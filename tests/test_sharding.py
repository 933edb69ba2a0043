"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pertrenderer_tpu.parallel import sharding


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_8():
    sharding.dryrun_multichip(8, image_size=16, faces_per_pixel=4, steps=2)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_dryrun_multichip_2():
    sharding.dryrun_multichip(2, image_size=16, faces_per_pixel=4, steps=1)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_sample_sharding_exact_equivalence():
    """Sharded (samples-axis) estimator fwd+bwd == a single-device run that
    folds the same device indices into the key — exact, not statistical.

    The sharded estimator gives device i the stream fold_in(key, i) and
    pmeans the per-device sample means (ops/perturbed.py _device_key); a
    host-side loop reproducing exactly those streams must match to float
    reassociation (<=1e-6)."""
    from jax.sharding import Mesh, PartitionSpec as P

    from pertrenderer_tpu.ops.perturbed import (perturbed_argmax,
                                                perturbed_heaviside)

    n_dev, n_per_dev = 4, 8
    devices = np.asarray(jax.devices()[:n_dev]).reshape(1, n_dev)
    mesh = Mesh(devices, (sharding.DATA_AXIS, sharding.SAMPLE_AXIS))
    key = jax.random.PRNGKey(3)
    d = jnp.linspace(-1, 1, 64).reshape(1, 4, 4, 4)
    w = jnp.cos(jnp.arange(64.0)).reshape(1, 4, 4, 4)
    sigma = jnp.asarray(0.5)

    def sharded_local(d, sigma):
        def loss(d, sigma):
            out = perturbed_heaviside(d, sigma, key, n_per_dev, "gaussian",
                                      True, sharding.SAMPLE_AXIS)
            return jnp.sum(out * w), out
        (l, out), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(d, sigma)
        return l, out, grads

    l_sh, out_sh, (gd_sh, gs_sh) = jax.jit(jax.shard_map(
        sharded_local, mesh=mesh, in_specs=(P(), P()),
        out_specs=(P(), P(), (P(), P())), check_vma=False))(d, sigma)

    def single(d, sigma):
        def loss(d, sigma):
            outs = [perturbed_heaviside(d, sigma, jax.random.fold_in(key, i),
                                        n_per_dev, "gaussian", True)
                    for i in range(n_dev)]
            out = sum(outs) / n_dev
            return jnp.sum(out * w), out
        (l, out), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(d, sigma)
        return l, out, grads

    l_1, out_1, (gd_1, gs_1) = jax.jit(single)(d, sigma)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_1),
                               atol=1e-6)
    np.testing.assert_allclose(float(l_sh), float(l_1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gd_sh), np.asarray(gd_1), atol=1e-6)
    np.testing.assert_allclose(float(gs_sh), float(gs_1), rtol=1e-5)

    # Same exactness for the perturbed argmax (fwd + VR Jacobian bwd).
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 5))
    wz = jnp.sin(jnp.arange(80.0)).reshape(1, 4, 4, 5)
    gamma = jnp.asarray(0.3)

    def sharded_arg(z, gamma):
        def loss(z, gamma):
            out = perturbed_argmax(z, gamma, key, n_per_dev, "gaussian",
                                   True, sharding.SAMPLE_AXIS)
            return jnp.sum(out * wz)
        return jax.value_and_grad(loss, argnums=(0, 1))(z, gamma)

    l_sh, (gz_sh, gg_sh) = jax.jit(jax.shard_map(
        sharded_arg, mesh=mesh, in_specs=(P(), P()),
        out_specs=(P(), (P(), P())), check_vma=False))(z, gamma)

    def single_arg(z, gamma):
        def loss(z, gamma):
            outs = [perturbed_argmax(z, gamma, jax.random.fold_in(key, i),
                                     n_per_dev, "gaussian", True)
                    for i in range(n_dev)]
            return jnp.sum(sum(outs) / n_dev * wz)
        return jax.value_and_grad(loss, argnums=(0, 1))(z, gamma)

    l_1, (gz_1, gg_1) = jax.jit(single_arg)(z, gamma)
    np.testing.assert_allclose(float(l_sh), float(l_1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gz_sh), np.asarray(gz_1), atol=1e-6)
    np.testing.assert_allclose(float(gg_sh), float(gg_1), rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_sample_sharding_matches_single_device():
    """pmean of per-device sample means == single-device mean over all
    samples, given matching noise streams: check the sharded estimator is
    finite, in-range and deterministic."""
    from jax.sharding import Mesh, PartitionSpec as P

    from pertrenderer_tpu.ops.perturbed import perturbed_heaviside

    devices = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devices, (sharding.DATA_AXIS, sharding.SAMPLE_AXIS))
    d = jnp.linspace(-1, 1, 64).reshape(1, 4, 4, 4)
    key = jax.random.PRNGKey(0)

    def f(d):
        return perturbed_heaviside(d, jnp.asarray(0.5), key, 64, "gaussian",
                                   True, sharding.SAMPLE_AXIS)

    out = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False))(d)
    ref = perturbed_heaviside(d, jnp.asarray(0.5), key, 256, "gaussian", True)
    assert np.isfinite(np.asarray(out)).all()
    # Both estimate Phi(d/sigma); with 256 total samples each, they agree
    # statistically.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.15)
    # different per-device fold_in streams -> not all-equal to a single
    # device's 64-sample estimate
    one = perturbed_heaviside(d, jnp.asarray(0.5), key, 64, "gaussian", True)
    assert np.abs(np.asarray(out) - np.asarray(one)).max() > 0
