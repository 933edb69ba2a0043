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
