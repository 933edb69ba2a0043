import jax
import jax.numpy as jnp
import numpy as np
import optax

from pertrenderer_tpu.utils import checkpoint


def test_checkpoint_roundtrip(tmp_path):
    params = {"log_rot": jnp.ones((1, 3)), "sigma": jnp.asarray(1e-3)}
    opt = optax.adam(1e-2)
    state = {"params": params, "opt_state": opt.init(params),
             "key": jax.random.PRNGKey(3), "step": jnp.asarray(7)}
    path = checkpoint.save_checkpoint(str(tmp_path / "ckpt"), state, step=7)
    assert path
    restored = checkpoint.restore_checkpoint(str(tmp_path / "ckpt"),
                                             example_state=state)
    flat_a, _ = jax.tree.flatten(state)
    flat_b, _ = jax.tree.flatten(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_latest(tmp_path):
    d = str(tmp_path / "ckpt")
    checkpoint.save_checkpoint(d, {"x": jnp.asarray(1.0)}, step=1)
    checkpoint.save_checkpoint(d, {"x": jnp.asarray(2.0)}, step=5)
    assert checkpoint.latest_step(d) == 5
    restored = checkpoint.restore_checkpoint(
        d, example_state={"x": jnp.asarray(0.0)})
    np.testing.assert_allclose(float(restored["x"]), 2.0)


def test_per_iteration_time_runs():
    from pertrenderer_tpu.utils.profiling import per_iteration_time

    t = per_iteration_time(lambda c: c * 1.0001 + 0.01,
                           jnp.ones((64, 64)), n1=2, n2=6)
    assert t >= 0.0
