"""The closure-constant zero-fill guard (NOTES.md round-5 quirk).

The axon TPU backend zero-fills batched gathers of large constant-embedded
operands: a jitted program that closure-captures a large mesh renders
all-black (measured at 81,920 faces — fused path only; the staged path is
unaffected).  ``fused_render._warn_closure_constants`` detects the hazard
at trace time; these tests pin when it fires (large table reaches the
fused entry as a concrete constant while other inputs are tracers) and
when it must stay silent (eager calls, argument-passed meshes, small
meshes).
"""
import warnings

import jax
import jax.numpy as jnp
import pytest

import pertrenderer_tpu as pt
from pertrenderer_tpu.ops.fused_render import _warn_closure_constants


def _mesh(level):
    verts, faces = pt.make_icosphere(level)
    return pt.Meshes.create(
        verts, faces,
        textures=pt.TexturesVertex(jnp.ones((1, verts.shape[0], 3))))


def _traced(mesh, lr):
    # verts traced (the harness pattern: rotation applied to closure mesh),
    # faces/textures still whatever `mesh` carries.
    return mesh.update_padded(mesh.verts_padded() + lr)


def test_warns_on_large_closure_mesh():
    mesh = _mesh(4)        # 5120 faces > the 4096-row threshold
    seen = []

    def f(lr):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            _warn_closure_constants(_traced(mesh, lr))
            seen.extend(w)
        return lr

    jax.jit(f)(jnp.zeros(3))
    assert any("closure-captured" in str(x.message) for x in seen)


def test_silent_when_mesh_is_argument():
    mesh = _mesh(4)
    seen = []

    def f(m, lr):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            _warn_closure_constants(_traced(m, lr))
            seen.extend(w)
        return lr

    jax.jit(f)(mesh, jnp.zeros(3))
    assert not seen


def test_silent_on_small_mesh_and_eager():
    small = _mesh(1)       # 80 faces — under threshold
    seen = []

    def f(lr):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            _warn_closure_constants(_traced(small, lr))
            seen.extend(w)
        return lr

    jax.jit(f)(jnp.zeros(3))
    assert not seen

    big = _mesh(4)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _warn_closure_constants(big)       # eager: nothing traced
    assert not w


def test_optimize_pose_compiles_mesh_as_argument():
    """The harness threads mesh/target through the compiled scan's
    arguments (the round-4 config-5 'failures' were this quirk corrupting
    closure-compiled scans)."""
    import inspect

    from pertrenderer_tpu.experiments import harness

    src = inspect.getsource(harness.optimize_pose)
    assert "jitted.lower(carry, seg_keys, mesh, target)" in src
    src2 = inspect.getsource(harness.optimize_scene_params)
    assert "scan_cache[sig](\n            carry, base_mesh, target)" in src2
