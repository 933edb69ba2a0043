"""Callback-free binned-capacity detection (VERDICT r3 #6).

The M-slot binned kernel approximates when a tile's candidate count
exceeds its slot budget.  The overflow counts now come back as REGULAR
jittable outputs (``capacity_stats``), checked host-side
(``check_capacity_host``) — and the pose harness fetches them at every
scan-segment boundary, so detection works on backends with no
host-callback support (the axon TPU relay).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pertrenderer_tpu as pt
from pertrenderer_tpu.ops import fused_render as fr


def _scene(imsize=64, max_faces_per_bin=50000):
    verts, faces = pt.make_icosphere(2)           # 320 faces > flat slots
    mesh = pt.Meshes.create(
        verts, faces,
        textures=pt.TexturesVertex(jnp.ones((1, verts.shape[0], 3))))
    mesh = mesh.scale_verts(2.0)
    r, t = pt.look_at_view_transform(dist=6.7, elev=30.0, azim=120.0)
    cameras = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    settings = pt.RasterizationSettings(
        image_size=imsize, blur_radius=2e-3, faces_per_pixel=50,
        max_faces_per_bin=max_faces_per_bin)
    sr = pt.SoftRast.create(sigma=1e-3)
    sa = pt.SoftAgg.create(gamma=1e-2)
    return mesh, cameras, lights, settings, sr, sa


def test_capacity_stats_modes(monkeypatch):
    """Stats exist exactly for the binned route; flat/stream return None."""
    monkeypatch.setenv("PERTRENDERER_FUSED", "interpret")
    mesh, cameras, lights, settings, sr, sa = _scene()
    # Default route for this mesh is streaming -> no capacity limits.
    assert fr.capacity_stats(mesh, cameras, settings, sr, sa, lights) is None
    monkeypatch.setenv("PERTRENDERER_STREAM", "off")
    monkeypatch.setattr(fr, "_BIN_P_TILE", 32)
    stats = fr.capacity_stats(mesh, cameras, settings, sr, sa, lights)
    assert stats is not None
    assert int(stats["max_tile_candidates"]) > 0
    assert stats["slots"] > 0


def test_capacity_overflow_detected_and_policies(monkeypatch):
    monkeypatch.setenv("PERTRENDERER_FUSED", "interpret")
    monkeypatch.setenv("PERTRENDERER_STREAM", "off")
    monkeypatch.setattr(fr, "_BIN_P_TILE", 32)
    # A tiny slot budget guarantees overflow on the sphere's dense tiles.
    mesh, cameras, lights, settings, sr, sa = _scene(max_faces_per_bin=8)
    stats = jax.device_get(
        fr.capacity_stats(mesh, cameras, settings, sr, sa, lights))
    assert int(stats["max_tile_candidates"]) > int(stats["slots"])

    with pytest.warns(UserWarning, match="capacity exceeded"):
        msg = fr.check_capacity_host(settings, stats)
    assert msg is not None

    import dataclasses

    err_settings = dataclasses.replace(settings, bin_overflow="error")
    with pytest.raises(RuntimeError, match="capacity exceeded"):
        fr.check_capacity_host(err_settings, stats)

    allow_settings = dataclasses.replace(settings, bin_overflow="allow")
    assert fr.check_capacity_host(allow_settings, stats) is None
    assert fr.check_capacity_host(settings, None) is None

    # No overflow -> silent.
    ok = dict(stats)
    ok["max_tile_candidates"] = np.int32(1)
    ok["max_range"] = np.int32(0)
    assert fr.check_capacity_host(settings, ok) is None


def test_capacity_stats_jittable(monkeypatch):
    """The stats are plain data — jittable with a traced pose/blur (no host
    callbacks), which is what lets the harness probe them on axon."""
    monkeypatch.setenv("PERTRENDERER_FUSED", "interpret")
    monkeypatch.setenv("PERTRENDERER_STREAM", "off")
    monkeypatch.setattr(fr, "_BIN_P_TILE", 32)
    mesh, cameras, lights, settings, sr, sa = _scene(max_faces_per_bin=8)

    @jax.jit
    def probe(blur):
        return fr.capacity_stats(mesh, cameras, settings, sr, sa, lights,
                                 blur_override=blur)

    s1 = jax.device_get(probe(jnp.asarray(2e-3)))
    s2 = jax.device_get(probe(jnp.asarray(0.0)))
    # A wider blur band can only add candidates.
    assert int(s1["max_tile_candidates"]) >= int(s2["max_tile_candidates"])


def test_harness_boundary_check_fires_without_callbacks(monkeypatch):
    """End-to-end: pose optimization over an overflowing binned scene warns
    at the segment boundary even when the backend cannot run host
    callbacks (the axon case, simulated by forcing _callbacks_supported
    False)."""
    monkeypatch.setenv("PERTRENDERER_FUSED", "interpret")
    monkeypatch.setenv("PERTRENDERER_STREAM", "off")
    monkeypatch.setattr(fr, "_BIN_P_TILE", 32)
    monkeypatch.setattr(fr, "_callbacks_supported", lambda: False)
    from pertrenderer_tpu.experiments.harness import optimize_pose

    mesh, cameras, lights, settings, sr, sa = _scene(max_faces_per_bin=8)
    renderer = pt.MeshRenderer.create(
        rasterizer=pt.MeshRasterizer.create(cameras=cameras,
                                            raster_settings=settings),
        shader=pt.RandomPhongShader.create(
            cameras=cameras, lights=lights,
            blend_params=pt.BlendParams(sigma=1e-3, gamma=1e-2),
            smoothrast=sr, smoothagg=sa))
    assert renderer.plan(mesh, assume_available=False).mode == "binned"
    target = jnp.zeros((1, 64, 64, 3))
    with pytest.warns(UserWarning, match="capacity exceeded"):
        optimize_pose(mesh, cameras, lights, jnp.zeros((1, 3)), renderer,
                      (target,), Niter=2, segment_size=2)
