"""Routing matrix: which execution mode serves which (F, image) regime.

VERDICT r3 #8: the fused-kernel routing (flat / stream / binned / staged)
must be auditable and the 8192-face cliff closed — a large-F mesh at an
image the binned kernel cannot tile now streams (exact) instead of silently
landing on the staged XLA path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pertrenderer_tpu as pt


def _mesh(f):
    """Minimal valid mesh with exactly ``f`` faces (plan inspection only —
    never rendered)."""
    v = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    faces = jnp.zeros((f, 3), jnp.int32).at[:, 1].set(1).at[:, 2].set(2)
    tex = pt.TexturesVertex(jnp.ones((1, 3, 3)))
    return pt.Meshes.create(v, faces, textures=tex)


def _renderer(imsize, k=50):
    r, t = pt.look_at_view_transform(dist=6.7, elev=30.0, azim=120.0)
    cameras = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    settings = pt.RasterizationSettings(
        image_size=imsize, blur_radius=1e-4, faces_per_pixel=k,
        max_faces_per_bin=50000)
    return pt.MeshRenderer.create(
        rasterizer=pt.MeshRasterizer.create(cameras=cameras,
                                            raster_settings=settings),
        shader=pt.RandomPhongShader.create(
            cameras=cameras, lights=lights,
            smoothrast=pt.GaussianRast.create(sigma=1e-3, nb_samples=2),
            smoothagg=pt.GaussianAgg.create(gamma=1e-2, nb_samples=2)))


# The documented routing matrix (default env: PERTRENDERER_STREAM=on).
# EXACT BY DEFAULT (VERDICT r3 #2): every F > K scene streams; the
# approximate M-slot binned kernel requires an explicit opt-in
# (bin_overflow='allow', next table) and the sub-row binnable regime.
#   F <= K       -> flat   (slots are faces, exact)
#   F > K        -> stream (exact, any size, any density)
MATRIX = {
    (12, 64): "flat", (12, 128): "flat", (12, 256): "flat",
    (12, 512): "flat",
    (2048, 64): "stream", (2048, 128): "stream", (2048, 256): "stream",
    (2048, 512): "stream",
    (8192, 64): "stream", (8192, 128): "stream", (8192, 256): "stream",
    (8192, 512): "stream",
    (10240, 64): "stream", (10240, 128): "stream",
    (10240, 256): "stream", (10240, 512): "stream",
    (81920, 64): "stream", (81920, 128): "stream",
    (81920, 256): "stream", (81920, 512): "stream",
}

# With the opt-in, large meshes at binnable images take the fast
# approximate binned kernel; everything else still streams.
MATRIX_ALLOW = {
    (12, 256): "flat",
    (2048, 256): "stream",     # mid-poly always streams (binned no faster)
    (10240, 128): "stream",    # not binnable below 256
    (10240, 256): "binned", (10240, 512): "binned",
    (81920, 256): "binned", (81920, 512): "binned",
    (81920, 64): "stream",
}


@pytest.mark.parametrize("f,imsize", sorted(MATRIX))
def test_routing_matrix(f, imsize):
    plan = _renderer(imsize).plan(_mesh(f))
    assert plan.mode == MATRIX[(f, imsize)], plan
    assert plan.f == f and plan.image_size == imsize
    assert plan.reason


@pytest.mark.parametrize("f,imsize", sorted(MATRIX_ALLOW))
def test_routing_matrix_binned_optin(f, imsize):
    import dataclasses

    r = _renderer(imsize)
    settings = dataclasses.replace(r.rasterizer.raster_settings,
                                   bin_overflow="allow")
    r = r.replace(rasterizer=r.rasterizer.replace(raster_settings=settings))
    plan = r.plan(_mesh(f))
    assert plan.mode == MATRIX_ALLOW[(f, imsize)], plan


def test_plan_fields():
    plan = _renderer(256).plan(_mesh(12))
    assert plan.mode == "flat" and plan.slots >= 12 and plan.k == 50
    th, tw = plan.tile
    assert th * tw == plan.p_tile

    plan = _renderer(512).plan(_mesh(2048))
    assert plan.mode == "stream"
    assert plan.table_rows >= 2048 and plan.table_rows % 64 == 0

    import dataclasses

    r = _renderer(512)
    settings = dataclasses.replace(r.rasterizer.raster_settings,
                                   bin_overflow="allow")
    r = r.replace(rasterizer=r.rasterizer.replace(raster_settings=settings))
    plan = r.plan(_mesh(81920))
    assert plan.mode == "binned" and plan.slots > 0


def test_stream_env_off_keeps_binned(monkeypatch):
    monkeypatch.setenv("PERTRENDERER_STREAM", "off")
    assert _renderer(512).plan(_mesh(2048)).mode == "binned"
    # stream off + binned-ineligible image -> staged, with the reason.
    plan = _renderer(128).plan(_mesh(2048))
    assert plan.mode == "staged" and "PERTRENDERER_STREAM" in plan.reason


def test_stream_env_force_streams_everything(monkeypatch):
    monkeypatch.setenv("PERTRENDERER_STREAM", "force")
    assert _renderer(512).plan(_mesh(81920)).mode == "stream"


def test_unfused_shader_reports_staged():
    r = _renderer(128)
    r = r.replace(shader=pt.SoftSimpleShader.create())
    plan = r.plan(_mesh(12))
    assert plan.mode == "staged" and "SoftSimpleShader" in plan.reason


def test_actual_backend_report():
    # assume_available=False reports this CPU process's true route: staged
    # unless the interpreter is forced.
    plan = _renderer(128).plan(_mesh(12), assume_available=False)
    assert plan.mode == "staged"
    assert "unavailable" in plan.reason
