"""Per-pixel Phong shading.

TPU-native equivalent of PyTorch3D's ``phong_shading`` consumed at
`/root/reference/randomras/random_rasterizer.py:103-110`: interpolate
world-space positions and vertex normals for every fragment, apply
ambient + diffuse + specular lighting, modulate texels.

Pure gathers + elementwise math — XLA fuses the whole thing into the
rasterize -> shade -> blend program.
"""

from __future__ import annotations

import jax.numpy as jnp

from pertrenderer_tpu.lights import diffuse_specular
from pertrenderer_tpu.textures import interpolate_face_attributes

__all__ = ["phong_shading", "apply_lighting"]


def apply_lighting(points, normals, lights, cameras, materials):
    """Ambient/diffuse/specular components for shaded points.

    points, normals: (N, ..., 3).  Returns three (N, ..., 3) arrays.
    """
    def _b(x):
        return x.reshape((x.shape[0],) + (1,) * (points.ndim - 2) + (3,))

    diffuse, specular = diffuse_specular(
        lights, normals, points, cameras.camera_center(), materials.shininess
    )
    ambient = _b(materials.ambient_color * lights.ambient_color)
    diffuse = diffuse * _b(materials.diffuse_color)
    specular = specular * _b(materials.specular_color)
    return ambient, diffuse, specular


def _normalize_cm(v, eps=1e-8):
    """Normalize a channel-major (3, ...) vector field along axis 0."""
    norm = jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
    return v / jnp.maximum(norm, eps)


def phong_shading_cm(meshes, pfrag, texels_cm, lights, cameras, materials):
    """Channel-major Phong shading: (3, N, H, W, K) colors.

    The hot-path twin of :func:`phong_shading` — all 3-vector fields keep
    channels on the leading axis so the big pixel dims stay lane-aligned
    (TPU pads the minor dim to 128 lanes; a trailing 3 wastes 42x).
    Supports PointLights (the reference's lighting,
    `/root/reference/experiments/eval.py:252`) and DirectionalLights.
    """
    from pertrenderer_tpu.lights import DirectionalLights, PointLights
    from pertrenderer_tpu.ops.gather import take_rows_cm_batched

    n, f = meshes.batch_size, meshes.max_faces
    faces = jnp.maximum(meshes.faces, 0)
    p2f = pfrag.pix_to_face
    w0, w1, w2 = pfrag.w0, pfrag.w1, pfrag.w2

    # Per-face corner tables (N, F, 3, 6) for verts AND vertex normals,
    # interpolated in ONE fused weighted gather (the unfused version
    # materializes an 18-wide corner tensor — the largest allocation in
    # profiles).
    from pertrenderer_tpu.ops.gather import take_rows_batched
    from pertrenderer_tpu.ops.interp_gather import interp_rows_cm_batched

    verts_table = take_rows_batched(meshes.verts, faces)           # (N,F,3,3)
    normals_table = take_rows_batched(meshes.verts_normals(), faces)
    merged = jnp.concatenate([verts_table, normals_table], axis=-1)
    vals = interp_rows_cm_batched(merged, p2f, w0, w1, w2)  # (6, N, H, W, K)
    points = vals[:3]
    normals = vals[3:]

    def _b(x):  # (N, 3) -> (3, N, 1, 1, 1)
        return jnp.moveaxis(x, -1, 0).reshape(
            (3, x.shape[0]) + (1,) * (points.ndim - 2))

    if isinstance(lights, PointLights):
        to_light = _normalize_cm(_b(lights.location) - points)
    elif isinstance(lights, DirectionalLights):
        to_light = jnp.broadcast_to(_normalize_cm(_b(-lights.direction)),
                                    points.shape)
    else:
        raise NotImplementedError(
            f"phong_shading_cm supports Point/DirectionalLights, got "
            f"{type(lights).__name__}")
    cos_angle = jnp.sum(normals * to_light, axis=0)                 # (N,H,W,K)
    diffuse = jnp.maximum(cos_angle, 0.0) * _b(lights.diffuse_color)

    view_dir = _normalize_cm(_b(cameras.camera_center()) - points)
    reflect = 2.0 * cos_angle * normals - to_light
    alpha = jnp.maximum(jnp.sum(view_dir * reflect, axis=0), 0.0)
    facing = (cos_angle > 0.0).astype(points.dtype)
    shin = materials.shininess.reshape(
        (materials.shininess.shape[0],) + (1,) * (points.ndim - 2))
    specular = (facing * jnp.power(alpha, shin)) * _b(lights.specular_color)

    ambient = _b(materials.ambient_color * lights.ambient_color)
    diffuse = diffuse * _b(materials.diffuse_color)
    specular = specular * _b(materials.specular_color)
    return (ambient + diffuse) * texels_cm + specular


def phong_shading(meshes, fragments, texels, lights, cameras, materials):
    """Per-fragment Phong colors (N, H, W, K, 3).

    colors = (ambient + diffuse) * texels + specular, with positions/normals
    barycentric-interpolated from mesh vertices — matching PyTorch3D's
    ``phong_shading``.
    """
    from pertrenderer_tpu.ops.gather import take_rows_batched

    verts = meshes.verts                      # (N, V, 3)
    faces = jnp.maximum(meshes.faces, 0)      # (N, F, 3)
    verts_normals = meshes.verts_normals()    # (N, V, 3)

    def _face_attrs(attr):
        # (N, V, 3) -> (N, F, 3, 3) via the MXU gather
        return take_rows_batched(attr, faces)

    pixel_coords = interpolate_face_attributes(
        fragments.pix_to_face, fragments.bary_coords, _face_attrs(verts)
    )
    pixel_normals = interpolate_face_attributes(
        fragments.pix_to_face, fragments.bary_coords, _face_attrs(verts_normals)
    )
    ambient, diffuse, specular = apply_lighting(
        pixel_coords, pixel_normals, lights, cameras, materials
    )
    return (ambient + diffuse) * texels + specular
