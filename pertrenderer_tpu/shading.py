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


def phong_shading(meshes, fragments, texels, lights, cameras, materials):
    """Per-fragment Phong colors (N, H, W, K, 3).

    colors = (ambient + diffuse) * texels + specular, with positions/normals
    barycentric-interpolated from mesh vertices — matching PyTorch3D's
    ``phong_shading``.
    """
    verts = meshes.verts                      # (N, V, 3)
    faces = jnp.maximum(meshes.faces, 0)      # (N, F, 3)
    verts_normals = meshes.verts_normals()    # (N, V, 3)

    def _face_attrs(attr):
        # (N, V, 3) -> (N, F, 3, 3)
        import jax
        return jax.vmap(lambda a, f: a[f])(attr, faces)

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
