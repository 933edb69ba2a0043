"""Texture representations: per-vertex colors, UV maps, per-face atlases.

TPU-native equivalents of the three PyTorch3D texture classes the reference
exercises (`/root/reference/experiments/eval.py:233-238,450,746-756`):

  * ``TexturesVertex`` — barycentric interpolation of per-vertex colors,
  * ``TexturesUV``     — barycentric UV interpolation + bilinear map fetch,
  * ``TexturesAtlas``  — per-face RxR texture atlas lookup.

All per-pixel indexing goes through ``ops.gather.take_rows`` — the MXU
one-hot-matmul gather (XLA's native TPU gather is a ~25 ns/row scalar loop
that dominated the whole render step in profiles).  The pattern everywhere:
build a small *per-face* attribute table first (one cheap gather over F
rows), then do a single per-pixel row-gather from it.

Fully differentiable w.r.t. texture values; UV sampling also differentiates
w.r.t. vertex UVs through the bilinear weights.

Sampling consumes ``Fragments`` (see ops/rasterize.py): ``pix_to_face``
(N, H, W, K) per-mesh face indices (-1 = empty) and ``bary_coords``
(N, H, W, K, 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from pertrenderer_tpu.ops.gather import (
    take_rows,
    take_rows_batched,
    take_rows_cm_batched,
)

__all__ = ["TexturesVertex", "TexturesUV", "TexturesAtlas", "Textures",
           "interpolate_face_attributes", "interpolate_face_attributes_cm"]


def interpolate_face_attributes_cm(pix_to_face, w0, w1, w2, face_attrs):
    """Channel-major barycentric interpolation, fused into one weighted
    gather (ops/interp_gather.py).

    pix_to_face, w0..w2: (N, H, W, K); face_attrs: (N, F, 3, C).
    Returns (C, N, H, W, K) — channels on the (cheaply padded) leading axis,
    pixels lane-aligned.  Zero where empty (negative indices are masked)."""
    from pertrenderer_tpu.ops.interp_gather import interp_rows_cm_batched

    return interp_rows_cm_batched(face_attrs, pix_to_face, w0, w1, w2)


def interpolate_face_attributes(
    pix_to_face: jnp.ndarray, bary_coords: jnp.ndarray,
    face_attrs: jnp.ndarray,
) -> jnp.ndarray:
    """Barycentric interpolation of per-face-vertex attributes.

    pix_to_face: (N, H, W, K); bary_coords: (N, H, W, K, 3);
    face_attrs: (N, F, 3, C).  Returns (N, H, W, K, C), zero where empty.
    Mirrors PyTorch3D's ``interpolate_face_attributes`` consumed through
    ``phong_shading`` (`/root/reference/randomras/random_rasterizer.py:103`).
    """
    n, f = face_attrs.shape[0], face_attrs.shape[1]
    c = face_attrs.shape[-1]
    vals = take_rows_batched(face_attrs.reshape(n, f, 3 * c), pix_to_face)
    vals = vals.reshape(pix_to_face.shape + (3, c))
    # take_rows already zeroes empty (-1) fragments.
    return jnp.einsum("...v,...vc->...c", bary_coords, vals,
                      precision=jax.lax.Precision.HIGHEST)


@struct.dataclass
class TexturesVertex:
    """Per-vertex RGB features, interpolated with barycentric weights.

    verts_features: (N, V, C) — clampable, differentiable (the scene-parameter
    loop optimizes these at `/root/reference/experiments/eval.py:450`).
    """

    verts_features: jnp.ndarray

    def sample(self, faces: jnp.ndarray, pix_to_face: jnp.ndarray,
               bary_coords: jnp.ndarray) -> jnp.ndarray:
        face_attrs = take_rows_batched(self.verts_features,
                                       jnp.maximum(faces, 0))  # (N, F, 3, C)
        return interpolate_face_attributes(pix_to_face, bary_coords,
                                           face_attrs)

    def sample_cm(self, faces, pix_to_face, w0, w1, w2) -> jnp.ndarray:
        """Channel-major sampling: (C, N, H, W, K)."""
        face_attrs = take_rows_batched(self.verts_features,
                                       jnp.maximum(faces, 0))
        return interpolate_face_attributes_cm(pix_to_face, w0, w1, w2,
                                              face_attrs)

    def extend(self, n: int) -> "TexturesVertex":
        return TexturesVertex(jnp.repeat(self.verts_features, n, axis=0))


@struct.dataclass
class TexturesUV:
    """UV-mapped texture: bilinear fetch from ``maps`` at interpolated UVs.

    maps: (N, Hm, Wm, C) texture images; verts_uvs: (N, Vt, 2) in [0, 1]
    (origin bottom-left, as in OBJ / PyTorch3D); faces_uvs: (N, F, 3) indices
    into verts_uvs.  Used for the Rubik's-cube strip texture
    (`/root/reference/experiments/eval.py:746-756`).

    ``atlas_size`` > 0 enables the TPU fast path: the map is baked into a
    per-face RxR atlas *inside the render* (differentiable w.r.t. the map —
    the bake is a bilinear resample at F*R^2 points) and fragments fetch from
    the atlas with a single row-gather instead of four bilinear map fetches
    per fragment.  Exact for per-face-constant textures (the reference's
    painted cube strips); an R-resolution approximation otherwise — the same
    trade PyTorch3D's own ``TexturesAtlas`` pathway makes.
    """

    maps: jnp.ndarray
    verts_uvs: jnp.ndarray
    faces_uvs: jnp.ndarray
    atlas_size: int = struct.field(pytree_node=False, default=0)

    def _bake_atlas(self) -> jnp.ndarray:
        """Differentiable (N, F, R, R, C) atlas resampled from the UV map
        on a barycentric grid (PyTorch3D ``make_mesh_texture_atlas``
        quantization: x from w1, y from w2)."""
        r = self.atlas_size
        n, f = self.faces_uvs.shape[0], self.faces_uvs.shape[1]
        hm, wm = self.maps.shape[1], self.maps.shape[2]
        grid = (jnp.arange(r, dtype=jnp.float32) + 0.5) / r
        w1 = grid[None, :].repeat(r, 0)          # (R, R) x-coordinate
        w2 = grid[:, None].repeat(r, 1)          # (R, R) y-coordinate
        w0 = 1.0 - w1 - w2

        def _one(map_n, verts_uvs_n, faces_uvs_n):
            uv_c = verts_uvs_n[jnp.maximum(faces_uvs_n, 0)]   # (F, 3, 2)
            uv = (w0[None, ..., None] * uv_c[:, None, None, 0]
                  + w1[None, ..., None] * uv_c[:, None, None, 1]
                  + w2[None, ..., None] * uv_c[:, None, None, 2])
            x = uv[..., 0] * (wm - 1)
            y = (1.0 - uv[..., 1]) * (hm - 1)
            x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, wm - 1)
            y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, hm - 1)
            x1 = jnp.clip(x0 + 1, 0, wm - 1)
            y1 = jnp.clip(y0 + 1, 0, hm - 1)
            fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
            fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
            top = map_n[y0, x0] * (1 - fx) + map_n[y0, x1] * fx
            bot = map_n[y1, x0] * (1 - fx) + map_n[y1, x1] * fx
            return top * (1 - fy) + bot * fy                  # (F, R, R, C)

        return jax.vmap(_one)(self.maps, self.verts_uvs,
                              jnp.maximum(self.faces_uvs, 0))

    def sample(self, faces: jnp.ndarray, pix_to_face: jnp.ndarray,
               bary_coords: jnp.ndarray) -> jnp.ndarray:
        del faces  # UV topology has its own face index buffer.
        n = self.maps.shape[0]
        hm, wm, c = self.maps.shape[1], self.maps.shape[2], self.maps.shape[3]

        # Per-face UV corner table, then one per-pixel gather.
        uv_corners = take_rows_batched(self.verts_uvs,
                                       jnp.maximum(self.faces_uvs, 0))
        f = uv_corners.shape[1]
        uv_pix = take_rows_batched(uv_corners.reshape(n, f, 6), pix_to_face)
        uv_pix = uv_pix.reshape(pix_to_face.shape + (3, 2))
        uv = jnp.einsum("...v,...vc->...c", bary_coords, uv_pix,
                        precision=jax.lax.Precision.HIGHEST)  # (..., 2)

        # Bilinear fetch: 4 corner texels in ONE row-gather from the
        # linearized map.
        x = uv[..., 0] * (wm - 1)
        y = (1.0 - uv[..., 1]) * (hm - 1)     # OBJ: v=0 is the bottom row
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, wm - 1)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, hm - 1)
        x1 = jnp.clip(x0 + 1, 0, wm - 1)
        y1 = jnp.clip(y0 + 1, 0, hm - 1)
        fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
        fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
        corners = jnp.stack([
            y0 * wm + x0, y0 * wm + x1, y1 * wm + x0, y1 * wm + x1,
        ], axis=-1)                                        # (..., 4)
        # Keep empty fragments masked through the gather.
        corners = jnp.where((pix_to_face >= 0)[..., None], corners, -1)
        texels4 = take_rows_batched(self.maps.reshape(n, hm * wm, c), corners)
        c00, c01, c10, c11 = (texels4[..., i, :] for i in range(4))
        top = c00 * (1 - fx) + c01 * fx
        bot = c10 * (1 - fx) + c11 * fx
        return top * (1 - fy) + bot * fy

    def sample_cm(self, faces, pix_to_face, w0, w1, w2) -> jnp.ndarray:
        """Channel-major UV sampling: (C, N, H, W, K)."""
        if self.atlas_size:
            atlas = self._bake_atlas()
            return TexturesAtlas(atlas).sample_cm(faces, pix_to_face, w0,
                                                  w1, w2)
        del faces
        n = self.maps.shape[0]
        hm, wm, c = self.maps.shape[1], self.maps.shape[2], self.maps.shape[3]
        uv_corners = take_rows_batched(self.verts_uvs,
                                       jnp.maximum(self.faces_uvs, 0))
        uv = interpolate_face_attributes_cm(pix_to_face, w0, w1, w2,
                                            uv_corners)  # (2, N, H, W, K)
        u, v = uv[0], uv[1]

        x = u * (wm - 1)
        y = (1.0 - v) * (hm - 1)
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, wm - 1)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, hm - 1)
        x1 = jnp.clip(x0 + 1, 0, wm - 1)
        y1 = jnp.clip(y0 + 1, 0, hm - 1)
        fx = jnp.clip(x - x0, 0.0, 1.0)
        fy = jnp.clip(y - y0, 0.0, 1.0)
        # Corner-major index stack (4, N, H, W, K) — one gather call, no
        # 4-wide trailing dim.
        corners = jnp.stack([
            y0 * wm + x0, y0 * wm + x1, y1 * wm + x0, y1 * wm + x1,
        ], axis=0)
        corners = jnp.where((pix_to_face >= 0)[None], corners, -1)
        map_flat = self.maps.reshape(n, hm * wm, c)
        # Batched gather expects the batch axis first; fold the corner axis
        # into the index shape by moving batch out front.
        texels = take_rows_cm_batched(
            map_flat, jnp.moveaxis(corners, 1, 0))        # (C, N, 4, H, W, K)
        texels = jnp.moveaxis(texels, 2, 1)               # (C, 4, N, H, W, K)
        c00, c01, c10, c11 = (texels[:, i] for i in range(4))
        top = c00 * (1 - fx) + c01 * fx
        bot = c10 * (1 - fx) + c11 * fx
        return top * (1 - fy) + bot * fy

    def extend(self, n: int) -> "TexturesUV":
        return TexturesUV(
            maps=jnp.repeat(self.maps, n, axis=0),
            verts_uvs=jnp.repeat(self.verts_uvs, n, axis=0),
            faces_uvs=jnp.repeat(self.faces_uvs, n, axis=0),
            atlas_size=self.atlas_size,
        )


@struct.dataclass
class TexturesAtlas:
    """Per-face RxR texture atlas, sampled by barycentric coordinates.

    atlas: (N, F, R, R, C).  Matches PyTorch3D's ``TexturesAtlas`` built by
    ``load_obj(create_texture_atlas=True)``
    (`/root/reference/experiments/eval.py:224-238`): texel (i, j) is chosen by
    quantizing (w1, w2) barycentric coordinates onto the RxR grid.
    """

    atlas: jnp.ndarray

    def sample(self, faces: jnp.ndarray, pix_to_face: jnp.ndarray,
               bary_coords: jnp.ndarray) -> jnp.ndarray:
        del faces
        n, f, r = self.atlas.shape[0], self.atlas.shape[1], self.atlas.shape[2]
        c = self.atlas.shape[-1]
        w = jnp.clip(bary_coords, 0.0, 1.0)
        xi = jnp.clip((w[..., 1] * r).astype(jnp.int32), 0, r - 1)
        yi = jnp.clip((w[..., 2] * r).astype(jnp.int32), 0, r - 1)
        lin = pix_to_face * (r * r) + yi * r + xi
        lin = jnp.where(pix_to_face >= 0, lin, -1)
        return take_rows_batched(self.atlas.reshape(n, f * r * r, c), lin)

    def sample_cm(self, faces, pix_to_face, w0, w1, w2) -> jnp.ndarray:
        """Channel-major atlas sampling: (C, N, H, W, K)."""
        del faces
        n, f, r = self.atlas.shape[0], self.atlas.shape[1], self.atlas.shape[2]
        c = self.atlas.shape[-1]
        xi = jnp.clip((jnp.clip(w1, 0.0, 1.0) * r).astype(jnp.int32), 0, r - 1)
        yi = jnp.clip((jnp.clip(w2, 0.0, 1.0) * r).astype(jnp.int32), 0, r - 1)
        lin = pix_to_face * (r * r) + yi * r + xi
        lin = jnp.where(pix_to_face >= 0, lin, -1)
        return take_rows_cm_batched(self.atlas.reshape(n, f * r * r, c), lin)

    def extend(self, n: int) -> "TexturesAtlas":
        return TexturesAtlas(jnp.repeat(self.atlas, n, axis=0))


# Back-compat alias: PyTorch3D 0.4 exposed `Textures(verts_uvs, faces_uvs,
# maps)` which the reference uses for the cube
# (`/root/reference/experiments/eval.py:755`).
def Textures(maps=None, verts_uvs=None, faces_uvs=None):
    return TexturesUV(maps=maps, verts_uvs=verts_uvs, faces_uvs=faces_uvs)
