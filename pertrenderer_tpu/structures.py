"""Fixed-shape mesh batch structure (a JAX pytree).

TPU-native equivalent of the PyTorch3D ``Meshes`` container the reference
manipulates (`/root/reference/experiments/eval.py:234-244,284-287,346,448-450`).
Unlike PyTorch3D's packed/padded dual representation, this is a single padded,
static-shape representation — required for jit: all meshes in a batch share
the (V, F) padding so every op traces once.

All mutating PyTorch3D ops (``offset_verts_``, ``scale_verts_``,
``update_padded``) become pure functions returning new ``Meshes``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["Meshes", "join_meshes_as_batch"]


@struct.dataclass
class Meshes:
    """A batch of N triangle meshes, padded to V vertices / F faces.

    Attributes:
      verts: (N, V, 3) float32 vertex positions (padding rows are zeros).
      faces: (N, F, 3) int32 vertex indices (padding faces are -1).
      num_verts: (N,) int32 valid vertex counts.
      num_faces: (N,) int32 valid face counts.
      textures: optional texture pytree (TexturesVertex / TexturesUV /
        TexturesAtlas).
    """

    verts: jnp.ndarray
    faces: jnp.ndarray
    num_verts: jnp.ndarray
    num_faces: jnp.ndarray
    textures: Optional[Any] = None

    @classmethod
    def create(cls, verts, faces, textures=None) -> "Meshes":
        """Build from unbatched (V, 3) + (F, 3) or batched (N, V, 3) + (N, F, 3)."""
        verts = jnp.asarray(verts, jnp.float32)
        faces = jnp.asarray(faces, jnp.int32)
        if verts.ndim == 2:
            verts = verts[None]
        if faces.ndim == 2:
            faces = faces[None]
        n = verts.shape[0]
        num_verts = jnp.full((n,), verts.shape[1], jnp.int32)
        num_faces = jnp.sum(jnp.any(faces >= 0, axis=-1), axis=-1).astype(jnp.int32)
        return cls(verts=verts, faces=faces, num_verts=num_verts,
                   num_faces=num_faces, textures=textures)

    # ---- shape accessors -------------------------------------------------
    @property
    def batch_size(self) -> int:
        return self.verts.shape[0]

    @property
    def max_verts(self) -> int:
        return self.verts.shape[1]

    @property
    def max_faces(self) -> int:
        return self.faces.shape[1]

    def verts_padded(self) -> jnp.ndarray:
        return self.verts

    def faces_padded(self) -> jnp.ndarray:
        return self.faces

    def verts_packed(self) -> jnp.ndarray:
        """First mesh's vertices (V, 3) — the reference only uses N=1 packing
        (`/root/reference/experiments/eval.py:239`)."""
        return self.verts.reshape(-1, 3)

    def faces_mask(self) -> jnp.ndarray:
        """(N, F) bool — True for valid (non-padding) faces."""
        return jnp.all(self.faces >= 0, axis=-1)

    # ---- functional updates ---------------------------------------------
    def update_padded(self, new_verts: jnp.ndarray) -> "Meshes":
        return self.replace(verts=new_verts)

    def offset_verts(self, offset: jnp.ndarray) -> "Meshes":
        """offset: (V, 3) or (N, V, 3)."""
        if offset.ndim == 2:
            offset = offset[None]
        return self.replace(verts=self.verts + offset)

    def scale_verts(self, scale) -> "Meshes":
        scale = jnp.asarray(scale, jnp.float32)
        if scale.ndim == 0:
            scale = scale[None]
        return self.replace(verts=self.verts * scale[:, None, None])

    def extend(self, n: int) -> "Meshes":
        """Repeat each mesh n times (PyTorch3D ``extend`` at eval.py:284)."""
        tex = self.textures.extend(n) if self.textures is not None else None
        return Meshes(
            verts=jnp.repeat(self.verts, n, axis=0),
            faces=jnp.repeat(self.faces, n, axis=0),
            num_verts=jnp.repeat(self.num_verts, n, axis=0),
            num_faces=jnp.repeat(self.num_faces, n, axis=0),
            textures=tex,
        )

    def with_textures(self, textures) -> "Meshes":
        return self.replace(textures=textures)

    # ---- derived geometry ------------------------------------------------
    def face_verts(self) -> jnp.ndarray:
        """(N, F, 3, 3) world coordinates of each face's corners (padded
        faces read vertex 0)."""
        safe_faces = jnp.maximum(self.faces, 0)

        def _one(v, f):
            return v[f]

        return jax.vmap(_one)(self.verts, safe_faces)

    def face_normals(self, normalize: bool = True) -> jnp.ndarray:
        """(N, F, 3) face normals (area-weighted if normalize=False)."""
        fv = self.face_verts()
        n = jnp.cross(fv[..., 1, :] - fv[..., 0, :], fv[..., 2, :] - fv[..., 0, :])
        if normalize:
            n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-10)
        mask = self.faces_mask()[..., None].astype(n.dtype)
        return n * mask

    def verts_normals(self) -> jnp.ndarray:
        """(N, V, 3) unit vertex normals: area-weighted average of incident
        face normals (PyTorch3D ``verts_normals_padded`` semantics, consumed
        by phong shading)."""
        fn = self.face_normals(normalize=False)  # area-weighted
        mask = self.faces_mask()
        v_count = self.max_verts

        def _one(faces_n, fn_n, mask_n):
            # Padding faces scatter to a dummy slot v_count.
            idx = jnp.where(mask_n[:, None], faces_n, v_count)
            acc = jnp.zeros((v_count + 1, 3), fn_n.dtype)
            for corner in range(3):
                acc = acc.at[idx[:, corner]].add(fn_n)
            return acc[:v_count]

        vn = jax.vmap(_one)(jnp.maximum(self.faces, 0), fn, mask)
        return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-10)

    def sample_textures(self, fragments) -> jnp.ndarray:
        """Per-fragment texel colors (N, H, W, K, C) from the attached
        textures — PyTorch3D ``meshes.sample_textures(fragments)``
        (`/root/reference/randomras/random_rasterizer.py:99`)."""
        if self.textures is None:
            raise ValueError("Meshes has no textures attached.")
        return self.textures.sample(
            self.faces, fragments.pix_to_face, fragments.bary_coords
        )

    def sample_textures_cm(self, pfrag) -> jnp.ndarray:
        """Channel-major texel colors (C, N, H, W, K) from PlanarFragments —
        the hot-path variant."""
        if self.textures is None:
            raise ValueError("Meshes has no textures attached.")
        return self.textures.sample_cm(
            self.faces, pfrag.pix_to_face, pfrag.w0, pfrag.w1, pfrag.w2
        )

    def edges(self) -> jnp.ndarray:
        """(N, 3F, 2) all face edges (with duplicates; padded edges are -1)."""
        f = self.faces
        e01 = jnp.stack([f[..., 0], f[..., 1]], axis=-1)
        e12 = jnp.stack([f[..., 1], f[..., 2]], axis=-1)
        e20 = jnp.stack([f[..., 2], f[..., 0]], axis=-1)
        return jnp.concatenate([e01, e12, e20], axis=1)


def join_meshes_as_batch(meshes_list) -> Meshes:
    """Concatenate same-padding Meshes along the batch dim."""
    return Meshes(
        verts=jnp.concatenate([m.verts for m in meshes_list], axis=0),
        faces=jnp.concatenate([m.faces for m in meshes_list], axis=0),
        num_verts=jnp.concatenate([m.num_verts for m in meshes_list], axis=0),
        num_faces=jnp.concatenate([m.num_faces for m in meshes_list], axis=0),
        textures=meshes_list[0].textures,
    )
