"""Differentiable mesh rasterization (XLA path).

TPU-native re-design of the native `rasterize_meshes` forward/backward kernels
the reference consumes from PyTorch3D (configured at
`/root/reference/experiments/eval.py:135-141,265-270`; fragment fields used at
`/root/reference/randomras/random_rasterizer.py:36,47,49`).

Design (TPU-first, not a kernel translation):

  1. **Select pass** (non-differentiable, integer output): scan over face
     chunks, evaluating per-pixel candidacy (inside-face OR within the
     ``blur_radius`` band of signed squared NDC edge distance) and the
     interpolated depth, maintaining a running per-pixel top-K nearest-first
     z-buffer.  Static shapes, `lax.scan` + `lax.top_k` — no data-dependent
     control flow, so XLA tiles it onto the VPU.
  2. **Derive pass** (differentiable): gather the K winning faces per pixel
     and re-derive barycentrics, signed squared edge distance and depth from
     the projected vertices with plain jnp math.  Gradients w.r.t. vertex
     positions (and through them pose/camera/shape parameters) flow through
     this pass via XLA autodiff — replacing PyTorch3D's hand-written CUDA
     backward kernel with compiler-fused math.

Fragment semantics match PyTorch3D: ``pix_to_face`` (N, H, W, K) face indices
sorted by ascending depth, -1 padding; ``zbuf`` view-space depth (-1 padding);
``dists`` signed *squared* Euclidean NDC x/y distance to the nearest face edge,
negative inside (-1 padding); ``bary_coords`` (N, H, W, K, 3) (-1 padding).
Coordinate frame: NDC +x left, +y up; image pixel (0, 0) is top-left = NDC
(+1, +1).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["Fragments", "RasterizationSettings", "rasterize_meshes"]

_INF = jnp.inf


@struct.dataclass
class Fragments:
    pix_to_face: jnp.ndarray   # (N, H, W, K) int32, per-mesh face id, -1 empty
    zbuf: jnp.ndarray          # (N, H, W, K) float32 view-space depth
    bary_coords: jnp.ndarray   # (N, H, W, K, 3) float32
    dists: jnp.ndarray         # (N, H, W, K) float32 signed squared distance


@dataclasses.dataclass(frozen=True)
class RasterizationSettings:
    """Static rasterizer configuration (hashable: safe as a jit static arg).

    Mirrors PyTorch3D's ``RasterizationSettings``
    (`/root/reference/experiments/eval.py:135-141`).  ``bin_size`` and
    ``max_faces_per_bin`` configure the binned Pallas kernel; the XLA path
    ignores them (it chunks over all faces).
    """

    image_size: int = 128
    blur_radius: float = 0.0
    faces_per_pixel: int = 1
    bin_size: Optional[int] = None
    max_faces_per_bin: Optional[int] = None
    perspective_correct: bool = False
    clip_barycentric_coords: Optional[bool] = None
    cull_backfaces: bool = False
    faces_per_chunk: int = 512

    def resolve_clip(self) -> bool:
        if self.clip_barycentric_coords is None:
            return self.blur_radius > 0.0
        return self.clip_barycentric_coords


def _pixel_grid(h: int, w: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NDC coordinates of pixel centers; row 0 / col 0 = top-left = (+1, +1)."""
    ys = (h - 1.0 - 2.0 * jnp.arange(h, dtype=dtype)) / h
    xs = (w - 1.0 - 2.0 * jnp.arange(w, dtype=dtype)) / w
    return xs, ys


def _edge_dist_sq(px, py, ax, ay, bx, by):
    """Squared distance from pixel (px, py) to segment (a, b).  All inputs
    broadcast; px/py have trailing singleton face dim."""
    ex, ey = bx - ax, by - ay
    dx, dy = px - ax, py - ay
    denom = ex * ex + ey * ey
    t = (dx * ex + dy * ey) / jnp.maximum(denom, 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    rx = dx - t * ex
    ry = dy - t * ey
    return rx * rx + ry * ry


def _face_pixel_geometry(px, py, fv, clip: bool, perspective_correct: bool):
    """Per pixel x face geometry.

    px, py: broadcastable pixel NDC coords with trailing face dim (..., 1).
    fv: (..., 3, 3) projected face verts [x_ndc, y_ndc, z_view].

    Returns (bary_used, z, dist, inside, degenerate) where bary_used are the
    (optionally clipped / perspective-corrected) barycentrics used for
    interpolation, z the interpolated depth, dist the signed squared edge
    distance.
    """
    ax, ay, az = fv[..., 0, 0], fv[..., 0, 1], fv[..., 0, 2]
    bx, by, bz = fv[..., 1, 0], fv[..., 1, 1], fv[..., 1, 2]
    cx, cy, cz = fv[..., 2, 0], fv[..., 2, 1], fv[..., 2, 2]

    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    degenerate = jnp.abs(area) < 1e-10
    inv_area = 1.0 / jnp.where(degenerate, 1.0, area)
    w0 = ((cx - bx) * (py - by) - (cy - by) * (px - bx)) * inv_area
    w1 = ((ax - cx) * (py - cy) - (ay - cy) * (px - cx)) * inv_area
    w2 = 1.0 - w0 - w1
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & ~degenerate

    d0 = _edge_dist_sq(px, py, ax, ay, bx, by)
    d1 = _edge_dist_sq(px, py, bx, by, cx, cy)
    d2 = _edge_dist_sq(px, py, cx, cy, ax, ay)
    min_d = jnp.minimum(d0, jnp.minimum(d1, d2))
    dist = jnp.where(inside, -min_d, min_d)

    bary = jnp.stack([w0, w1, w2], axis=-1)
    bary_used = bary
    if perspective_correct:
        z_corners = jnp.stack([az, bz, cz], axis=-1)
        wz = bary / jnp.maximum(z_corners, 1e-8)
        bary_used = wz / jnp.maximum(jnp.sum(wz, axis=-1, keepdims=True), 1e-12)
    if clip:
        clipped = jnp.maximum(bary_used, 0.0)
        bary_used = clipped / jnp.maximum(
            jnp.sum(clipped, axis=-1, keepdims=True), 1e-12
        )
    z = bary_used[..., 0] * az + bary_used[..., 1] * bz + bary_used[..., 2] * cz
    return bary_used, z, dist, inside, degenerate


def _select_topk(verts_ndc, faces, num_faces, image_size, blur_radius, k,
                 faces_per_chunk, clip, perspective_correct, cull_backfaces):
    """Non-differentiable top-K face selection for one mesh.

    verts_ndc: (V, 3); faces: (F, 3) int32 (padding -1).
    Returns (idx (H, W, K) int32 with -1 padding, sorted ascending-z).
    """
    h = w = image_size
    fcount = faces.shape[0]
    c = min(faces_per_chunk, fcount)
    n_chunks = -(-fcount // c)
    pad = n_chunks * c - fcount

    safe_faces = jnp.maximum(faces, 0)
    fv = verts_ndc[safe_faces]                      # (F, 3, 3)
    face_ids = jnp.arange(fcount, dtype=jnp.int32)
    valid = (face_ids < num_faces) & jnp.all(faces >= 0, axis=-1)
    if cull_backfaces:
        area = (
            (fv[:, 1, 0] - fv[:, 0, 0]) * (fv[:, 2, 1] - fv[:, 0, 1])
            - (fv[:, 1, 1] - fv[:, 0, 1]) * (fv[:, 2, 0] - fv[:, 0, 0])
        )
        valid = valid & (area > 0)
    # Cull faces entirely behind the camera.
    valid = valid & (jnp.max(fv[..., 2], axis=-1) > 0)

    if pad:
        fv = jnp.concatenate([fv, jnp.zeros((pad, 3, 3), fv.dtype)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)
    fv_chunks = fv.reshape(n_chunks, c, 3, 3)
    valid_chunks = valid.reshape(n_chunks, c)

    xs, ys = _pixel_grid(h, w)
    px = xs[None, :, None]                          # (1, W, 1)
    py = ys[:, None, None]                          # (H, 1, 1)

    def chunk_step(carry, chunk):
        z_top, idx_top = carry                       # (H, W, K)
        chunk_id, fv_c, valid_c = chunk
        _, z, dist, inside, degen = _face_pixel_geometry(
            px, py, fv_c[None, None], clip, perspective_correct
        )                                            # (H, W, C)
        candidate = (
            (inside | (dist <= blur_radius))
            & ~degen
            & valid_c[None, None]
            & (z > 0)
        )
        z_cand = jnp.where(candidate, z, _INF)
        z_all = jnp.concatenate([z_top, z_cand], axis=-1)      # (H, W, K+C)
        neg_top, pos = jax.lax.top_k(-z_all, k)
        z_top = -neg_top
        old_idx = jnp.take_along_axis(idx_top, jnp.minimum(pos, k - 1), axis=-1)
        new_idx = chunk_id * c + (pos - k)
        idx_top = jnp.where(pos < k, old_idx, new_idx).astype(jnp.int32)
        return (z_top, idx_top), None

    z0 = jnp.full((h, w, k), _INF)
    i0 = jnp.full((h, w, k), -1, jnp.int32)
    chunk_ids = jnp.arange(n_chunks, dtype=jnp.int32)
    (z_top, idx_top), _ = jax.lax.scan(
        chunk_step, (z0, i0), (chunk_ids, fv_chunks, valid_chunks)
    )
    idx_top = jnp.where(jnp.isfinite(z_top), idx_top, -1)
    return idx_top


def _derive_fragments(verts_ndc, faces, idx, image_size, clip,
                      perspective_correct):
    """Differentiable fragment attributes for the selected faces (one mesh).

    idx: (H, W, K) face indices (-1 empty).  Returns (zbuf, bary, dists) with
    PyTorch3D's -1 padding on empty slots.
    """
    h = w = image_size
    safe_idx = jnp.maximum(idx, 0)
    face_verts = verts_ndc[jnp.maximum(faces, 0)]   # (F, 3, 3)
    fv = face_verts[safe_idx]                        # (H, W, K, 3, 3)

    xs, ys = _pixel_grid(h, w)
    px = xs[None, :, None]
    py = ys[:, None, None]
    bary, z, dist, _, _ = _face_pixel_geometry(px, py, fv, clip,
                                               perspective_correct)
    empty = idx < 0
    zbuf = jnp.where(empty, -1.0, z)
    dists = jnp.where(empty, -1.0, dist)
    bary = jnp.where(empty[..., None], -1.0, bary)
    return zbuf, bary, dists


@partial(jax.jit, static_argnames=("settings",))
def rasterize_meshes(meshes, cameras, settings: RasterizationSettings) -> Fragments:
    """Rasterize a batch of meshes with per-batch cameras.

    Equivalent of PyTorch3D ``MeshRasterizer`` + the native
    ``rasterize_meshes`` kernel (`/root/reference/randomras/random_rasterizer.py:17`).
    """
    verts_ndc = cameras.transform_points_ndc(meshes.verts)   # (N, V, 3)
    clip = settings.resolve_clip()

    def _one(verts_ndc_n, faces_n, num_faces_n):
        idx = jax.lax.stop_gradient(
            _select_topk(
                jax.lax.stop_gradient(verts_ndc_n), faces_n, num_faces_n,
                settings.image_size, settings.blur_radius,
                settings.faces_per_pixel, settings.faces_per_chunk,
                clip, settings.perspective_correct, settings.cull_backfaces,
            )
        )
        zbuf, bary, dists = _derive_fragments(
            verts_ndc_n, faces_n, idx, settings.image_size, clip,
            settings.perspective_correct,
        )
        return idx, zbuf, bary, dists

    idx, zbuf, bary, dists = jax.vmap(_one)(
        verts_ndc, meshes.faces, meshes.num_faces
    )
    return Fragments(pix_to_face=idx, zbuf=zbuf, bary_coords=bary, dists=dists)
