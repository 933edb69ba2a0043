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
     z-buffer.  The merge is a stable variadic ``lax.sort`` carrying face ids
     alongside depth keys — a vectorized sorting network instead of XLA's
     scalar-loop gather.
  2. **Derive pass** (differentiable): gather the K winning faces per pixel
     with the MXU one-hot gather (ops/gather.py) and re-derive barycentrics,
     signed squared edge distance and depth from the projected vertices with
     plain jnp math.  Gradients w.r.t. vertex positions (and through them
     pose/camera/shape parameters) flow through this pass via XLA autodiff —
     replacing PyTorch3D's hand-written CUDA backward kernel with
     compiler-fused math.

Layout: TPU pads an array's minor dimension to 128 lanes, so small trailing
dims (3-vectors, 9 coords) are catastrophic.  The internal representation is
**planar / channel-major**: barycentrics live as three separate (N, H, W, K)
arrays (``PlanarFragments``), and per-pixel vertex coordinates are gathered
channel-major.  The public :class:`Fragments` (PyTorch3D layout, stacked
``bary_coords`` (N, H, W, K, 3)) is assembled only at the API boundary.

Fragment semantics match PyTorch3D: ``pix_to_face`` (N, H, W, K) face indices
sorted by ascending depth, -1 padding; ``zbuf`` view-space depth (-1 padding);
``dists`` signed *squared* Euclidean NDC x/y distance to the nearest face edge,
negative inside (-1 padding).  Coordinate frame: NDC +x left, +y up; image
pixel (0, 0) is top-left = NDC (+1, +1).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pertrenderer_tpu.ops.gather import take_rows, take_rows_cm

__all__ = ["Fragments", "PlanarFragments", "RasterizationSettings",
           "rasterize_meshes", "rasterize_planar", "rasterize_planar_rows"]

_INF = jnp.inf


@struct.dataclass
class Fragments:
    """PyTorch3D-layout fragments (public API)."""

    pix_to_face: jnp.ndarray   # (N, H, W, K) int32, per-mesh face id, -1 empty
    zbuf: jnp.ndarray          # (N, H, W, K) float32 view-space depth
    bary_coords: jnp.ndarray   # (N, H, W, K, 3) float32
    dists: jnp.ndarray         # (N, H, W, K) float32 signed squared distance


@struct.dataclass
class PlanarFragments:
    """Channel-major fragments: the internal hot-path representation."""

    pix_to_face: jnp.ndarray   # (N, H, W, K) int32
    zbuf: jnp.ndarray          # (N, H, W, K)
    dists: jnp.ndarray         # (N, H, W, K)
    w0: jnp.ndarray            # (N, H, W, K) barycentric coordinates,
    w1: jnp.ndarray            #   one array per corner (layout: K minor,
    w2: jnp.ndarray            #   no 3-wide trailing dim)

    def to_fragments(self) -> Fragments:
        bary = jnp.stack([self.w0, self.w1, self.w2], axis=-1)
        empty = (self.pix_to_face < 0)[..., None]
        return Fragments(
            pix_to_face=self.pix_to_face,
            zbuf=self.zbuf,
            bary_coords=jnp.where(empty, -1.0, bary),
            dists=self.dists,
        )


def as_planar(fragments) -> "PlanarFragments":
    """View public Fragments as planar (unstacks bary)."""
    if isinstance(fragments, PlanarFragments):
        return fragments
    b = fragments.bary_coords
    return PlanarFragments(
        pix_to_face=fragments.pix_to_face, zbuf=fragments.zbuf,
        dists=fragments.dists, w0=b[..., 0], w1=b[..., 1], w2=b[..., 2])


@dataclasses.dataclass(frozen=True)
class RasterizationSettings:
    """Static rasterizer configuration (hashable: safe as a jit static arg).

    Mirrors PyTorch3D's ``RasterizationSettings``
    (`/root/reference/experiments/eval.py:135-141`).  ``bin_size`` and
    ``max_faces_per_bin`` configure the binned kernel path; the chunked scan
    ignores them.
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
    # Binned fused-kernel capacity policy: 'warn' (default), 'error', or
    # 'allow' (skip the runtime overflow check).
    bin_overflow: str = "warn"

    def resolve_clip(self) -> bool:
        if self.clip_barycentric_coords is None:
            return self.blur_radius > 0.0
        return self.clip_barycentric_coords

    def resolve_binning(self, num_faces: int):
        """(bin_size, max_faces_per_bin) or (0, 0) for the flat path.

        Heuristic mirrors PyTorch3D: binning kicks in for large meshes;
        ``bin_size=0`` forces the flat path."""
        if self.bin_size == 0:
            return 0, 0
        bin_size = self.bin_size
        if bin_size is None:
            if num_faces <= 2048 or self.image_size < 128:
                return 0, 0
            bin_size = 32 if self.image_size <= 256 else 64
        if self.image_size % bin_size != 0 or self.image_size <= bin_size:
            return 0, 0
        mfpb = self.max_faces_per_bin or 4096
        return bin_size, min(mfpb, num_faces)


def _pixel_grid(h: int, w: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NDC coordinates of pixel centers; row 0 / col 0 = top-left = (+1, +1)."""
    ys = (h - 1.0 - 2.0 * jnp.arange(h, dtype=dtype)) / h
    xs = (w - 1.0 - 2.0 * jnp.arange(w, dtype=dtype)) / w
    return xs, ys


def _edge_dist_sq(px, py, ax, ay, bx, by):
    """Squared distance from pixel (px, py) to segment (a, b); broadcasting.

    The per-edge constants (deltas, reciprocal length) have the *face* shape
    only, so in the fused kernel's (F, 1) x (1, P) layout the per-pair work
    is FMAs and one clip — the division never touches the (F, P) block."""
    ex, ey = bx - ax, by - ay
    inv_denom = 1.0 / jnp.maximum(ex * ex + ey * ey, 1e-12)
    exs, eys = ex * inv_denom, ey * inv_denom
    dx, dy = px - ax, py - ay
    t = jnp.clip(dx * exs + dy * eys, 0.0, 1.0)
    rx = dx - t * ex
    ry = dy - t * ey
    return rx * rx + ry * ry


def _face_pixel_geometry(px, py, ax, ay, az, bx, by, bz, cx, cy, cz,
                         clip: bool, perspective_correct: bool):
    """Per pixel x face geometry on unpacked coordinate arrays (all inputs
    broadcastable).  Returns (w0, w1, w2, z, dist, inside, degenerate) where
    (w0, w1, w2) are the interpolation barycentrics (optionally clipped /
    perspective-corrected), z the interpolated view depth, dist the signed
    squared edge distance."""
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    degenerate = jnp.abs(area) < 1e-10
    inv_area = 1.0 / jnp.where(degenerate, 1.0, area)
    # Edge functions in precomputed-coefficient form: every term in
    # parentheses has the face shape only, so the per-(face, pixel) work is
    # two FMAs per barycentric.
    e0x = (cy - by) * inv_area
    e0y = (cx - bx) * inv_area
    w0 = e0y * py - e0x * px + (e0x * bx - e0y * by)
    e1x = (ay - cy) * inv_area
    e1y = (ax - cx) * inv_area
    w1 = e1y * py - e1x * px + (e1x * cx - e1y * cy)
    w2 = 1.0 - w0 - w1
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & ~degenerate

    d0 = _edge_dist_sq(px, py, ax, ay, bx, by)
    d1 = _edge_dist_sq(px, py, bx, by, cx, cy)
    d2 = _edge_dist_sq(px, py, cx, cy, ax, ay)
    min_d = jnp.minimum(d0, jnp.minimum(d1, d2))
    dist = jnp.where(inside, -min_d, min_d)

    if perspective_correct:
        s0 = w0 / jnp.maximum(az, 1e-8)
        s1 = w1 / jnp.maximum(bz, 1e-8)
        s2 = w2 / jnp.maximum(cz, 1e-8)
        denom = jnp.maximum(s0 + s1 + s2, 1e-12)
        w0, w1, w2 = s0 / denom, s1 / denom, s2 / denom
    if clip:
        c0 = jnp.maximum(w0, 0.0)
        c1 = jnp.maximum(w1, 0.0)
        c2 = jnp.maximum(w2, 0.0)
        denom = jnp.maximum(c0 + c1 + c2, 1e-12)
        w0, w1, w2 = c0 / denom, c1 / denom, c2 / denom
    z = w0 * az + w1 * bz + w2 * cz
    return w0, w1, w2, z, dist, inside, degenerate


def _face_validity(verts_ndc, faces, num_faces, cull_backfaces):
    """(fv (F, 3, 3), valid (F,)) face table + validity for one mesh."""
    fcount = faces.shape[0]
    safe_faces = jnp.maximum(faces, 0)
    fv = take_rows(verts_ndc, safe_faces)           # (F, 3, 3)
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
    return fv, valid


def _select_topk_core(px, py, fv, face_ids, valid, blur_radius, k,
                      faces_per_chunk, clip, perspective_correct):
    """Chunked top-K selection over an arbitrary pixel grid / face list.

    px, py: broadcastable pixel NDC coords with a trailing singleton face
    dim; fv: (F, 3, 3); face_ids: (F,) global ids (emitted into the output);
    valid: (F,).  Returns idx with the pixel shape + (K,), -1 padded,
    ascending z.
    """
    fcount = fv.shape[0]
    c = min(faces_per_chunk, fcount)
    n_chunks = -(-fcount // c)
    pad = n_chunks * c - fcount
    if pad:
        fv = jnp.concatenate([fv, jnp.zeros((pad, 3, 3), fv.dtype)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)
        face_ids = jnp.concatenate(
            [face_ids, jnp.full((pad,), -1, jnp.int32)], axis=0)
    fv_chunks = fv.reshape(n_chunks, c, 3, 3)
    valid_chunks = valid.reshape(n_chunks, c)
    id_chunks = face_ids.reshape(n_chunks, c)
    pix_shape = jnp.broadcast_shapes(px.shape[:-1], py.shape[:-1])

    def chunk_step(carry, chunk):
        z_top, idx_top = carry                       # pix_shape + (K,)
        fv_c, valid_c, ids_c = chunk
        coords = [fv_c[..., i, j] for i in range(3) for j in range(3)]
        bshape = (1,) * len(pix_shape) + (c,)
        coords = [x.reshape(bshape) for x in coords]
        _, _, _, z, dist, inside, degen = _face_pixel_geometry(
            px, py, *coords, clip, perspective_correct
        )                                            # pix_shape + (C,)
        candidate = (
            (inside | (dist <= blur_radius))
            & ~degen
            & valid_c.reshape(bshape)
            & (z > 0)
        )
        z_cand = jnp.where(candidate, z, _INF)
        cand_ids = jnp.broadcast_to(ids_c.reshape(bshape), z_cand.shape)
        z_all = jnp.concatenate([z_top, z_cand], axis=-1)      # (..., K+C)
        idx_all = jnp.concatenate([idx_top, cand_ids], axis=-1)
        # Stable variadic sort carries the face ids alongside the depth keys.
        z_sorted, idx_sorted = jax.lax.sort(
            (z_all, idx_all), dimension=-1, num_keys=1)
        z_top = jax.lax.slice_in_dim(z_sorted, 0, k, axis=-1)
        idx_top = jax.lax.slice_in_dim(idx_sorted, 0, k, axis=-1)
        return (z_top, idx_top), None

    z0 = jnp.full(pix_shape + (k,), _INF)
    i0 = jnp.full(pix_shape + (k,), -1, jnp.int32)
    if n_chunks == 1:
        (z_top, idx_top), _ = chunk_step(
            (z0, i0), (fv_chunks[0], valid_chunks[0], id_chunks[0]))
    else:
        (z_top, idx_top), _ = jax.lax.scan(
            chunk_step, (z0, i0), (fv_chunks, valid_chunks, id_chunks))
    idx_top = jnp.where(jnp.isfinite(z_top), idx_top, -1)
    return idx_top


def _select_topk(verts_ndc, faces, num_faces, image_size, blur_radius, k,
                 faces_per_chunk, clip, perspective_correct, cull_backfaces):
    """Flat (un-binned) top-K face selection for one mesh.

    verts_ndc: (V, 3); faces: (F, 3) int32 (padding -1).
    Returns idx (H, W, K) int32 with -1 padding, sorted ascending-z.
    """
    h = w = image_size
    fv, valid = _face_validity(verts_ndc, faces, num_faces, cull_backfaces)
    face_ids = jnp.arange(fv.shape[0], dtype=jnp.int32)
    xs, ys = _pixel_grid(h, w)
    px = xs[None, :, None]                          # (1, W, 1)
    py = ys[:, None, None]                          # (H, 1, 1)
    return _select_topk_core(px, py, fv, face_ids, valid, blur_radius, k,
                             faces_per_chunk, clip, perspective_correct)


def _select_topk_binned(verts_ndc, faces, num_faces, image_size, blur_radius,
                        k, bin_size, max_faces_per_bin, faces_per_chunk,
                        clip, perspective_correct, cull_backfaces):
    """Binned top-K selection: the coarse-to-fine strategy of PyTorch3D's
    native kernel (the ``bin_size`` / ``max_faces_per_bin`` knobs at
    `/root/reference/experiments/eval.py:139`), re-designed for XLA.

    1. per-face screen bbox (expanded by the blur band) -> (n_bins, F)
       overlap matrix (pure elementwise compare);
    2. per bin, the first ``max_faces_per_bin`` overlapping face ids via
       top_k on masked ids (static shape);
    3. the core chunked selector runs vmapped over bins on bin-local pixel
       grids and bin-local face tables — work per pixel drops from F to the
       bin's face count;
    4. bins tile the image, so reassembly is a static reshape.
    """
    h = w = image_size
    assert h % bin_size == 0
    nb = h // bin_size
    m = min(max_faces_per_bin, faces.shape[0])

    fv, valid = _face_validity(verts_ndc, faces, num_faces, cull_backfaces)
    band = jnp.sqrt(jnp.maximum(blur_radius, 0.0))
    x_min = jnp.min(fv[..., 0], axis=-1) - band     # (F,)
    x_max = jnp.max(fv[..., 0], axis=-1) + band
    y_min = jnp.min(fv[..., 1], axis=-1) - band
    y_max = jnp.max(fv[..., 1], axis=-1) + band

    # Bin NDC extents.  Column c has x = (W - 1 - 2c) / W (x decreases with
    # c); bin bx covers columns [bx*bs, (bx+1)*bs).
    cols = jnp.arange(nb) * bin_size
    bx_hi = (w - 1.0 - 2.0 * cols) / w              # x at first column
    bx_lo = (w - 1.0 - 2.0 * (cols + bin_size - 1)) / w
    rows = jnp.arange(nb) * bin_size
    by_hi = (h - 1.0 - 2.0 * rows) / h
    by_lo = (h - 1.0 - 2.0 * (rows + bin_size - 1)) / h

    # (nb_y, nb_x, F) overlap via interval intersection.
    ox = (x_min[None, :] <= bx_hi[:, None]) & (x_max[None, :] >= bx_lo[:, None])
    oy = (y_min[None, :] <= by_hi[:, None]) & (y_max[None, :] >= by_lo[:, None])
    overlap = oy[:, None, :] & ox[None, :, :] & valid[None, None, :]
    overlap = overlap.reshape(nb * nb, -1)

    # First M overlapping faces per bin, ascending id (top_k of -id).
    f_ids = jnp.arange(overlap.shape[1], dtype=jnp.int32)
    score = jnp.where(overlap, -f_ids, jnp.iinfo(jnp.int32).min)
    top_scores, _ = jax.lax.top_k(score, m)          # (n_bins, M)
    bin_ids = jnp.where(top_scores == jnp.iinfo(jnp.int32).min, -1,
                        -top_scores)
    bin_fv = take_rows(fv.reshape(-1, 9), bin_ids).reshape(
        nb * nb, m, 3, 3)                            # zeros where id == -1
    bin_valid = bin_ids >= 0

    xs, ys = _pixel_grid(h, w)
    xs_b = xs.reshape(nb, bin_size)                  # per bin-column x coords
    ys_b = ys.reshape(nb, bin_size)
    by_idx = jnp.repeat(jnp.arange(nb), nb)          # bin -> row block
    bx_idx = jnp.tile(jnp.arange(nb), nb)

    def one_bin(fv_b, ids_b, valid_b, by, bx):
        px = xs_b[bx][None, :, None]                 # (1, bs, 1)
        py = ys_b[by][:, None, None]                 # (bs, 1, 1)
        return _select_topk_core(px, py, fv_b, ids_b, valid_b, blur_radius,
                                 k, faces_per_chunk, clip,
                                 perspective_correct)

    idx_bins = jax.vmap(one_bin)(bin_fv, bin_ids, bin_valid, by_idx, bx_idx)
    # (nb*nb, bs, bs, K) -> (H, W, K)
    idx = idx_bins.reshape(nb, nb, bin_size, bin_size, k)
    return idx.transpose(0, 2, 1, 3, 4).reshape(h, w, k)


def _derive_planar(verts_ndc, faces, idx, image_size, clip,
                   perspective_correct, rows=None):
    """Differentiable fragment attributes for the selected faces (one mesh),
    channel-major.  idx: (H, W, K) face indices (-1 empty).  Returns
    (zbuf, dists, w0, w1, w2) with PyTorch3D's -1 padding on empty slots
    (w's padding handled at Fragments assembly).  ``rows=(start, count)``
    restricts to an image-row strip (idx then has count rows)."""
    h = w = image_size
    # Per-face vertex table (F, 9), then ONE per-pixel channel-major gather:
    # fv9 (9, H, W, K) — each coordinate is its own lane-aligned array.
    face_verts = take_rows(verts_ndc, jnp.maximum(faces, 0))   # (F, 3, 3)
    fv9 = take_rows_cm(face_verts.reshape(faces.shape[0], 9), idx)

    xs, ys = _pixel_grid(h, w)
    if rows is not None:
        ys = jax.lax.slice_in_dim(ys, rows[0], rows[0] + rows[1])
    px = xs[None, :, None]
    py = ys[:, None, None]
    w0, w1, w2, z, dist, _, _ = _face_pixel_geometry(
        px, py, *[fv9[i] for i in range(9)], clip, perspective_correct)
    empty = idx < 0
    zbuf = jnp.where(empty, -1.0, z)
    dists = jnp.where(empty, -1.0, dist)
    return zbuf, dists, w0, w1, w2


@partial(jax.jit, static_argnames=("settings",))
def rasterize_planar(meshes, cameras, settings: RasterizationSettings,
                     blur_radius=None) -> PlanarFragments:
    """Rasterize a batch of meshes with per-batch cameras (channel-major
    fragments — the hot-path API).

    ``blur_radius`` optionally overrides ``settings.blur_radius`` as a
    *traced* scalar (annealing changes it without recompiling; it only
    enters data comparisons).  Structural choices (clip resolution,
    binning) still come from the static settings value.
    """
    blur = settings.blur_radius if blur_radius is None else blur_radius
    verts_ndc = cameras.transform_points_ndc(meshes.verts)   # (N, V, 3)
    clip = settings.resolve_clip()
    bin_size, mfpb = settings.resolve_binning(meshes.faces.shape[1])

    def _one(verts_ndc_n, faces_n, num_faces_n):
        if bin_size:
            select = lambda v: _select_topk_binned(
                v, faces_n, num_faces_n, settings.image_size,
                blur, settings.faces_per_pixel, bin_size,
                mfpb, settings.faces_per_chunk, clip,
                settings.perspective_correct, settings.cull_backfaces)
        else:
            select = lambda v: _select_topk(
                v, faces_n, num_faces_n, settings.image_size,
                blur, settings.faces_per_pixel,
                settings.faces_per_chunk, clip,
                settings.perspective_correct, settings.cull_backfaces)
        idx = jax.lax.stop_gradient(
            select(jax.lax.stop_gradient(verts_ndc_n)))
        zbuf, dists, w0, w1, w2 = _derive_planar(
            verts_ndc_n, faces_n, idx, settings.image_size, clip,
            settings.perspective_correct,
        )
        return idx, zbuf, dists, w0, w1, w2

    idx, zbuf, dists, w0, w1, w2 = jax.vmap(_one)(
        verts_ndc, meshes.faces, meshes.num_faces
    )
    return PlanarFragments(pix_to_face=idx, zbuf=zbuf, dists=dists,
                           w0=w0, w1=w1, w2=w2)


@partial(jax.jit, static_argnames=("settings", "row_start", "row_count"))
def rasterize_planar_rows(meshes, cameras, settings: RasterizationSettings,
                          row_start: int, row_count: int,
                          blur_radius=None) -> PlanarFragments:
    """Staged rasterization of the image-row strip
    [row_start, row_start + row_count) at full-image NDC coordinates.

    Memory-bounded oracle path: at scales where the full-image staged pass
    cannot fit (81,920 faces at 512², K=150 — BASELINE config 5, the
    ``max_faces_per_bin`` regime of `/root/reference/experiments/eval.py:139`),
    work and residency scale with the strip's pixel count, so the fused
    binned kernel's output can be parity-checked strip-by-strip at full
    scale.  Always uses flat chunked selection (every face tested per
    pixel) — an independent code path from both the fused kernel and the
    binned XLA selector."""
    blur = settings.blur_radius if blur_radius is None else blur_radius
    verts_ndc = cameras.transform_points_ndc(meshes.verts)   # (N, V, 3)
    clip = settings.resolve_clip()
    h = w = settings.image_size
    xs, ys_full = _pixel_grid(h, w)
    ys = jax.lax.slice_in_dim(ys_full, row_start, row_start + row_count)

    def _one(verts_ndc_n, faces_n, num_faces_n):
        def select(v):
            fv, valid = _face_validity(v, faces_n, num_faces_n,
                                       settings.cull_backfaces)
            face_ids = jnp.arange(fv.shape[0], dtype=jnp.int32)
            return _select_topk_core(
                xs[None, :, None], ys[:, None, None], fv, face_ids, valid,
                blur, settings.faces_per_pixel, settings.faces_per_chunk,
                clip, settings.perspective_correct)
        idx = jax.lax.stop_gradient(
            select(jax.lax.stop_gradient(verts_ndc_n)))
        zbuf, dists, w0, w1, w2 = _derive_planar(
            verts_ndc_n, faces_n, idx, settings.image_size, clip,
            settings.perspective_correct, rows=(row_start, row_count))
        return idx, zbuf, dists, w0, w1, w2

    idx, zbuf, dists, w0, w1, w2 = jax.vmap(_one)(
        verts_ndc, meshes.faces, meshes.num_faces)
    return PlanarFragments(pix_to_face=idx, zbuf=zbuf, dists=dists,
                           w0=w0, w1=w1, w2=w2)


def rasterize_meshes(meshes, cameras, settings: RasterizationSettings,
                     blur_radius=None) -> Fragments:
    """Public PyTorch3D-layout rasterization (equivalent of ``MeshRasterizer``
    + the native ``rasterize_meshes`` kernel,
    `/root/reference/randomras/random_rasterizer.py:17`)."""
    return rasterize_planar(meshes, cameras, settings,
                            blur_radius=blur_radius).to_fragments()
