"""Mesh regularization losses and point-cloud metrics.

Re-implements the PyTorch3D loss surface the reference imports
(`/root/reference/experiments/eval.py:26-31`): ``mesh_laplacian_smoothing``
(the only one exercised, at eval.py:455), ``mesh_edge_loss``,
``mesh_normal_consistency``, ``chamfer_distance`` and the ``knn_points``
primitive behind it.  All are jit-compatible with static mesh topology;
chamfer/knn use dense pairwise distances (MXU-friendly batched matmuls
rather than a spatial-index kernel — the right TPU trade at these scales).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "mesh_laplacian_smoothing", "vertex_feature_laplacian",
    "mesh_edge_loss", "mesh_normal_consistency", "chamfer_distance",
    "knn_points",
]


def vertex_feature_laplacian(meshes, features: jnp.ndarray) -> jnp.ndarray:
    """Uniform-Laplacian smoothness of an arbitrary per-vertex field —
    mean_v || mean_{u in N(v)} f_u - f_v || over the mesh (batch 0) edge
    graph.  Used as an optional texture regularizer in the scene-parameter
    loop (per-vertex colors live on the same graph as positions; the
    reference regularizes only geometry, `eval.py:455`).

    features: (V, C) or (1, V, C); gradients flow through ``features``
    only (topology weights are constants).
    """
    if features.ndim == 3:
        features = features[0]
    faces = jnp.maximum(meshes.faces[0], 0)
    fmask = meshes.faces_mask()[0].astype(features.dtype)
    v_count = features.shape[0]
    src = jnp.concatenate([faces[:, 0], faces[:, 1], faces[:, 1],
                           faces[:, 2], faces[:, 2], faces[:, 0]])
    dst = jnp.concatenate([faces[:, 1], faces[:, 0], faces[:, 2],
                           faces[:, 1], faces[:, 0], faces[:, 2]])
    w = jnp.tile(fmask, 6)
    acc = jax.ops.segment_sum(w[:, None] * features[dst], src,
                              num_segments=v_count)
    deg = jax.ops.segment_sum(w, src, num_segments=v_count)
    lap = acc / jnp.maximum(deg, 1.0)[:, None] - features
    # Guarded norm: sqrt has a 0/0 NaN gradient at exactly-zero residuals,
    # and a CONSTANT field (the loop's white texture init) hits it at every
    # vertex — the NaN then poisons the whole parameter gradient, the
    # optimizer's isfinite guard zeroes it, and the texture never leaves
    # its init.  Double-where gives the exact subgradient 0 at lap == 0.
    sq = jnp.sum(lap * lap, axis=-1)
    pos = sq > 0.0
    norm = jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)
    valid = (deg > 0).astype(norm.dtype)
    return jnp.sum(norm * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def mesh_laplacian_smoothing(meshes, method: str = "uniform") -> jnp.ndarray:
    """Laplacian smoothing with PyTorch3D's three weighting ``method``s.

    - ``uniform``: mean_v || mean_{u in N(v)} u - v || — the variant the
      reference exercises as the deform regularizer
      (`/root/reference/experiments/eval.py:455`).
    - ``cot``: cotangent-weighted neighbor mean, || (L x)_v / rowsum_v - x_v ||.
    - ``cotcurv``: discrete mean-curvature magnitude,
      || (L x - rowsum * x)_v || * 0.25 / A_v with A_v the summed incident
      face area.

    Laplacian weights are built under ``stop_gradient`` (PyTorch3D computes
    them inside ``torch.no_grad()``), so gradients flow only through the
    smoothed positions.
    """
    if method not in ("uniform", "cot", "cotcurv"):
        raise NotImplementedError(f"unknown Laplacian method {method!r}")
    if method in ("cot", "cotcurv"):
        return _cot_laplacian_smoothing(meshes, method)
    verts = meshes.verts                    # (N, V, 3)
    faces = jnp.maximum(meshes.faces, 0)    # (N, F, 3)
    fmask = meshes.faces_mask()             # (N, F)
    v_count = verts.shape[1]

    def _one(verts_n, faces_n, fmask_n, nv):
        # Each face contributes its 3 undirected edges in both directions.
        src = jnp.concatenate([faces_n[:, 0], faces_n[:, 1], faces_n[:, 1],
                               faces_n[:, 2], faces_n[:, 2], faces_n[:, 0]])
        dst = jnp.concatenate([faces_n[:, 1], faces_n[:, 0], faces_n[:, 2],
                               faces_n[:, 1], faces_n[:, 0], faces_n[:, 2]])
        w = jnp.tile(fmask_n.astype(verts_n.dtype), 6)
        # Each undirected edge appears in exactly 2 faces of a closed mesh;
        # weight 0.5 halves the double count (any residual multiplicity
        # cancels in the neighbor *mean*).
        acc = jax.ops.segment_sum(w[:, None] * verts_n[dst], src,
                                  num_segments=v_count)
        deg = jax.ops.segment_sum(w, src, num_segments=v_count)
        mean_nb = acc / jnp.maximum(deg, 1.0)[:, None]
        lap = mean_nb - verts_n
        norm = jnp.linalg.norm(lap, axis=-1)
        valid = (deg > 0).astype(norm.dtype)
        return jnp.sum(norm * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    per_mesh = jax.vmap(_one)(verts, faces, fmask, meshes.num_verts)
    return jnp.mean(per_mesh)


def _cot_laplacian_smoothing(meshes, method: str) -> jnp.ndarray:
    """Cotangent Laplacian smoothing (PyTorch3D ``method="cot"/"cotcurv"``).

    Per face with corner vertices (v0, v1, v2) and opposite edge lengths
    (a, b, c), the corner cotangents are cot_0 = (b^2+c^2-a^2)/(4*area)
    etc.; edge (v1, v2) receives weight cot_0 / 4 from each incident face
    (symmetrized), matching PyTorch3D's ``cot_laplacian``.
    """
    verts = meshes.verts                    # (N, V, 3)
    faces = jnp.maximum(meshes.faces, 0)    # (N, F, 3)
    fmask = meshes.faces_mask()             # (N, F)
    v_count = verts.shape[1]

    def _one(verts_n, faces_n, fmask_n):
        x = jax.lax.stop_gradient(verts_n)
        v0, v1, v2 = (x[faces_n[:, i]] for i in range(3))
        a = jnp.linalg.norm(v1 - v2, axis=-1)   # opposite v0
        b = jnp.linalg.norm(v0 - v2, axis=-1)   # opposite v1
        c = jnp.linalg.norm(v0 - v1, axis=-1)   # opposite v2
        s = 0.5 * (a + b + c)
        area = jnp.sqrt(
            jnp.maximum(s * (s - a) * (s - b) * (s - c), 1e-12))
        a2, b2, c2 = a * a, b * b, c * c
        # Corner cotangents / 4 (the 1/4 folds PyTorch3D's `cot /= 4.0`).
        w = fmask_n.astype(x.dtype)
        cot0 = (b2 + c2 - a2) / (4.0 * area) * w
        cot1 = (a2 + c2 - b2) / (4.0 * area) * w
        cot2 = (a2 + b2 - c2) / (4.0 * area) * w
        # Edge (i, j) opposite each corner, both directions (symmetrized L).
        src = jnp.concatenate([faces_n[:, 1], faces_n[:, 2],
                               faces_n[:, 2], faces_n[:, 0],
                               faces_n[:, 0], faces_n[:, 1]])
        dst = jnp.concatenate([faces_n[:, 2], faces_n[:, 1],
                               faces_n[:, 0], faces_n[:, 2],
                               faces_n[:, 1], faces_n[:, 0]])
        wgt = jnp.concatenate([cot0, cot0, cot1, cot1, cot2, cot2])
        # L x (off-diagonal only, like the sparse matrix) and its row sums —
        # gradients flow through verts_n here, weights are stopped above.
        lx = jax.ops.segment_sum(wgt[:, None] * verts_n[dst], src,
                                 num_segments=v_count)
        rowsum = jax.ops.segment_sum(wgt, src, num_segments=v_count)
        if method == "cot":
            # norm_w = 1/rowsum where rowsum > 0 (else kept as-is).
            norm_w = jnp.where(rowsum > 0, 1.0 / jnp.maximum(rowsum, 1e-30),
                               rowsum)
            lap = lx * norm_w[:, None] - verts_n
        else:
            # Summed incident face area per vertex, inverted where > 0.
            fidx = faces_n.reshape(-1)
            aval = jnp.repeat(area * w, 3)
            varea = jax.ops.segment_sum(aval, fidx, num_segments=v_count)
            inv_area = jnp.where(varea > 0,
                                 1.0 / jnp.maximum(varea, 1e-30), 0.0)
            lap = (lx - rowsum[:, None] * verts_n) * (
                0.25 * inv_area)[:, None]
        norm = jnp.linalg.norm(lap, axis=-1)
        valid = (rowsum != 0).astype(norm.dtype)
        return jnp.sum(norm * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    per_mesh = jax.vmap(_one)(verts, faces, fmask)
    return jnp.mean(per_mesh)


def mesh_edge_loss(meshes, target_length: float = 0.0) -> jnp.ndarray:
    """Mean squared deviation of edge lengths from ``target_length``
    (PyTorch3D ``mesh_edge_loss``)."""
    verts = meshes.verts
    faces = jnp.maximum(meshes.faces, 0)
    fmask = meshes.faces_mask().astype(verts.dtype)

    def _one(verts_n, faces_n, fmask_n):
        v0, v1, v2 = (verts_n[faces_n[:, i]] for i in range(3))
        lengths = jnp.stack([
            jnp.linalg.norm(v0 - v1, axis=-1),
            jnp.linalg.norm(v1 - v2, axis=-1),
            jnp.linalg.norm(v2 - v0, axis=-1),
        ])  # (3, F); each undirected edge counted twice on closed meshes —
        # a constant factor absorbed by the mean.
        sq = (lengths - target_length) ** 2 * fmask_n[None]
        return jnp.sum(sq) / jnp.maximum(3.0 * jnp.sum(fmask_n), 1.0)

    return jnp.mean(jax.vmap(_one)(verts, faces, fmask))


def mesh_normal_consistency(meshes) -> jnp.ndarray:
    """Mean (1 - cos) between normals of faces sharing an edge
    (PyTorch3D ``mesh_normal_consistency``), computed jit-compatibly by
    sorting canonical edge keys and pairing equal neighbors."""
    verts = meshes.verts
    faces = jnp.maximum(meshes.faces, 0)
    fmask = meshes.faces_mask()
    v_count = verts.shape[1]

    def _one(verts_n, faces_n, fmask_n):
        normals = jnp.cross(
            verts_n[faces_n[:, 1]] - verts_n[faces_n[:, 0]],
            verts_n[faces_n[:, 2]] - verts_n[faces_n[:, 0]],
        )
        normals = normals / jnp.maximum(
            jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
        f = faces_n.shape[0]
        e = jnp.stack([
            jnp.stack([faces_n[:, 0], faces_n[:, 1]], -1),
            jnp.stack([faces_n[:, 1], faces_n[:, 2]], -1),
            jnp.stack([faces_n[:, 2], faces_n[:, 0]], -1),
        ], 0).reshape(-1, 2)                                    # (3F, 2)
        lo = jnp.minimum(e[:, 0], e[:, 1])
        hi = jnp.maximum(e[:, 0], e[:, 1])
        face_of_edge = jnp.tile(jnp.arange(f), 3)
        valid = jnp.tile(fmask_n, 3)
        big = jnp.int32(jnp.iinfo(jnp.int32).max)
        lo = jnp.where(valid, lo, big)
        hi = jnp.where(valid, hi, big)
        order = jnp.lexsort((hi, lo))
        lo_s, hi_s = lo[order], hi[order]
        face_s = face_of_edge[order]
        pair = (lo_s[1:] == lo_s[:-1]) & (hi_s[1:] == hi_s[:-1]) & (
            lo_s[1:] != big)
        n1 = normals[face_s[:-1]]
        n2 = normals[face_s[1:]]
        cos = jnp.sum(n1 * n2, axis=-1)
        term = (1.0 - cos) * pair.astype(cos.dtype)
        return jnp.sum(term) / jnp.maximum(jnp.sum(pair), 1.0)

    return jnp.mean(jax.vmap(_one)(verts, faces, fmask))


def _pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(P1, D) x (P2, D) -> (P1, P2) squared distances via a single matmul
    (MXU path)."""
    xx = jnp.sum(x * x, axis=-1, keepdims=True)
    yy = jnp.sum(y * y, axis=-1, keepdims=True)
    # HIGHEST: the MXU's default bf16 pass would round coordinates (~2e-3
    # relative), enough to flip nearest-neighbor selections between close
    # points; exact-f32 distances keep knn/chamfer reference-faithful.
    xy = jnp.matmul(x, y.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(xx - 2.0 * xy + yy.T, 0.0)


def knn_points(p1: jnp.ndarray, p2: jnp.ndarray, K: int = 1):
    """K nearest neighbors of each p1 point in p2.

    p1: (N, P1, D); p2: (N, P2, D).  Returns (dists (N, P1, K) squared,
    idx (N, P1, K)) — the PyTorch3D ``knn_points`` surface
    (imported by the reference's chamfer at eval.py:26).
    """
    def _one(a, b):
        d = _pairwise_sqdist(a, b)
        neg, idx = jax.lax.top_k(-d, K)
        return -neg, idx

    return jax.vmap(_one)(p1, p2)


def chamfer_distance(x: jnp.ndarray, y: jnp.ndarray):
    """Symmetric squared chamfer distance between point clouds
    (N, P1, 3) / (N, P2, 3).  Returns (loss, None) like PyTorch3D."""
    dx, _ = knn_points(x, y, K=1)
    dy, _ = knn_points(y, x, K=1)
    loss = jnp.mean(dx) + jnp.mean(dy)
    return loss, None
