"""Diagnose binned-mode selection quality at BASELINE config-5 density.

Pure-XLA (CPU-runnable): builds the config-5 scene, runs the y-sorted
binned selection (_binned_tables_sorted), and checks — per pixel of a few
strips — whether each pixel's true front face (min-z among faces whose
un-inflated bbox covers the pixel) made it into its tile's M-slot list.
Also reports per-tile candidate/covering count distributions vs M.

    JAX_PLATFORMS=cpu python tools/diag_bin_selection.py
"""

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", type=int, default=512)
    ap.add_argument("--k", type=int, default=150)
    ap.add_argument("--level", type=int, default=6)
    args = ap.parse_args()

    import pertrenderer_tpu as pt
    from pertrenderer_tpu.ops import fused_render as fr

    imsize, k = args.image, args.k
    verts, faces = pt.make_icosphere(args.level)
    mesh = pt.Meshes.create(
        verts, faces,
        textures=pt.TexturesVertex(
            0.5 + 0.5 * jnp.abs(jnp.asarray(verts))[None]))
    mesh = mesh.scale_verts(3.0)
    r, t = pt.look_at_view_transform(dist=6.7, elev=30.0, azim=120.0)
    cameras = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
    lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
    sigma, gamma = 1e-3, 1e-2
    blur = float(np.log(1.0 / 1e-4 - 1.0) * sigma)
    settings = pt.RasterizationSettings(
        image_size=imsize, blur_radius=blur, faces_per_pixel=k,
        max_faces_per_bin=50000, perspective_correct=False)
    materials = pt.Materials.create()
    sr = pt.SoftRast.create(sigma=sigma)
    sa = pt.SoftAgg.create(gamma=gamma)
    bp = pt.BlendParams(sigma=sigma, gamma=gamma,
                        background_color=(0.0, 0.0, 0.0))
    cfg = fr._plan(mesh, cameras, lights, materials, sr, sa, settings,
                   "phong")
    assert cfg is not None and cfg.binned, cfg
    print(f"cfg: binned={cfg.binned} m={cfg.f_pad} p_tile={cfg.p_tile} "
          f"tiles={fr._n_tiles(cfg)}")

    verts_ndc = cameras.transform_points_ndc(mesh.verts)
    fv_ndc = jax.vmap(fr._gather_rows)(verts_ndc,
                                       jnp.maximum(mesh.faces, 0))
    f = mesh.max_faces
    face_ids = jnp.arange(f, dtype=jnp.int32)
    validf = ((face_ids[None, :] < mesh.num_faces[:, None])
              & jnp.all(mesh.faces >= 0, axis=-1)).astype(jnp.float32)
    merged = jnp.concatenate([fv_ndc, fv_ndc], axis=-1)  # content unused
    blur_j = jnp.asarray(blur, jnp.float32)

    tiles, ids, counts, max_range = jax.jit(jax.vmap(
        partial(fr._binned_tables_sorted, cfg),
        in_axes=(0, 0, 0, None)))(merged, fv_ndc, validf, blur_j)
    ids = np.asarray(ids[0])        # (nt, M) — indices into SORTED order
    counts = np.asarray(counts[0])  # (nt,)
    # Map sorted-order ids back to original face ids (perm as in
    # _binned_tables_sorted: argsort of blur-inflated bbox y-min).
    fv0 = np.asarray(fv_ndc[0])
    vb0 = np.asarray(validf[0]) > 0
    band0 = float(np.sqrt(blur))
    lo0 = fv0[:, 1::3].min(1) - band0
    perm = np.argsort(np.where(vb0, lo0, np.inf), kind="stable")
    ids = np.where(ids >= 0, perm[np.clip(ids, 0, f - 1)], -1)
    m = cfg.f_pad
    print(f"max_range={int(max_range[0])} (RANGE_MAX={fr._RANGE_MAX})")
    print(f"per-tile candidate counts: max={counts.max()} "
          f"p99={np.percentile(counts, 99):.0f} "
          f"median={np.median(counts):.0f}; tiles>{m}: "
          f"{(counts > m).sum()}/{counts.size}")

    # Ground truth per pixel: covering = un-inflated bbox contains pixel.
    fv = np.asarray(fv_ndc[0])      # (F, 9)
    xs, ys, zs = fv[:, 0::3], fv[:, 1::3], fv[:, 2::3]
    vb = np.asarray(validf[0]) > 0
    w = imsize
    band = float(np.sqrt(blur))
    xmin, xmax = xs.min(1), xs.max(1)
    ymin, ymax = ys.min(1), ys.max(1)
    zmin = np.where(vb, zs.min(1), np.inf)

    p = cfg.p_tile
    tiles_per_row = w // p if p < w else 1

    rng = np.random.default_rng(0)
    for r0 in [imsize // 4, imsize // 2, 5 * imsize // 8]:
        miss_front = 0
        miss_any = 0
        checked = 0
        worst = None
        for row in range(r0, r0 + 4):
            py = (imsize - 1.0 - 2.0 * row) / imsize
            cols = rng.choice(w, size=64, replace=False)
            for col in cols:
                px = (w - 1.0 - 2.0 * col) / w
                cover = (vb & (xmin <= px) & (xmax >= px)
                         & (ymin <= py) & (ymax >= py))
                if not cover.any():
                    continue
                checked += 1
                tid = row * tiles_per_row + col // p
                sel = set(ids[tid][ids[tid] >= 0].tolist())
                front = int(np.argmin(np.where(cover, zmin, np.inf)))
                if front not in sel:
                    miss_front += 1
                    if worst is None:
                        worst = (row, col, front, counts[tid])
                # nearest-K coverage: how many of the K nearest covering
                # faces are missing?
                cz = np.where(cover, zmin, np.inf)
                order = np.argsort(cz)[: min(k, int(cover.sum()))]
                missing = [int(i) for i in order if int(i) not in sel]
                if missing:
                    miss_any += 1
        print(f"strip {r0}: checked={checked} front-missing={miss_front} "
              f"anyK-missing={miss_any} worst={worst}")


if __name__ == "__main__":
    main()
