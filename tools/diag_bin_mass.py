"""Measure the per-pixel softmax mass the binned M-slot selection captures
at config-5 density: exact fragment weights from the staged strip oracle
(K high enough to be untruncated), membership from the fused binned ids.

    JAX_PLATFORMS=cpu python tools/diag_bin_mass.py
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
    ap.add_argument("--k-exact", type=int, default=800)
    ap.add_argument("--level", type=int, default=6)
    ap.add_argument("--rows", type=int, default=4)
    args = ap.parse_args()

    import pertrenderer_tpu as pt
    from pertrenderer_tpu.ops import fused_render as fr
    from pertrenderer_tpu.ops.rasterize import rasterize_planar_rows

    imsize = args.image
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
        image_size=imsize, blur_radius=blur, faces_per_pixel=150,
        max_faces_per_bin=50000, perspective_correct=False)
    materials = pt.Materials.create()
    sr = pt.SoftRast.create(sigma=sigma)
    sa = pt.SoftAgg.create(gamma=gamma)
    bp = pt.BlendParams(sigma=sigma, gamma=gamma,
                        background_color=(0.0, 0.0, 0.0))
    cfg = fr._plan(mesh, cameras, lights, materials, sr, sa, settings,
                   "phong")
    assert cfg is not None and cfg.binned

    verts_ndc = cameras.transform_points_ndc(mesh.verts)
    fv_ndc = jax.vmap(fr._gather_rows)(verts_ndc,
                                       jnp.maximum(mesh.faces, 0))
    f = mesh.max_faces
    face_ids = jnp.arange(f, dtype=jnp.int32)
    validf = ((face_ids[None, :] < mesh.num_faces[:, None])
              & jnp.all(mesh.faces >= 0, axis=-1)).astype(jnp.float32)
    merged = jnp.concatenate([fv_ndc, fv_ndc], axis=-1)
    blur_j = jnp.asarray(blur, jnp.float32)
    _, ids, counts, _ = jax.jit(jax.vmap(
        partial(fr._binned_tables_sorted, cfg),
        in_axes=(0, 0, 0, None)))(merged, fv_ndc, validf, blur_j)
    ids = np.asarray(ids[0])
    fv0 = np.asarray(fv_ndc[0])
    vb0 = np.asarray(validf[0]) > 0
    lo0 = fv0[:, 1::3].min(1) - float(np.sqrt(blur))
    perm = np.argsort(np.where(vb0, lo0, np.inf), kind="stable")
    ids = np.where(ids >= 0, perm[np.clip(ids, 0, f - 1)], -1)

    import dataclasses
    settings_x = dataclasses.replace(settings,
                                     faces_per_pixel=args.k_exact)
    p = cfg.p_tile
    tiles_per_row = imsize // p

    znear, zfar = 1.0, 100.0
    for r0 in [imsize // 4, imsize // 2, 5 * imsize // 8]:
        frag = rasterize_planar_rows(mesh, cameras, settings_x, r0,
                                     args.rows)
        # PlanarFragments layout: channel-major
        p2f = np.asarray(frag.pix_to_face)[0]   # (H, W, K) or planar?
        dst = np.asarray(frag.dists)[0]
        zb = np.asarray(frag.zbuf)[0]
        if p2f.ndim == 2:   # planar (K, P)
            k_, pp = p2f.shape
            h_ = args.rows
            p2f = p2f.reshape(k_, h_, imsize).transpose(1, 2, 0)
            dst = dst.reshape(k_, h_, imsize).transpose(1, 2, 0)
            zb = zb.reshape(k_, h_, imsize).transpose(1, 2, 0)
        mass_stats = []
        for row in range(args.rows):
            for col in range(0, imsize, 7):
                pf = p2f[row, col]
                valid = pf >= 0
                if valid.sum() == 0:
                    continue
                prob = 1.0 / (1.0 + np.exp(dst[row, col] / sigma))
                z_inv = (zfar - zb[row, col]) / (zfar - znear)
                zm = gamma * np.log(np.maximum(prob, 1e-30)) + z_inv
                zm = np.where(valid, zm, -np.inf)
                zm -= zm.max()
                num = np.exp(zm / gamma)
                tid = (r0 + row) * tiles_per_row + col // p
                sel = set(ids[tid][ids[tid] >= 0].tolist())
                in_sel = np.array([(int(x) in sel) for x in pf])
                mass = float((num * in_sel * valid).sum()
                             / max((num * valid).sum(), 1e-30))
                nfrag = int(valid.sum())
                mass_stats.append((mass, nfrag))
        ms = np.array([m for m, _ in mass_stats])
        nf = np.array([n for _, n in mass_stats])
        print(f"strip {r0}: pixels={len(ms)} mass_in_sel "
              f"min={ms.min():.3f} p05={np.percentile(ms, 5):.3f} "
              f"median={np.median(ms):.3f}; frag count "
              f"median={np.median(nf):.0f} max={nf.max()}")


if __name__ == "__main__":
    main()
