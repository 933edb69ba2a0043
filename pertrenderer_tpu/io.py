"""Mesh I/O and bundled procedural assets.

Covers the loader surface the reference uses
(`/root/reference/experiments/eval.py:59,224-231,296,727-757`):
``load_obj`` (OBJ + MTL + texture images, optional per-face texture atlas),
``load_objs_as_meshes``, and the two bundled assets — the Rubik's cube and the
642-vertex icosphere.  The assets are *generated procedurally* here (the cube
from its 8-vertex/12-face topology + 6 painted UV strips, the sphere as a
3x-subdivided icosahedron), reproducing the reference's
``data/objs/rubiks/cube2.obj`` + ``cube_p.npz`` painting logic
(`eval.py:727-757`) and ``data/objs/sphere/sphere_642.obj`` without shipping
copied data files.  ``load_obj`` also reads the reference's files directly if
pointed at them.
"""

from __future__ import annotations

import os
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

from pertrenderer_tpu.structures import Meshes
from pertrenderer_tpu.textures import TexturesAtlas, TexturesUV, TexturesVertex

__all__ = [
    "load_obj", "load_objs_as_meshes", "save_obj",
    "load_cube", "load_cube_from_files", "make_icosphere", "make_cow",
    "cube_mesh_data",
]


class FacesData(NamedTuple):
    verts_idx: np.ndarray      # (F, 3) int32
    textures_idx: np.ndarray   # (F, 3) int32 (-1 if absent)
    normals_idx: np.ndarray    # (F, 3) int32 (-1 if absent)


class ObjAux(NamedTuple):
    verts_uvs: Optional[np.ndarray]           # (Vt, 2)
    normals: Optional[np.ndarray]             # (Vn, 3)
    material_colors: Dict[str, Dict[str, np.ndarray]]
    texture_images: Dict[str, np.ndarray]     # name -> (H, W, 3) float [0,1]
    texture_atlas: Optional[np.ndarray]       # (F, R, R, 3) if requested


def _parse_mtl(path: str):
    """Minimal MTL parser: Ka/Kd/Ks/Ns + map_Kd images."""
    colors: Dict[str, Dict[str, np.ndarray]] = {}
    images: Dict[str, np.ndarray] = {}
    if not os.path.exists(path):
        return colors, images
    current = None
    for raw in open(path):
        tokens = raw.split("#")[0].split()
        if not tokens:
            continue
        if tokens[0] == "newmtl":
            current = tokens[1]
            colors[current] = {}
        elif current is not None and tokens[0] in ("Ka", "Kd", "Ks"):
            key = {"Ka": "ambient_color", "Kd": "diffuse_color",
                   "Ks": "specular_color"}[tokens[0]]
            colors[current][key] = np.array(tokens[1:4], np.float32)
        elif current is not None and tokens[0] == "Ns":
            colors[current]["shininess"] = np.array(tokens[1], np.float32)
        elif current is not None and tokens[0] == "map_Kd":
            img_path = os.path.join(os.path.dirname(path), tokens[-1])
            if os.path.exists(img_path):
                from PIL import Image

                img = np.asarray(Image.open(img_path).convert("RGB"),
                                 np.float32) / 255.0
                images[current] = img
    return colors, images


def load_obj(path: str, load_textures: bool = True,
             create_texture_atlas: bool = False, texture_atlas_size: int = 4,
             texture_wrap: str = "repeat", use_native: bool = True):
    """Parse an OBJ file.  Returns (verts, faces, aux) like PyTorch3D's
    ``load_obj`` (`/root/reference/experiments/eval.py:224-231,296,746`).

    Geometry parsing uses the native C++ parser (pertrenderer_tpu/native)
    when available — the data-loading hot path for large meshes — with this
    pure-Python scanner as the fallback."""
    if use_native:
        try:
            from pertrenderer_tpu import native

            nat = native.parse_obj_native(path)
        except FileNotFoundError:
            raise
        except Exception:
            nat = None
        if nat is not None:
            colors: Dict[str, Dict[str, np.ndarray]] = {}
            images: Dict[str, np.ndarray] = {}
            if load_textures and nat["mtl"]:
                mtl_path = os.path.join(os.path.dirname(path), nat["mtl"])
                colors, images = _parse_mtl(mtl_path)
            faces = FacesData(verts_idx=nat["faces_v"],
                              textures_idx=nat["faces_t"],
                              normals_idx=nat["faces_n"])
            atlas = None
            if (create_texture_atlas and nat["uvs"] is not None and images
                    and len(nat["uvs"])):
                atlas = _make_texture_atlas(
                    list(images.values())[0], nat["uvs"], faces.textures_idx,
                    texture_atlas_size)
            aux = ObjAux(verts_uvs=nat["uvs"], normals=nat["normals"],
                         material_colors=colors, texture_images=images,
                         texture_atlas=atlas)
            return nat["verts"], faces, aux

    verts: List[List[float]] = []
    uvs: List[List[float]] = []
    normals: List[List[float]] = []
    faces_v: List[List[int]] = []
    faces_t: List[List[int]] = []
    faces_n: List[List[int]] = []
    mtl_path = None
    colors: Dict[str, Dict[str, np.ndarray]] = {}
    images: Dict[str, np.ndarray] = {}

    def _idx(tok: str, which: int) -> int:
        parts = tok.split("/")
        if which >= len(parts) or parts[which] == "":
            return 0
        return int(parts[which])

    for raw in open(path):
        tokens = raw.split("#")[0].split()
        if not tokens:
            continue
        tag = tokens[0]
        if tag == "v":
            verts.append([float(x) for x in tokens[1:4]])
        elif tag == "vt":
            uvs.append([float(x) for x in tokens[1:3]])
        elif tag == "vn":
            normals.append([float(x) for x in tokens[1:4]])
        elif tag == "mtllib":
            mtl_path = os.path.join(os.path.dirname(path), tokens[1])
        elif tag == "f":
            corners = tokens[1:]
            # fan-triangulate polygons
            for i in range(1, len(corners) - 1):
                tri = [corners[0], corners[i], corners[i + 1]]
                faces_v.append([_idx(t, 0) - 1 for t in tri])
                faces_t.append([_idx(t, 1) - 1 for t in tri])
                faces_n.append([_idx(t, 2) - 1 for t in tri])

    if load_textures and mtl_path:
        colors, images = _parse_mtl(mtl_path)

    verts_np = np.asarray(verts, np.float32)
    faces = FacesData(
        verts_idx=np.asarray(faces_v, np.int32),
        textures_idx=np.asarray(faces_t, np.int32),
        normals_idx=np.asarray(faces_n, np.int32),
    )
    verts_uvs = np.asarray(uvs, np.float32) if uvs else None
    normals_np = np.asarray(normals, np.float32) if normals else None

    atlas = None
    if create_texture_atlas and verts_uvs is not None and images:
        atlas = _make_texture_atlas(
            list(images.values())[0], verts_uvs, faces.textures_idx,
            texture_atlas_size,
        )

    aux = ObjAux(verts_uvs=verts_uvs, normals=normals_np,
                 material_colors=colors, texture_images=images,
                 texture_atlas=atlas)
    return verts_np, faces, aux


def _make_texture_atlas(image: np.ndarray, verts_uvs: np.ndarray,
                        faces_uvs: np.ndarray, r: int) -> np.ndarray:
    """Bake a (F, R, R, 3) per-face atlas by sampling the UV map on an RxR
    barycentric grid (PyTorch3D ``make_mesh_texture_atlas`` semantics)."""
    f = faces_uvs.shape[0]
    h, w = image.shape[0], image.shape[1]
    grid = (np.arange(r, dtype=np.float32) + 0.5) / r
    gx, gy = np.meshgrid(grid, grid, indexing="xy")  # (R, R)
    w1, w2 = gx, gy
    w0 = 1.0 - w1 - w2
    uv0 = verts_uvs[np.maximum(faces_uvs[:, 0], 0)]
    uv1 = verts_uvs[np.maximum(faces_uvs[:, 1], 0)]
    uv2 = verts_uvs[np.maximum(faces_uvs[:, 2], 0)]
    uv = (w0[None, ..., None] * uv0[:, None, None]
          + w1[None, ..., None] * uv1[:, None, None]
          + w2[None, ..., None] * uv2[:, None, None])  # (F, R, R, 2)
    x = np.clip((uv[..., 0] % 1.0) * (w - 1), 0, w - 1).astype(np.int32)
    y = np.clip((1.0 - (uv[..., 1] % 1.0)) * (h - 1), 0, h - 1).astype(np.int32)
    return image[y, x].reshape(f, r, r, 3).astype(np.float32)


def load_objs_as_meshes(paths: List[str], load_textures: bool = True) -> Meshes:
    """Load OBJs into a Meshes batch (UV textures if present, else white
    vertex textures)."""
    all_verts, all_faces, textures = [], [], None
    for path in paths:
        verts, faces, aux = load_obj(path, load_textures=load_textures)
        all_verts.append(verts)
        all_faces.append(faces.verts_idx)
        if aux.texture_images and aux.verts_uvs is not None:
            img = list(aux.texture_images.values())[0]
            textures = TexturesUV(
                maps=np.asarray(img, np.float32)[None],
                verts_uvs=aux.verts_uvs[None],
                faces_uvs=faces.textures_idx[None],
            )
    verts = np.stack(all_verts)
    faces = np.stack(all_faces)
    if textures is None:
        textures = TexturesVertex(np.ones_like(verts))
    return Meshes.create(verts, faces, textures=textures)


def save_obj(path: str, verts, faces) -> None:
    verts = np.asarray(verts)
    faces = np.asarray(faces)
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for face in faces:
            f.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")


# ---------------------------------------------------------------------------
# Procedural assets
# ---------------------------------------------------------------------------

# Rubik's cube face colors in the order the reference paints its texture
# strips AFTER the swap at eval.py:742-744: [green, yellow, blue, white,
# red, orange].
_CUBE_STRIP_COLORS = np.array(
    [
        [0.0, 1.0, 0.0],
        [1.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
        [1.0, 1.0, 1.0],
        [1.0, 0.0, 0.0],
        [1.0, 0.647, 0.0],
    ],
    np.float32,
)


def cube_mesh_data():
    """Topology of the reference cube (`data/objs/rubiks/cube2.obj`): 8 verts,
    12 faces, one UV per cube side pointing at a 6-strip texture."""
    verts = np.array(
        [
            [-0.5, -0.5, 0.5], [0.5, -0.5, 0.5], [-0.5, 0.5, 0.5],
            [0.5, 0.5, 0.5], [-0.5, 0.5, -0.5], [0.5, 0.5, -0.5],
            [-0.5, -0.5, -0.5], [0.5, -0.5, -0.5],
        ],
        np.float32,
    )
    faces = np.array(
        [
            [0, 1, 2], [2, 1, 3],      # +z side, strip 0
            [2, 3, 4], [4, 3, 5],      # +y side, strip 1
            [4, 5, 6], [6, 5, 7],      # -z side, strip 2
            [6, 7, 0], [0, 7, 1],      # -y side, strip 3
            [1, 7, 3], [3, 7, 5],      # +x side, strip 4
            [6, 0, 4], [4, 0, 2],      # -x side, strip 5
        ],
        np.int32,
    )
    strip_of_face = np.repeat(np.arange(6, dtype=np.int32), 2)
    verts_uvs = np.stack(
        [np.array([0.08, 0.24, 0.40, 0.56, 0.82, 0.98], np.float32),
         np.full(6, 0.5, np.float32)],
        axis=-1,
    )
    faces_uvs = np.stack([strip_of_face] * 3, axis=-1)
    return verts, faces, verts_uvs, faces_uvs


def cube_texture_image(strip_px: int = 16, height: int = 8) -> np.ndarray:
    """The painted 6-strip texture the reference builds at eval.py:746-749."""
    img = np.zeros((height, 6 * strip_px, 3), np.float32)
    for i in range(6):
        img[:, i * strip_px:(i + 1) * strip_px] = _CUBE_STRIP_COLORS[i]
    return img


def load_cube() -> Meshes:
    """The Rubik's-cube test asset (procedural equivalent of
    `/root/reference/experiments/eval.py:727-757`).

    ``atlas_size=1`` turns on the baked-atlas fast path at a single texel
    per face — exact here (verified bit-equal to atlas_size=4 and to true
    bilinear) because each cube face maps to a constant texture strip, and
    ~16x cheaper in the fused kernel's per-fragment texel select."""
    verts, faces, verts_uvs, faces_uvs = cube_mesh_data()
    tex = TexturesUV(
        maps=cube_texture_image()[None],
        verts_uvs=verts_uvs[None],
        faces_uvs=faces_uvs[None],
        atlas_size=1,
    )
    return Meshes.create(verts, faces, textures=tex)


def load_cube_from_files(datadir: str, atlas_size: int = 4) -> Meshes:
    """Load the Rubik's cube from reference-format asset files — the exact
    pipeline of `/root/reference/experiments/eval.py:727-757`: read
    ``cube2.obj`` + ``cube_p.npz``, swap face colors 0<->3 (the
    "same cube as softras" reorder at eval.py:742-744), paint the loaded
    texture image's six strips with the npz colors, and build a UV-textured
    mesh.  Use :func:`load_cube` for the procedural equivalent."""
    obj_path = os.path.join(datadir, "cube2.obj")
    npz_path = os.path.join(datadir, "cube_p.npz")
    with np.load(npz_path) as f:
        pos_idx, pos, col_idx, col = f.values()
    if pos.shape[1] == 4:
        pos = pos[:, 0:3]
    vtx_col = col.astype(np.float32).copy()
    green = vtx_col[3].copy()
    vtx_col[3] = vtx_col[0]
    vtx_col[0] = green

    verts, faces, aux = load_obj(obj_path, load_textures=True)
    if aux.texture_images:
        tex = list(aux.texture_images.values())[0].copy()
    else:
        tex = np.zeros((8, 96, 3), np.float32)
    strip = tex.shape[1] // 6
    for i in range(6):
        tex[:, i * strip:(i + 1) * strip] = vtx_col[i]
    textures = TexturesUV(
        maps=tex[None].astype(np.float32),
        verts_uvs=aux.verts_uvs[None],
        faces_uvs=faces.textures_idx[None],
        atlas_size=atlas_size,
    )
    return Meshes.create(verts, faces.verts_idx, textures=textures)


def make_cow(level: int = 4) -> Meshes:
    """Procedural 'cow-class' test asset: a few-thousand-face UV-textured
    mesh for BASELINE config 3 ("textured cow mesh pose+texture optimization
    at 256^2").  The reference loads external OBJ assets
    (`/root/reference/experiments/eval.py:224-231`); like the other bundled
    fixtures this repo generates an equivalent-complexity asset procedurally:
    an icosphere (level=4: 2562 verts / 5120 faces) deformed into a
    capsule-ish body with a head bump, spherical UVs and a spotted texture
    map (TexturesUV with a baked 4x4 atlas for the fused path)."""
    verts, faces = make_icosphere(level)
    v = verts.astype(np.float64).copy()
    # Body: elongate along x, flatten slightly; head bump at +x pole; four
    # leg-ish bulges below.  (Asymmetry matters more than anatomy here.)
    v[:, 0] *= 1.6
    v[:, 1] *= 0.95
    head = np.exp(-np.sum((v - np.array([1.5, 0.25, 0.0])) ** 2, 1) / 0.18)
    v += 0.55 * head[:, None] * np.array([1.0, 0.35, 0.0])
    for lx in (-0.9, 0.7):
        for lz in (-0.45, 0.45):
            leg = np.exp(-((v[:, 0] - lx) ** 2 + (v[:, 2] - lz) ** 2)
                         / 0.06) * (v[:, 1] < -0.2)
            v[:, 1] -= 0.5 * leg
    v = v / np.max(np.abs(v))
    # Spherical UVs (seam faces sample across the wrap; acceptable for a
    # procedural fixture).
    u = np.arctan2(v[:, 2], v[:, 0]) / (2.0 * np.pi) + 0.5
    w = 0.5 + 0.5 * (v[:, 1] / np.max(np.abs(v[:, 1]) + 1e-9))
    verts_uvs = np.stack([u, np.clip(w, 0.0, 1.0)], 1).astype(np.float32)
    # Spotted hide: white base, dark blobs, pink belly band.
    hh = ww = 128
    yy, xx = np.meshgrid(np.linspace(0, 1, hh), np.linspace(0, 1, ww),
                         indexing="ij")
    rng = np.random.RandomState(7)
    img = np.ones((hh, ww, 3), np.float32) * 0.95
    for _ in range(14):
        cy, cx, rr = rng.rand(), rng.rand(), 0.05 + 0.08 * rng.rand()
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        img[d2 < rr * rr] = np.array([0.12, 0.10, 0.10], np.float32)
    belly = yy < 0.18
    img[belly] = 0.6 * img[belly] + 0.4 * np.array([0.95, 0.75, 0.75],
                                                   np.float32)
    tex = TexturesUV(maps=np.asarray(img)[None],
                     verts_uvs=np.asarray(verts_uvs)[None],
                     faces_uvs=np.asarray(faces)[None],
                     atlas_size=4)
    return Meshes.create(v.astype(np.float32), faces, textures=tex)


def make_icosphere(level: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """Unit icosphere by repeated midpoint subdivision of an icosahedron.

    level=3 gives 642 vertices / 1280 faces — the reference's
    ``sphere_642.obj`` fixture (`/root/reference/experiments/eval.py:296`).
    """
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    for _ in range(level):
        cache = {}
        vlist = list(verts)

        def midpoint(a: int, b: int) -> int:
            kk = (min(a, b), max(a, b))
            if kk in cache:
                return cache[kk]
            m = vlist[a] + vlist[b]
            m = m / np.linalg.norm(m)
            vlist.append(m)
            cache[kk] = len(vlist) - 1
            return cache[kk]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc],
                          [ab, bc, ca]]
        verts = np.asarray(vlist)
        faces = np.asarray(new_faces, np.int64)
    return verts.astype(np.float32), faces.astype(np.int32)
