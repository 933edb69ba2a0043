"""Native C++ OBJ parser: parity with the pure-Python scanner."""

import numpy as np
import pytest

import pertrenderer_tpu as pt
from pertrenderer_tpu import native
from pertrenderer_tpu.io import make_icosphere


@pytest.fixture(scope="module")
def sphere_obj(tmp_path_factory):
    verts, faces = make_icosphere(2)
    path = str(tmp_path_factory.mktemp("objs") / "sphere.obj")
    pt.save_obj(path, verts, faces)
    return path, verts, faces


def test_native_builds():
    assert native.native_available(), "g++ build of objparse failed"


def test_native_matches_python(sphere_obj):
    path, verts, faces = sphere_obj
    if not native.native_available():
        pytest.skip("no native lib")
    vn, fn, auxn = pt.load_obj(path, use_native=True)
    vp, fp, auxp = pt.load_obj(path, use_native=False)
    np.testing.assert_allclose(vn, vp, atol=1e-6)
    np.testing.assert_array_equal(fn.verts_idx, fp.verts_idx)
    np.testing.assert_allclose(vn, verts, atol=1e-5)
    np.testing.assert_array_equal(fn.verts_idx, faces)


def test_native_parses_reference_cube_if_present():
    import os

    path = "/root/reference/data/objs/rubiks/cube2.obj"
    if not os.path.exists(path) or not native.native_available():
        pytest.skip("reference asset or native lib unavailable")
    vn, fn, auxn = pt.load_obj(path, use_native=True, load_textures=False)
    vp, fp, auxp = pt.load_obj(path, use_native=False, load_textures=False)
    np.testing.assert_allclose(vn, vp, atol=1e-6)
    np.testing.assert_array_equal(fn.verts_idx, fp.verts_idx)
    np.testing.assert_array_equal(fn.textures_idx, fp.textures_idx)
    assert vn.shape == (8, 3)
    assert fn.verts_idx.shape == (12, 3)


def test_native_quads_triangulated(tmp_path):
    path = str(tmp_path / "quad.obj")
    with open(path, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    v, fc, aux = pt.load_obj(path, use_native=True)
    assert fc.verts_idx.shape == (2, 3)
    np.testing.assert_array_equal(fc.verts_idx, [[0, 1, 2], [0, 2, 3]])
