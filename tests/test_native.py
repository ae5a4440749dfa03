"""C++ native components vs the Python reference implementations."""

import os

import numpy as np
import pytest

from distributed_raytracer_tpu.models import bvh, native
from distributed_raytracer_tpu.models.objparse import parse_obj

SUZANNE = "/root/reference/example/suzanne.obj"


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native library could not be built")


def assert_mesh_equal(a, b):
    np.testing.assert_array_equal(a.vertices, b.vertices)
    np.testing.assert_array_equal(a.faces_v, b.faces_v)
    np.testing.assert_array_equal(a.face_mat, b.face_mat)
    if a.has_normals or b.has_normals:
        np.testing.assert_allclose(a.normals, b.normals, atol=1e-15)
        np.testing.assert_array_equal(a.faces_n, b.faces_n)
    assert a.materials == b.materials


@pytest.mark.skipif(not os.path.exists(SUZANNE), reason="reference assets not mounted")
def test_native_parser_matches_python_suzanne():
    py = parse_obj(SUZANNE, backend="python")
    nat = parse_obj(SUZANNE, backend="native")
    assert_mesh_equal(nat, py)


def test_native_parser_matches_python_tetra(tmp_path):
    from tests.conftest import make_tetra_obj
    path = make_tetra_obj(str(tmp_path / "t.obj"))
    assert_mesh_equal(parse_obj(path, backend="native"),
                      parse_obj(path, backend="python"))


def test_native_parser_no_normals_no_mtl(tmp_path):
    from tests.conftest import make_tetra_obj
    path = make_tetra_obj(str(tmp_path / "t.obj"), with_normals=False,
                          with_mtl=False)
    assert_mesh_equal(parse_obj(path, backend="native"),
                      parse_obj(path, backend="python"))


def test_native_parser_missing_file():
    with pytest.raises(FileNotFoundError):
        native.parse_obj("/tmp/does-not-exist.obj")


def test_native_morton_matches_python():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-5, 5, size=(4096, 3))
    nat = native.morton_argsort(pts)
    py = np.argsort(bvh.morton_codes(pts), kind="stable")
    np.testing.assert_array_equal(nat, py)
