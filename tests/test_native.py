"""Native C++ host runtime vs the pure-Python implementations.

Skips when g++ is unavailable; the binding builds the library on demand.
Contract: BIT-IDENTICAL arrays (the native code mirrors numpy float32
op-for-op and is compiled with -ffp-contract=off).
"""

import os

import numpy as np
import pytest

from vct_tpu import native
from vct_tpu.render.voxelize import generate_surface_samples
from vct_tpu.scene import cornell_box
from vct_tpu.scene.obj import load_obj

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


OBJ = """
mtllib test.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 -1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
usemtl red
f 1/1/1 2/2/1 3/3/1 4/4/1
usemtl blue
f -5/-4 2/2 5/1
f 1 2 5
"""

MTL = """
newmtl red
Kd 0.9 0.1 0.1
Ks 0.2 0.2 0.2
newmtl blue
Kd 0.1 0.1 0.9
"""


@pytest.fixture
def obj_path(tmp_path):
    (tmp_path / "test.obj").write_text(OBJ)
    (tmp_path / "test.mtl").write_text(MTL)
    return str(tmp_path / "test.obj")


def test_obj_parse_parity(obj_path):
    a = load_obj(obj_path, backend="python", scale=0.5)
    b = load_obj(obj_path, backend="auto", scale=0.5)
    np.testing.assert_array_equal(a.positions, b.positions)
    np.testing.assert_array_equal(a.uvs, b.uvs)
    np.testing.assert_array_equal(a.normals, b.normals)
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_array_equal(a.tri_material, b.tri_material)
    assert [m.name for m in a.materials] == [m.name for m in b.materials]
    assert a.materials[0].albedo == b.materials[0].albedo


def test_obj_parse_no_materials(tmp_path):
    p = tmp_path / "bare.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    a = load_obj(str(p), backend="python")
    b = load_obj(str(p), backend="auto")
    np.testing.assert_array_equal(a.positions, b.positions)
    assert len(a.materials) == len(b.materials) == 1
    # no vn records and zero normals -> smooth normals generated both ways
    np.testing.assert_array_equal(a.normals, b.normals)


def _sorted_by_tri(s):
    order = np.argsort(s.tri_ids, kind="stable")
    return (s.positions[order], s.normals[order], s.uvs[order],
            s.material_ids[order], s.tri_ids[order])


def test_surface_samples_parity():
    scene = cornell_box(size=100.0)
    py = generate_surface_samples(scene, 100.0 / 32, 2.0, backend="python")
    nat = generate_surface_samples(scene, 100.0 / 32, 2.0, backend="auto")
    assert py.count == nat.count
    # the python path batches triangles by subdivision level; within a
    # triangle both paths emit the identical sequence -> stable sort by
    # tri_id must make the arrays bit-equal
    for a, b in zip(_sorted_by_tri(py), _sorted_by_tri(nat)):
        np.testing.assert_array_equal(a, b)


def test_surface_samples_parity_irregular():
    rng = np.random.default_rng(7)
    from vct_tpu.scene.mesh import scene_from_arrays
    v = rng.uniform(-60, 60, (30, 3)).astype(np.float32)
    tris = rng.integers(0, 30, (40, 3)).astype(np.int32)
    scene = scene_from_arrays(
        v, tris, uvs=rng.uniform(0, 1, (30, 2)).astype(np.float32))
    py = generate_surface_samples(scene, 1.2, 2.0, backend="python")
    nat = generate_surface_samples(scene, 1.2, 2.0, backend="auto")
    assert py.count == nat.count
    for a, b in zip(_sorted_by_tri(py), _sorted_by_tri(nat)):
        np.testing.assert_array_equal(a, b)
