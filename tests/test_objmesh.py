"""OBJ loader + normal/tangent computation, incl. the real SMPL-X UV
template shipped with the reference (gated on its presence)."""

import os

import numpy as np
import pytest

from soar_tpu.io.objmesh import compute_normal, compute_tangent, load_obj_mesh

_REF_TEMPLATE = (
    "/root/reference/soar/threestudio-soar/utils/assets/"
    "template_mesh_smplx_uv.obj"
)

_CUBE = """\
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
v 1 0 1
v 1 1 1
v 0 1 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1 2/2 3/3 4/4
f 5/1 8/4 7/3 6/2
f 1/1 5/2 6/3 2/4
f 2/1 6/2 7/3 3/4
f 3/1 7/2 8/3 4/4
f 4/1 8/2 5/3 1/4
"""


def test_quad_obj_triangulation(tmp_path):
    p = tmp_path / "cube.obj"
    p.write_text(_CUBE)
    v, f = load_obj_mesh(str(p))
    assert v.shape == (8, 3)
    assert f.shape == (12, 3)  # 6 quads fan-triangulated
    v, f, uv, uvf = load_obj_mesh(str(p), with_texture=True)
    assert uv.shape == (4, 2)
    assert uvf.shape == (12, 3)
    n = compute_normal(v, f)
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
    t = compute_tangent(v, f, uv, uvf)
    assert t.shape == v.shape
    assert np.all(np.isfinite(t))


@pytest.mark.skipif(
    not os.path.exists(_REF_TEMPLATE), reason="reference template not mounted"
)
def test_real_smplx_uv_template():
    """The loader must digest the actual SMPL-X UV template the reference
    feeds through ``utils/smpl.py:381-390`` (10,475 verts, 11,313 UVs,
    20,908 triangles)."""
    v, f, uv, uvf = load_obj_mesh(_REF_TEMPLATE, with_texture=True)
    assert v.shape == (10475, 3)
    assert uv.shape == (11313, 2)
    assert f.shape == (20908, 3)
    assert uvf.shape == (20908, 3)
    assert f.min() == 0 and f.max() == v.shape[0] - 1
    assert uvf.min() == 0 and uvf.max() == uv.shape[0] - 1
    # sane human-scale bounds (meters), watertight-ish normals
    assert np.all(np.abs(v) < 3.0)
    n = compute_normal(v, f)
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)
    t = compute_tangent(v, f, uv, uvf)
    assert np.all(np.isfinite(t))
