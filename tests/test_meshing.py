import jax.numpy as jnp
import numpy as np

from soar_tpu.io.meshing import (
    clean_mesh,
    decimate_mesh,
    extract_density_field,
    gaussian_3d_coeff,
    marching_tetrahedra,
    write_obj,
)


def test_gaussian_3d_coeff_isotropic():
    cov6 = jnp.asarray([[0.04, 0.0, 0.0, 0.04, 0.0, 0.04]])  # sigma^2 = 0.04
    d = jnp.asarray([[0.2, 0.0, 0.0]])  # 1 sigma
    w = gaussian_3d_coeff(d, cov6)
    np.testing.assert_allclose(w, np.exp(-0.5), atol=1e-5)


def test_marching_tetrahedra_sphere():
    R = 48
    lin = np.linspace(-1, 1, R)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    field = 1.0 - np.sqrt(x**2 + y**2 + z**2)  # level 0.5 -> radius 0.5
    verts, faces = marching_tetrahedra(field, 0.5)
    assert len(verts) > 100 and len(faces) > 100
    world = verts / (R - 1.0) * 2.0 - 1.0
    radii = np.linalg.norm(world, axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.5, atol=0.03)
    assert radii.std() < 0.03

    # faces index valid vertices
    assert faces.max() < len(verts)

    v2, f2 = clean_mesh(verts, faces)
    assert len(f2) <= len(faces)

    v3, f3 = decimate_mesh(world, faces, target_faces=len(faces) // 5)
    assert len(f3) < len(faces) // 2


def test_density_field_single_gaussian():
    xyz = np.zeros((1, 3), np.float32)
    scales = np.full((1, 3), 0.1, np.float32)
    quats = np.asarray([[1.0, 0, 0, 0]], np.float32)
    op = np.ones(1, np.float32)
    occ, center, scale = extract_density_field(
        xyz, scales, quats, op, resolution=32
    )
    assert occ.shape == (32, 32, 32)
    # Peak at the center.
    assert occ[16, 16, 16] > 0.9 * occ.max()


def test_write_obj(tmp_path):
    import os.path as osp

    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.asarray([[0, 1, 2]])
    p = osp.join(str(tmp_path), "m.obj")
    write_obj(p, verts, faces)
    lines = open(p).read().splitlines()
    assert lines[0].startswith("v ") and lines[-1] == "f 1 2 3"
