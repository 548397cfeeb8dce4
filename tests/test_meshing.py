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

def test_marching_tetrahedra_consistent_winding():
    """The 6-tet decomposition has mixed parity; the gradient-based
    orientation pass must leave every face wound outward (normal away
    from the inside>level region)."""
    R = 48
    lin = np.linspace(-1, 1, R)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    field = 1.0 - np.sqrt(x**2 + y**2 + z**2)
    verts, faces = marching_tetrahedra(field, 0.5)
    world = verts / (R - 1.0) * 2.0 - 1.0
    fn = np.cross(
        world[faces[:, 1]] - world[faces[:, 0]],
        world[faces[:, 2]] - world[faces[:, 0]],
    )
    cent = world[faces].mean(axis=1)
    outward = (np.sum(fn * cent, axis=1) > 0).mean()
    assert outward > 0.99


def test_poisson_reconstruct_sphere():
    """Spectral Poisson reconstruction (mesh_utils.py:6 rebuild): an
    oriented unit-sphere cloud reconstructs to radius 1 within half a
    grid cell, wound outward, for both supplied and estimated normals."""
    from soar_tpu.io.meshing import poisson_reconstruct

    rng = np.random.RandomState(0)
    v = rng.randn(8000, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    c = np.array([0.3, -0.2, 0.1])
    pts = v + c

    for normals in (v, None):
        verts, faces = poisson_reconstruct(pts, normals, depth=6)
        assert len(verts) > 500 and len(faces) > 500
        r = np.linalg.norm(verts - c, axis=1)
        assert abs(r.mean() - 1.0) < 0.02 and r.std() < 0.02
        fn = np.cross(
            verts[faces[:, 1]] - verts[faces[:, 0]],
            verts[faces[:, 2]] - verts[faces[:, 0]],
        )
        cen = verts[faces].mean(axis=1) - c
        assert (np.sum(fn * cen, axis=1) > 0).mean() > 0.99


def test_poisson_reconstruct_outlier_removal():
    """Far outliers (the statistical-outlier gate) must not grow the
    reconstructed surface."""
    from soar_tpu.io.meshing import poisson_reconstruct

    rng = np.random.RandomState(1)
    v = rng.randn(6000, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = np.concatenate([v, np.array([[50.0, 0, 0], [0, 80.0, 0]])])
    nrm = np.concatenate([v, np.array([[1.0, 0, 0], [0, 1.0, 0]])])
    verts, faces = poisson_reconstruct(pts, nrm, depth=6, std_ratio=2.0)
    assert len(verts) > 0
    assert np.linalg.norm(verts, axis=1).max() < 2.0
