import jax
import jax.numpy as jnp
import numpy as np

from soar_tpu.core.camera import camera_from_c2w, look_at_c2w
from soar_tpu.render.image_utils import (
    contour_padding,
    depth2wpos,
    gaussian_to_occgrid,
    grid_prune,
    mask_prune,
    world2scrn,
)


def batched_cams(n=2, dist=3.0):
    cams = []
    for i in range(n):
        a = 2 * np.pi * i / n
        pos = jnp.asarray([dist * np.sin(a), 0.0, dist * np.cos(a)])
        c2w = look_at_c2w(pos, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
        cams.append(camera_from_c2w(c2w, jnp.asarray(0.7), jnp.asarray(0.7)))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)


def test_contour_padding_dilates():
    m = jnp.zeros((16, 16)).at[8, 8].set(1.0)
    out = contour_padding(m, 2)
    assert bool(out[6, 6]) and bool(out[10, 10]) and not bool(out[3, 3])


def test_world2scrn_center_point_visible():
    cams = batched_cams(2)
    pts = jnp.zeros((1, 3))
    cam_pos, ndc, in_mask, out_view = world2scrn(
        pts, cams, None, (64, 64)
    )
    assert cam_pos.shape == (2, 1, 3)
    # Half-pixel offset from the reference's scrnPos->ndc mapping.
    np.testing.assert_allclose(np.abs(np.asarray(ndc)), 0.0, atol=2.0 / 64)
    assert not bool(out_view.any())

    far = jnp.asarray([[100.0, 0.0, 0.0]])
    _, _, _, ov = world2scrn(far, cams, None, (64, 64))
    assert bool(ov.all())


def test_mask_prune_respects_masks():
    cams = batched_cams(2)
    # Mask covering only the image center.
    m = np.zeros((2, 64, 64), np.float32)
    m[:, 24:40, 24:40] = 1.0
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 1.8, 0.0]])  # center, off-center
    keep = mask_prune(pts, cams, jnp.asarray(m), (64, 64), pad=0)
    assert bool(keep[0]) and not bool(keep[1])


def test_occgrid_and_grid_prune():
    pts = jnp.asarray([[0.5, 0.5, 0.5]])
    occ = gaussian_to_occgrid(
        pts, jnp.ones(1) * 5.0, (8, 8, 8), jnp.zeros(3), jnp.asarray(8.0)
    )
    assert float(occ[4, 4, 4]) > 0
    keep = grid_prune(occ, jnp.zeros(3), jnp.asarray(8.0), pts, thrsh=1.0)
    assert bool(keep[0])
    far = jnp.asarray([[0.9, 0.1, 0.1]])
    assert not bool(grid_prune(occ, jnp.zeros(3), jnp.asarray(8.0), far)[0])


def test_depth2wpos_roundtrip():
    """Backprojecting the rendered depth of a known plane recovers world z."""
    c2w = look_at_c2w(
        jnp.asarray([0.0, 0.0, 2.0]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    cam = camera_from_c2w(c2w, jnp.asarray(0.7), jnp.asarray(0.7))
    H = W = 32
    depth = jnp.full((H, W), 2.0)  # plane through the origin
    mask = jnp.ones((H, W))
    wpos = depth2wpos(depth, mask, cam, (H, W))
    # Center pixel should land at the origin.
    np.testing.assert_allclose(np.asarray(wpos[H // 2, W // 2]), 0.0, atol=0.1)
