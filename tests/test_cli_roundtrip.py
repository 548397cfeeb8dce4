"""End-to-end CLI seam test: train --synthetic checkpoints must load in
render_rot --synthetic (regression for the field-capacity/frame-count
mismatch between the two CLIs' avatar constructions)."""

import glob
import os

import numpy as np

from soar_tpu.cli.render_rot import main as render_main
from soar_tpu.cli.train import main as train_main


def test_train_then_render_rot(tmp_path):
    out = str(tmp_path / "run")
    train_main(
        [
            "--synthetic",
            "--steps", "2",
            "--stage", "0",
            "--use-explicit",
            "--out", out,
            "--log-every", "10",
            "--dump-every", "1000",
            "--val-every", "1000",
        ]
    )
    ckpt = os.path.join(out, "stage0")
    assert os.path.exists(ckpt)

    rot = str(tmp_path / "rot")
    render_main(
        [
            "--synthetic",
            "--ckpt", ckpt,
            "--out", rot,
            "--num-views", "2",
            "--use-explicit",
        ]
    )
    rgbs = sorted(glob.glob(os.path.join(rot, "rgb_*.png")))
    assert len(rgbs) == 2
    import cv2

    img = cv2.imread(rgbs[0])
    assert img is not None and img.shape[2] == 3
    # A trained avatar on a white turntable background: some non-white pixels.
    assert (img < 200).any()


def test_train_import_reference_ckpt(tmp_path):
    """--import-ckpt warm-starts training from a reference-layout Lightning
    checkpoint (docs/REAL_WEIGHTS.md §5): the imported xyz must reach the
    trained checkpoint, not the fresh-init template."""
    import torch

    from soar_tpu.cli.common import synthetic_setup
    from soar_tpu.io.checkpoint import load_avatar

    _, params, _ = synthetic_setup(distill_steps=100, seed=0)
    n = int(params.xyz.shape[0])
    rng = np.random.RandomState(1)
    shift = np.asarray(params.xyz) + np.array([0.5, 0.0, 0.0], np.float32)
    sd = {
        "geometry._xyz": torch.tensor(shift),
        "geometry._rotation": torch.tensor(np.asarray(params.rotation)),
        "geometry._scaling": torch.tensor(np.asarray(params.scaling)),
        "geometry._opacity": torch.tensor(np.asarray(params.opacity)),
        "geometry._colors": torch.tensor(rng.rand(n, 3).astype(np.float32)),
        "geometry._occ": torch.tensor(rng.rand(n, 1).astype(np.float32)),
        "geometry.latent_pose": torch.tensor(
            np.asarray(params.latent_pose)
        ),
    }
    ref = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": sd, "epoch": 0}, ref)

    out = str(tmp_path / "run")
    train_main(
        [
            "--synthetic",
            "--steps", "1",
            "--stage", "0",
            "--use-explicit",
            "--import-ckpt", ref,
            "--out", out,
            "--log-every", "10",
            "--dump-every", "1000",
            "--val-every", "1000",
        ]
    )
    loaded, _ = load_avatar(os.path.join(out, "stage0"), params)
    # One Adam step moves xyz by <= lr; the import shifted it by 0.5.
    dx = np.abs(np.asarray(loaded.xyz[:, 0]) - np.asarray(params.xyz[:, 0]))
    assert np.median(dx) > 0.4
