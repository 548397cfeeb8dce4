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
