"""Held-out-frame evaluation + media dumps.

Rebuild of the reference's test protocol (``system/gaussian_surfel_mvdream.py:
527-589``): render each held-out frame with the GT camera, whiten GT outside
the mask, compute PSNR / SSIM (and LPIPS when VGG weights are available),
write per-frame pngs + ``psnrs.txt / ssims.txt / lpips.txt / average.txt``
and an mp4 (gated on a video backend being present).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..avatar import RenderSettings, render_view
from ..avatar.state import AvatarModel, AvatarParams
from . import losses as L
from .trainer import make_gt_batch


def _to_u8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def skimage_ssim(pred: np.ndarray, gt: np.ndarray, win: int = 7) -> float:
    """skimage.metrics.structural_similarity with its DEFAULTS — what the
    reference eval actually calls (``gaussian_surfel_mvdream.py:559``
    ``ski_ssim(pred, gt, multichannel=True, channel_axis=-1,
    data_range=1)``): 7x7 UNIFORM window (not the loss path's 11x11
    Gaussian), unbiased sample covariance (N/(N-1)), per-channel SSIM maps
    cropped by the filter radius and averaged."""
    from scipy.ndimage import uniform_filter

    K1, K2, L = 0.01, 0.03, 1.0
    C1, C2 = (K1 * L) ** 2, (K2 * L) ** 2
    NP = win * win
    cov_norm = NP / (NP - 1.0)
    pad = (win - 1) // 2

    vals = []
    for c in range(pred.shape[-1]):
        x = pred[..., c].astype(np.float64)
        y = gt[..., c].astype(np.float64)
        ux = uniform_filter(x, size=win)
        uy = uniform_filter(y, size=win)
        uxx = uniform_filter(x * x, size=win)
        uyy = uniform_filter(y * y, size=win)
        uxy = uniform_filter(x * y, size=win)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
            (ux * ux + uy * uy + C1) * (vx + vy + C2)
        )
        vals.append(S[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))


def save_png(path: str, img: np.ndarray) -> None:
    import imageio.v2 as imageio

    imageio.imwrite(path, _to_u8(img))


def try_save_mp4(path: str, frames: List[np.ndarray], fps: int = 30) -> bool:
    """mp4 via cv2 (no ffmpeg binary in this image); returns success."""
    try:
        import cv2

        h, w = frames[0].shape[:2]
        vw = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )
        if not vw.isOpened():
            return False
        for f in frames:
            vw.write(_to_u8(f)[..., ::-1])
        vw.release()
        return True
    except Exception:
        return False


def evaluate(
    params: AvatarParams,
    model: AvatarModel,
    ds,
    save_dir: Optional[str] = None,
    settings: RenderSettings = RenderSettings(),
    lpips_fn=None,
    split: str = "test",
) -> Dict[str, float]:
    indices = ds.test_idx if split == "test" else ds.val_idx
    if not indices:  # tiny sequences: fall back to whatever held-out exists
        indices = ds.test_idx + ds.val_idx
    H, W = ds.image_size
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)

    render = jax.jit(
        lambda p, cam, f: render_view(
            p, model, cam, (H, W), jnp.ones(3), f, settings
        )["render"]
    )

    psnrs, ssims, lpipss = [], [], []
    frames = []
    for i in indices:
        batch = make_gt_batch(ds, model, i)
        pred = np.asarray(render(params, batch["gt_cam"], batch["frame_idx"]))
        gt = np.asarray(ds.images[i]).copy()
        mask = np.asarray(ds.masks[i]) > 0.5
        gt[~mask] = 1.0  # whiten outside mask (``:533-534``)
        psnrs.append(float(L.psnr(jnp.asarray(pred), jnp.asarray(gt))))
        # Eval protocol SSIM = skimage defaults (reference :559), NOT the
        # training-loss Gaussian SSIM.
        ssims.append(skimage_ssim(pred, gt))
        if lpips_fn is not None:
            lpipss.append(float(lpips_fn(pred, gt)))
        frames.append(pred)
        if save_dir:
            save_png(os.path.join(save_dir, f"{i}.png"), pred)

    out = {
        "psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
        "ssim": float(np.mean(ssims)) if ssims else float("nan"),
    }
    if lpipss:
        out["lpips"] = float(np.mean(lpipss))
    if save_dir and psnrs:
        np.savetxt(os.path.join(save_dir, "psnrs.txt"), np.asarray(psnrs))
        np.savetxt(os.path.join(save_dir, "ssims.txt"), np.asarray(ssims))
        if lpipss:
            np.savetxt(os.path.join(save_dir, "lpips.txt"), np.asarray(lpipss))
        with open(os.path.join(save_dir, "average.txt"), "w") as f:
            f.write(
                f"{out['psnr']} {out['ssim']} {out.get('lpips', float('nan'))}"
            )
        try_save_mp4(os.path.join(save_dir, "test.mp4"), frames)
    return out
