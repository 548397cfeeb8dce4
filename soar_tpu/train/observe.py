"""Observability: step timing, profiler traces, metric logging, image dumps.

The reference had none of this beyond tqdm and Lightning's bar (SURVEY §5.1);
its debugging story was image grids every 250 steps
(``system/gaussian_surfel_mvdream.py:100-167``) and optional (disabled) wandb
(``configs/...s0.yaml:99-103``).  This module provides all of it:

- :class:`StepTimer` — rolling per-phase wall-clock stats;
- :func:`profile_trace` — a ``jax.profiler`` trace context writing a
  TensorBoard-compatible trace;
- :class:`MetricLogger` — JSONL always, wandb when available+enabled;
- :func:`dump_debug_images` — the every-250-step grid of render / mask /
  normal / pred_normal / occ / depth / curv.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict, deque
from typing import Dict, Optional

import numpy as np


class StepTimer:
    def __init__(self, window: int = 50):
        self.window = window
        self.times = defaultdict(lambda: deque(maxlen=window))
        self._start = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        yield
        self.times[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        return {
            k: float(np.mean(v)) for k, v in self.times.items() if len(v)
        }


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace (open with TensorBoard / xprof)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricLogger:
    """JSONL metrics (always) + optional wandb (like the reference's disabled
    wandb block)."""

    def __init__(self, out_dir: str, use_wandb: bool = False, project: str = "soar_tpu"):
        os.makedirs(out_dir, exist_ok=True)
        self.f = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb
                wandb.init(project=project, dir=out_dir)
            except ImportError:
                print("[observe] wandb requested but not installed; JSONL only")

    def log(self, step: int, metrics: Dict):
        row = {"step": int(step)}
        row.update({k: float(v) for k, v in metrics.items()})
        self.f.write(json.dumps(row) + "\n")
        self.f.flush()
        if self.wandb is not None:
            self.wandb.log(row, step=int(step))

    def close(self):
        self.f.close()
        if self.wandb is not None:
            self.wandb.finish()


def dump_debug_images(out_dir: str, step: int, render_out: Dict, gt: Optional[Dict] = None):
    """Per-channel debug pngs (``gaussian_surfel_mvdream.py:100-167``)."""
    from .evaluate import save_png

    d = os.path.join(out_dir, f"test_{step}")
    os.makedirs(d, exist_ok=True)

    def grab(x):
        a = np.asarray(x)
        return a[0] if a.ndim == 4 else a

    for key in ("render", "normal", "pred_normal", "occ"):
        if key in render_out:
            save_png(os.path.join(d, f"test_{step}_{key}.png"), grab(render_out[key]))
    for key in ("mask", "curv"):
        if key in render_out:
            img = grab(render_out[key])
            if img.ndim == 2:
                img = img[..., None].repeat(3, -1)
            save_png(os.path.join(d, f"test_{step}_{key}.png"), img)
    if "depth" in render_out:
        dep = grab(render_out["depth"])
        lo, hi = np.percentile(dep[dep > 0], [5, 95]) if (dep > 0).any() else (0, 1)
        dn = np.clip((dep - lo) / max(hi - lo, 1e-6), 0, 1)
        save_png(
            os.path.join(d, f"test_{step}_depth.png"),
            dn[..., None].repeat(3, -1),
        )
    if gt:
        for key, img in gt.items():
            img = np.asarray(img)
            if img.ndim == 2:
                img = img[..., None].repeat(3, -1)
            save_png(os.path.join(d, f"test_{step}_gt_{key}.png"), img)
