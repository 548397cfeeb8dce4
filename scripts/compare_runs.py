"""Quality gate for perf-knob promotions (VERDICT r4 task 1).

Compares two full-schedule ``cli.train`` runs — a baseline at the current
production knobs and a candidate (e.g. ``--gen-res 256 --max-per-tile 64
--composite-dtype bf16``) — on the evidence the promotion decision needs:

- the LOSS TRAJECTORY (per-term means over aligned tail windows of
  ``metrics.jsonl``, not a one-step scalar — the round-4 K=64 gate failed
  review precisely because it was a single-step loss to 3 decimals);
- the END-STATE EVAL metrics (``test/average.txt`` written by
  ``train/evaluate.py`` — the reference's eval protocol,
  ``gaussian_surfel_mvdream.py:557-589``);
- the canaries (``raster_capped`` must be 0 in both).

    python scripts/compare_runs.py outputs/evidence_r5/baseline \
        outputs/evidence_r5/candidate [--tail 8] [--out cmp.json]

Pass/fail is advisory (printed as ``gate_*`` fields); the promotion call
is made in PERFORMANCE.md with this JSON as the cited artifact.
"""

from __future__ import annotations

import argparse
import json
import os


def load_metrics(run_dir):
    rows = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def tail_means(rows, tail):
    """Per-key means over the last ``tail`` logged rows (loss terms only)."""
    rows = rows[-tail:]
    keys = set()
    for r in rows:
        keys.update(k for k in r if k.startswith("loss"))
    return {
        k: sum(r[k] for r in rows if k in r) / max(1, sum(k in r for r in rows))
        for k in sorted(keys)
    }


def stage_tail_means(rows, tail):
    """Tail means per stage: steps reset to 0 at the stage boundary, so a
    stage change is a step-number decrease."""
    stages = []
    cur = []
    last = -1
    for r in rows:
        if r["step"] < last:
            stages.append(cur)
            cur = []
        cur.append(r)
        last = r["step"]
    stages.append(cur)
    return [tail_means(s, tail) for s in stages]


def load_eval(run_dir):
    """``test/average.txt`` is one line: ``<psnr> <ssim> <lpips>``
    (train/evaluate.py; lpips is nan when no LPIPS weights were given)."""
    path = os.path.join(run_dir, "test", "average.txt")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        vals = [float(x) for x in f.read().split()]
    out = dict(zip(("psnr", "ssim", "lpips"), vals))
    return {k: v for k, v in out.items() if v == v}  # drop nan lpips


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("candidate")
    ap.add_argument("--tail", type=int, default=8,
                    help="logged rows per stage to average (log-every 25 "
                    "x 8 = the last 200 steps)")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)

    result = {"baseline": args.baseline, "candidate": args.candidate}
    mb = load_metrics(args.baseline)
    mc = load_metrics(args.candidate)
    sb = stage_tail_means(mb, args.tail)
    sc = stage_tail_means(mc, args.tail)
    result["stages"] = []
    for i, (b, c) in enumerate(zip(sb, sc)):
        stage = {}
        for k in sorted(set(b) | set(c)):
            if k in b and k in c:
                stage[k] = {
                    "baseline": round(b[k], 5),
                    "candidate": round(c[k], 5),
                    "delta": round(c[k] - b[k], 5),
                }
        result["stages"].append(stage)

    # Canaries over the whole run.
    for name, rows in (("baseline", mb), ("candidate", mc)):
        capped = max((r.get("raster_capped", 0.0) for r in rows), default=0.0)
        result[f"max_raster_capped_{name}"] = capped
    result["gate_capped_ok"] = (
        result["max_raster_capped_baseline"] == 0.0
        and result["max_raster_capped_candidate"] == 0.0
    )

    eb, ec = load_eval(args.baseline), load_eval(args.candidate)
    if eb and ec:
        result["eval"] = {
            k: {
                "baseline": eb[k],
                "candidate": ec[k],
                "delta": round(ec[k] - eb[k], 4),
            }
            for k in sorted(set(eb) & set(ec))
        }
        # Advisory gates: eval PSNR within 0.3 dB and SSIM within 0.005 of
        # the baseline end state (deltas far inside render-noise for a
        # same-seed run; regressions past these need a human call).
        if "psnr" in result["eval"]:
            result["gate_psnr_ok"] = result["eval"]["psnr"]["delta"] >= -0.3
        if "ssim" in result["eval"]:
            result["gate_ssim_ok"] = result["eval"]["ssim"]["delta"] >= -0.005

    # Total-loss tail gate per stage: candidate within 5% or better.
    gates = []
    for stage in result["stages"]:
        if "loss" in stage:
            b, c = stage["loss"]["baseline"], stage["loss"]["candidate"]
            gates.append(c <= b * 1.05 + 1e-6)
    result["gate_loss_tail_ok"] = all(gates) if gates else None

    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    main()
