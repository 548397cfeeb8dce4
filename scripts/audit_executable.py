"""Audit the production train-step programs for baked-in constants.

The serialized no-SDS step executable measures 227 MB and the SDS pair
385+58 MB; over the 4-8 MB/s axon tunnel that serialization is the
cold-start floor (PERFORMANCE.md item 19).  Weights/GT already ride as jit
arguments, so whatever remains embedded is either (a) closure-captured
model context (skinning tables, original positions), (b) index/iota tables
XLA materializes at compile time, or (c) just program text.  This script
lowers the EXACT bench program on the host backend and walks the stablehlo
module for `stablehlo.constant` ops, bucketing by byte size — pointing at
what to hoist into arguments.

    JAX_PLATFORMS=cpu python scripts/audit_executable.py [--sds] [--top 30]
"""

import argparse
import os

# These tools decompose/lower the SPLIT two-program structure (prelude +
# grad-half step); force it regardless of the production default.
os.environ["SOAR_BENCH_SDS_MODE"] = "split"
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_ITEMSIZE = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "i64": 8, "ui64": 8, "i32": 4, "ui32": 4,
    "i16": 2, "ui16": 2, "i8": 1, "ui8": 1, "i1": 1,
}


def tensor_nbytes(type_str: str) -> int:
    """'tensor<125664x10xf32>' -> nbytes.  0 for non-tensor types."""
    if not type_str.startswith("tensor<"):
        return 0
    inner = type_str[len("tensor<"):].rstrip(">")
    parts = inner.split("x")
    n = 1
    dtype = parts[-1]
    for p in parts[:-1]:
        try:
            n *= int(p)
        except ValueError:
            return 0
    return n * _ITEMSIZE.get(dtype, 4)


def audit(lowered, top=30, label=""):
    # Walk the MLIR module object (no full-text dump of constant data).
    mod = lowered.compiler_ir(dialect="stablehlo")
    sizes = []

    def visit(op):
        name = op.operation.name
        if name in ("stablehlo.constant", "mhlo.constant", "arith.constant"):
            t = str(op.operation.results[0].type)
            nb = tensor_nbytes(t)
            if nb:
                sizes.append((nb, t))
        for region in op.operation.regions:
            for block in region.blocks:
                for inner in block.operations:
                    visit(inner)

    for func in mod.body.operations:
        visit(func)

    sizes.sort(reverse=True)
    total = sum(s for s, _ in sizes)
    by_type = collections.Counter()
    for nb, t in sizes:
        by_type[t] += nb
    print(f"== {label}: {len(sizes)} constants, {total/1e6:.1f} MB total ==")
    for t, nb in by_type.most_common(top):
        print(f"  {nb/1e6:9.2f} MB  {t}")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sds", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench_trainstep as B
    from soar_tpu.train.config import StageConfig
    from soar_tpu.train.trainer import make_gt_batch

    scene = B.build_scene()
    params, model, ds, cfg = scene
    lpips_pair = B._random_lpips_fn()

    guidance_fn = None
    stage = StageConfig(training_stage=0)
    if args.sds:
        from soar_tpu.guidance.build import build_guidance

        stage = StageConfig(training_stage=0, sds_start=0)
        guidance_fn = build_guidance(
            "imagedream", stage, key=jax.random.PRNGKey(1), mock=True,
            image_size=256, n_view=4, dtype=jnp.bfloat16,
        )

    state, fn, prelude, g, lvars = B.build_step(
        params, model, ds, cfg, guidance_fn, stage, lpips_pair
    )
    batch = make_gt_batch(ds, model, 0)
    batch["lpips_params"] = lvars
    key = jax.random.PRNGKey(0)

    if prelude is not None:
        batch2 = dict(batch)
        batch2["sds_target"] = jnp.zeros((4, 32, 32, 4))
        audit(fn.lower(state, batch2, key), args.top, "sds train step")
    else:
        audit(fn.lower(state, batch, key), args.top, "no-sds train step")


if __name__ == "__main__":
    main()
