#!/bin/bash
# Two-stage SOAR training driver (parity wrapper for the reference's
# scripts/run_dance_0.sh: same sequence, same prompt, stage 0 then stage 1;
# launch.py + threestudio are replaced by soar_tpu.cli.train).
set -e
seq="dance_0"
prompt="A man with a T-shirt, black pants, and black sneakers."
smpl_model="${SMPL_MODEL:-data/smpl_related/models/smplx/SMPLX_NEUTRAL.npz}"

echo "Running Stage 0"
python -m soar_tpu.cli.train \
    --dataroot "data/custom/$seq" \
    --smpl-model "$smpl_model" \
    --out "outputs/$seq" \
    --stage 0 --steps 1000

echo "Running Stage 1"
python -m soar_tpu.cli.train \
    --dataroot "data/custom/$seq" \
    --smpl-model "$smpl_model" \
    --out "outputs/$seq" \
    --stage 1 --steps 1000 \
    --resume "outputs/$seq/stage0" \
    --eval
