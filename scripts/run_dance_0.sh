#!/bin/bash
# Two-stage SOAR training driver (parity wrapper for the reference's
# scripts/run_dance_0.sh: same sequence, same prompt, stage 0 then stage 1;
# launch.py + threestudio are replaced by soar_tpu.cli.train).
#
# ImageDream SDS guidance needs weights this zero-egress image cannot fetch:
#   GUIDANCE_CKPT=/path/to/sd-v2.1-base-4view-ipmv.pt   (torch checkpoint)
#   PROMPT_EMBEDDINGS=/path/to/prompt.npz  (or CLIP_MODEL_DIR=...)
# With GUIDANCE_CKPT unset, MOCK_GUIDANCE=1 runs random-init full-shape
# networks (timing/smoke), and otherwise SDS is skipped (reconstruction-only).
set -e
seq="dance_0"
prompt="A man with a T-shirt, black pants, and black sneakers."
smpl_model="${SMPL_MODEL:-data/smpl_related/models/smplx/SMPLX_NEUTRAL.npz}"

guidance_args=()
if [[ -n "${GUIDANCE_CKPT:-}" ]]; then
    guidance_args+=(--guidance imagedream --prompt "$prompt"
                    --guidance-ckpt "$GUIDANCE_CKPT")
    [[ -n "${PROMPT_EMBEDDINGS:-}" ]] && guidance_args+=(--prompt-embeddings "$PROMPT_EMBEDDINGS")
    [[ -n "${CLIP_MODEL_DIR:-}" ]] && guidance_args+=(--clip-model-dir "$CLIP_MODEL_DIR")
elif [[ -n "${MOCK_GUIDANCE:-}" ]]; then
    guidance_args+=(--guidance imagedream --prompt "$prompt" --mock-guidance)
fi

echo "Running Stage 0"
python -m soar_tpu.cli.train \
    --dataroot "data/custom/$seq" \
    --smpl-model "$smpl_model" \
    --out "outputs/$seq" \
    --stage 0 --steps 1000 \
    "${guidance_args[@]}"

echo "Running Stage 1"
python -m soar_tpu.cli.train \
    --dataroot "data/custom/$seq" \
    --smpl-model "$smpl_model" \
    --out "outputs/$seq" \
    --stage 1 --steps 1000 \
    --resume "outputs/$seq/stage0" \
    --eval \
    "${guidance_args[@]}"
