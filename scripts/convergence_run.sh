#!/usr/bin/env bash
# End-to-end convergence run on the real TPU chip — the repo's answer to the
# reference's trained-artifact evidence (/root/reference/README.md:16,38-44:
# a 560-epoch FFHQ checkpoint + stage1 training reconstructions).
#
# No image corpus ships in this container, so the run trains on the
# procedural structured corpus (vqvae2_tpu/data/shapes.py): stage-1 VQ-VAE →
# code extraction → top + bottom PixelSNAIL priors → hierarchical sampling.
# Loss curves land in CSVs, recon/sample grids as PNGs under $RUN.
#
# Usage: nohup bash scripts/convergence_run.sh [run_dir] > run.log 2>&1 &
set -euo pipefail
RUN="${1:-runs/convergence}"
N_IMG="${N_IMG:-2048}"
SIZE="${SIZE:-256}"
mkdir -p "$RUN"

echo "=== stage 1: VQ-VAE ($N_IMG shapes @ ${SIZE}px) ==="
python -m vqvae2_tpu.train.vqvae --shapes "$N_IMG" --size "$SIZE" \
  --batch_size 16 --steps "${S1_STEPS:-4000}" --log_every 25 \
  --ckpt_dir "$RUN/vqvae" --sample_dir "$RUN/stage1_samples" \
  --sample_every 500 --metrics_csv "$RUN/vqvae_loss.csv" --workers 4

echo "=== extract codes ==="
python -m vqvae2_tpu.train.extract_codes --shapes "$N_IMG" --size "$SIZE" \
  --batch_size 64 --ckpt_dir "$RUN/vqvae" --name "$RUN/codes.vq2" --workers 4

echo "=== stage 2: top prior ==="
python -m vqvae2_tpu.train.pixelsnail "$RUN/codes.vq2" --hier top \
  --batch 32 --steps "${TOP_STEPS:-2000}" --log_every 25 --bf16 \
  --ckpt_dir "$RUN/top" --metrics_csv "$RUN/top_loss.csv"

echo "=== stage 2: bottom prior ==="
python -m vqvae2_tpu.train.pixelsnail "$RUN/codes.vq2" --hier bottom \
  --batch 16 --steps "${BOT_STEPS:-2000}" --log_every 25 --bf16 \
  --ckpt_dir "$RUN/bottom" --metrics_csv "$RUN/bottom_loss.csv"

echo "=== sample (top -> bottom -> decode -> PNG) ==="
time python -m vqvae2_tpu.train.sample "$RUN/sample_grid.png" \
  --vqvae "$RUN/vqvae" --top "$RUN/top" --bottom "$RUN/bottom" --batch 8

echo "=== done: $RUN ==="
