#!/usr/bin/env bash
# Round-4 adversarial-family evidence runs (VERDICT r3 next-round #1 and #6):
#
# 1. StarGAN-v2 bidirectional trainer with the three round-4 stability fixes
#    (luminance-space D, consistent domain heads, normalized center-margin
#    hinge — train/stargan_bi.py module docstring): >=2500 steps with the
#    frozen-reid identity-preservation mAP logged every 100 steps.  Healthy
#    run = no loss >1e3 at any step, cycle keeps falling past the round-3
#    2.0 plateau AND/OR idpres mAP rises.
# 2. Full-phase staged gray->IR trainer: 2000 steps with the curriculum
#    boundary at 300, so ~1700 post-curriculum steps with sample grids —
#    the reference trains far past the boundary
#    (/root/reference/train_vqvae_deep_ir.py:204-288).
#
# Usage: nohup bash scripts/gan_round4.sh [run_dir] > gan_r4.log 2>&1 &
set -euo pipefail
RUN="${1:-runs/convergence_gan}"
N_IDS="${N_IDS:-16}"
PER_ID="${PER_ID:-24}"
STEPS_GAN="${STEPS_GAN:-2500}"
STEPS_IR="${STEPS_IR:-2000}"
STAGE_RECON="${STAGE_RECON:-300}"
mkdir -p "$RUN"

if [ ! -d "$RUN/data" ]; then
  echo "=== corpus: $N_IDS identities x $PER_ID instances/modality ==="
  python - "$RUN" "$N_IDS" "$PER_ID" <<'EOF'
import sys
from vqvae2_tpu.data.persons import save_person_sysu
run, n_ids, per_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
save_person_sysu(f"{run}/data", n_ids=n_ids, per_id=per_id)
print("corpus written", flush=True)
EOF
fi

echo "=== StarGAN-v2 bidirectional trainer, round-4 stability fixes ==="
python -m vqvae2_tpu.train.stargan_bi --path "$RUN/data" \
  --steps "$STEPS_GAN" --batch_size 4 --num_pos 4 --arch resnet18 \
  --log_every 8 --metrics_csv "$RUN/gan_loss_r4.csv" \
  --sample_dir "$RUN/gan_samples_r4" --sample_every 250 \
  --eval_every 100 --map_csv "$RUN/gan_idpres_r4.csv" \
  --r1_weight 1.0 --adv_weight 0.5 --d_every "${D_EVERY:-2}"

echo "=== full-phase staged gray->IR trainer ==="
python -m vqvae2_tpu.train.vqvae_deep_ir --path "$RUN/data" \
  --steps "$STEPS_IR" --stage_reconstruction "$STAGE_RECON" \
  --batch_size 4 --num_pos 4 --arch resnet18 --log_every 8 \
  --metrics_csv "$RUN/ir_loss_r4.csv" \
  --sample_dir "$RUN/ir_samples_r4" --sample_every 200

echo "=== done: $RUN ==="
