#!/usr/bin/env bash
# Round-4 evidence chain, ordered by VERDICT r3 priority:
#   1. StarGAN-v2 >=2000-step run with the round-4 stability fixes + frozen-reid
#      identity-preservation mAP (VERDICT missing #1 / next #1).
#   2. Detection AP-rises runs (SSD + Mask R-CNN, VERDICT missing #2 / next #5).
#   3. ReID-step roofline measurement (VERDICT weak #4 / next #3).
#   4. Full-phase staged gray->IR run (VERDICT missing #3 / next #6).
# Serial on purpose: one chip, one trainer graph's HBM at a time.
# Usage: nohup bash scripts/round4_evidence.sh > /tmp/r4_evidence.log 2>&1 &
set -uo pipefail
RUN="runs/convergence_gan"
mkdir -p "$RUN"

if [ ! -d "$RUN/data" ]; then
  echo "=== corpus ==="
  python - "$RUN" <<'EOF'
import sys
from vqvae2_tpu.data.persons import save_person_sysu
save_person_sysu(f"{sys.argv[1]}/data", n_ids=16, per_id=24)
print("corpus written", flush=True)
EOF
fi

echo "=== [1/4] StarGAN-v2 bidirectional, 2000 steps ($(date -u +%H:%M:%S)) ==="
python -m vqvae2_tpu.train.stargan_bi --path "$RUN/data" \
  --steps 2000 --batch_size 4 --num_pos 4 --arch resnet18 \
  --log_every 8 --metrics_csv "$RUN/gan_loss_r4.csv" \
  --sample_dir "$RUN/gan_samples_r4" --sample_every 250 \
  --eval_every 100 --map_csv "$RUN/gan_idpres_r4.csv" \
  --r1_weight 1.0 --adv_weight 0.5 --d_every 2
echo "=== [1/4] exit $? ($(date -u +%H:%M:%S)) ==="

echo "=== [2/4] detection AP runs ($(date -u +%H:%M:%S)) ==="
bash scripts/detection_ap_run.sh runs/convergence_det
echo "=== [2/4] exit $? ($(date -u +%H:%M:%S)) ==="

echo "=== [3/4] ReID roofline ($(date -u +%H:%M:%S)) ==="
python scripts/mfu_profile.py --reid
echo "=== [3/4] exit $? ($(date -u +%H:%M:%S)) ==="

echo "=== [4/4] full-phase gray->IR, 1400 steps ($(date -u +%H:%M:%S)) ==="
python -m vqvae2_tpu.train.vqvae_deep_ir --path "$RUN/data" \
  --steps 1400 --stage_reconstruction 300 \
  --batch_size 4 --num_pos 4 --arch resnet18 --log_every 8 \
  --metrics_csv "$RUN/ir_loss_r4.csv" \
  --sample_dir "$RUN/ir_samples_r4" --sample_every 200
echo "=== [4/4] exit $? ($(date -u +%H:%M:%S)) ==="
echo "=== round4_evidence done ($(date -u +%H:%M:%S)) ==="
