#!/usr/bin/env bash
# Adaptation-family convergence runs on the real TPU chip — learning
# evidence for the fork's flagship joint trainer (reference train_vqvae.py's
# ModelAdaptive VQ-VAE + ReID loop) and the gray→color style-adaptation
# trainer (reference train_gray2color.py).
#
# Both train on the procedural cross-modal person corpus
# (vqvae2_tpu/data/persons.py — no SYSU data ships in this container).
# Deliverables per run: a loss-curve CSV and periodic sample grids —
#   adaptive:   [rgb, fake rgb, real ir, fake ir]
#   gray2color: [rgb, ir, rgb recon, colorized, colorized-other-style]
# Falling recon/mse curves plus grids approaching the targets are the
# learning evidence.
#
# Usage: nohup bash scripts/adaptation_convergence.sh [run_dir] > adapt.log 2>&1 &
# First launch pays one-off remote compiles; the persistent compile cache
# makes re-runs start in seconds.
set -euo pipefail
RUN="${1:-runs/convergence_adapt}"
N_IDS="${N_IDS:-16}"
PER_ID="${PER_ID:-24}"
STEPS_ADAPT="${STEPS_ADAPT:-800}"
STEPS_G2C="${STEPS_G2C:-800}"
mkdir -p "$RUN"

echo "=== corpus: $N_IDS identities x $PER_ID instances/modality (288x144) ==="
python - "$RUN" "$N_IDS" "$PER_ID" <<'EOF'
import sys
from vqvae2_tpu.data.persons import save_person_sysu
run, n_ids, per_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
save_person_sysu(f"{run}/data", n_ids=n_ids, per_id=per_id)
print("corpus written", flush=True)
EOF

echo "=== ModelAdaptive joint trainer (train/adaptive.py) ==="
python -m vqvae2_tpu.train.adaptive --path "$RUN/data" \
  --steps "$STEPS_ADAPT" --batch_size 4 --num_pos 4 --arch resnet18 \
  --log_every 8 --metrics_csv "$RUN/adaptive_loss.csv" \
  --sample_dir "$RUN/adaptive_samples" --sample_every 100

echo "=== gray->color adaptation trainer (train/gray2color.py) ==="
python -m vqvae2_tpu.train.gray2color --path "$RUN/data" \
  --steps "$STEPS_G2C" --batch_size 4 --num_pos 4 --arch resnet18 \
  --log_every 8 --metrics_csv "$RUN/g2c_loss.csv" \
  --sample_dir "$RUN/g2c_samples" --sample_every 100

echo "=== done: $RUN ==="
