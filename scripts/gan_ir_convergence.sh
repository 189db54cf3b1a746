#!/usr/bin/env bash
# GAN / IR-translation convergence runs on the real TPU chip — learning
# evidence for the generative-adaptation half of the framework (the
# reference's train_vqvae_deep_ir.py staged gray→IR trainer and
# train_vqvae_deep_bi2.py StarGAN-v2 bidirectional trainer).
#
# No SYSU data ships in this container, so both runs train on the procedural
# cross-modal person corpus (vqvae2_tpu/data/persons.py): identities with
# persistent geometry/appearance and an IR modality sharing geometry but
# swapping color for a thermal signature.  Deliverables per run: a
# loss-curve CSV and periodic sample grids —
#   IR trainer:      [aug RGB, gray, gray→IR, real IR, IR recon]
#   StarGAN trainer: [gray, gray→IR, real IR, IR→gray]
# A falling cycle/recon curve plus grids whose translations move toward the
# target modality is the learning evidence; pixel-perfect translation is not
# expected at these step counts.
#
# Usage: nohup bash scripts/gan_ir_convergence.sh [run_dir] > gan_ir.log 2>&1 &
# First launch pays one-off remote compiles (10-40 min per new trainer
# graph); the persistent compile cache makes re-runs start in seconds.
set -euo pipefail
RUN="${1:-runs/convergence_gan}"
N_IDS="${N_IDS:-16}"
PER_ID="${PER_ID:-24}"
STEPS_IR="${STEPS_IR:-800}"
STAGE_RECON="${STAGE_RECON:-300}"
STEPS_GAN="${STEPS_GAN:-600}"
mkdir -p "$RUN"

echo "=== corpus: $N_IDS identities x $PER_ID instances/modality (288x144) ==="
python - "$RUN" "$N_IDS" "$PER_ID" <<'EOF'
import sys
from vqvae2_tpu.data.persons import save_person_sysu
run, n_ids, per_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
save_person_sysu(f"{run}/data", n_ids=n_ids, per_id=per_id)
print("corpus written", flush=True)
EOF

echo "=== staged gray->IR trainer (train/vqvae_deep_ir.py) ==="
python -m vqvae2_tpu.train.vqvae_deep_ir --path "$RUN/data" \
  --steps "$STEPS_IR" --stage_reconstruction "$STAGE_RECON" \
  --batch_size 4 --num_pos 4 --arch resnet18 --log_every 8 \
  --metrics_csv "$RUN/ir_loss.csv" \
  --sample_dir "$RUN/ir_samples" --sample_every 100

echo "=== StarGAN-v2 bidirectional trainer (train/stargan_bi.py) ==="
python -m vqvae2_tpu.train.stargan_bi --path "$RUN/data" \
  --steps "$STEPS_GAN" --batch_size 4 --num_pos 4 --arch resnet18 \
  --log_every 8 --metrics_csv "$RUN/gan_loss.csv" \
  --sample_dir "$RUN/gan_samples" --sample_every 100

echo "=== done: $RUN ==="
