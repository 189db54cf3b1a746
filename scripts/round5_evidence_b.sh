#!/usr/bin/env bash
# Round-5 evidence chain, part B: relaunch of round5_evidence.sh steps
# [2/4] and [3/4], which died on FileNotFoundError — --resume hard-failed
# on a fresh checkpoint dir. Fixed via CheckpointManager.restore_latest
# (tolerant resume); [1/4] Mask R-CNN AP and [4/4] StarGAN roofline already
# completed and are committed.
# Usage: nohup bash scripts/round5_evidence_b.sh > /tmp/r5b.log 2>&1 &
set -uo pipefail
GAN="runs/convergence_gan"
mkdir -p "$GAN"

if [ ! -d "$GAN/data" ]; then
  echo "=== 16-id corpus ==="
  python - "$GAN" <<'EOF'
import sys
from vqvae2_tpu.data.persons import save_person_sysu
save_person_sysu(f"{sys.argv[1]}/data", n_ids=16, per_id=24)
print("corpus written", flush=True)
EOF
fi
if [ ! -d "$GAN/data32" ]; then
  echo "=== 32-id corpus (hardened idpres eval needs >=32 identities) ==="
  python - "$GAN" <<'EOF'
import sys
from vqvae2_tpu.data.persons import save_person_sysu
save_person_sysu(f"{sys.argv[1]}/data32", n_ids=32, per_id=24)
print("corpus written", flush=True)
EOF
fi

echo "=== [1/2] full-phase gray->IR, 1400 steps ($(date -u +%H:%M:%S)) ==="
python -m vqvae2_tpu.train.vqvae_deep_ir --path "$GAN/data" \
  --steps 1400 --stage_reconstruction 300 \
  --batch_size 4 --num_pos 4 --arch resnet18 --log_every 8 \
  --metrics_csv "$GAN/ir_loss_r5.csv" \
  --sample_dir "$GAN/ir_samples_r5" --sample_every 200 \
  --ckpt_dir "$GAN/ir_r5_ckpt" --save_every 200 --resume
echo "=== [1/2] exit $? ($(date -u +%H:%M:%S)) ==="

echo "=== [2/2] StarGAN-v2 2500 steps, 32 ids, multi-trial idpres ($(date -u +%H:%M:%S)) ==="
python -m vqvae2_tpu.train.stargan_bi --path "$GAN/data32" \
  --steps 2500 --batch_size 4 --num_pos 4 --arch resnet18 \
  --log_every 8 --metrics_csv "$GAN/gan_loss_r5.csv" \
  --sample_dir "$GAN/gan_samples_r5" --sample_every 250 \
  --eval_every 100 --map_csv "$GAN/gan_idpres_r5.csv" --idpres_trials 5 \
  --r1_weight 1.0 --adv_weight 0.5 --d_every "${D_EVERY:-2}" \
  --ckpt_dir "$GAN/gan_r5_ckpt" --save_every 250 --resume
echo "=== [2/2] exit $? ($(date -u +%H:%M:%S)) ==="

# End-of-round checklist (VERDICT r4 #10): stage this chain's own outputs
# and show what remains uncommitted. data32/ckpt dirs are gitignored.
git add -A "$GAN" 2>/dev/null
echo "=== git status after staging evidence outputs ==="
git status --short
echo "=== round5_evidence_b done ($(date -u +%H:%M:%S)) ==="
