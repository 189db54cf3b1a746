#!/usr/bin/env bash
# Round-5 evidence chain (VERDICT r4 "next round" #1, #4, #5, #7):
#
#   1. Mask R-CNN AP-rises rerun after the zero-AP fix (GT-RoI injection +
#      balanced RoI CE, commit afb7260) — the quality-metric counterpart of
#      the loss-falls run, matching the reference's per-epoch evaluate
#      (/root/reference/vision/engine.py:71-109, fashion.py:88-108).
#   2. Full-phase staged gray->IR run, 1400 steps, checkpointed under the
#      run dir (ADVICE r4: /tmp does not survive reboots) so --resume
#      recovers from a tunnel outage instead of restarting.
#   3. StarGAN-v2 bidirectional run to 2500 steps on a 32-identity corpus,
#      checkpointed, with the hardened multi-trial identity-preservation
#      eval (--idpres_trials 5; round 4's single 16-probe draw carried
#      ~±0.1 noise — the entire claimed signal).
#   4. StarGAN step roofline (scripts/mfu_profile.py --stargan) — the last
#      unprofiled trainer (831 ms/step in the heavy-check table).
#
# Serial on purpose: one chip, one trainer graph's HBM at a time.
# Usage: nohup bash scripts/round5_evidence.sh > /tmp/r5.log 2>&1 &
set -uo pipefail
GAN="runs/convergence_gan"
DET="runs/convergence_det"
REID="runs/convergence_reid"
mkdir -p "$GAN" "$DET" "$REID"

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
if [ ! -d "$DET/data256" ]; then
  echo "=== synthetic COCO corpus (256px, masks) ==="
  python - "$DET" <<'EOF'
import sys
from vqvae2_tpu.detection.data import make_synthetic_coco
img_dir, ann = make_synthetic_coco(f"{sys.argv[1]}/data256", n=64, size=256,
                                   with_masks=True)
print("maskrcnn corpus:", img_dir, ann, flush=True)
EOF
fi

echo "=== [1/4] Mask R-CNN AP rerun ($(date -u +%H:%M:%S)) ==="
python -m vqvae2_tpu.train.maskrcnn \
  --img_dir "$DET/data256/images" --ann_file "$DET/data256/annotations.json" \
  --steps 600 --batch_size 4 --log_every 20 --max_boxes 8 \
  --eval_every 100 --map_csv "$DET/maskrcnn_ap_r5.csv" \
  --metrics_csv "$DET/maskrcnn_loss_r5.csv"
echo "=== [1/4] exit $? ($(date -u +%H:%M:%S)) ==="

echo "=== [2/4] full-phase gray->IR, 1400 steps ($(date -u +%H:%M:%S)) ==="
python -m vqvae2_tpu.train.vqvae_deep_ir --path "$GAN/data" \
  --steps 1400 --stage_reconstruction 300 \
  --batch_size 4 --num_pos 4 --arch resnet18 --log_every 8 \
  --metrics_csv "$GAN/ir_loss_r5.csv" \
  --sample_dir "$GAN/ir_samples_r5" --sample_every 200 \
  --ckpt_dir "$GAN/ir_r5_ckpt" --save_every 200 --resume
echo "=== [2/4] exit $? ($(date -u +%H:%M:%S)) ==="

echo "=== [3/4] StarGAN-v2 2500 steps, 32 ids, multi-trial idpres ($(date -u +%H:%M:%S)) ==="
python -m vqvae2_tpu.train.stargan_bi --path "$GAN/data32" \
  --steps 2500 --batch_size 4 --num_pos 4 --arch resnet18 \
  --log_every 8 --metrics_csv "$GAN/gan_loss_r5.csv" \
  --sample_dir "$GAN/gan_samples_r5" --sample_every 250 \
  --eval_every 100 --map_csv "$GAN/gan_idpres_r5.csv" --idpres_trials 5 \
  --r1_weight 1.0 --adv_weight 0.5 --d_every "${D_EVERY:-2}" \
  --ckpt_dir "$GAN/gan_r5_ckpt" --save_every 250 --resume
echo "=== [3/4] exit $? ($(date -u +%H:%M:%S)) ==="

echo "=== [4/4] StarGAN step roofline ($(date -u +%H:%M:%S)) ==="
python scripts/mfu_profile.py --stargan | tee "$GAN/stargan_roofline_r5.txt"
echo "=== [4/4] exit $? ($(date -u +%H:%M:%S)) ==="

# End-of-round checklist (VERDICT r4 #10: the last two rounds ended dirty) —
# stage this chain's own outputs and show what remains uncommitted.
git add -A "$DET" "$GAN" "$REID" 2>/dev/null
echo "=== git status after staging evidence outputs ==="
git status --short
echo "=== round5_evidence done ($(date -u +%H:%M:%S)) ==="
