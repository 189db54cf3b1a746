#!/usr/bin/env bash
# Detection-family AP-rises evidence (VERDICT r3 missing #2): train SSD and
# Mask R-CNN on a synthetic COCO corpus and log COCO AP every eval_every
# steps — the quality-metric counterpart of the loss-falls overfit tests,
# matching the reference's per-epoch evaluate loop
# (/root/reference/vision/engine.py:71-109, fashion.py:88-108).
#
# No COCO/ModaNet data ships in this container, so both runs use the
# procedural COCO-format corpus (vqvae2_tpu/detection/data.py) and evaluate
# on it: the deliverable is bbox/mask AP climbing from ~0 as the models fit
# the corpus, CSV-logged for the committed evidence directory.
#
# Usage: nohup bash scripts/detection_ap_run.sh [run_dir] > det_ap.log 2>&1 &
set -euo pipefail
RUN="${1:-runs/convergence_det}"
N_IMGS="${N_IMGS:-64}"
STEPS_SSD="${STEPS_SSD:-600}"
STEPS_MRCNN="${STEPS_MRCNN:-400}"
mkdir -p "$RUN"

if [ ! -d "$RUN/data300" ] || [ ! -d "$RUN/data256" ]; then
  echo "=== corpus: $N_IMGS synthetic COCO images ==="
  python - "$RUN" "$N_IMGS" <<'EOF'
import sys
from vqvae2_tpu.detection.data import make_synthetic_coco
run, n = sys.argv[1], int(sys.argv[2])
img_dir, ann = make_synthetic_coco(f"{run}/data300", n=n, size=300,
                                   with_masks=False)
print("ssd corpus:", img_dir, ann, flush=True)
img_dir, ann = make_synthetic_coco(f"{run}/data256", n=n, size=256,
                                   with_masks=True)
print("maskrcnn corpus:", img_dir, ann, flush=True)
EOF
fi

echo "=== SSD300 (train/detection.py) ==="
python -m vqvae2_tpu.train.detection \
  --img_dir "$RUN/data300/images" --ann_file "$RUN/data300/annotations.json" \
  --steps "$STEPS_SSD" --batch_size 8 --log_every 20 \
  --eval_every 100 --map_csv "$RUN/ssd_ap.csv" \
  --metrics_csv "$RUN/ssd_loss.csv"

echo "=== Mask R-CNN (train/maskrcnn.py) ==="
python -m vqvae2_tpu.train.maskrcnn \
  --img_dir "$RUN/data256/images" --ann_file "$RUN/data256/annotations.json" \
  --steps "$STEPS_MRCNN" --batch_size 4 --log_every 20 \
  --eval_every 100 --map_csv "$RUN/maskrcnn_ap.csv" \
  --metrics_csv "$RUN/maskrcnn_loss.csv"

echo "=== done: $RUN ==="
