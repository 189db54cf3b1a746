#!/usr/bin/env bash
# Cross-modal ReID convergence run on the real TPU chip — learning evidence
# for the ReID half of the framework (the reference's raison d'être:
# train_reid.py on SYSU-MM01, validated by CMC/mAP every 4 epochs,
# /root/reference/train_reid.py:267-274).
#
# No SYSU data ships in this container, so the run trains on the procedural
# cross-modal person corpus (vqvae2_tpu/data/persons.py): identities defined
# by persistent geometry + appearance, an IR modality sharing geometry but
# replacing color with a thermal signature, and exact part-map supervision
# from the renderer.  Validation runs the full SYSU protocol (IR query ->
# single-shot RGB gallery) on HELD-OUT instances: chance mAP with N_IDS
# identities is ~1/N_IDS; a rising mAP curve means the embedding generalizes
# across modality and nuisance, not that pixels were memorized.
#
# Usage: nohup bash scripts/reid_convergence.sh [run_dir] > reid_run.log 2>&1 &
set -euo pipefail
RUN="${1:-runs/convergence_reid}"
N_IDS="${N_IDS:-16}"
PER_ID="${PER_ID:-24}"
STEPS="${STEPS:-600}"
mkdir -p "$RUN"

echo "=== corpus: $N_IDS identities x $PER_ID instances/modality (288x144) ==="
python - "$RUN" "$N_IDS" "$PER_ID" <<'EOF'
import sys
from vqvae2_tpu.data.persons import save_person_sysu, save_person_sysu_eval
run, n_ids, per_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
save_person_sysu(f"{run}/data", n_ids=n_ids, per_id=per_id)
save_person_sysu_eval(f"{run}/eval", n_ids=n_ids, per_id=4)
print("corpus written", flush=True)
EOF

echo "=== train reid (EmbedNet2 + part parsing, resnet50) ==="
python -m vqvae2_tpu.train.reid --path "$RUN/data" --eval_path "$RUN/eval" \
  --steps "$STEPS" --batch_size 6 --num_pos 4 --arch resnet50 \
  --eval_every 2 --eval_trials 1 --log_every 8 \
  --metrics_csv "$RUN/reid_loss.csv" --map_csv "$RUN/reid_map.csv" \
  --sample_dir "$RUN/part_samples" --sample_every 96 \
  --ckpt_dir "$RUN/ckpt"

echo "=== done: $RUN ==="
