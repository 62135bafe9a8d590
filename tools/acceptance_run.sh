#!/bin/bash
# The measured acceptance flow (VERDICT r1 #2): full 3-stage schedule on a
# 450-frame 1080x1080 synthetic subject at real fidelity -> infer ->
# errors.txt mask-IoU + Chamfer vs the built-in ground-truth mesh.
# Wall-clock per stage comes from the train log's per-epoch lines.
#
#   bash tools/acceptance_run.sh [DATA_ROOT] [N_FRAMES] [EPOCHS]
set -e -o pipefail
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/srtpu_accept}
FRAMES=${2:-450}
EPOCHS=${3:-}

# subject_done.json is written by make_synthetic_subject AFTER the frame loop
# (frames are written img-then-mask-then-normal, so "last img exists" does not
# imply completeness), and the generator itself re-renders everything when the
# parameter manifest differs from the previous run's.
if [ ! -f "$DATA/subject_done.json" ]; then
  echo "=== rendering synthetic subject ($FRAMES frames, 1080^2) ==="
  python -u -c "
from selfreconcode_tpu.data.synthetic_subject import make_synthetic_subject
make_synthetic_subject('$DATA', n_frames=$FRAMES, H=1080, W=1080)
"
fi

EXTRA=""
if [ -n "$EPOCHS" ]; then EXTRA="--max-epochs $EPOCHS"; fi
if [ -f "$DATA/rec/latest.pkl" ]; then
  # resume an interrupted run from its last epoch checkpoint
  EXTRA="$EXTRA --model $DATA/rec/latest.pkl"
fi

echo "=== training (full schedule) ==="
START=$(date +%s)
python -u train.py --conf configs/config.conf --data "$DATA" \
    --save-folder rec --synthetic-body $EXTRA 2>&1 | tee -a "$DATA/train.log" \
    | grep -E "epoch .* took|enable|initial|OVERFLOW|WARNING|cache|loss = " \
    | awk 'NR % 37 == 1 || !/loss = /'
TRAIN_S=$(( $(date +%s) - START ))
echo "TRAIN WALL-CLOCK: ${TRAIN_S}s"

echo "=== inference ==="
START=$(date +%s)
python -u infer.py --rec-root "$DATA/rec" --synthetic-body --nV \
    2>&1 | tail -5
INFER_S=$(( $(date +%s) - START ))
echo "INFER WALL-CLOCK: ${INFER_S}s"

echo "=== metrics ==="
tail -3 "$DATA/rec/errors.txt" || true
python tools/compare_meshes.py "$DATA/rec/tmp.ply" "$DATA/gt_mesh.npz"
echo "train=${TRAIN_S}s infer=${INFER_S}s"
