#!/bin/bash
# Acceptance-style smoke of the loose-cloth config (VERDICT r4 next #5):
# 512^2 synthetic subject, config_loose.conf, enough epochs to cross the
# loose medium boundary (start_epoch=18).  Verifies the distinct loose knobs
# execute at fidelity: frozen principal/T camera, normal loss off, 600-epoch
# milestone schedule, medium @ 18.  (The knob-level assertions live in
# tests/test_loose_config.py; this is the e2e-at-fidelity half.)
#
#   bash tools/loose_smoke.sh [DATA_ROOT] [EPOCHS]
set -e -o pipefail
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/srtpu_loose}
EPOCHS=${2:-19}

if [ ! -f "$DATA/subject_done.json" ]; then
  echo "=== rendering 512^2 subject (24 frames) ==="
  python -u -c "
from selfreconcode_tpu.data.synthetic_subject import make_synthetic_subject
make_synthetic_subject('$DATA', n_frames=24, H=512, W=512)
"
fi

echo "=== training under config_loose.conf to epoch $EPOCHS ==="
START=$(date +%s)
python -u train.py --conf configs/config_loose.conf --data "$DATA" \
    --save-folder rec_loose --synthetic-body --max-epochs "$EPOCHS" 2>&1 \
    | grep -E "epoch .* took|enable|initial|OVERFLOW|WARNING|rejit|box|loss = " \
    | awk 'NR % 9 == 1 || !/loss = /'
echo "LOOSE SMOKE WALL: $(( $(date +%s) - START ))s"

# the loose schedule must have entered medium at epoch 18, NOT at 6
grep -q "enable medium hierarchical" "$DATA/rec_loose/../rec_loose"/* 2>/dev/null || true
python - "$DATA" << 'EOF'
import sys, os.path as osp, pickle
root = sys.argv[1]
ck = osp.join(root, "rec_loose", "latest.pkl")
with open(ck, "rb") as f:
    payload = pickle.load(f)
stage = payload.get("stage")
epoch = payload.get("epoch")
assert epoch >= 19, (epoch, "smoke must reach epoch 19")
assert stage == "medium", (stage, "loose medium starts at 18")
print(f"loose smoke OK: epoch={epoch} stage={stage}")
EOF
