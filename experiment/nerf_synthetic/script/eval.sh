#!/usr/bin/env bash
# Evaluate all 8 scenes on their test splits (protocol parity with the
# reference script/eval_win.bat). Usage: eval.sh <data_root> <out_root>
set -euo pipefail
DATA_ROOT=${1:?usage: eval.sh <data_root> <out_root>}
OUT_ROOT=${2:?usage: eval.sh <data_root> <out_root>}
HERE=$(dirname "$0")

for scene in chair drums ficus hotdog lego materials mic ship; do
    # --nerf_compatibility: exactly eval_win.bat:12-16
    python "$HERE/../python/run.py" \
        --load_snapshot "$OUT_ROOT/$scene/${scene}_ckpt.msgpack" \
        --nerf_compatibility \
        --test_transforms "$DATA_ROOT/$scene/transforms_test.json" \
        --n_steps 0
done
