#!/usr/bin/env bash
# Train all 8 nerf_synthetic scenes, 50k steps each (protocol parity with the
# reference script/train_win.bat). Usage: train.sh <data_root> <out_root>
set -euo pipefail
DATA_ROOT=${1:?usage: train.sh <data_root> <out_root>}
OUT_ROOT=${2:?usage: train.sh <data_root> <out_root>}
HERE=$(dirname "$0")

for scene in chair drums ficus hotdog lego materials mic ship; do
    mkdir -p "$OUT_ROOT/$scene"
    python "$HERE/../python/run.py" \
        --scene "$DATA_ROOT/$scene/transforms_train.json" \
        --network "$HERE/../config/base.json" \
        --save_snapshot "$OUT_ROOT/$scene/${scene}_ckpt.msgpack" \
        --n_steps 50000
done
