#!/usr/bin/env bash
# Train all 8 nerf_synthetic scenes, 50k steps each (protocol parity with the
# reference script/train_win.bat). Usage: train.sh <data_root> <out_root>
set -euo pipefail
DATA_ROOT=${1:?usage: train.sh <data_root> <out_root>}
OUT_ROOT=${2:?usage: train.sh <data_root> <out_root>}
HERE=$(dirname "$0")
# protocol default 50k steps (train_win.bat:9); NGP_N_STEPS overrides for
# short smoke runs of the full 8-scene pipeline
N_STEPS=${NGP_N_STEPS:-50000}
# NGP_NETWORK overrides the model config (smoke runs use a tiny net)
NETWORK=${NGP_NETWORK:-$HERE/../config/base.json}

for scene in chair drums ficus hotdog lego materials mic ship; do
    mkdir -p "$OUT_ROOT/$scene"
    # --nerf_compatibility + inline eval: exactly train_win.bat:13-21
    python "$HERE/../python/run.py" \
        --scene "$DATA_ROOT/$scene/transforms_train.json" \
        --network "$NETWORK" \
        --save_snapshot "$OUT_ROOT/$scene/${scene}_ckpt.msgpack" \
        --nerf_compatibility \
        --test_transforms "$DATA_ROOT/$scene/transforms_test.json" \
        --n_steps "$N_STEPS"
done
