#!/usr/bin/env bash
# Run the 8-scene batch protocol end-to-end on the procedural per-scene
# variants (no real nerf_synthetic data ships here): train.sh -> eval.sh ->
# collect_8scenes.py. Steps default short (NGP_N_STEPS) so the sweep fits in
# single-chip wall clock; the full 50k protocol is exercised separately on
# the flagship scene (tools/evidence_run.py).
# Usage: tools/run_8scenes.sh [data_root] [out_root] [n_steps]
set -euo pipefail
DATA_ROOT=${1:-/root/repo/.evidence/scenes8}
OUT_ROOT=${2:-/root/repo/.evidence/out8}
N_STEPS=${3:-2000}
HERE=$(cd "$(dirname "$0")" && pwd)
cd "$HERE/.."

for scene in chair drums ficus hotdog lego materials mic ship; do
  test -f "$DATA_ROOT/$scene/transforms_train.json" || {
    echo "missing dataset: $DATA_ROOT/$scene" >&2; exit 1; }
done

NGP_N_STEPS=$N_STEPS experiment/nerf_synthetic/script/train.sh "$DATA_ROOT" "$OUT_ROOT"
experiment/nerf_synthetic/script/eval.sh "$DATA_ROOT" "$OUT_ROOT"
python tools/collect_8scenes.py "$OUT_ROOT" EVIDENCE_8SCENES.json
