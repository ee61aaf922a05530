"""Generate the 8-scene procedural data root for the batch scripts.

No nerf_synthetic data ships in this zero-egress environment, so the
8-scene protocol (reference train_win.bat:11-21) runs over per-name
procedural variants instead: each scene is a deterministic blob set seeded
from its name (data/synthetic.scene_blobs), written in the exact
transforms_*.json + PNG layout the loader consumes.

Usage: python tools/make_8scenes.py <data_root> [width=96] [n_train=16] [n_test=4]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SCENES = ("chair", "drums", "ficus", "hotdog", "lego", "materials", "mic", "ship")


def main():
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ngp_8scenes")
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    n_train = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    n_test = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    from ngp_tpu.data.synthetic import write_synthetic_dataset

    for scene in SCENES:
        out = root / scene
        if (out / "transforms_train.json").exists():
            print(f"{scene}: exists, skipping")
            continue
        t0 = time.perf_counter()
        out.mkdir(parents=True, exist_ok=True)
        write_synthetic_dataset(
            out, n_train=n_train, n_test=n_test, width=width, height=width, scene=scene
        )
        print(f"{scene}: {n_train}+{n_test} x {width}^2 in {time.perf_counter()-t0:.1f}s")
    print(root)


if __name__ == "__main__":
    main()
