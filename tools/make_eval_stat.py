"""Convert an EVIDENCE_r*.json into the reference protocol's eval_stat.xls.

The reference eval driver writes per-view PSNR/SSIM/LPIPS/render-time plus a
mean row to `eval_stat.xls` (reference run.py:168; repo run.py does the same
for real dataset evals). The long-protocol evidence runs (tools/evidence_run.py)
record the identical per-view table in their JSON artifact; this tool emits the
xls-named artifact from it so the 50k-step protocol output is file-complete.

Usage: python tools/make_eval_stat.py EVIDENCE_r3.json [out_dir]
"""

import json
import sys
from pathlib import Path

import numpy as np


def main():
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "EVIDENCE_r3.json")
    out_dir = Path(sys.argv[2]) if len(sys.argv) > 2 else src.parent
    doc = json.loads(src.read_text())
    views = doc["views"]
    rows = [
        (f"view_{v['view']:03d}", v["psnr"], v["ssim"], float("nan"), v["render_s"])
        for v in views
    ]
    rows.append(
        (
            "mean",
            float(np.mean([v["psnr"] for v in views])),
            float(np.mean([v["ssim"] for v in views])),
            float("nan"),  # LPIPS leg environment-blocked (see the JSON note)
            float(np.mean([v["render_s"] for v in views])),
        )
    )
    cols = {
        "": [r[0] for r in rows],
        "PSNR": [r[1] for r in rows],
        "SSIM": [r[2] for r in rows],
        "LPIPS": [r[3] for r in rows],
        "Time (s)": [r[4] for r in rows],
    }
    stat_path = out_dir / "eval_stat.xls"
    try:
        import pandas as pd

        try:
            pd.DataFrame(cols).to_excel(stat_path, index=False)
        except Exception:
            pd.DataFrame(cols).to_csv(stat_path, sep="\t", index=False)
    except ImportError:
        with open(stat_path, "w") as f:
            f.write("\tPSNR\tSSIM\tLPIPS\tTime (s)\n")
            for r in rows:
                f.write("\t".join(str(v) for v in r) + "\n")
    print(stat_path)


if __name__ == "__main__":
    main()
