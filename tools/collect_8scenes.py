"""Merge the per-scene eval_stat tables from the 8-scene batch protocol into
one json artifact (EVIDENCE_8SCENES.json).

Reads <out_root>/<scene>/eval_stat.xls — pandas to_excel output, or the
plain-TSV fallback this environment produces (no xlwt offline) — and the
per-scene train_timing.txt.

Usage: python tools/collect_8scenes.py <out_root> [out_json]
"""

import json
import sys
from pathlib import Path

SCENES = ("chair", "drums", "ficus", "hotdog", "lego", "materials", "mic", "ship")


def read_eval_stat(path: Path) -> dict:
    try:
        import pandas as pd

        df = pd.read_excel(path)
    except Exception:
        rows = [ln.split("\t") for ln in path.read_text().strip().splitlines()]
        head, body = rows[0], rows[1:]
        mean = next((r for r in body if r and r[0] == "mean"), None)
        if mean is None:
            return {}
        return {
            "psnr": float(mean[1]),
            "ssim": float(mean[2]),
            "lpips": float(mean[3]) if len(mean) > 3 and mean[3] else None,
            "n_views": sum(1 for r in body if r and r[0] != "mean"),
        }
    mean = df[df.iloc[:, 0] == "mean"]
    return {
        "psnr": float(mean["PSNR"].iloc[0]),
        "ssim": float(mean["SSIM"].iloc[0]),
        "lpips": None,
        "n_views": int((df.iloc[:, 0] != "mean").sum()),
    }


def main():
    out_root = Path(sys.argv[1])
    out_json = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("EVIDENCE_8SCENES.json")
    scenes = {}
    for scene in SCENES:
        stat = out_root / scene / "eval_stat.xls"
        if not stat.exists():
            scenes[scene] = {"error": "missing eval_stat"}
            continue
        row = read_eval_stat(stat)
        timing = out_root / scene / "train_timing.txt"
        if timing.exists():
            row["train_timing"] = timing.read_text().strip()
        scenes[scene] = row
    ok = [s for s in scenes.values() if "psnr" in s]
    result = {
        "scenes": scenes,
        "psnr_mean": sum(s["psnr"] for s in ok) / len(ok) if ok else None,
        "ssim_mean": sum(s["ssim"] for s in ok) / len(ok) if ok else None,
        "n_scenes_ok": len(ok),
        "lpips_note": "environment-blocked: no lpips package/VGG weights offline",
    }
    # provenance (VERDICT r3 #7): same stamp as the other evidence artifacts
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from evidence_run import _provenance

    result.update(_provenance())
    out_json.write_text(json.dumps(result, indent=1))
    print(json.dumps({k: v for k, v in result.items() if k != "scenes"}))
    for name, s in scenes.items():
        print(f"  {name:10s} " + (f"PSNR {s['psnr']:.2f}  SSIM {s['ssim']:.3f}" if "psnr" in s else str(s)))


if __name__ == "__main__":
    main()
