"""Merge a re-run eval-only result into an existing evidence JSON.

The 50k-step training half of EVIDENCE_r{N}.json (wall time, steady
samples/s, extrapolation) comes from the original full run; an eval-only
re-run (tools/evidence_run.py with n_steps=0) refreshes the quality and
render-time half after renderer changes. This stitches the two honestly:
training fields kept, eval fields replaced.

Usage: python tools/merge_eval_into_evidence.py <evidence.json> <eval_only.json>
"""

import json
import sys


def main():
    evidence_path, eval_path = sys.argv[1], sys.argv[2]
    ev = json.load(open(evidence_path))
    ee = json.load(open(eval_path))
    for k in ("views", "psnr_mean", "ssim_mean", "render_mean_s", "lpips_mean", "lpips_note"):
        ev[k] = ee[k]
    ev["eval_note"] = (
        "eval re-run from the run's checkpoint after renderer improvements "
        "(multi-spp batched kernel); training metrics are the original run's"
    )
    json.dump(ev, open(evidence_path, "w"), indent=1)
    print(json.dumps({k: v for k, v in ev.items() if k != "views"}))


if __name__ == "__main__":
    main()
