"""Integration: the run.py CLI driver end-to-end (train -> snapshot -> eval)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

TINY_CONFIG = {
    "samlper": {"aabb_scale": 1, "grid_size": 16, "maximum_marching_steps": 128},
    "network": {
        "encoding": {"n_levels": 4, "log2_hashmap_size": 12, "base_resolution": 8, "desired_resolution": 64},
        "network": {"n_neurons": 64, "n_hidden_layers": 1},
        "dir_encoding": {"degree": 4},
        "rgb_network": {"n_neurons": 64, "n_hidden_layers": 2},
    },
    "loss": "SmoothL1",
}


@pytest.mark.parametrize("nerf_compat", [False, True])
def test_run_cli_train_and_eval(tmp_path, nerf_compat):
    from ngp_tpu.data.synthetic import write_synthetic_dataset

    train_json, test_json = write_synthetic_dataset(tmp_path / "scene", n_train=4, n_test=1, width=32, height=32)
    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps(TINY_CONFIG))
    snap = tmp_path / "out" / "ckpt.msgpack"
    snap.parent.mkdir()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["NGP_TPU_TEST_FAST"] = "1"
    # an accelerator-plugin sitecustomize on the inherited PYTHONPATH can
    # override the env pin via jax.config at child startup (the exact failure
    # mode __graft_entry__.dryrun_multichip guards against) — and a CLI child
    # on the real chip would contend with any concurrently running bench;
    # remove the plugin trigger so the child really runs on CPU
    env.pop("PALLAS_AXON_POOL_IPS", None)

    run_py = REPO / "experiment" / "nerf_synthetic" / "python" / "run.py"
    cmd = [
        sys.executable,
        str(run_py),
        "--scene",
        str(train_json),
        "--network",
        str(cfg_path),
        "--save_snapshot",
        str(snap),
        "--n_steps",
        "32",
        "--test_transforms",
        str(test_json),
    ]
    if nerf_compat:
        cmd.append("--nerf_compatibility")
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=1500)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert snap.exists()
    assert (snap.parent / "train_timing.txt").exists()
    assert (snap.parent / "eval_stat.xls").exists()
    assert "PSNR=" in out.stdout
    # rendered artifacts written
    assert any((snap.parent / "image").iterdir())
    assert any((snap.parent / "depth").iterdir())
