"""Benchmark: steady-state training throughput of the full-size NGP on TPU.

Protocol (mirrors the reference training protocol, BASELINE.md): full
base.json model (hash T=2^19 L=16 F=2, 64-wide MLPs, SH4), target batch
2^18 samples/step, 16 steps per train() call, occupancy grid maintained
every call. The scene is the procedural nerf_synthetic-format dataset
(ngp_tpu/data/synthetic.py) since no real nerf_synthetic data ships here.

Headline metric: training samples/second (network-visited samples per
wall-clock second, the reference's measured_batch_size × steps / time),
measured at STEADY STATE: the converged-grid regime that covers all but the
first few percent of the 50k-step protocol (the early noisy-dense grid is a
transient). The converged state is cached as a /tmp snapshot so repeated
bench runs skip the convergence phase.
vs_baseline anchors against 1e8 samples/s — the tiny-cuda-nn-class
single-GPU training throughput implied by the Instant-NGP paper's
seconds-class lego training on an RTX 3090 (BASELINE.md's external anchor;
the reference repo itself publishes no numbers).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import tempfile
import time
from pathlib import Path

BASELINE_SAMPLES_PER_SEC = 1.0e8
_REPO = Path(__file__).resolve().parent
# Fallback sources for a stale-but-honest artifact when the TPU tunnel is
# down: the last successful run's record (gitignored, survives within a
# machine) and a committed copy (survives everything).
_STEADY_PATHS = (_REPO / ".evidence" / "last_steady.json", _REPO / "bench_steady.json")


def _provenance():
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "-C", str(_REPO), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        commit = None
    return {
        "commit": commit,
        "captured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }


def emit_stale(reason):
    """An outage must degrade the artifact, not erase it: emit the last
    recorded steady-state number marked stale, and exit 0 (VERDICT r3 #1)."""
    for cand in _STEADY_PATHS:
        try:
            doc = json.loads(cand.read_text())
        except Exception:
            continue
        doc.update({"stale": True, "stale_reason": reason, "stale_source": cand.name})
        print(f"# emitting STALE fallback from {cand}", file=sys.stderr)
        print(json.dumps(doc), flush=True)
        return
    print(json.dumps({
        "metric": "train_samples_per_sec", "value": None, "unit": "samples/s",
        "vs_baseline": None, "stale": True, "stale_reason": reason,
    }), flush=True)


def probe_device():
    """Probe the TPU tunnel BEFORE this process creates any JAX client.

    The probe subprocess does a full put+compute+readback round trip; it must
    run while the parent holds NO backend client — a second concurrent client
    through the axon tunnel can block on the first (ADVICE r3: the r03 bench
    init'd the parent first and every probe then hung for the full 20 min).
    Gate on the env platform pin, not jax.devices(): calling jax.devices()
    here would itself be the first (hangable) backend RPC.
    """
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # honor the CPU request for real: the axon sitecustomize overrides the
        # env pin at interpreter startup, so re-pin via jax.config (same
        # belt-and-braces as conftest.py / __graft_entry__.py)
        import jax

        jax.config.update("jax_platforms", "cpu")
        return
    import subprocess

    probe = (
        "import numpy as np, jax, jax.numpy as jnp;"
        "x = jax.device_put(np.ones((8,), np.float32));"
        "print(float(jnp.sum(x * 2)))"
    )
    patience = float(os.environ.get("NGP_BENCH_PATIENCE", "1200"))
    deadline = time.monotonic() + patience
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], timeout=120,
                capture_output=True, text=True,
            )
            if r.returncode == 0 and "16.0" in r.stdout:
                return
            note = (r.stderr or r.stdout).strip().splitlines()[-1:] or ["?"]
            print(f"# device probe failed: {note[0]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print("# device probe hung >120s (tunnel outage)", file=sys.stderr)
        if time.monotonic() > deadline:
            print(f"# TPU unreachable for {patience/60:.0f} min — emitting stale artifact", file=sys.stderr)
            emit_stale("tunnel outage: device probe exhausted patience")
            sys.exit(0)
        time.sleep(60)


def arm_global_watchdog():
    """If the tunnel dies MID-run an RPC can hang forever; bound the whole
    bench so the artifact degrades to stale instead of the driver timing out
    on nothing. SIGALRM-based: fires even while blocked in a JAX readback."""
    import signal

    budget = float(os.environ.get("NGP_BENCH_BUDGET", "5400"))

    def on_alarm(signum, frame):
        print(f"# bench exceeded {budget:.0f}s budget — emitting stale artifact", file=sys.stderr)
        emit_stale(f"bench exceeded {budget:.0f}s budget (mid-run hang or outage)")
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(int(budget))


def main():
    probe_device()  # before ANY parent JAX backend init
    arm_global_watchdog()

    import hashlib

    import jax
    import numpy as np

    from ngp_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()  # big warmup saver across bench runs

    from ngp_tpu.data.synthetic import write_synthetic_dataset
    from ngp_tpu.testbed import Testbed

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}", file=sys.stderr)

    # NGP_BENCH_SMOKE=1: tiny config + short phases, for exercising the bench
    # control flow (warmup/converge/cache/resume) on CPU. The reported number
    # is then NOT the benchmark — the driver runs without it.
    smoke = os.environ.get("NGP_BENCH_SMOKE") == "1"

    # dataset cached across bench runs (generation is numpy-only, ~seconds)
    cache = Path(tempfile.gettempdir()) / ("ngp_tpu_bench_scene_smoke" if smoke else "ngp_tpu_bench_scene_v1")
    train_json = cache / "transforms_train.json"
    if not train_json.exists():
        t0 = time.perf_counter()
        cache.mkdir(parents=True, exist_ok=True)
        w = 32 if smoke else 96
        write_synthetic_dataset(cache, n_train=4 if smoke else 12, n_test=1, width=w, height=w)
        print(f"# dataset gen: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    config_doc = {}  # full defaults == base.json
    if smoke:
        config_doc = {
            "samlper": {"aabb_scale": 1, "grid_size": 16, "maximum_marching_steps": 128},
            "network": {
                "encoding": {"n_levels": 4, "log2_hashmap_size": 12, "base_resolution": 8, "desired_resolution": 64},
                "network": {"n_neurons": 64, "n_hidden_layers": 1},
                "dir_encoding": {"degree": 4},
                "rgb_network": {"n_neurons": 64, "n_hidden_layers": 2},
            },
        }

    snap_path = cache / "warm_snapshot.msgpack"
    # /tmp is wiped on machine restarts; a second copy rides the (gitignored)
    # repo .evidence dir so a reboot doesn't cost the ~20 min converge phase
    persist_snap = Path(__file__).resolve().parent / ".evidence" / (
        "bench_warm_smoke.msgpack" if smoke else "bench_warm.msgpack"
    )
    tb = Testbed()
    resumed = False
    for cand in (snap_path, persist_snap):
        if resumed or not cand.exists():
            continue
        try:  # warm resume: skip straight to the converged-grid regime
            tb.load_snapshot(str(cand))
            resumed = True
            print(f"# resumed warm snapshot ({cand}) at step {tb.training_buffer.i_step}", file=sys.stderr)
        except Exception as e:  # stale schema etc. — fall back to fresh
            print(f"# warm snapshot {cand} unusable ({e}); starting fresh", file=sys.stderr)
            tb = Testbed()
    if not resumed:
        tb.load_model_config_dict(config_doc)
    if smoke:
        tb._trainer.sample_capacity = 1 << 13
    tb.load_training_data(train_json)

    target_batch = (1 << 12) if smoke else (1 << 18)

    seen_shapes = set()

    def warm_until_stable(limit_steps):
        """Train until the controller's UPCOMING shape tuple (peek_shape)
        matches the one the last call just used, twice in a row, AND no
        shape tuple NEW to this process has appeared for 4 consecutive
        calls — so a late controller flip inside the timed region reuses an
        already-compiled step instead of paying its jit there (a single
        leaked compile is ~10-30 s against ~3 s calls: round-2's timed
        region lost ~25% of its reported throughput to exactly that) — or
        until `limit_steps`. Comparing used-vs-used instead has an
        off-by-one that exits right as a switch is pending."""
        stable = 0
        no_new = 0
        t0 = time.perf_counter()
        first = tb.training_buffer.i_step + 64
        while tb.training_buffer.i_step < first or (
            (stable < 2 or no_new < 4) and tb.training_buffer.i_step < limit_steps
        ):
            tb.train(16, target_batch)
            lp = tb._loop
            stable = stable + 1 if lp.peek_shape(16) == lp._last_shape else 0
            no_new = no_new + 1 if lp._last_shape in seen_shapes else 0
            seen_shapes.add(lp._last_shape)
            print(
                f"#   warm step={tb.training_buffer.i_step} n_rays={lp.n_rays_per_batch} "
                f"cap={lp.capacity} win={lp.n_window} seg_cap={lp.n_seg_cap} stable={stable} "
                f"no_new={no_new} "
                f"measured={tb.training_buffer.measured_batch_size} t={time.perf_counter()-t0:.1f}s",
                file=sys.stderr,
            )

    # warmup A: grid bootstrap + controller settling + jit compiles
    warm_until_stable(tb.training_buffer.i_step + 256)

    # warmup B: grid convergence. The step-~300 state still has a noisy,
    # nearly-dense occupancy grid — a transient covering the first few percent
    # of the reference's 50k-step protocol (train_win.bat:9). STEADY-STATE
    # throughput, which this bench reports, is the converged-grid regime
    # (sparse occupancy, coarse premask engaged). Converge by training on,
    # then cache the state as a snapshot so reruns skip straight here.
    CONVERGE_STEPS = 192 if smoke else 8192
    BUDGET_S = 120.0 if smoke else 1200.0
    t0 = time.perf_counter()
    progressed = False
    while (
        tb.training_buffer.i_step < CONVERGE_STEPS
        and time.perf_counter() - t0 < BUDGET_S
    ):
        tb.train(16, target_batch)
        progressed = True
        if tb.training_buffer.i_step % 512 == 0:
            lp = tb._loop
            print(
                f"#   converge step={tb.training_buffer.i_step} win={lp.n_window} "
                f"seg_cap={lp.n_seg_cap} measured={tb.training_buffer.measured_batch_size} "
                f"t={time.perf_counter()-t0:.1f}s",
                file=sys.stderr,
            )
    if progressed:
        try:  # cache (atomically) for the next run — even a partial converge
            tmp_snap = snap_path.with_suffix(".tmp")
            tb.save_snapshot(str(tmp_snap), serialize_optimizer=True)
            persist_snap.parent.mkdir(parents=True, exist_ok=True)
            import shutil

            shutil.copyfile(tmp_snap, persist_snap)
            tmp_snap.replace(snap_path)
            print(f"# warm snapshot saved at step {tb.training_buffer.i_step}", file=sys.stderr)
        except Exception as e:
            print(f"# warm snapshot save failed: {e}", file=sys.stderr)
        # shapes may have shifted as the grid sparsified (premask engaging);
        # re-settle so the timed region measures, not compiles
        warm_until_stable(tb.training_buffer.i_step + 256)

    # timed region
    n_steps = 32 if smoke else 128
    start_step = tb.training_buffer.i_step
    samples = 0
    call_times = []
    t0 = time.perf_counter()
    while tb.training_buffer.i_step < start_step + n_steps:
        tc = time.perf_counter()
        tb.train(16, target_batch)
        call_times.append(time.perf_counter() - tc)
        samples += tb.training_buffer.measured_batch_size * 16
    elapsed = time.perf_counter() - t0
    print(
        "# timed calls (s): " + " ".join(f"{t:.2f}" for t in call_times),
        file=sys.stderr,
    )
    sps = samples / elapsed
    print(
        f"# {n_steps} steps in {elapsed:.2f}s -> {sps:.3e} samples/s "
        f"({n_steps/elapsed:.1f} steps/s), loss={tb.training_buffer.loss:.5f}",
        file=sys.stderr,
    )

    # ---- converged-grid render benchmark (sparse-scene FPS, tracked) ----
    # The short bench training above leaves a noisy, nearly-dense occupancy
    # grid (worst case for any empty-space skip). A CONVERGED run's grid is
    # the analytic one: cells whose ground-truth optical thickness crosses
    # the update threshold (grid/occupancy.update_occupancy semantics, fed
    # the GT field instead of network densities). Rendering the trained
    # model over that grid tracks the renderer's sparse-scene throughput —
    # the regime the reference's FPS-class eval lives in (run.py:169).
    render_stats = {}
    try:
        import jax.numpy as jnp

        from ngp_tpu.data.synthetic import field_sigma_rgb
        from ngp_tpu.grid.occupancy import update_occupancy

        cfgs = tb.config.sampler
        g = cfgs.grid_size
        ax = (np.arange(g, dtype=np.float32) + 0.5) / g - 0.5
        zz, yy, xx = np.meshgrid(ax, ax, ax, indexing="ij")  # linear: x fastest
        dens = []
        for c in range(cfgs.n_cascades):
            centers = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3) * float(1 << c) + 0.5
            sigma, _ = field_sigma_rgb(centers)
            dens.append(sigma * cfgs.min_cone_stepsize)
        grid = tb._state.grid._replace(density=jnp.asarray(np.concatenate(dens)))
        grid = update_occupancy(cfgs, grid)
        occ_frac = float(np.asarray(grid.occupancy[0]).mean())
        print(f"# converged grid: cascade-0 occ frac {occ_frac:.4f}", file=sys.stderr)

        ds = tb._dataset
        camera = np.asarray(ds.xforms[0], np.float32)
        res = 64 if smoke else 800
        fl = float(ds.focal_length[0]) * res / ds.images.shape[2]

        batch = tb._renderer.can_batch_spp()

        def frame_spp8():
            if batch:  # all 8 passes in one device program per tile
                return np.asarray(
                    tb._renderer.render_frame(
                        tb._state.ema_params, grid.occupancy, camera, (res, res),
                        (fl, fl), (0.5, 0.5), 0, occ_aabb=grid.occ_aabb, n_spp=8,
                    )
                )
            for s in range(8):
                out = np.asarray(
                    tb._renderer.render_frame(
                        tb._state.ema_params, grid.occupancy, camera, (res, res),
                        (fl, fl), (0.5, 0.5), s, occ_aabb=grid.occ_aabb,
                    )
                )
            return out

        frame_spp8()  # compile + warm
        t0 = time.perf_counter()
        frame_spp8()
        t_frame = time.perf_counter() - t0
        render_stats = {
            "render_res": res,
            "render_spp8_s": t_frame,
            "render_fps": 1.0 / t_frame,
        }
        print(f"# converged-grid render: {res}^2 spp-8 frame {t_frame:.2f}s", file=sys.stderr)

        # interactive preview: one spp-1 pass at reduced resolution — the
        # regime the reference's live testbed renders in (testbed.cu's
        # dynamic-res loop drops resolution to hold frame rate). Each timed
        # frame uses a DIFFERENT camera (small orbit steps) so per-(camera)
        # host caches and tile uploads are paid per frame, like a live
        # moving-camera testbed would (ADVICE r3: same-camera re-render
        # overstated interactive throughput).
        pres = 32 if smoke else 320
        pfl = float(ds.focal_length[0]) * pres / ds.images.shape[2]

        def orbit_camera(angle):
            c, s = np.cos(angle), np.sin(angle)
            rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
            cam = camera.copy()
            cam[:3, :3] = rot @ camera[:3, :3]
            cam[:3, 3] = rot @ (camera[:3, 3] - 0.5) + 0.5
            return cam

        def frame_preview(cam):
            return np.asarray(
                tb._renderer.render_frame(
                    tb._state.ema_params, grid.occupancy, cam, (pres, pres),
                    (pfl, pfl), (0.5, 0.5), 0, occ_aabb=grid.occ_aabb,
                )
            )

        frame_preview(orbit_camera(-0.01))  # compile + warm (its own camera)
        t0 = time.perf_counter()
        n_prev = 4
        for k in range(n_prev):
            frame_preview(orbit_camera(0.01 * (k + 1)))
        t_prev = (time.perf_counter() - t0) / n_prev
        render_stats["preview_res"] = pres
        render_stats["preview_spp1_fps"] = 1.0 / t_prev
        print(f"# preview render (moving camera): {pres}^2 spp-1 {1.0/t_prev:.1f} fps", file=sys.stderr)
    except Exception as e:  # the headline metric must survive a render failure
        print(f"# converged-grid render benchmark failed: {e}", file=sys.stderr)

    doc = {
        "metric": "train_samples_per_sec",
        "value": sps,
        "unit": "samples/s",
        "vs_baseline": sps / BASELINE_SAMPLES_PER_SEC,
        "steady_measured_at_step": int(start_step),
        **render_stats,
        **_provenance(),
        "config_sha": hashlib.sha256(
            json.dumps(config_doc, sort_keys=True).encode()
        ).hexdigest()[:16],
    }
    if not smoke:
        # record for the stale-fallback path (emit_stale) of future runs
        for cand in _STEADY_PATHS:
            try:
                cand.parent.mkdir(parents=True, exist_ok=True)
                cand.write_text(json.dumps(doc, indent=1))
            except Exception as e:
                print(f"# last_steady record to {cand} failed: {e}", file=sys.stderr)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
