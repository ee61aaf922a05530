"""mb13: is the network itself slower inside a lax.while_loop?

Runs the packed-params NGP forward on a fixed _BUDGET batch (a) once per jit
call, (b) N times inside a while_loop (fresh positions derived per round so
nothing is hoisted), (c) N times inside the while_loop WITH the renderer's
compaction/t_idx-gather glue around it. Separates while_loop scheduling cost
from composite glue. Run: python tools/mb13_netloop.py
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np

def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    from ngp_tpu.models.ngp import NGPModel
    from ngp_tpu.utils.config import NGPConfig

    config = NGPConfig.from_json({})
    model = NGPModel.create(config.network)
    params = model.init(jax.random.PRNGKey(0))
    prep = jax.jit(model.prepare_inference)(params)
    sync(prep["hash_packed"])
    B = 1 << 17
    N = 20
    pos = jax.random.uniform(jax.random.PRNGKey(1), (B, 3))
    dirs = jax.random.uniform(jax.random.PRNGKey(2), (B, 3))

    @jax.jit
    def once(prep, pos, dirs):
        rgb, sig = model.rgbsigma_raw(prep, pos, dirs)
        return rgb.sum() + sig.sum()

    @jax.jit
    def loop(prep, pos, dirs):
        def body(c):
            i, acc = c
            p = jnp.mod(pos + i.astype(jnp.float32) * 0.001, 1.0)
            rgb, sig = model.rgbsigma_raw(prep, p, dirs)
            return i + 1, acc + rgb.sum() + sig.sum()
        _, acc = jax.lax.while_loop(lambda c: c[0] < N, body, (jnp.int32(0), jnp.float32(0)))
        return acc

    @jax.jit
    def loop_glue(prep, pos, dirs):
        # renderer-like glue: alive mask, compaction, gathers, scatter-adds
        R = 1 << 16
        D = 16
        A = B // D
        t_idx = jnp.tile(jnp.arange(640, dtype=jnp.int32)[None], (R, 1)).reshape(-1)
        counts = jnp.full((R,), 640, jnp.int32)
        def body(c):
            i, cursor, acc_r, alive = c
            order = jnp.cumsum(alive.astype(jnp.int32)) - 1
            sel = jnp.zeros((R,), jnp.int32).at[jnp.where(alive, order, R)].set(
                jnp.arange(R, dtype=jnp.int32), mode="drop")[:A]
            cur = cursor[sel]
            j = jnp.arange(D, dtype=jnp.int32)[None, :]
            flat = sel[:, None] * 640 + jnp.minimum(cur[:, None] + j, 639)
            lat = t_idx[flat.reshape(-1)].reshape(A, D)
            p = jnp.mod(pos.reshape(A, D, 3) + lat[..., None].astype(jnp.float32) * 1e-4, 1.0).reshape(-1, 3)
            rgb, sig = model.rgbsigma_raw(prep, p, dirs)
            sg = sig.reshape(A, D)
            add = sg.sum(1)
            acc_r = acc_r.at[sel].add(add, mode="drop")
            cursor = cursor.at[sel].add(D, mode="drop")
            done = (cur + D) >= counts[sel]
            alive = alive.at[jnp.where(done, sel, R)].set(False, mode="drop")
            return i + 1, cursor, acc_r, alive
        i, cursor, acc_r, alive = jax.lax.while_loop(
            lambda c: (c[0] < N), body,
            (jnp.int32(0), jnp.zeros((R,), jnp.int32), jnp.zeros((R,), jnp.float32),
             jnp.ones((R,), bool)))
        return acc_r.sum()

    def timeit(name, f, reps=4):
        f(); f()
        t0 = time.perf_counter()
        for _ in range(reps):
            f()
        dtms = (time.perf_counter() - t0) / reps * 1e3 - 26.6
        print(f"{name:44s} {dtms:8.1f} ms", flush=True)
        return dtms

    t1 = timeit("net once (B=2^17)", lambda: sync(once(prep, pos, dirs)))
    tN = timeit(f"net x{N} in while_loop", lambda: sync(loop(prep, pos, dirs)))
    tG = timeit(f"net x{N} in while_loop + glue", lambda: sync(loop_glue(prep, pos, dirs)))
    print(f"# per-round: isolated {t1:.1f}  in-loop {tN/N:.1f}  in-loop+glue {tG/N:.1f} ms")

if __name__ == "__main__":
    main()
