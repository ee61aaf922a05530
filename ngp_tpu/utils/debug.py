"""Runtime checks / NaN debugging (SURVEY.md §5.2 aux subsystem).

The reference's only runtime guards are device asserts, a WTF printf on
out-of-bounds grid coords (occupancy_sampler.cu:245), and the hard failure
on zero-sample batches (testbed.cu:277-279, mirrored in train/trainer.py).
XLA forbids unsynchronized mutation, so the CUDA race class is gone by
construction; what remains useful on TPU:

 * `check_finite(tree, name)` — checkify-free finite check usable outside
   jit (fetches a single scalar per array).
 * `checked(fn)` — wrap a jitted fn with jax.experimental.checkify to
   surface NaN/OOB errors with location info (debug runs only; it disables
   some fusions).
 * `enable_nan_debugging()` — flips jax_debug_nans.
"""

import jax
import jax.numpy as jnp


def check_finite(tree, name: str = "tree"):
    """Raises with the offending leaf path if any array has a NaN/Inf."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    bad = []
    for path, leaf in leaves_with_paths:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def checked(fn):
    """checkify wrapper: returns (err, out); call err.throw() to surface."""
    from jax.experimental import checkify

    return checkify.checkify(fn, errors=checkify.float_checks | checkify.index_checks)


def enable_nan_debugging(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)
