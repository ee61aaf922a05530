"""Persistent XLA compile cache shared by every entry point.

First render/train compiles are tens of seconds each on the remote chip;
the reference amortizes them within one long-lived process (testbed.cu keeps
CUDA graphs resident). Here the cache also has to survive PROCESS AND
MACHINE restarts — evaluation drives many short CLI runs — so executables
persist on disk under the user cache dir (not /tmp, which reboots wipe).

Override with NGP_JAX_CACHE_DIR; empty value disables.
"""

import os
from pathlib import Path


def enable_persistent_compile_cache() -> None:
    import jax

    cache_dir = os.environ.get("NGP_JAX_CACHE_DIR")
    if cache_dir == "":
        return
    if cache_dir is None:
        cache_dir = str(Path.home() / ".cache" / "ngp_tpu_jax")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # cache is an optimization only
