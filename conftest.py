"""Test harness config: run every test on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated with
`--xla_force_host_platform_device_count=8` fake devices (real multi-chip TPU
hardware is exercised separately by the driver's dryrun and bench).
"""

import os

# force (not setdefault): the environment may pin JAX_PLATFORMS to a real
# accelerator (e.g. the axon TPU tunnel); tests must run on the fake mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# belt and braces: if a pytest plugin imported jax before this conftest ran,
# the env var alone is too late — force the platform through jax.config too
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
