"""Low-discrepancy (shuffled scrambled Sobol) sampling, vectorized in jnp.

Rebuild of the Burley [2019] shuffled-scrambled-Sobol sampler the reference
uses for per-spp pixel jitter and ray-advance jitter
(internal/utils/random_val.cuh:140-278). The Sobol direction numbers are the
standard published constants from that paper (first 2 dims = van der Corput /
Sobol dim 2); the permutation is Laine-Karras.

Used for:
 * ld_random_pixel_offset  (random_val.cuh:273-278) — per-spp pixel jitter
 * ld_random_val           (random_val.cuh:266-271) — per-ray march jitter
"""

import numpy as np
import jax.numpy as jnp

# dim 0: van der Corput (bit-reversal); dim 1: standard Sobol dim-2 matrices.
_DIRECTIONS_DIM1 = np.array([0x80000000 >> i for i in range(32)], dtype=np.uint32)


def _sobol_dim2_directions():
    # Sobol dimension 2: recurrence with primitive polynomial x^2+x+1, m=[1,3].
    v = np.zeros(32, dtype=np.uint64)
    v[0] = 1 << 31
    v[1] = 3 << 30
    for i in range(2, 32):
        v[i] = v[i - 2] ^ (v[i - 2] >> 2) ^ v[i - 1]  # s=2, a=1 recurrence
    return v.astype(np.uint32)


_DIRECTIONS = np.stack([_DIRECTIONS_DIM1, _sobol_dim2_directions()])


def sobol(index, dim: int):
    """Sobol sample `index` along dimension dim (0 or 1), as uint32."""
    index = jnp.asarray(index, jnp.uint32)
    dirs = jnp.asarray(_DIRECTIONS[dim])
    bits = (index[..., None] >> jnp.arange(32, dtype=jnp.uint32)) & jnp.uint32(1)
    return _xor_reduce(bits * dirs)


def _xor_reduce(x):
    # jnp has no ufunc.reduce; fold over the last axis in log2 steps.
    n = x.shape[-1]
    while n > 1:
        half = n // 2
        x = x[..., :half] ^ x[..., half : 2 * half]
        n = half
    return x[..., 0]


def reverse_bits(x):
    x = jnp.asarray(x, jnp.uint32)
    x = ((x & jnp.uint32(0xAAAAAAAA)) >> 1) | ((x & jnp.uint32(0x55555555)) << 1)
    x = ((x & jnp.uint32(0xCCCCCCCC)) >> 2) | ((x & jnp.uint32(0x33333333)) << 2)
    x = ((x & jnp.uint32(0xF0F0F0F0)) >> 4) | ((x & jnp.uint32(0x0F0F0F0F)) << 4)
    x = ((x & jnp.uint32(0xFF00FF00)) >> 8) | ((x & jnp.uint32(0x00FF00FF)) << 8)
    return (x >> 16) | (x << 16)


def _laine_karras(x, seed):
    x = x + seed
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return x


def nested_uniform_scramble(x, seed):
    return reverse_bits(_laine_karras(reverse_bits(jnp.asarray(x, jnp.uint32)), jnp.uint32(seed)))


def _hash_combine(seed, v):
    seed = jnp.uint32(seed)
    return seed ^ (jnp.uint32(v) + (seed << 6) + (seed >> 2))


_U32_SCALE = float(1.0 / (1 << 32))


def ld_random_val(index, seed, dim: int = 0):
    """Scalar (or batched) low-discrepancy value in [0,1)."""
    index = nested_uniform_scramble(index, seed)
    return nested_uniform_scramble(sobol(index, dim), _hash_combine(seed, dim)).astype(jnp.float32) * _U32_SCALE


def ld_random_val_2d(index, seed):
    index = nested_uniform_scramble(index, seed)
    vals = [
        nested_uniform_scramble(sobol(index, d), _hash_combine(seed, d)).astype(jnp.float32) * _U32_SCALE
        for d in (0, 1)
    ]
    return jnp.stack(vals, axis=-1)


# ---------------------------------------------------------------------------
# Direction sampling (random_val.cuh:30-135 parity: cylindrical / cosine-
# hemisphere / Fibonacci-lattice / uniform-disc sampling)

_GOLDEN_RATIO = 1.6180339887498948


def cylindrical_to_dir(p):
    """(..., 2) in [0,1]^2 -> unit direction (random_val.cuh:30-39)."""
    import numpy as _np

    cos_theta = -2.0 * p[..., 0] + 1.0
    phi = 2.0 * _np.pi * (p[..., 1] - 0.5)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    return jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1)


def dir_to_cylindrical(d):
    """Inverse of cylindrical_to_dir (random_val.cuh:41-45)."""
    import numpy as _np

    cos_theta = jnp.clip(-d[..., 2], -1.0, 1.0)
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    return jnp.stack([(cos_theta + 1.0) / 2.0, phi / (2.0 * _np.pi) + 0.5], axis=-1)


def cosine_hemisphere(u):
    """(..., 2) uniforms -> cosine-weighted hemisphere dir (cuh:113-127)."""
    import numpy as _np

    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * _np.pi * u[..., 1]
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    return jnp.stack([x, y, z], axis=-1)


def fibonacci_dir(i, n_dirs: int, offset):
    """Fibonacci-lattice direction i of n_dirs with 2-d offset (cuh:64-82)."""
    if n_dirs >= 11000:
        eps = 27.0
    elif n_dirs >= 890:
        eps = 10.0
    elif n_dirs >= 177:
        eps = 3.33
    elif n_dirs >= 24:
        eps = 1.33
    else:
        eps = 0.33
    i = jnp.asarray(i, jnp.float32)
    u = (i + eps) / (n_dirs - 1 + 2 * eps) + offset[..., 0]
    v = i / _GOLDEN_RATIO + offset[..., 1]
    p = jnp.stack([u - jnp.floor(u), v - jnp.floor(v)], axis=-1)
    return cylindrical_to_dir(p)


def random_uniform_disc(u):
    """(..., 2) uniforms -> point on the unit disc (cuh:85-92)."""
    import numpy as _np

    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * _np.pi * u[..., 1]
    return jnp.stack([r * jnp.sin(phi), r * jnp.cos(phi)], axis=-1)


def ld_random_pixel_offset(spp):
    """Per-spp sub-pixel jitter in [0,1)^2, constant across pixels.

    fract(0.5 - ld2(0) + ld2(spp)); spp=0 gives exactly 0.5 (pixel centers).
    Reference: random_val.cuh:273-278.
    """
    base = ld_random_val_2d(jnp.uint32(0), 0xDEADBEEF)
    cur = ld_random_val_2d(jnp.asarray(spp, jnp.uint32), 0xDEADBEEF)
    off = 0.5 - base + cur
    return off - jnp.floor(off)
