"""Counter-based random number generation.

Replaces the reference's fract-sin hash (ref: src/shader/util/random.glsl:1-17),
whose quality is poor and whose seeding is frame-time-dependent, with JAX's
counter-based threefry PRNG: every (pixel, sample, bounce, purpose) tuple maps
deterministically to a key, so renders are reproducible bit-for-bit for a
given seed regardless of execution order, device count, or sharding layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def trace_key(seed, sample_idx) -> jax.Array:
    """Key for one progressive sample pass. `seed` is an int or a PRNG key."""
    if isinstance(seed, jax.Array) and (
        jnp.issubdtype(seed.dtype, jax.dtypes.prng_key) or seed.dtype == jnp.uint32
    ):
        key = seed
    else:
        key = jax.random.PRNGKey(seed)
    return jax.random.fold_in(key, sample_idx)


def bounce_key(key: jax.Array, bounce) -> jax.Array:
    return jax.random.fold_in(key, bounce)


def uniform(key: jax.Array, shape, tag: int) -> jax.Array:
    """Uniform [0,1) field for a given purpose tag (bsdf-u, light-u, ...)."""
    return jax.random.uniform(jax.random.fold_in(key, tag), shape, jnp.float32)


def uniform2(key: jax.Array, shape, tag: int):
    k = jax.random.fold_in(key, tag)
    u = jax.random.uniform(k, (2,) + tuple(shape), jnp.float32)
    return u[0], u[1]


def randint(key: jax.Array, shape, tag: int, minval: int, maxval: int) -> jax.Array:
    """Uniform integer in [minval, maxval) (ref: util/random.glsl:13-17)."""
    if maxval <= minval + 1:
        return jnp.full(shape, minval, jnp.int32)
    return jax.random.randint(jax.random.fold_in(key, tag), shape, minval, maxval, jnp.int32)


# Purpose tags — keep unique so streams never collide.
TAG_PIXEL_JITTER = 0
TAG_BSDF = 1
TAG_LIGHT_PICK = 2
TAG_LIGHT_U = 3
TAG_LOBE = 4
TAG_LENS = 5
