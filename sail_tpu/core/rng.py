"""Counter-based random number generation.

Replaces the reference's fract-sin hash (ref: src/shader/util/random.glsl:1-17),
whose quality is poor and whose seeding is frame-time-dependent, with a
stateless counter-based hash: every (pixel, sample, bounce, purpose) tuple
maps deterministically to uniforms, so renders are reproducible bit-for-bit
for a given seed regardless of execution order, device count, or sharding
layout.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


# Purpose tags — keep unique so streams never collide.
TAG_PIXEL_JITTER = 0
TAG_BSDF = 1
TAG_LIGHT_PICK = 2
TAG_LIGHT_U = 3
TAG_LOBE = 4
TAG_LENS = 5


# --------------------------------------------------------------------------
# Stateless per-pixel hash RNG (sharding-layout invariant)
# --------------------------------------------------------------------------
# Keyed on GLOBAL pixel coordinates + (seed, sample, bounce, tag), so a pixel
# draws the same random numbers whether the image is rendered on one chip or
# sharded over a pod — renders are bit-stable across mesh layouts (SURVEY.md
# §7 hard part c).  PCG3D mixer (Jarzynski & Olano, JCGT 2020, public domain
# hash construction), all uint32 VPU ops — also the scheme the Pallas kernels
# use on-core.

# Implementation note: the whole hash runs in int32 with wrapping arithmetic
# (bitwise-identical to uint32 for add/mul/xor/<<) and logical right shifts
# emulated by arithmetic-shift + mask — Mosaic (Pallas TPU) supports neither
# uint32→f32 casts nor scalar bitcasts, so int32 end-to-end is the portable
# encoding that compiles identically under XLA and inside Pallas kernels.

def _c32(v: int):
    """uint32 literal as a wrapped int32 constant."""
    v &= 0xFFFFFFFF
    if v >= 1 << 31:
        v -= 1 << 32
    return jnp.int32(v)


def _lsr(x, k: int):
    """Logical right shift on int32 bit patterns."""
    return (x >> k) & _c32((1 << (32 - k)) - 1)


def _pcg3d(x, y, z):
    """3-in 3-out PCG hash (Jarzynski & Olano) over int32 bit patterns."""
    m = _c32(1664525)
    a = _c32(1013904223)
    x = x * m + a
    y = y * m + a
    z = z * m + a
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ _lsr(x, 16)
    y = y ^ _lsr(y, 16)
    z = z ^ _lsr(z, 16)
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return x, y, z


def _splitmix32(x):
    x = x + _c32(0x9E3779B9)
    x = (x ^ _lsr(x, 16)) * _c32(0x21F0AAAD)
    x = (x ^ _lsr(x, 15)) * _c32(0x735A2D97)
    return x ^ _lsr(x, 15)


def _to_unit(u):
    """int32 hash bits → float32 in [0, 1): top 24 bits are non-negative."""
    return _lsr(u, 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _as_i32(x):
    x = jnp.asarray(x)
    if x.dtype == jnp.int32:
        return x
    return x.astype(jnp.int32)


def stream(seed, sample_idx, bounce: int, tag: int):
    """Mix (seed, sample, bounce, tag) into one int32 stream id."""
    s = _as_i32(seed)
    s = _splitmix32(s ^ _splitmix32(_as_i32(sample_idx)))
    s = _splitmix32(s ^ _c32(bounce * 0x9E37 + tag * 0x85EB + 0x1234))
    return s


def pixel_uniform3(stream_id, ii, jj):
    """Three independent uniforms per pixel for one (sample, bounce, tag)
    stream.  `ii`, `jj` are global integer pixel coordinates (any shape)."""
    ii = _as_i32(ii)
    jj = _as_i32(jj)
    sid = jnp.broadcast_to(_as_i32(stream_id), ii.shape)
    a, b, c = _pcg3d(jj, ii, sid)
    return _to_unit(a), _to_unit(b), _to_unit(c)


class PixelNoise(NamedTuple):
    """Noise coordinates for one progressive sample pass: the RNG is a pure
    function of (seed, sample, bounce, tag, pixel) — no state, no keys."""
    seed: jax.Array    # int32 scalar
    sample: jax.Array  # int32 scalar
    ii: jax.Array      # global pixel rows (broadcastable to ray shape)
    jj: jax.Array      # global pixel cols

    def uniform3(self, bounce: int, tag: int):
        return pixel_uniform3(stream(self.seed, self.sample, bounce, tag),
                              self.ii, self.jj)


def pixel_noise(seed, sample_idx, shape=None, ii=None, jj=None) -> PixelNoise:
    """Build PixelNoise for an (H, W) image block or a flat ray batch."""
    if ii is None:
        if len(shape) == 2:
            h, w = shape
            ii = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None], shape)
            jj = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], shape)
        else:
            (n,) = shape
            ii = jnp.arange(n, dtype=jnp.int32)
            jj = jnp.zeros((n,), jnp.int32)
    return PixelNoise(_as_i32(seed), _as_i32(sample_idx), ii, jj)
