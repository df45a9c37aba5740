"""Pallas-safe transcendentals.

Mosaic (the Pallas TPU compiler) has no lowering for atan2 / arccos / arctan /
tan; these minimax-polynomial versions (max error ~1e-7 over the principal
range) are used by BOTH the XLA integrator and the Pallas megakernel so the
two paths produce bit-identical estimators.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import PI

PI_2 = PI / 2.0


def _atan_poly(t):
    """atan on |t| <= 1, degree-11 odd minimax polynomial."""
    t2 = t * t
    p = jnp.float32(-0.0117212)
    p = p * t2 + jnp.float32(0.05265332)
    p = p * t2 + jnp.float32(-0.11643287)
    p = p * t2 + jnp.float32(0.19354346)
    p = p * t2 + jnp.float32(-0.33262347)
    p = p * t2 + jnp.float32(0.99997726)
    return t * p


def atan2(y, x):
    """Four-quadrant arctangent, elementwise."""
    y = jnp.asarray(y, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    swap = jnp.abs(y) > jnp.abs(x)
    num = jnp.where(swap, x, y)
    den = jnp.where(swap, y, x)
    den = jnp.where(den == 0.0, 1e-30, den)
    t = num / den
    r = _atan_poly(t)
    # |y|>|x|: atan(y/x) = sign(y/x)·π/2 − atan(x/y)
    s = jnp.where((y < 0.0) ^ (x < 0.0), -PI_2, PI_2)
    r = jnp.where(swap, s - r, r)
    # quadrant shift for x<0
    r = jnp.where(x < 0.0, jnp.where(y >= 0.0, r + PI, r - PI), r)
    return r


def atan(x):
    x = jnp.asarray(x, jnp.float32)
    big = jnp.abs(x) > 1.0
    inv = 1.0 / jnp.where(x == 0.0, 1e-30, x)
    t = jnp.where(big, inv, x)
    r = _atan_poly(t)
    s = jnp.where(x >= 0.0, PI_2, -PI_2)
    return jnp.where(big, s - r, r)


def acos(x):
    x = jnp.clip(jnp.asarray(x, jnp.float32), -1.0, 1.0)
    s = jnp.sqrt(jnp.maximum(1.0 - x * x, 1e-20))
    return atan2(s, x)


def asin(x):
    return PI_2 - acos(x)


def tan(x):
    """tan via sin/cos (Mosaic lowers sin/cos but not tan)."""
    x = jnp.asarray(x, jnp.float32)
    c = jnp.cos(x)
    return jnp.sin(x) / jnp.where(jnp.abs(c) < 1e-20, 1e-20, c)
