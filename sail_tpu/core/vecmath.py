"""Structure-of-arrays 3-vector math.

TPU-first design note: a `Vec3` is a pytree of three arrays (x, y, z), each of
arbitrary (usually flat, lane-aligned) shape — NOT an array with a trailing
dim of 3.  Every operation is a plain elementwise op over large arrays, which
maps directly onto the TPU VPU's (8, 128) registers with full lane utilization
and lets XLA fuse entire shading expressions into a handful of kernels.  This
replaces the reference's GLSL `vec3` (ref: src/shader/const/struct.glsl) and
its host-side math library (ref: src/utils/matrix.js).
"""
from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp

Scalar = Union[float, jax.Array]


class Vec3(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array

    # -- arithmetic ---------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)
        return Vec3(self.x + o, self.y + o, self.z + o)

    def __radd__(self, o):
        return self.__add__(o)

    def __sub__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)
        return Vec3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return Vec3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)
        return Vec3(self.x * o, self.y * o, self.z * o)

    def __rmul__(self, o):
        return self.__mul__(o)

    def __truediv__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x / o.x, self.y / o.y, self.z / o.z)
        return Vec3(self.x / o, self.y / o, self.z / o)

    def __rtruediv__(self, o):
        return Vec3(o / self.x, o / self.y, o / self.z)

    def __neg__(self):
        return Vec3(-self.x, -self.y, -self.z)

    # -- geometry -----------------------------------------------------------
    def dot(self, o: "Vec3") -> jax.Array:
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o: "Vec3") -> "Vec3":
        return Vec3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def length_sq(self) -> jax.Array:
        return self.dot(self)

    def length(self) -> jax.Array:
        # Floored for a finite backward pass at zero vectors.
        return jnp.sqrt(jnp.maximum(self.length_sq(), 1e-20))

    def normalize(self, eps: float = 1e-20) -> "Vec3":
        inv = jax.lax.rsqrt(jnp.maximum(self.length_sq(), eps))
        return self * inv

    def min_component(self) -> jax.Array:
        return jnp.minimum(jnp.minimum(self.x, self.y), self.z)

    def max_component(self) -> jax.Array:
        return jnp.maximum(jnp.maximum(self.x, self.y), self.z)

    # -- utilities ----------------------------------------------------------
    @property
    def shape(self):
        return jnp.shape(self.x)

    @property
    def dtype(self):
        return jnp.result_type(self.x)

    def astype(self, dtype) -> "Vec3":
        return Vec3(self.x.astype(dtype), self.y.astype(dtype), self.z.astype(dtype))

    def reshape(self, *shape) -> "Vec3":
        return Vec3(
            jnp.reshape(self.x, shape),
            jnp.reshape(self.y, shape),
            jnp.reshape(self.z, shape),
        )

    def broadcast_to(self, shape) -> "Vec3":
        return Vec3(
            jnp.broadcast_to(self.x, shape),
            jnp.broadcast_to(self.y, shape),
            jnp.broadcast_to(self.z, shape),
        )

    def stack(self, axis: int = -1) -> jax.Array:
        """Materialize as a dense [..., 3] array (host/IO boundary only)."""
        return jnp.stack([self.x, self.y, self.z], axis=axis)

    def clip(self, lo, hi) -> "Vec3":
        return Vec3(
            jnp.clip(self.x, lo, hi),
            jnp.clip(self.y, lo, hi),
            jnp.clip(self.z, lo, hi),
        )


def vec3(x: Scalar, y: Scalar, z: Scalar, dtype=jnp.float32) -> Vec3:
    """Build a Vec3, promoting python scalars to arrays of `dtype`."""
    return Vec3(jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype))


def splat(v, dtype=jnp.float32) -> Vec3:
    """Vec3 from a length-3 python/numpy sequence or a scalar."""
    if isinstance(v, Vec3):
        return v
    if hasattr(v, "__len__"):
        return vec3(v[0], v[1], v[2], dtype)
    return vec3(v, v, v, dtype)


def where(c: jax.Array, a: Vec3, b: Vec3) -> Vec3:
    return Vec3(jnp.where(c, a.x, b.x), jnp.where(c, a.y, b.y), jnp.where(c, a.z, b.z))


def from_stacked(a: jax.Array, axis: int = -1) -> Vec3:
    x, y, z = jnp.split(a, 3, axis=axis)
    return Vec3(jnp.squeeze(x, axis), jnp.squeeze(y, axis), jnp.squeeze(z, axis))


def lerp(a: Vec3, b: Vec3, t) -> Vec3:
    return a * (1.0 - t) + b * t


# -- shading frames ---------------------------------------------------------

def world_to_local(v: Vec3, n: Vec3, s: Vec3, t: Vec3) -> Vec3:
    """Express world vector `v` in the orthonormal frame (s, t, n); local z
    is the normal axis (ref: src/shader/util/utility.glsl:1-3)."""
    return Vec3(v.dot(s), v.dot(t), v.dot(n))


def local_to_world(v: Vec3, n: Vec3, s: Vec3, t: Vec3) -> Vec3:
    return Vec3(
        s.x * v.x + t.x * v.y + n.x * v.z,
        s.y * v.x + t.y * v.y + n.y * v.z,
        s.z * v.x + t.z * v.y + n.z * v.z,
    )


def ortho(d: Vec3) -> Vec3:
    """A vector orthogonal to d (ref: src/shader/util/utility.glsl:19-25)."""
    big = (jnp.abs(d.x) > 1e-5) | (jnp.abs(d.y) > 1e-5)
    return where(big, Vec3(d.y, -d.x, jnp.zeros_like(d.z)), Vec3(jnp.zeros_like(d.x), d.z, -d.y))


def onb(n: Vec3) -> tuple[Vec3, Vec3]:
    """Build an orthonormal basis (s, t) around unit normal n."""
    s = ortho(n).normalize()
    t = n.cross(s)
    return s, t


def reflect(wo: Vec3, n: Vec3) -> Vec3:
    """Mirror direction of incoming -wo about n: GLSL reflect(-wo, n)."""
    return n * (2.0 * wo.dot(n)) - wo


def refract_dir(i: Vec3, n: Vec3, eta) -> tuple[Vec3, jax.Array]:
    """GLSL-style refract of incident direction `i` (pointing into surface)
    about normal `n` with relative IOR `eta = etaI/etaT`.

    Returns (direction, total_internal_reflection_mask). On TIR the direction
    is the zero vector — matching GLSL `refract` semantics used by the
    reference's specular transmission (ref: src/shader/material/bsdf.glsl:118).
    """
    cos_i = -i.dot(n)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    tir = k < 0.0
    # Double-where: sqrt must see a strictly positive input on TIR lanes or
    # its backward pass emits inf·0 = NaN through the masking `where`.
    k_safe = jnp.where(tir, 1.0, jnp.maximum(k, 1e-12))
    d = i * eta + n * (eta * cos_i - jnp.sqrt(k_safe))
    zero = Vec3(jnp.zeros_like(d.x), jnp.zeros_like(d.y), jnp.zeros_like(d.z))
    return where(tir, zero, d), tir


# -- misc -------------------------------------------------------------------

def quadratic(a, b, c):
    """Stable quadratic solve (ref: src/shader/util/utility.glsl:38-52).

    Returns (has_roots, t0, t1) with t0 <= t1. Where has_roots is False the
    roots are garbage and must be masked by the caller.
    """
    discrim = b * b - 4.0 * a * c
    ok = discrim >= 0.0
    # Double-where: keep sqrt's input strictly positive on masked-out lanes so
    # the backward pass stays NaN-free (d√x/dx at 0 is ∞; ∞·0 = NaN).
    root = jnp.sqrt(jnp.where(ok, jnp.maximum(discrim, 1e-20), 1.0))
    root = jnp.where(ok, root, 0.0)
    q = jnp.where(b < 0.0, -0.5 * (b - root), -0.5 * (b + root))
    # Avoid 0/0; masked out by `ok` or by degenerate-a handling at call sites.
    t0 = q / jnp.where(a == 0.0, 1e-20, a)
    t1 = c / jnp.where(q == 0.0, 1e-20, q)
    return ok, jnp.minimum(t0, t1), jnp.maximum(t0, t1)


def spherical_direction(sin_theta, cos_theta, phi) -> Vec3:
    return Vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)


# -- shading-space trig (local frame, z = normal) ---------------------------
# ref: src/shader/material/ssutility.glsl

def cos_theta(w: Vec3):
    return w.z


def cos2_theta(w: Vec3):
    return w.z * w.z


def abs_cos_theta(w: Vec3):
    return jnp.abs(w.z)


def sin2_theta(w: Vec3):
    return jnp.maximum(0.0, 1.0 - cos2_theta(w))


def sin_theta(w: Vec3):
    # 1e-12 floor keeps the backward pass finite at θ=0 (negligible primal
    # shift: √1e-12 = 1e-6, far below MC noise).
    return jnp.sqrt(jnp.maximum(sin2_theta(w), 1e-12))


def tan2_theta(w: Vec3):
    c2 = cos2_theta(w)
    return jnp.where(c2 < 1e-5, jnp.float32(1e5), sin2_theta(w) / jnp.maximum(c2, 1e-20))


def cos_phi(w: Vec3):
    s = sin_theta(w)
    return jnp.where(jnp.abs(s) < 1e-3, 1.0, jnp.clip(w.x / jnp.where(s == 0, 1.0, s), -1.0, 1.0))


def sin_phi(w: Vec3):
    s = sin_theta(w)
    return jnp.where(jnp.abs(s) < 1e-3, 0.0, jnp.clip(w.y / jnp.where(s == 0, 1.0, s), -1.0, 1.0))


def cos2_phi(w: Vec3):
    c = cos_phi(w)
    return c * c


def sin2_phi(w: Vec3):
    s = sin_phi(w)
    return s * s


def same_hemisphere(w: Vec3, wp: Vec3):
    return w.z * wp.z > 1e-5
