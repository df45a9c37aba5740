"""Monte-Carlo direction/point samplers (ref: src/shader/util/sampler.glsl).

All samplers take uniform [0,1) fields (u1, u2) of any shape and return Vec3 /
tuples of arrays of the same shape — pure elementwise VPU code.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import PI, PI_OVER_2, PI_OVER_4
from .vecmath import Vec3


def uniform_sphere(u1, u2) -> Vec3:
    """Uniform direction on the unit sphere (ref: sampler.glsl:1-5)."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 1e-12))
    angle = 2.0 * PI * u2
    return Vec3(r * jnp.cos(angle), r * jnp.sin(angle), z)


def cosine_hemisphere(u1, u2) -> Vec3:
    """Cosine-weighted hemisphere (+z) direction (ref: sampler.glsl:7-12)."""
    r = jnp.sqrt(u1)
    angle = 2.0 * PI * u2
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 1e-12))
    return Vec3(r * jnp.cos(angle), r * jnp.sin(angle), z)


def uniform_disk(u1, u2):
    r = jnp.sqrt(u1)
    theta = 2.0 * PI * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def concentric_disk(u1, u2):
    """Concentric (Shirley) disk mapping (ref: sampler.glsl:26-41)."""
    uo = 2.0 * u1 - 1.0
    vo = 2.0 * u2 - 1.0
    at_origin = (uo == 0.0) & (vo == 0.0)
    use_u = jnp.abs(uo) > jnp.abs(vo)
    uo_safe = jnp.where(uo == 0.0, 1e-20, uo)
    vo_safe = jnp.where(vo == 0.0, 1e-20, vo)
    r = jnp.where(use_u, uo, vo)
    theta = jnp.where(use_u, (vo / uo_safe) * PI_OVER_4, PI_OVER_2 - (uo / vo_safe) * PI_OVER_4)
    x = jnp.where(at_origin, 0.0, r * jnp.cos(theta))
    y = jnp.where(at_origin, 0.0, r * jnp.sin(theta))
    return x, y


def uniform_cone(u1, u2, cos_theta_max) -> Vec3:
    """Uniform direction in a +z cone (ref: sampler.glsl:43-49)."""
    ct = (1.0 - u1) + u1 * cos_theta_max
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 1e-12))
    phi = 2.0 * PI * u2
    return Vec3(jnp.cos(phi) * st, jnp.sin(phi) * st, ct)


def uniform_triangle(u1, u2):
    su0 = jnp.sqrt(u1)
    return 1.0 - su0, u2 * su0
