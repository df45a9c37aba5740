"""Pinhole camera and primary-ray generation.

The reference computes ray directions by dragging NDC corners through an
inverse jittered model-view-projection matrix in a vertex shader
(ref: src/shader/main/vstrace.glsl:5-6, src/scene/camera.js:16-58).  Here the
camera is a tiny pytree of basis vectors and the rays are generated directly —
one fused elementwise expression over all pixels, no 4x4 matrix inverses in
the hot path.

Convention parity: the reference's lookAt negates its x basis *after*
computing y (camera.js:43-48), yielding basis x' = z×up; we reproduce that so
renders match its golden images.  fovy=55°, aspect=1, like camera.js:16.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .vecmath import Vec3, splat


class CameraParams(NamedTuple):
    """Differentiable camera parameters (a pytree of scalars)."""
    eye: Vec3
    right: Vec3     # x' = z × up (reference's flipped basis)
    up: Vec3        # true vertical basis in camera plane
    back: Vec3      # z = normalize(eye - center)
    tan_half_fovy: jax.Array
    aspect: jax.Array


def make_camera(eye, center, up=(0.0, 1.0, 0.0), fovy: float = 55.0,
                aspect: float = 1.0) -> CameraParams:
    eye = splat(eye)
    center = splat(center)
    up = splat(up)
    z = (eye - center).normalize()
    x = z.cross(up).normalize()       # = -(up × z): reference's flip
    y = z.cross(-x).normalize()       # y from the un-negated basis
    return CameraParams(
        eye=eye,
        right=x,
        up=y,
        back=z,
        tan_half_fovy=jnp.float32(math.tan(fovy * math.pi / 360.0)),
        aspect=jnp.float32(aspect),
    )


def rays_for_pixels(cam: CameraParams, ii, jj, height: int, width: int,
                    jitter_x=None, jitter_y=None) -> tuple[Vec3, Vec3]:
    """Primary rays for explicit pixel-index arrays `ii` (rows), `jj` (cols) —
    the sharding-friendly entry point: a device rendering a tile passes its
    global row indices, so sharded and single-chip renders are identical."""
    ox = jitter_x if jitter_x is not None else 0.5
    oy = jitter_y if jitter_y is not None else 0.5
    ndc_x = (jj + ox) * (2.0 / width) - 1.0
    ndc_y = 1.0 - (ii + oy) * (2.0 / height)
    sx = ndc_x * cam.tan_half_fovy * cam.aspect
    sy = ndc_y * cam.tan_half_fovy
    d = Vec3(
        cam.right.x * sx + cam.up.x * sy - cam.back.x,
        cam.right.y * sx + cam.up.y * sy - cam.back.y,
        cam.right.z * sx + cam.up.z * sy - cam.back.z,
    ).normalize()
    o = cam.eye.broadcast_to(d.shape)
    return o, d


def generate_rays(cam: CameraParams, height: int, width: int,
                  jitter_x=None, jitter_y=None) -> tuple[Vec3, Vec3]:
    """Primary rays for a full H×W image. Returns (origins, directions), each
    a Vec3 of (H, W) arrays.  jitter_x/y are optional per-pixel uniforms in
    [0,1) for sub-pixel anti-aliasing (ref: src/core/tracer.js:94-96)."""
    jj = jnp.arange(width, dtype=jnp.float32)[None, :]
    ii = jnp.arange(height, dtype=jnp.float32)[:, None]
    return rays_for_pixels(cam, ii, jj, height, width, jitter_x, jitter_y)
