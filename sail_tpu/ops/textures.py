"""Procedural surface textures + Perlin noise library.

TPU-native counterpart of the reference's texture kernels
(ref: src/shader/texture/*.glsl) and its generated `getSurfaceColor`
dispatcher (texture/shader.texture.js:22-30).  Dispatch is a static unrolled
loop over the scene's texture rows with per-ray row masks — only textures the
scene uses are compiled, and XLA fuses the whole evaluation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..core import vecmath as vm
from ..core.vecmath import Vec3
from ..scene.texture import (BilerpP, Checkerboard2P, CheckerboardP, MixP,
                             ScaleP, UniformColorP, UVP)


def checkerboard(p: CheckerboardP, uv_u, uv_v) -> Vec3:
    """White grid with grey outline (ref: texture/checkerboard.glsl)."""
    width = 0.5 * p.line_width / p.size
    fx = uv_u / p.size - jnp.floor(uv_u / p.size)
    fy = uv_v / p.size - jnp.floor(uv_v / p.size)
    in_outline = (fx < width) | (fx > 1.0 - width) | (fy < width) | (fy > 1.0 - width)
    white = vm.splat(C.WHITE).broadcast_to(uv_u.shape)
    grey = vm.splat(C.GREY).broadcast_to(uv_u.shape)
    return vm.where(in_outline, grey, white)


def checkerboard2(p: Checkerboard2P, uv_u, uv_v) -> Vec3:
    """Two-color checker (ref: texture/checkerboard2.glsl)."""
    iu = jnp.floor(uv_u / p.size)
    iv = jnp.floor(uv_v / p.size)
    even = jnp.mod(iu + iv, 2.0) < 0.5
    return vm.where(even, p.color1.broadcast_to(uv_u.shape),
                    p.color2.broadcast_to(uv_u.shape))


def bilerp(p: BilerpP, uv_u, uv_v) -> Vec3:
    s = uv_u.shape
    return (p.color00.broadcast_to(s) * ((1.0 - uv_u) * (1.0 - uv_v)) +
            p.color01.broadcast_to(s) * ((1.0 - uv_u) * uv_v) +
            p.color10.broadcast_to(s) * (uv_u * (1.0 - uv_v)) +
            p.color11.broadcast_to(s) * (uv_u * uv_v))


def mixf(p: MixP, uv_u, uv_v) -> Vec3:
    s = uv_u.shape
    return vm.lerp(p.color1.broadcast_to(s), p.color2.broadcast_to(s), p.amount)


def scalef(p: ScaleP, uv_u, uv_v) -> Vec3:
    s = uv_u.shape
    return (p.color1 * p.color2).broadcast_to(s)


def uvf(p: UVP, uv_u, uv_v) -> Vec3:
    return Vec3(uv_u - jnp.floor(uv_u), uv_v - jnp.floor(uv_v),
                jnp.zeros_like(uv_u))


_TEX_FNS = {
    C.CHECKERBOARD: checkerboard,
    C.CHECKERBOARD2: checkerboard2,
    C.BILERP: bilerp,
    C.MIXF: mixf,
    C.SCALE: scalef,
    C.UVF: uvf,
}


def surface_color(textures: tuple, static, tex_row, hit_p: Vec3, uv_u, uv_v,
                  sc_override: Vec3, use_override) -> Vec3:
    """Per-ray surface color: texture-row dispatch + Cornell-wall override
    (ref dispatcher: texture/shader.texture.js:22-30)."""
    shape = uv_u.shape
    sc = vm.splat(C.BLACK).broadcast_to(shape)
    for row, (cat, params) in enumerate(zip(static.texture_categories, textures)):
        mask = tex_row == row
        if cat == C.UNIFORM_COLOR:
            val = params.color.broadcast_to(shape)
        else:
            val = _TEX_FNS[cat](params, uv_u, uv_v)
        sc = vm.where(mask, val, sc)
    return vm.where(use_override > 0, sc_override, sc)


# --------------------------------------------------------------------------
# Perlin noise library (ref: src/shader/texture/noise.glsl — compiled into
# every reference shader as a library; exposed here as public ops).
# --------------------------------------------------------------------------

_NOISE_PERM = np.array([
    151, 160, 137, 91, 90, 15, 131, 13, 201, 95, 96, 53, 194, 233, 7, 225, 140,
    36, 103, 30, 69, 142, 8, 99, 37, 240, 21, 10, 23, 190, 6, 148, 247, 120,
    234, 75, 0, 26, 197, 62, 94, 252, 219, 203, 117, 35, 11, 32, 57, 177, 33,
    88, 237, 149, 56, 87, 174, 20, 125, 136, 171, 168, 68, 175, 74, 165, 71,
    134, 139, 48, 27, 166, 77, 146, 158, 231, 83, 111, 229, 122, 60, 211, 133,
    230, 220, 105, 92, 41, 55, 46, 245, 40, 244, 102, 143, 54, 65, 25, 63, 161,
    1, 216, 80, 73, 209, 76, 132, 187, 208, 89, 18, 169, 200, 196, 135, 130,
    116, 188, 159, 86, 164, 100, 109, 198, 173, 186, 3, 64, 52, 217, 226, 250,
    124, 123, 5, 202, 38, 147, 118, 126, 255, 82, 85, 212, 207, 206, 59, 227,
    47, 16, 58, 17, 182, 189, 28, 42, 223, 183, 170, 213, 119, 248, 152, 2, 44,
    154, 163, 70, 221, 153, 101, 155, 167, 43, 172, 9, 129, 22, 39, 253, 19,
    98, 108, 110, 79, 113, 224, 232, 178, 185, 112, 104, 218, 246, 97, 228,
    251, 34, 242, 193, 238, 210, 144, 12, 191, 179, 162, 241, 81, 51, 145,
    235, 249, 14, 239, 107, 49, 192, 214, 31, 181, 199, 106, 157, 184, 84,
    204, 176, 115, 121, 50, 45, 127, 4, 150, 254, 138, 236, 205, 93, 222, 114,
    67, 29, 24, 72, 243, 141, 128, 195, 78, 66, 215, 61, 156, 180,
], dtype=np.int32)
# plain numpy (converted on first use): a module-level jnp array would
# initialize the XLA backend at import time, which breaks multi-host
# bring-up (jax.distributed.initialize must run before any backend use —
# tools/mp_render_worker.py imports this module only after initializing)
_NOISE_PERM2 = np.concatenate([_NOISE_PERM, _NOISE_PERM])
_NPS = 256


def _grad(ix, iy, iz, dx, dy, dz):
    perm2 = jnp.asarray(_NOISE_PERM2)
    h = perm2[perm2[perm2[ix] + iy] + iz]
    h = h & 15
    u = jnp.where((h < 8) | (h == 12) | (h == 13), dx, dy)
    v = jnp.where((h < 4) | (h == 12) | (h == 13), dy, dz)
    return jnp.where(h & 1 != 0, -u, u) + jnp.where(h & 2 != 0, -v, v)


def _noise_weight(t):
    t3 = t * t * t
    t4 = t3 * t
    return 6.0 * t4 * t - 15.0 * t4 + 10.0 * t3


def perlin(p: Vec3) -> jax.Array:
    """Classic gradient noise (ref: noise.glsl:38-95)."""
    ix = jnp.floor(p.x).astype(jnp.int32)
    iy = jnp.floor(p.y).astype(jnp.int32)
    iz = jnp.floor(p.z).astype(jnp.int32)
    dx = p.x - ix
    dy = p.y - iy
    dz = p.z - iz
    ix = ix & (_NPS - 1)
    iy = iy & (_NPS - 1)
    iz = iz & (_NPS - 1)
    w000 = _grad(ix, iy, iz, dx, dy, dz)
    w100 = _grad(ix + 1, iy, iz, dx - 1.0, dy, dz)
    w010 = _grad(ix, iy + 1, iz, dx, dy - 1.0, dz)
    w110 = _grad(ix + 1, iy + 1, iz, dx - 1.0, dy - 1.0, dz)
    w001 = _grad(ix, iy, iz + 1, dx, dy, dz - 1.0)
    w101 = _grad(ix + 1, iy, iz + 1, dx - 1.0, dy, dz - 1.0)
    w011 = _grad(ix, iy + 1, iz + 1, dx, dy - 1.0, dz - 1.0)
    w111 = _grad(ix + 1, iy + 1, iz + 1, dx - 1.0, dy - 1.0, dz - 1.0)
    wx = _noise_weight(dx)
    wy = _noise_weight(dy)
    wz = _noise_weight(dz)
    x00 = w000 + wx * (w100 - w000)
    x10 = w010 + wx * (w110 - w010)
    x01 = w001 + wx * (w101 - w001)
    x11 = w011 + wx * (w111 - w011)
    y0 = x00 + wy * (x10 - x00)
    y1 = x01 + wy * (x11 - x01)
    return y0 + wz * (y1 - y0)


def _smoothstep(lo, hi, x):
    t = jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def fbm(p: Vec3, omega: float, max_octaves: int) -> jax.Array:
    """Fractional Brownian motion (ref: noise.glsl:101-113)."""
    n_int = max_octaves // 2
    total = jnp.zeros(p.shape, jnp.float32)
    lam, o = 1.0, 1.0
    for _ in range(n_int):
        total = total + o * perlin(p * lam)
        lam *= 1.99
        o *= omega
    n_partial = float(max_octaves - n_int)
    total = total + o * _smoothstep(0.3, 0.7, n_partial) * perlin(p * lam)
    return total


def turbulence(p: Vec3, omega: float, max_octaves: int) -> jax.Array:
    """Absolute-value fbm (ref: noise.glsl:115-130)."""
    n_int = max_octaves // 2
    total = jnp.zeros(p.shape, jnp.float32)
    lam, o = 1.0, 1.0
    for _ in range(n_int):
        total = total + o * jnp.abs(perlin(p * lam))
        lam *= 1.99
        o *= omega
    n_partial = float(max_octaves - n_int)
    total = total + o * (0.2 + (jnp.abs(perlin(p * lam)) - 0.2) *
                         _smoothstep(0.3, 0.7, n_partial))
    for _ in range(n_int, max_octaves):
        total = total + o * 0.2
        o *= omega
    return total
