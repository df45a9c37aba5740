"""Reconstruction / display filters.

TPU-native counterpart of the reference's filter pass
(ref: src/shader/filter/*.glsl + host weight-table codegen filter/{box,
gaussian,mitchell,sinc,triangle}.js).  The reference precomputes a 4×4 weight
table on the host, bakes it into GLSL, and samples 4 symmetric taps per entry
(filter/window.glsl); here the same weight tables are precomputed in NumPy and
the window is applied as a fused stack of shifted adds over the accumulated
image — one XLA kernel, no texture fetches.

The reference's windowed filter has an indexing bug (`windowWeightTable[i*j+j]`,
window.glsl:37 — should be `i*width+j`); this implementation indexes correctly.
Its `wavelet` filter is a 3-level à-trous edge-avoiding denoiser over the
color/normal/position G-buffer (filter/wavelet.glsl); re-implemented here as a
standard à-trous B3-spline pass with the same edge-stopping parameters.
"""
from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..core import vecmath as vm
from ..core.vecmath import Vec3

WINDOW_WIDTH = 4  # ref: filter/shader.filter.js:31


# -- simple tone filters ----------------------------------------------------

def color(img: Vec3, normal=None, position=None, **params) -> Vec3:
    return img


def gamma(img: Vec3, normal=None, position=None, c: float = 2.2, **params) -> Vec3:
    inv = 1.0 / c
    g = lambda v: jnp.power(jnp.maximum(v, 0.0), inv)
    return Vec3(g(img.x), g(img.y), g(img.z))


def tonemapping(img: Vec3, normal=None, position=None, **params) -> Vec3:
    """Filmic approximation (ref: filter/tonemapping.glsl)."""
    def tm(v):
        x = jnp.maximum(0.0, v - 0.004)
        return (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)
    return Vec3(tm(img.x), tm(img.y), tm(img.z))


def normal_view(img: Vec3, normal=None, position=None, **params) -> Vec3:
    """G-buffer debug: normals remapped to [0,1] (ref: main/fstrace.glsl:15)."""
    n = normal if normal is not None else img
    return n * 0.5 + 0.5


def position_view(img: Vec3, normal=None, position=None, **params) -> Vec3:
    p = position if position is not None else img
    return p.normalize() * 0.5 + 0.5


# -- windowed convolution filters ------------------------------------------
# Host-side weight functions (ref: filter/{box,triangle,gaussian,mitchell,
# sinc}.js evaluate these at table build time).

def _w_box(px, py, r, **kw):
    return 1.0


def _w_triangle(px, py, r, **kw):
    return max(0.0, r[0] - px) * max(0.0, r[1] - py)


def _w_gaussian(px, py, r, alpha=2.0, **kw):
    ex = math.exp(-alpha * r[0] * r[0])
    ey = math.exp(-alpha * r[1] * r[1])
    gx = max(0.0, math.exp(-alpha * px * px) - ex)
    gy = max(0.0, math.exp(-alpha * py * py) - ey)
    return gx * gy


def _mitchell_1d(x, b, c):
    x = abs(2.0 * x)
    if x > 1:
        return ((-b - 6 * c) * x ** 3 + (6 * b + 30 * c) * x * x +
                (-12 * b - 48 * c) * x + (8 * b + 24 * c)) / 6.0
    return ((12 - 9 * b - 6 * c) * x ** 3 +
            (-18 + 12 * b + 6 * c) * x * x + (6 - 2 * b)) / 6.0


def _w_mitchell(px, py, r, b=1.0 / 3.0, c=1.0 / 3.0, **kw):
    return _mitchell_1d(px / r[0], b, c) * _mitchell_1d(py / r[1], b, c)


def _sinc_1d(x):
    x = abs(x)
    if x < 1e-5:
        return 1.0
    return math.sin(math.pi * x) / (math.pi * x)


def _windowed_sinc(x, radius, tau):
    x = abs(x)
    if x > radius:
        return 0.0
    return _sinc_1d(x) * _sinc_1d(x / tau)


def _w_sinc(px, py, r, tau=3.0, **kw):
    return _windowed_sinc(px, r[0], tau) * _windowed_sinc(py, r[1], tau)


_WINDOW_WEIGHT_FNS = {
    "box": _w_box,
    "triangle": _w_triangle,
    "gaussian": _w_gaussian,
    "mitchell": _w_mitchell,
    "sinc": _w_sinc,
}


def window_table(name: str, r=(2.0, 2.0), **params) -> list:
    """Precompute the 4×4 (offset, weight) table on the host
    (ref: filter/box.js:10-36 et al.)."""
    fn = _WINDOW_WEIGHT_FNS[name]
    entries = []
    for i in range(WINDOW_WIDTH):
        for j in range(WINDOW_WIDTH):
            px = (j + 0.5) * r[0] / WINDOW_WIDTH
            py = (i + 0.5) * r[1] / WINDOW_WIDTH
            w = float(fn(px, py, r, **params))
            entries.append((px, py, w))
    return entries


def _shifted(a, dy, dx):
    """Shift with zero padding (out-of-bounds taps contribute nothing, like
    window.glsl:2-3 windowSampler)."""
    out = jnp.roll(a, (dy, dx), axis=(0, 1))
    h, w = a.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    valid = jnp.ones_like(a, bool)
    if dy > 0:
        valid = valid & (ys >= dy)
    elif dy < 0:
        valid = valid & (ys < h + dy)
    if dx > 0:
        valid = valid & (xs >= dx)
    elif dx < 0:
        valid = valid & (xs < w + dx)
    return jnp.where(valid, out, 0.0), valid


def windowed(img: Vec3, name: str, r=(2.0, 2.0), **params) -> Vec3:
    """Apply a 4×4-table windowed filter with 4 symmetric taps per entry,
    normalizing by the in-bounds tap count (ref: filter/window.glsl)."""
    table = window_table(name, r, **params)
    acc = [jnp.zeros_like(img.x)] * 3
    wsum = jnp.zeros_like(img.x)
    for (px, py, w) in table:
        if w == 0.0:
            continue
        dx = int(round(px))
        dy = int(round(py))
        for sx, sy in ((dx, dy), (dx, -dy), (-dx, dy), (-dx, -dy)):
            # reference samples all 4 taps even when offsets coincide;
            # replicate by accumulating weight per tap occurrence
            cx, valid = _shifted(img.x, sy, sx)
            cy, _ = _shifted(img.y, sy, sx)
            cz, _ = _shifted(img.z, sy, sx)
            acc = [acc[0] + cx * w, acc[1] + cy * w, acc[2] + cz * w]
            wsum = wsum + w * valid.astype(jnp.float32)
    wsum = jnp.maximum(wsum, 1e-8)
    return Vec3(acc[0] / wsum, acc[1] / wsum, acc[2] / wsum)


# -- à-trous edge-avoiding wavelet denoiser ---------------------------------

_H_KERNEL = np.array([1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16])


def wavelet(img: Vec3, normal: Vec3, position: Vec3, levels: int = 3,
            c_phi: float = 4.0, n_phi: float = 128.0, p_phi: float = 1.0,
            **params) -> Vec3:
    """Edge-avoiding à-trous wavelet denoise over the color/normal/position
    G-buffer (ref: filter/wavelet.glsl, parameters :1-3).  Correct B3-spline
    à-trous levels with spacing 2^level replace the reference's tangled
    linear-index tap selection."""
    out = img
    for level in range(levels):
        step = 2 ** level
        acc_x = jnp.zeros_like(out.x)
        acc_y = jnp.zeros_like(out.y)
        acc_z = jnp.zeros_like(out.z)
        wsum = jnp.zeros_like(out.x)
        for i in range(5):
            for j in range(5):
                h = _H_KERNEL[i] * _H_KERNEL[j]
                dy = (i - 2) * step
                dx = (j - 2) * step
                cx, valid = _shifted(out.x, dy, dx)
                cy, _ = _shifted(out.y, dy, dx)
                cz, _ = _shifted(out.z, dy, dx)
                dc = (out.x - cx) ** 2 + (out.y - cy) ** 2 + (out.z - cz) ** 2
                w_c = jnp.minimum(jnp.exp(-dc / c_phi), 1.0)
                nx, _ = _shifted(normal.x, dy, dx)
                ny, _ = _shifted(normal.y, dy, dx)
                nz, _ = _shifted(normal.z, dy, dx)
                dn = ((normal.x - nx) ** 2 + (normal.y - ny) ** 2 +
                      (normal.z - nz) ** 2) / (step * step)
                w_n = jnp.minimum(jnp.exp(-dn / n_phi), 1.0)
                px_, _ = _shifted(position.x, dy, dx)
                py_, _ = _shifted(position.y, dy, dx)
                pz_, _ = _shifted(position.z, dy, dx)
                dp = ((position.x - px_) ** 2 + (position.y - py_) ** 2 +
                      (position.z - pz_) ** 2)
                w_p = jnp.minimum(jnp.exp(-dp / p_phi), 1.0)
                w = w_c * w_n * w_p * h * valid.astype(jnp.float32)
                acc_x = acc_x + cx * w
                acc_y = acc_y + cy * w
                acc_z = acc_z + cz * w
                wsum = wsum + w
        wsum = jnp.maximum(wsum, 1e-8)
        out = Vec3(acc_x / wsum, acc_y / wsum, acc_z / wsum)
    return out


def apply_filter(name: str, img: Vec3, normal: Vec3 = None,
                 position: Vec3 = None, **params) -> Vec3:
    """Filter dispatch (ref: RenderShader plugin selection,
    src/core/shader.js:89-113)."""
    if name in _WINDOW_WEIGHT_FNS:
        return windowed(img, name, **params)
    fn = {
        "color": color,
        "gamma": gamma,
        "tonemapping": tonemapping,
        "normal": normal_view,
        "position": position_view,
        "wavelet": wavelet,
    }[name]
    return fn(img, normal, position, **params)
