"""Jaxpr-level VPU op counting — the honest FLOPs/ray accounting.

XLA's `compiled.cost_analysis()["flops"]` counts `fori_loop` bodies ONCE
regardless of trip count (measured: flops(spp=8)/flops(spp=1) = 1.36 on the
spp-loop integrator — PROFILE_r04.json cost_recon), which made r3's
"27.9 flops/ray" ~spp x too low and its 1.8% MFU meaningless (VERDICT r3
weak #1).  This module instead walks the traced jaxpr of ONE sample and
counts per-lane elementwise VPU ops directly, with documented weights:

  - every elementwise f32/i32 op (add/mul/select/compare/shift/...) = 1
  - div / sqrt / rsqrt = 4;  sin/cos/exp/log = 8;  acos/asin = 12;
    atan2 / pow = 16  (approximate multi-instruction VPU expansions)
  - data movement (broadcast/reshape/convert/slice/...) = 0
  - reductions = one op per input element

Two totals come back: `weighted` (the above) and `raw` (every counted op =
1).  The raw count is a LOWER bound on executed ops pre-XLA-optimization;
XLA's CSE/DCE then removes some — measured throughput lands near the
raw-count speed of light (see docs/PERF.md for the full roofline story).
"""
from __future__ import annotations

import numpy as np

WEIGHTS = {
    "add": 1, "sub": 1, "mul": 1, "max": 1, "min": 1, "and": 1, "or": 1,
    "xor": 1, "not": 1, "neg": 1, "abs": 1, "sign": 1, "floor": 1,
    "ceil": 1, "round": 1, "shift_left": 1, "shift_right_logical": 1,
    "shift_right_arithmetic": 1, "lt": 1, "le": 1, "gt": 1, "ge": 1,
    "eq": 1, "ne": 1, "select_n": 1, "is_finite": 1, "rem": 4,
    "square": 1, "clamp": 2, "nextafter": 1, "population_count": 1,
    "div": 4, "sqrt": 4, "rsqrt": 4, "cbrt": 8,
    "log": 8, "exp": 8, "log1p": 8, "expm1": 8,
    "sin": 8, "cos": 8, "tan": 12, "atan2": 16, "atan": 12,
    "acos": 12, "asin": 12, "tanh": 10, "logistic": 10, "erf": 12,
    "pow": 16,
}
FREE = {
    "broadcast_in_dim", "reshape", "convert_element_type", "slice",
    "squeeze", "concatenate", "iota", "transpose", "copy", "copy_p",
    "stop_gradient", "bitcast_convert_type", "expand_dims", "rev",
    "dynamic_slice", "dynamic_update_slice", "gather", "pad",
}
CALLS = {"pjit", "jit", "closed_call", "custom_jvp_call", "custom_vjp_call",
         "remat", "checkpoint", "custom_vjp_call_jaxpr", "core_call"}


def _size(aval):
    try:
        return int(np.prod(aval.shape)) if aval.shape else 1
    except Exception:  # pragma: no cover
        return 1


def count_jaxpr(jaxpr, unknown=None):
    """Weighted VPU-op count of a (closed) jaxpr, recursing into calls and
    control flow.  Returns (weighted_ops, raw_ops); `unknown` (optional
    dict) collects primitives outside the table (charged 1/element)."""
    if unknown is None:
        unknown = {}
    if hasattr(jaxpr, "jaxpr"):
        jaxpr = jaxpr.jaxpr
    w_total = 0.0
    raw_total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in CALLS:
            inner = (eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr"))
            if inner is not None:
                wi, ri = count_jaxpr(inner, unknown)
                w_total += wi
                raw_total += ri
            continue
        if name == "cond":
            ws = [count_jaxpr(b, unknown) for b in eqn.params["branches"]]
            w_total += max(wi for wi, _ in ws)
            raw_total += max(ri for _, ri in ws)
            continue
        if name == "while":
            wi, ri = count_jaxpr(eqn.params["body_jaxpr"], unknown)
            unknown.setdefault("while_loops_counted_once", 0)
            unknown["while_loops_counted_once"] += 1
            w_total += wi
            raw_total += ri
            continue
        if name == "scan":
            wi, ri = count_jaxpr(eqn.params["jaxpr"], unknown)
            n = eqn.params.get("length", 1)
            w_total += wi * n
            raw_total += ri * n
            continue
        if name in FREE:
            continue
        if name.startswith("reduce_") or name in ("argmax", "argmin"):
            n = max((_size(v.aval) for v in eqn.invars), default=1)
            w_total += n
            raw_total += n
            continue
        n = max((_size(v.aval) for v in list(eqn.outvars) + list(eqn.invars)),
                default=1)
        if name in WEIGHTS:
            w_total += WEIGHTS[name] * n
            raw_total += n
        else:
            unknown.setdefault(name, 0)
            unknown[name] += n
            w_total += n
            raw_total += n
    return w_total, raw_total


def integrator_ops_per_lane(packed, static, bounces: int):
    """(weighted, raw) VPU ops per lane for ONE full sample of the
    integrator (camera generation + `bounces` bounces) — the exact code the
    Pallas megakernel traces per lane per sample."""
    import jax
    import jax.numpy as jnp

    from ..core import rng
    from ..core.camera import rays_for_pixels
    from ..core.rng import PixelNoise
    from ..render.integrator import trace_rays

    H, W = 8, 128
    lanes = H * W
    ii = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[:, None], (H, W))
    jj = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (H, W))

    def one_sample(pk):
        noise = PixelNoise(jnp.int32(0), jnp.int32(0), ii, jj)
        jx, jy, _ = noise.uniform3(0, rng.TAG_PIXEL_JITTER)
        ro, rd = rays_for_pixels(pk.camera, ii.astype(jnp.float32),
                                 jj.astype(jnp.float32), H, W, jx, jy)
        return trace_rays(pk, static, ro, rd, noise, bounces).color.stack()

    w, raw = count_jaxpr(jax.make_jaxpr(one_sample)(packed))
    return w / lanes, raw / lanes
