"""Megakernel profiling — attribute the gap between measured Mrays/s and the
VPU roofline (VERDICT r3 next #1).

Four independent measurements, each written incrementally to the output JSON
(default PROFILE_r04.json) so a timeout still leaves a usable artifact:

1. `op_count` — a HAND-DERIVED FLOPs/ray replacement for the implausible XLA
   cost-analysis figure (27.9 flops/ray, BENCH_r03): walk the jaxpr of one
   traced sample (camera + full 5-bounce loop, the exact code the Mosaic
   kernel traces) and count per-lane VPU ops per primitive with documented
   weights.  Elementwise f32/i32 ops cost 1 VPU op; transcendentals cost
   their multi-pass expansions (weights in `WEIGHTS`).  The speed-of-light
   bound is then ops_per_sample·lanes / 3.85e12 op/s (v5e VPU: 4 ALUs x
   8x128 lanes x 0.94 GHz, NOT the 7.7e12 FMA-doubled figure — the
   integrator's compare/select/hash chains don't pair into FMAs).

2. `cost_recon` — why 27.9 was wrong: XLA cost analysis of the spp-fori_loop
   twin at spp=1 vs spp=8 shows whether loop bodies are counted once
   (flops ratio ~1) or per-trip (~8).

3. `phases` — on-chip timings of stripped kernel variants (full, constant
   RNG, constant texture, no shadow scan, no NEE, intersect-only): the
   subtractive per-phase attribution of the forward kernel's time.

4. `tiles_fwd` / `tiles_bwd` / `open_scene` — tile-shape sweeps for both
   kernels and the open-scene early-exit win at column-tiled granularity.

Run on the real chip:  PYTHONPATH=/root/repo python tools/profile_megakernel.py
"""
from __future__ import annotations

import argparse
import json
import os
import time
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

T0 = time.time()

# --------------------------------------------------------------------------
# 1. jaxpr op counting
# --------------------------------------------------------------------------

# Per-element VPU-op weights.  1 = single ALU op.  Transcendentals reflect
# the multi-instruction expansions Mosaic emits on the VPU (polynomial or
# Newton iterations); they are estimates, but an order of magnitude tighter
# than XLA's flat flops=1 treatment.  Data movement costs 0 (fused/layout).
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
    except Exception:
        return 1


def count_jaxpr(jaxpr, mult=1.0, unknown=None):
    """Weighted VPU-op count of a (closed) jaxpr, recursing into calls and
    control flow.  Returns (weighted_ops, raw_elementwise_ops)."""
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
                w, r = count_jaxpr(inner, mult, unknown)
                w_total += w
                raw_total += r
            continue
        if name == "cond":
            # masks-not-branches: conds are rare; charge the max branch
            ws = [count_jaxpr(b, mult, unknown)
                  for b in eqn.params["branches"]]
            w_total += max(w for w, _ in ws)
            raw_total += max(r for _, r in ws)
            continue
        if name == "while":
            # trip count is dynamic: charge ONE iteration and flag it
            w, r = count_jaxpr(eqn.params["body_jaxpr"], mult, unknown)
            unknown.setdefault("while_loops_counted_once", 0)
            unknown["while_loops_counted_once"] += 1
            w_total += w
            raw_total += r
            continue
        if name == "scan":
            w, r = count_jaxpr(eqn.params["jaxpr"], mult, unknown)
            n = eqn.params.get("length", 1)
            w_total += w * n
            raw_total += r * n
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
            w_total += n   # charge 1/element for unknown primitives
            raw_total += n
    return w_total, raw_total


def op_count_section(scene_name="cornell_mirror", bounces=5):
    from sail_tpu import scenes
    from sail_tpu.core import rng
    from sail_tpu.core.camera import rays_for_pixels
    from sail_tpu.core.rng import PixelNoise
    from sail_tpu.render.integrator import trace_rays
    from sail_tpu.ops import intersect as isect
    from sail_tpu.ops import lights as lights_ops
    from sail_tpu.ops import materials as mat_ops

    packed, static = getattr(scenes, scene_name)().pack()
    H, W = 8, 128   # one VPU-native tile of lanes; scalar eqns are noise
    lanes = H * W
    ii = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[:, None], (H, W))
    jj = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (H, W))

    def one_sample(pk):
        noise = PixelNoise(jnp.int32(0), jnp.int32(0), ii, jj)
        jx, jy, _ = noise.uniform3(0, rng.TAG_PIXEL_JITTER)
        ro, rd = rays_for_pixels(pk.camera, ii.astype(jnp.float32),
                                 jj.astype(jnp.float32), H, W, jx, jy)
        return trace_rays(pk, static, ro, rd, noise, bounces).color.stack()

    unknown = {}
    w, raw = count_jaxpr(jax.make_jaxpr(one_sample)(packed), unknown=unknown)

    # sub-component counts (per call, same lane block)
    noise = PixelNoise(jnp.int32(0), jnp.int32(0), ii, jj)
    jx, jy, _ = noise.uniform3(0, rng.TAG_PIXEL_JITTER)
    ro, rd = rays_for_pixels(packed.camera, ii.astype(jnp.float32),
                             jj.astype(jnp.float32), H, W, jx, jy)
    hit = isect.intersect_scene(packed.objects, static, ro, rd)

    def _cnt(fn, *args):
        u = {}
        cw, cr = count_jaxpr(jax.make_jaxpr(fn)(*args), unknown=u)
        return {"vpu_ops_per_lane": round(cw / lanes, 1),
                "raw_ops_per_lane": round(cr / lanes, 1)}

    sub = {
        "intersect_scene": _cnt(
            lambda p: isect.intersect_scene(p.objects, static, ro, rd).t,
            packed),
        "occluded_shadow_scan": _cnt(
            lambda p: isect.occluded(p.objects, static, ro, rd,
                                     jnp.full((H, W), 2.0)), packed),
        "sample_direct_incl_shadow": _cnt(
            lambda p: lights_ops.sample_direct(
                p.objects, p.lights, static, hit.p, hit.n, jx, jy,
                jnp.zeros((H, W), jnp.int32))[0].stack(), packed),
        "sample_material": _cnt(
            lambda p: mat_ops.sample_material(
                p.materials, static, hit.mat_row, Vec3_ones((H, W)), jx, jy,
                jx, rd, hit.into).wi.stack(), packed),
        "rng_uniform3": _cnt(
            lambda s: jnp.stack(PixelNoise(s, jnp.int32(0), ii, jj)
                                .uniform3(1, 1)), jnp.int32(0)),
        "camera_rays": _cnt(
            lambda p: rays_for_pixels(p.camera, ii.astype(jnp.float32),
                                      jj.astype(jnp.float32), H, W, jx,
                                      jy)[1].stack(), packed),
    }

    ops_per_sample = w / lanes
    # ray convention (bench.py): bounces*2 ray queries per lane-sample
    rays_per_sample = bounces * 2
    vpu_peak_ops = 3.85e12
    return {
        "scene": scene_name, "bounces": bounces,
        "vpu_ops_per_lane_sample": round(ops_per_sample, 1),
        "raw_ops_per_lane_sample": round(raw / lanes, 1),
        "vpu_ops_per_ray_convention": round(ops_per_sample / rays_per_sample, 1),
        "weights_note": "elementwise=1 op; div/sqrt/rsqrt=4; sin/cos/exp/log=8;"
                        " acos/asin=12; atan2/pow=16; data movement=0",
        "vpu_peak_ops_per_s": vpu_peak_ops,
        "sol_mrays_per_s": round(
            rays_per_sample / (ops_per_sample / vpu_peak_ops) / 1e6, 1),
        "unknown_primitives": unknown,
        "subcomponents_per_call": sub,
    }


def Vec3_ones(shape):
    from sail_tpu.core.vecmath import Vec3
    one = jnp.ones(shape, jnp.float32)
    return Vec3(one, one, one)


# --------------------------------------------------------------------------
# 2. XLA cost-analysis reconciliation
# --------------------------------------------------------------------------

def cost_recon_section():
    from sail_tpu import scenes
    from sail_tpu.render.integrator import render_image

    packed, static = scenes.cornell_mirror().pack()
    out = {}
    for spp in (1, 8):
        def impl(p, spp=spp):
            img = render_image(p, static, 128, 128, spp, seed=0,
                               max_bounces=5)
            return img.x.sum() + img.y.sum() + img.z.sum()
        c = jax.jit(impl).lower(packed).compile()
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out[f"flops_spp{spp}"] = float(ca.get("flops", 0.0))
    r = out["flops_spp8"] / max(out["flops_spp1"], 1.0)
    out["spp8_over_spp1"] = round(r, 2)
    out["verdict"] = ("fori_loop body counted once -> cost-analysis flops "
                      "are ~spp x too low" if r < 2.0 else
                      "loop trip count IS included; low flops/ray needs "
                      "another explanation")
    return out


# --------------------------------------------------------------------------
# 3. phase-stripped kernel timings
# --------------------------------------------------------------------------

@contextmanager
def _patched(*patches):
    """patches: (obj, attr, replacement).  Applied during TRACING only."""
    saved = [(o, a, getattr(o, a)) for o, a, _ in patches]
    try:
        for o, a, r in patches:
            setattr(o, a, r)
        yield
    finally:
        for o, a, v in saved:
            setattr(o, a, v)


def _time_compiled(fn, packed, iters=3):
    c = jax.jit(fn).lower(packed, 0).compile()
    float(c(packed, 0))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(c(packed, i + 1))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def phases_section(size=1024, spp=64, bounces=5, iters=3, budget_left=None):
    from sail_tpu import scenes
    from sail_tpu.core import rng as rng_mod
    from sail_tpu.core import vecmath as vm
    from sail_tpu.core.camera import rays_for_pixels
    from sail_tpu.core.rng import PixelNoise
    from sail_tpu.core.vecmath import Vec3
    from sail_tpu.ops import intersect as isect
    from sail_tpu.ops import lights as lights_ops
    from sail_tpu.ops import textures as tex_ops
    from sail_tpu.ops.pallas.megakernel import render_block_pallas

    packed, static = scenes.cornell_mirror().pack()
    H = W = size

    def full(p, seed):
        img = render_block_pallas(p, static, H, W, spp, seed, 0,
                                  max_bounces=bounces)
        return img.x.sum() + img.y.sum() + img.z.sum()

    results = {}

    def measure(name, patches=()):
        if budget_left is not None and budget_left() < 400:
            results[name] = None
            return
        try:
            with _patched(*patches):
                results[name] = round(_time_compiled(full, packed, iters), 4)
        except Exception as e:  # pragma: no cover
            results[name] = f"error: {e!r}"

    measure("full_s")

    # constant RNG: every uniform3 -> (0.5, 0.5, 0.5); kills the PCG3D hash
    def const_u3(self, bounce, tag):
        h = jnp.full(jnp.shape(self.ii), 0.5, jnp.float32)
        return h, h, h
    measure("const_rng_s", [(PixelNoise, "uniform3", const_u3)])

    # constant texture
    orig_sc = tex_ops.surface_color

    def const_sc(textures, static_, tex_row, p, u, v, ov, use_ov):
        one = jnp.ones(jnp.shape(u), jnp.float32)
        return Vec3(one, one, one)
    measure("const_texture_s", [(tex_ops, "surface_color", const_sc)])

    # no shadow scan (NEE keeps sampling, visibility assumed 1)
    def no_occ(objects, static_, ro, rd, max_t):
        return jnp.zeros(jnp.shape(max_t), bool)
    measure("no_shadow_scan_s", [(isect, "occluded", no_occ)])

    # no NEE at all
    orig_sd = lights_ops.sample_direct

    def no_nee(objects, lights, static_, hit_p, hit_n, u1, u2, lidx):
        zero = jnp.zeros(hit_p.shape, jnp.float32)
        return Vec3(zero, zero, zero), Vec3(zero, zero, zero + 1.0)
    measure("no_nee_s", [(lights_ops, "sample_direct", no_nee)])

    # intersect-only bounce loop (camera + closest-hit + mirror continue)
    def isect_only(p, seed):
        ii = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[:, None], (H, W))
        jj = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (H, W))

        def tile_fn(pk):
            noise = PixelNoise(jnp.int32(seed), jnp.int32(0), ii, jj)
            jx, jy, _ = noise.uniform3(0, rng_mod.TAG_PIXEL_JITTER)
            ro, rd = rays_for_pixels(pk.camera, ii.astype(jnp.float32),
                                     jj.astype(jnp.float32), H, W, jx, jy)
            acc = jnp.zeros((H, W), jnp.float32)
            for b in range(bounces):
                hit = isect.intersect_scene(pk.objects, static, ro, rd)
                acc = acc + jnp.where(hit.valid, hit.t, 0.0)
                rd = (rd - hit.n * (2.0 * hit.n.dot(rd))).normalize()
                ro = hit.p + hit.n * 1e-4
            return acc

        def loop(s, a):
            return a + tile_fn(p)
        acc = jax.lax.fori_loop(0, spp, loop, jnp.zeros((H, W), jnp.float32))
        return acc.sum()

    if budget_left is None or budget_left() > 400:
        try:
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            def isect_kernel_call(p, seed):
                from sail_tpu.ops.pallas.megakernel import _flatten_scene
                params, treedef, n_leaves = _flatten_scene(p)
                tr = 8

                def kernel(params_ref, out_ref):
                    vals = [params_ref[i] for i in range(n_leaves)]
                    pk = jax.tree.unflatten(treedef, vals)
                    ti = pl.program_id(0)
                    ii = (ti * tr + jax.lax.broadcasted_iota(
                        jnp.int32, (tr, W), 0))
                    jj = jax.lax.broadcasted_iota(jnp.int32, (tr, W), 1)
                    noise = PixelNoise(jnp.int32(0), jnp.int32(0), ii, jj)
                    jx, jy, _ = noise.uniform3(0, rng_mod.TAG_PIXEL_JITTER)
                    ro0, rd0 = rays_for_pixels(
                        pk.camera, ii.astype(jnp.float32),
                        jj.astype(jnp.float32), H, W, jx, jy)

                    def body(s, acc):
                        ro, rd = ro0, rd0
                        a = jnp.zeros((tr, W), jnp.float32)
                        for b in range(bounces):
                            hit = isect.intersect_scene(pk.objects, static,
                                                        ro, rd)
                            a = a + jnp.where(hit.valid, hit.t, 0.0)
                            rd = (rd - hit.n * (2.0 * hit.n.dot(rd))
                                  ).normalize()
                            ro = hit.p + hit.n * 1e-4
                        return acc + a

                    out_ref[:] = jax.lax.fori_loop(
                        0, spp, body, jnp.zeros((tr, W), jnp.float32))

                out = pl.pallas_call(
                    kernel, grid=(H // tr,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                    out_specs=pl.BlockSpec((tr, W), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
                )(params)
                return out.sum()

            results["intersect_only_s"] = round(
                _time_compiled(isect_kernel_call, packed, iters), 4)
        except Exception as e:  # pragma: no cover
            results["intersect_only_s"] = f"error: {e!r}"

    # derived deltas
    f = results.get("full_s")
    if isinstance(f, float):
        for key, label in [("const_rng_s", "rng_cost_s"),
                           ("const_texture_s", "texture_cost_s"),
                           ("no_shadow_scan_s", "shadow_scan_cost_s"),
                           ("no_nee_s", "nee_total_cost_s")]:
            v = results.get(key)
            if isinstance(v, float):
                results[label] = round(f - v, 4)
    results["config"] = f"{size}^2 x {spp}spp x {bounces}b, tile 8x{size}"
    return results


# --------------------------------------------------------------------------
# 4. tile sweeps + open scene
# --------------------------------------------------------------------------

def tiles_fwd_section(size=1024, spp=64, bounces=5, iters=3,
                      budget_left=None):
    from sail_tpu import scenes
    from sail_tpu.ops.pallas.megakernel import render_block_pallas

    packed, static = scenes.cornell_mirror().pack()
    H = W = size
    shapes = [(8, 1024), (8, 512), (8, 256), (8, 128),
              (16, 512), (4, 512), (16, 256), (32, 1024)]
    out = {}
    for tr, tc in shapes:
        if budget_left is not None and budget_left() < 400:
            break
        def impl(p, seed, tr=tr, tc=tc):
            img = render_block_pallas(p, static, H, W, spp, seed, 0,
                                      max_bounces=bounces, tile_rows=tr,
                                      tile_cols=tc)
            return img.x.sum() + img.y.sum() + img.z.sum()
        try:
            out[f"{tr}x{tc}"] = round(_time_compiled(impl, packed, iters), 4)
        except Exception as e:  # pragma: no cover
            out[f"{tr}x{tc}"] = f"error: {e!r}"
    return out


def tiles_bwd_section(size=1024, spp=64, bounces=5, iters=3,
                      budget_left=None):
    from sail_tpu import scenes
    from sail_tpu.core.vecmath import Vec3
    from sail_tpu.ops.pallas.megakernel import render_grad_block_pallas

    packed, static = scenes.cornell_mirror().pack()
    H = W = size
    g1 = jnp.full((H, W), 1.0 / (H * W), jnp.float32)
    g = Vec3(g1, g1, g1)
    cases = [("remat", 8, 256), ("store", 8, 256), ("store", 8, 128),
             ("store", 8, 512), ("store", 16, 256), ("remat", 8, 128),
             ("store", 4, 256), ("store", 8, 1024)]
    out = {}
    for mode, tr, tc in cases:
        if budget_left is not None and budget_left() < 500:
            break
        def impl(p, seed, mode=mode, tr=tr, tc=tc):
            dp = render_grad_block_pallas(p, static, g, H, W, spp, seed, 0,
                                          max_bounces=bounces, tile_rows=tr,
                                          tile_cols=tc, mode=mode)
            return sum(jnp.sum(l) for l in jax.tree.leaves(dp))
        try:
            out[f"{mode}_{tr}x{tc}"] = round(
                _time_compiled(impl, packed, iters), 4)
        except Exception as e:  # pragma: no cover
            out[f"{mode}_{tr}x{tc}"] = f"error: {e!r}"
    return out


def vpu_peak_section(iters=5):
    """EMPIRICAL VPU op/s: tiny Pallas kernels timed on-chip.

    The public v5e spec pins only the MXU (197 bf16 TFLOP/s); the VPU
    op rate needed for the integrator's roofline (no matmuls) is
    datasheet-ambiguous (clock 0.94 vs ~1.5 GHz readings give 3.85e12 vs
    6.1e12 op/s).  So measure it: a fori_loop of K dependent-across-
    iterations but internally-parallel vector op blocks on an (8, 512)
    f32 tile, counted exactly.  Two mixes: pure mul-add (FMA-pairable)
    and an integrator-like mix (mul, add, max, select, rsqrt)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, Cn = 256, 512   # (rows, cols) block: 128K lanes
    K = 4096           # loop iterations
    G = 32             # grid steps
    # total elementwise ops ~ G*R*Cn*K*ops/iter ≈ 0.14 s at 4 Tops/s for
    # ops=8 — two orders of magnitude above the ~30 ms relay noise floor

    def run_kernel(body_ops, ops_per_elem_per_iter, R=R, Cn=Cn, G=G, K=K):
        def kernel(out_ref):
            a = (jax.lax.broadcasted_iota(jnp.int32, (R, Cn), 1)
                 .astype(jnp.float32) * 1e-3 + 1.0)
            b = a * 0.5 + 0.25

            def body(i, ab):
                a, b = ab
                return body_ops(a, b)

            a, b = jax.lax.fori_loop(0, K, body, (a, b))
            out_ref[:] = a + b

        out = pl.pallas_call(
            kernel, grid=(G,),
            out_specs=pl.BlockSpec((R, Cn), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, Cn), jnp.float32))()
        return out.sum()

    def fma_mix(a, b):
        # 8 mul-adds per element per iteration (dependent chain of 4 each)
        for _ in range(4):
            a = a * b + 1.000001
            b = b * a + 0.999999
        return a, b

    def integrator_mix(a, b):
        # mul, add, max, compare+select, rsqrt — 10 weighted ops/elem/iter
        for _ in range(2):
            a = a * b + 1.000001
            m = jnp.maximum(a, b)
            s = jnp.where(a > b, a, b * 1.000001)
            b = jax.lax.rsqrt(jnp.abs(m * s) + 1.0)
        return a, b

    def integrator_mix_ilp8(chains, _):
        # 8 INDEPENDENT (a, b) mix chains per iteration: at the megakernel's
        # own (8, 512) tile one op covers only 4 f32 vregs, so a single
        # serial chain is latency-bound (measured 0.8 Tops/s vs 5.3 on the
        # big block).  With 8 chains = ~64 independent vreg instrs in
        # flight, this measures the ISSUE-limited ceiling at tile geometry
        # — the honest comparator for the in-kernel marginal op cost.
        new = []
        for a, b in chains:
            for _ in range(2):
                a = a * b + 1.000001
                m = jnp.maximum(a, b)
                s = jnp.where(a > b, a, b * 1.000001)
                b = jax.lax.rsqrt(jnp.abs(m * s) + 1.0)
            new.append((a, b))
        return tuple(new), None

    def run_kernel_ilp8(R, Cn, G, K):
        def kernel(out_ref):
            base = (jax.lax.broadcasted_iota(jnp.int32, (R, Cn), 1)
                    .astype(jnp.float32) * 1e-3 + 1.0)
            chains = tuple((base * (1.0 + 0.01 * c), base * 0.5 + 0.25)
                           for c in range(8))

            def body(i, ch):
                return integrator_mix_ilp8(ch, None)[0]

            chains = jax.lax.fori_loop(0, K, body, chains)
            acc = chains[0][0]
            for a, b in chains[1:]:
                acc = acc + a + b
            out_ref[:] = acc + chains[0][1]

        out = pl.pallas_call(
            kernel, grid=(G,),
            out_specs=pl.BlockSpec((R, Cn), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, Cn), jnp.float32))()
        return out.sum()

    out = {}
    # Second geometry: the MEGAKERNEL's own (8, 512) tile = 4 f32 vregs
    # per op — measures the achievable rate at the kernel's actual vreg
    # count (vreg-level ILP there is 4-8x, not the big block's 128x), so
    # the op_slope section compares like with like.
    geoms = {"": dict(R=R, Cn=Cn, G=G, K=K),
             "_tile8x512": dict(R=8, Cn=512, G=4096, K=1024)}
    for name, body, ops in [("fma", fma_mix, 8),
                            ("integrator_mix", integrator_mix, 10)]:
        for suffix, geom in geoms.items():
            f = jax.jit(lambda body=body, ops=ops, geom=geom:
                        run_kernel(body, ops, **geom))
            float(f())
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                float(f())
                ts.append(time.perf_counter() - t0)
            ts.sort()
            t = ts[len(ts) // 2]
            elems_iters = (geom["G"] * geom["R"] * geom["Cn"] * geom["K"])
            total_ops = elems_iters * ops
            out[name + suffix] = {
                "seconds": round(t, 5),
                "ops_counted": total_ops,
                "achieved_tops_per_s": round(total_ops / t / 1e12, 3),
                "s_per_elem_iter": t / elems_iters,
                "unit": "Tops/s (1 op = 1 elementwise ALU op; a mul-add "
                        "counts 1 here, 2 under the FLOP convention)",
            }

    # issue-limited ceiling at tile geometry (8 independent chains)
    R8, Cn8, G8, K8 = 8, 512, 2048, 256
    f = jax.jit(lambda: run_kernel_ilp8(R8, Cn8, G8, K8))
    float(f())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    t = ts[len(ts) // 2]
    elems_iters = G8 * R8 * Cn8 * K8 * 8   # 8 chains per loop iteration
    out["integrator_mix_tile8x512_ilp8"] = {
        "seconds": round(t, 5),
        "ops_counted": elems_iters * 10,
        "achieved_tops_per_s": round(elems_iters * 10 / t / 1e12, 3),
        "s_per_elem_iter": t / elems_iters,
        "unit": "Tops/s, 8 independent mix chains (issue-limited at tile "
                "geometry; the single-chain _tile8x512 row is the "
                "latency-bound floor)",
    }
    return out


def tiles_bwd2_section(size=1024, spp=64, bounces=5, iters=3,
                       budget_left=None):
    """Follow-up backward sweep: remat at LARGER tiles (remat's residual
    footprint is one bounce's, so big tiles may fit where store OOMed),
    plus one store attempt with a raised scoped-VMEM limit."""
    from sail_tpu import scenes
    from sail_tpu.core.vecmath import Vec3
    from sail_tpu.ops.pallas.megakernel import render_grad_block_pallas

    packed, static = scenes.cornell_mirror().pack()
    H = W = size
    g1 = jnp.full((H, W), 1.0 / (H * W), jnp.float32)
    g = Vec3(g1, g1, g1)
    out = {}

    def impl_for(mode, tr, tc):
        def impl(p, seed):
            dp = render_grad_block_pallas(p, static, g, H, W, spp, seed, 0,
                                          max_bounces=bounces, tile_rows=tr,
                                          tile_cols=tc, mode=mode)
            return sum(jnp.sum(l) for l in jax.tree.leaves(dp))
        return impl

    def time_vmem64(impl, iters):
        """Compile with the raised scoped-VMEM limit — bench.py's config.
        The r4 sweep compiled remat tiles WITHOUT it and every 8x512+ case
        hit Mosaic's 16 MB default stack (JaxRuntimeError), leaving the
        claimed remat-8x512 number artifact-less (VERDICT r4 weak #1)."""
        lowered = jax.jit(impl).lower(packed, 0)
        c = lowered.compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": 65536})
        float(c(packed, 0))
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            float(c(packed, i + 1))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    for mode, tr, tc in [("remat", 8, 512), ("remat", 16, 256),
                         ("remat", 16, 512), ("remat", 32, 256),
                         ("remat", 8, 1024), ("remat", 16, 128)]:
        if budget_left is not None and budget_left() < 500:
            break
        try:
            out[f"{mode}_{tr}x{tc}_vmem64m"] = round(
                time_vmem64(impl_for(mode, tr, tc), iters), 4)
        except Exception as e:  # pragma: no cover
            out[f"{mode}_{tr}x{tc}_vmem64m"] = (
                f"error: {type(e).__name__}: {str(e)[:160]}")

    # store with a raised scoped-vmem limit (per-compile XLA option)
    for tr, tc in [(8, 512), (8, 256)]:
        if budget_left is not None and budget_left() < 500:
            break
        key = f"store_{tr}x{tc}_vmem64m"
        try:
            lowered = jax.jit(impl_for("store", tr, tc)).lower(packed, 0)
            c = lowered.compile(
                compiler_options={"xla_tpu_scoped_vmem_limit_kib": 65536})
            float(c(packed, 0))
            ts = []
            for i in range(iters):
                t0 = time.perf_counter()
                float(c(packed, i + 1))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            out[key] = round(ts[len(ts) // 2], 4)
        except Exception as e:  # pragma: no cover
            out[key] = f"error: {type(e).__name__}: {str(e)[:200]}"
    return out


def op_slope_section(size=1024, spp=64, bounces=5, iters=5,
                     budget_left=None, peak=None):
    """POST-OPT roofline proof by op injection (VERDICT r4 next #2).

    The Mosaic layout/optimization passes run server-side behind the axon
    relay (no dump available), so instead of counting executed instructions
    statically, MEASURE the kernel's marginal cost of a known op: inject K
    iterations of the vpu_peak `integrator_mix` body per lane-sample into
    the production forward megakernel (megakernel.INJECT_MIX_ITERS — joined
    through a 1e-37 term so nothing folds), time t(K), and fit the slope.

      utilization = peak_s_per_elem_iter / marginal_s_per_elem_iter

    If the kernel is at the VPU instruction roofline, extra ops cost
    exactly their at-peak time (utilization ~1).  If the scheduler has
    idle ALU slots (latency/data-movement-bound), injected independent
    work hides in them and the marginal cost is below at-peak cost
    (utilization < 1 by the headroom fraction).  This replaces the r4
    pre-opt upper-bound INFERENCE with a direct measurement, and

      executed_mix_iters_equiv = t(0) / marginal_s_per_elem_iter / lanes

    is an in-situ executed-op count (in mix-iteration units, x10 weighted
    ops/iter) comparable against the hand-counted pre-opt jaxpr ops.
    """
    from sail_tpu import scenes
    from sail_tpu.ops.pallas import megakernel as mk

    packed, static = scenes.cornell_mirror().pack()
    H = W = size
    lanes = H * W * spp
    # UNROLLED injection (see megakernel._inject_mix): keep K small enough
    # that the straight-line block stays schedulable; 64 iters = ~640
    # weighted ops vs the kernel's ~1800/lane-sample equivalent.
    ks = [0, 16, 32, 64]
    out = {"config": f"{size}^2 x {spp}spp x {bounces}b, tile 8x512, "
                     "unrolled injection"}
    times = {}
    saved = mk.INJECT_MIX_ITERS
    try:
        for k in ks:
            if budget_left is not None and budget_left() < 500:
                break
            mk.INJECT_MIX_ITERS = k

            def impl(p, seed):
                img = mk.render_block_pallas(p, static, H, W, spp, seed, 0,
                                             max_bounces=bounces,
                                             tile_rows=8, tile_cols=512)
                return img.x.sum() + img.y.sum() + img.z.sum()

            try:
                times[k] = _time_compiled(impl, packed, iters)
                out[f"t_inject{k}"] = round(times[k], 4)
            except Exception as e:  # pragma: no cover
                out[f"t_inject{k}"] = f"error: {type(e).__name__}"
    finally:
        mk.INJECT_MIX_ITERS = saved

    got = sorted(k for k in times)
    if len(got) >= 2:
        # least-squares slope of t vs K (seconds per mix-iter-per-lane)
        kk = np.array(got, float)
        tt = np.array([times[k] for k in got])
        slope = float(np.polyfit(kk, tt, 1)[0])
        marginal = slope / lanes          # s per elem per mix-iter, in situ
        out["marginal_s_per_elem_iter"] = marginal
        out["slope_s_per_inject_iter"] = slope
        if peak:
            for key in ("integrator_mix_tile8x512_ilp8",
                        "integrator_mix_tile8x512", "integrator_mix"):
                pk = peak.get(key)
                if isinstance(pk, dict) and "s_per_elem_iter" in pk:
                    util = pk["s_per_elem_iter"] / max(marginal, 1e-30)
                    out[f"utilization_vs_{key}"] = round(util, 3)
        if marginal > 0 and isinstance(times.get(0), float):
            eq_iters = times[0] / marginal / lanes
            out["executed_mix_iters_equiv_per_lane_sample"] = round(
                eq_iters, 1)
            out["executed_weighted_ops_equiv_per_lane_sample"] = round(
                eq_iters * 10, 1)
    return out


def unroll_section(size=1024, spp=64, bounces=5, iters=3, budget_left=None):
    """spp-unroll sweep: independent sample chains interleaved per loop
    iteration (ILP against the latency-bound phase finding)."""
    from sail_tpu import scenes
    from sail_tpu.core.vecmath import Vec3
    from sail_tpu.ops.pallas.megakernel import (render_block_pallas,
                                                render_grad_block_pallas)

    packed, static = scenes.cornell_mirror().pack()
    H = W = size
    out = {}
    for un in (1, 2, 4):
        if budget_left is not None and budget_left() < 400:
            break
        def impl(p, seed, un=un):
            img = render_block_pallas(p, static, H, W, spp, seed, 0,
                                      max_bounces=bounces, tile_rows=8,
                                      tile_cols=512, spp_unroll=un)
            return img.x.sum() + img.y.sum() + img.z.sum()
        try:
            out[f"fwd_8x512_u{un}"] = round(
                _time_compiled(impl, packed, iters), 4)
        except Exception as e:  # pragma: no cover
            out[f"fwd_8x512_u{un}"] = f"error: {type(e).__name__}"

    g1 = jnp.full((H, W), 1.0 / (H * W), jnp.float32)
    g = Vec3(g1, g1, g1)
    for un in (2,):
        if budget_left is not None and budget_left() < 500:
            break
        def gimpl(p, seed, un=un):
            dp = render_grad_block_pallas(p, static, g, H, W, spp, seed, 0,
                                          max_bounces=bounces, tile_rows=8,
                                          tile_cols=256, mode="remat",
                                          spp_unroll=un)
            return sum(jnp.sum(l) for l in jax.tree.leaves(dp))
        try:
            out[f"bwd_remat_8x256_u{un}"] = round(
                _time_compiled(gimpl, packed, iters), 4)
        except Exception as e:  # pragma: no cover
            out[f"bwd_remat_8x256_u{un}"] = f"error: {type(e).__name__}"
    return out


def open_scene_section(size=512, spp=32, bounces=5, iters=3,
                       budget_left=None):
    from sail_tpu import scenes
    from sail_tpu.ops.pallas.megakernel import render_block_pallas

    packed, static = scenes.material_demo_open().pack()
    H = W = size
    out = {}
    for tc in (512, 256, 128):
        for early in (False, True):
            if budget_left is not None and budget_left() < 400:
                return out
            def impl(p, seed, tc=tc, early=early):
                img = render_block_pallas(p, static, H, W, spp, seed, 0,
                                          max_bounces=bounces, tile_rows=8,
                                          tile_cols=tc, early_exit=early)
                return img.x.sum() + img.y.sum() + img.z.sum()
            key = f"8x{tc}_{'early' if early else 'base'}"
            try:
                out[key] = round(_time_compiled(impl, packed, iters), 4)
            except Exception as e:  # pragma: no cover
                out[key] = f"error: {e!r}"
        b, e = out.get(f"8x{tc}_base"), out.get(f"8x{tc}_early")
        if isinstance(b, float) and isinstance(e, float):
            out[f"8x{tc}_speedup"] = round(b / e, 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PROFILE_r04.json")
    ap.add_argument("--budget-s", type=float, default=7200.0)
    ap.add_argument("--sections", default="op_count,cost_recon,phases,"
                                          "tiles_fwd,tiles_bwd,open_scene")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    def budget_left():
        return args.budget_s - (time.time() - T0)

    result = {"device": str(jax.devices()[0]), "sections": {}}

    def save():
        result["seconds_total"] = round(time.time() - T0, 1)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)

    wanted = args.sections.split(",")
    runners = {
        "op_count": op_count_section,
        "cost_recon": cost_recon_section,
        "phases": lambda: phases_section(iters=args.iters,
                                         budget_left=budget_left),
        "tiles_fwd": lambda: tiles_fwd_section(iters=args.iters,
                                               budget_left=budget_left),
        "tiles_bwd": lambda: tiles_bwd_section(iters=args.iters,
                                               budget_left=budget_left),
        "tiles_bwd2": lambda: tiles_bwd2_section(iters=args.iters,
                                                 budget_left=budget_left),
        "vpu_peak": vpu_peak_section,
        "op_slope": lambda: op_slope_section(
            budget_left=budget_left,
            peak=result["sections"].get("vpu_peak")),
        "unroll": lambda: unroll_section(iters=args.iters,
                                         budget_left=budget_left),
        "open_scene": lambda: open_scene_section(iters=args.iters,
                                                 budget_left=budget_left),
    }
    for name in wanted:
        if budget_left() < 120:
            result["sections"][name] = "skipped: budget"
            continue
        t0 = time.time()
        try:
            result["sections"][name] = runners[name]()
        except Exception as e:  # pragma: no cover
            result["sections"][name] = f"error: {e!r}"
        result["sections"][f"_{name}_s"] = round(time.time() - t0, 1)
        save()
        print(f"[{time.time()-T0:7.1f}s] section {name} done", flush=True)
    save()
    print(json.dumps(result["sections"].get("op_count", {}), indent=1))


if __name__ == "__main__":
    main()
