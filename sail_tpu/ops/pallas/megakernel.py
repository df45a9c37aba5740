"""Pallas path-tracing megakernel.

The reference's entire renderer is one GLSL fragment-shader megakernel
(ref: src/shader/main/fstrace.glsl + trace/path.glsl) launched per pixel.
This is its TPU twin: one Pallas program per image row-tile runs camera-ray
generation, the full bounce loop (intersect → shade → NEE), and multi-sample
accumulation entirely in VMEM — no HBM round-trips between bounces, which is
where the XLA-fused path spends its slack (measured ≈2.5× above the pure-VPU
compute bound at 1024²).

The kernel body REUSES the framework's jnp ops (intersect/materials/lights/
textures are pure elementwise code over Vec3-of-arrays), traced inside the
kernel over (tile_rows, width) blocks.  Scene parameters arrive as one
flattened f32 vector and are rebuilt into the PackedScene pytree of scalars
with `jax.tree.unflatten` — so the same static specialization (only the
scene's shape/material/light types compile) applies inside the kernel.

Differentiability: `render_image_fast` carries a custom_vjp whose backward
is a second Pallas megakernel (`render_grad_block_pallas`): per-sample
vector-Jacobian products re-traced entirely in VMEM with manual per-bounce
checkpointing, parameter gradients accumulated across the sequential grid —
the same estimator and RNG as the forward, so gradients match the XLA path
to float32 reassociation error.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import constants as C
from ...core import rng
from ...core.camera import rays_for_pixels
from ...core.rng import PixelNoise
from ...core.vecmath import Vec3


# Backward-kernel defaults.  mode="remat" re-linearizes each bounce from
# its stored carry (second primal sweep, minimal residency); "store" keeps
# every bounce's linearization residuals live (one primal sweep, no
# re-run).  MEASURED on v5e (PROFILE_r04.json tiles_bwd, 1024^2x64spp):
# store is 15% SLOWER at 8x256 (0.464 s vs remat 0.402 s) and compile-OOMs
# against Mosaic's 16 MB scoped-VMEM stack at 8x512+ — on the VPU,
# recomputing a bounce is cheaper than holding its residuals live (the
# long live ranges wreck scheduling).  Both modes produce BIT-EQUAL
# gradients (verified on-chip); "store" stays available as the documented
# negative result and for future hardware where the tradeoff may flip.
GRAD_MODE = "remat"
GRAD_TILE_ROWS = 8
GRAD_TILE_COLS = {"store": 256, "remat": 256}

# Samples traced per fori_loop iteration (independent chains interleaved
# for ILP — see _trace_tile docstring).  Bit-identical for any value;
# defaults picked by the r4 on-chip sweep (PROFILE_r04.json unroll).
FWD_SPP_UNROLL = 1
BWD_SPP_UNROLL = 1

# Op-injection roofline probe (tools/profile_megakernel.py op_slope): when
# >0, every forward sample additionally runs this many iterations of the
# EXACT `integrator_mix` body the vpu_peak microbench times (fma, max,
# compare+select, rsqrt — ~10 weighted VPU ops/elem/iter), seeded from the
# sample's jitter so nothing hoists or folds, and joined into the output
# through a ~1e-37-scaled term (numerically invisible, not DCE-able).
# Measuring d(time)/d(iterations) in the REAL kernel and dividing by the
# microbench's at-peak seconds-per-iteration gives a DIRECT occupancy
# measurement: ratio ~1 -> no idle ALU slots (kernel at the instruction
# roofline); ratio << 1 -> the scheduler absorbed the extra work into idle
# slots, i.e. measurable headroom.  Default 0: production kernels carry
# zero probe code (Python-level if).
INJECT_MIX_ITERS = 0


def _inject_mix(jx, jy, iters):
    """The vpu_peak `integrator_mix` body, iterated `iters` times on state
    seeded from per-sample jitter.  Bounded by construction (rsqrt pulls b
    into (0,1]); returns a tiny join term.  Op accounting happens in units
    of mix-ITERATIONS, so no per-op weight convention is needed.

    UNROLLED straight-line (no inner fori_loop): Mosaic schedules at basic-
    block granularity and will NOT interleave a separate inner loop with
    the surrounding trace computation — a looped probe just measures its
    own standalone latency (measured: looped marginal 1.07e-11 s/elem-iter
    ~= the serial chain's standalone rate at (8,512), PROFILE_r05 first
    pass).  Unrolled, the injected ops sit in the same block as the bounce
    math, so idle issue slots (if any) can absorb them — which is the
    thing the probe exists to detect."""
    a = jx * 0.5 + 1.0
    b = jy * 0.25 + 0.5
    for _ in range(iters):
        for _ in range(2):
            a = a * b + 1.000001
            m = jnp.maximum(a, b)
            s = jnp.where(a > b, a, b * 1.000001)
            b = jax.lax.rsqrt(jnp.abs(m * s) + 1.0)
    return (a + b) * 1e-37


def _flatten_scene(packed):
    leaves, treedef = jax.tree.flatten(packed)
    params = jnp.stack([jnp.asarray(l, jnp.float32).reshape(()) for l in leaves])
    return params, treedef, len(leaves)


def _trace_tile(pk, static, ii, jj, height, width, seed, sample0, spp,
                max_bounces, early_exit=False, spp_unroll=1, cull=False):
    """Accumulate `spp` samples for one tile — shared by the kernel body and
    (for parity testing) the interpreter path.

    `spp_unroll`: samples traced per fori_loop iteration.  The integrator's
    per-sample chain is dependency-latency-bound on the VPU (removing the
    entire NEE+shadow subgraph leaves kernel time unchanged —
    PROFILE_r04.json phases), so interleaving >1 INDEPENDENT sample chains
    gives the scheduler parallel work to hide latencies with.  The
    accumulator is still folded strictly in sample order
    ((acc + f(2k)) + f(2k+1) associates exactly like the sequential loop),
    so results stay BIT-IDENTICAL to spp_unroll=1 and to the XLA
    integrator."""

    def one(s, acc):
        noise = PixelNoise(seed, sample0 + s, ii, jj)
        jx, jy, _ = noise.uniform3(0, rng.TAG_PIXEL_JITTER)
        ro, rd = rays_for_pixels(pk.camera, ii.astype(jnp.float32),
                                 jj.astype(jnp.float32), height, width, jx, jy)
        # early_exit (opt-in): a row-tile whose lanes are ALL dead skips the
        # rest of the bounce loop — mathematically exact (dead lanes add 0)
        # and worth up to ~2.5x on open scenes where escaped rays die in
        # coherent sky tiles, but NOT bit-identical: lax.cond changes XLA's
        # fusion/codegen by a few ulp even on always-taken branches
        # (docs/OCCUPANCY.md).  Default OFF so the production kernels stay
        # bit-equal to the XLA integrator (tools/tpu_checks.py check 1).
        from ...render.integrator import trace_rays
        res = trace_rays(pk, static, ro, rd, noise, max_bounces,
                         early_exit=early_exit, cull=cull)
        color = res.color
        if INJECT_MIX_ITERS:   # roofline probe only; 0 in production
            probe = _inject_mix(jx, jy, INJECT_MIX_ITERS)
            color = Vec3(color.x + probe, color.y, color.z)
        return acc + color

    while spp % spp_unroll:
        spp_unroll = max(spp_unroll // 2, 1)
    zero = jnp.zeros(ii.shape, jnp.float32)

    def body(k, acc):
        base = k * spp_unroll
        for u in range(spp_unroll):
            acc = one(base + u, acc)
        return acc

    # fori_loop (not full Python unroll): one traced body per spp_unroll
    # samples regardless of spp, keeping Mosaic compile time flat.
    return jax.lax.fori_loop(0, spp // spp_unroll, body,
                             Vec3(zero, zero, zero))


def render_block_pallas(packed, static, height: int, width: int, spp: int,
                        seed, sample0, max_bounces: int = C.MAX_BOUNCES,
                        tile_rows: int = 8, tile_cols: int = None,
                        interpret=None, row0=0, image_height: int = None,
                        vma=None, early_exit: bool = False,
                        spp_unroll: int = None, cull: bool = False) -> Vec3:
    """Forward render of an H×W block via the Pallas megakernel.

    Returns the SUM of `spp` sample passes (divide by spp for the mean).

    `row0`/`image_height`: when rendering a tile of a larger (sharded)
    image, the block's global first row and the full image height — RNG
    streams and camera rays then match the single-chip render exactly.

    `tile_cols` (default: min(256, width)): column-tile the grid like the
    backward kernel.  Pixel values are bit-identical for any tile shape
    (lanes never interact).  The r4 on-chip sweeps (PROFILE_r04.json
    tiles_fwd, /tmp-part3 recorded in docs/PERF.md) measured 8x256 ~8%
    faster than the r1-r3 full-width 8x1024 tiles (0.1286 s vs 0.1404 s
    at 1024^2x64spp), hence the 256 default; the tile shape also sets the
    opt-in `early_exit` granularity — full-width tiles span sky AND
    geometry on open scenes and never go all-dead (VERDICT r3 missing #4:
    1.22x of a 3.05x per-lane bound), while narrower tiles can die.

    `cull` (opt-in): per-TILE AABB broad phase for batched same-category
    object groups — inside the kernel the intersect/shadow folds cond-skip
    any object whose bound box no lane in THIS tile can reach.  This is
    where the batched cull actually pays (the whole-image XLA path's
    any-reduce is always true — MANYOBJ_r03/r04); small tiles + spatially
    localized objects prune most of the object loop per tile."""
    if interpret is None:
        # Mosaic only lowers for TPU; fall back to the interpreter on CPU
        # (tests / virtual-device meshes).
        interpret = jax.default_backend() == "cpu"
    while height % tile_rows:
        tile_rows //= 2  # fall back to a dividing tile height (worst case 1)
        tile_rows = max(tile_rows, 1)
        if tile_rows == 1:
            break
    assert height % tile_rows == 0, (height, tile_rows)
    if tile_cols is None:
        tile_cols = min(256, width)
    while width % tile_cols:
        tile_cols = max(tile_cols // 2, 1)
        if tile_cols == 1:
            break
    assert width % tile_cols == 0, (width, tile_cols)
    image_height = height if image_height is None else image_height
    params, treedef, n_leaves = _flatten_scene(packed)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape((1,))
    sample_arr = jnp.asarray(sample0, jnp.int32).reshape((1,))
    row0_arr = jnp.asarray(row0, jnp.int32).reshape((1,))

    def kernel(params_ref, seed_ref, sample_ref, row0_ref,
               out_x, out_y, out_z):
        vals = [params_ref[i] for i in range(n_leaves)]
        pk = jax.tree.unflatten(treedef, vals)
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        shape = (tile_rows, tile_cols)
        ii = (row0_ref[0] + ti * tile_rows +
              jax.lax.broadcasted_iota(jnp.int32, shape, 0))
        jj = (tj * tile_cols +
              jax.lax.broadcasted_iota(jnp.int32, shape, 1))
        acc = _trace_tile(pk, static, ii, jj, image_height, width,
                          seed_ref[0], sample_ref[0],
                          spp, max_bounces, early_exit=early_exit,
                          spp_unroll=(FWD_SPP_UNROLL if spp_unroll is None
                                      else spp_unroll), cull=cull)
        out_x[:] = acc.x
        out_y[:] = acc.y
        out_z[:] = acc.z

    if vma is None:
        out_shape = jax.ShapeDtypeStruct((height, width), jnp.float32)
    else:
        # under shard_map with vma checking, declare the output device-varying
        out_shape = jax.ShapeDtypeStruct((height, width), jnp.float32,
                                         vma=frozenset(vma))
    block = pl.BlockSpec((tile_rows, tile_cols), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    from ...ops import intersect as _isect
    saved_flag = _isect.IN_KERNEL_TRACE
    _isect.IN_KERNEL_TRACE = True   # unrolled winner-fold in-kernel
    try:
        outs = pl.pallas_call(
            kernel,
            grid=(height // tile_rows, width // tile_cols),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(block, block, block),
            out_shape=(out_shape, out_shape, out_shape),
            interpret=interpret,
        )(params, seed_arr, sample_arr, row0_arr)
    finally:
        _isect.IN_KERNEL_TRACE = saved_flag
    return Vec3(*outs)


def render_grad_block_pallas(packed, static, g: Vec3, height: int, width: int,
                             spp: int, seed, sample0,
                             max_bounces: int = C.MAX_BOUNCES,
                             tile_rows: int = None, tile_cols: int = None,
                             interpret=None, row0=0,
                             image_height: int = None, vma=None,
                             mode: str = None, spp_unroll: int = None):
    """Backward Pallas megakernel: dL/d(packed) for L = Σ_pixels g · image_sum
    where image_sum is the spp-SUM the forward kernel produces.

    The whole adjoint runs in VMEM: each grid step takes one image tile,
    loops over samples, and computes the per-sample vector-Jacobian product
    by tracing that sample's path *inside the kernel*.  Two modes
    (`mode`, default megakernel.GRAD_MODE):

    - "remat" (default): manual per-bounce checkpointing — the forward
      sweep stores only each bounce's small carry state, and the reverse
      sweep re-linearizes bounce b from its stored input (second primal
      run).  Minimal residual memory; measured fastest (see GRAD_MODE).
    - "store": ONE primal sweep with `jax.vjp` residuals held live for all
      bounces, then the reverse transpose sweep — fewer FLOPs on paper,
      but measured 15% slower on v5e and scoped-VMEM-bound at larger
      tiles (PROFILE_r04.json tiles_bwd); gradients bit-equal to "remat".
      (Mosaic cannot lower jax.checkpoint's remat2 primitive inside
      kernels, so both modes hand-build what jax.checkpoint would
      express.)

    Parameter gradients accumulate across the (sequential) TPU grid into a
    single (1, n_leaves) block.

    Unlike the forward kernel there is NO early-exit option: wrapping the
    per-bounce re-linearization in lax.cond produced NaN cotangents on open
    scenes (the round-2 regression — cond-wrapped vjp with float0-stripped
    cotangent plumbing), and the backward runs over 8×256 tiles where the
    all-dead case is rarer anyway; the masked full-depth adjoint is the one
    code path.

    shard_map vma typing: callers must run this under check_vma=False
    (parallel/render_sharded._check_vma(grad=True)).  Inside a Mosaic
    kernel trace, vma tags attach only to VMEM block reads of
    device-varying operands (the g blocks here) while SMEM scalar reads
    stay unvarying and lax.pcast(to="varying") is a silent no-op — so the
    in-kernel jax.vjp can never type-match a varying cotangent against the
    (unvarying) primal chain.  `vma` is accepted for the out_shape
    declaration only.
    """
    from ...render.integrator import _PathState, _bounce_step

    if mode is None:
        mode = GRAD_MODE
    assert mode in ("remat", "store"), mode
    if tile_rows is None:
        tile_rows = GRAD_TILE_ROWS
    if tile_cols is None:
        tile_cols = GRAD_TILE_COLS[mode]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    while height % tile_rows:
        tile_rows = max(tile_rows // 2, 1)
        if tile_rows == 1:
            break
    while width % tile_cols:
        tile_cols = max(tile_cols // 2, 1)
        if tile_cols == 1:
            break
    assert height % tile_rows == 0, (height, tile_rows)
    assert width % tile_cols == 0, (width, tile_cols)
    image_height = height if image_height is None else image_height
    params, treedef, n_leaves = _flatten_scene(packed)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape((1,))
    sample_arr = jnp.asarray(sample0, jnp.int32).reshape((1,))
    row0_arr = jnp.asarray(row0, jnp.int32).reshape((1,))

    grid = (height // tile_rows, width // tile_cols)

    def kernel(params_ref, seed_ref, sample_ref, row0_ref,
               gx_ref, gy_ref, gz_ref, dout_ref):
        params_vec = jnp.stack([params_ref[i] for i in range(n_leaves)])
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        shape = (tile_rows, tile_cols)
        ii = (row0_ref[0] + ti * tile_rows +
              jax.lax.broadcasted_iota(jnp.int32, shape, 0))
        jj = (tj * tile_cols +
              jax.lax.broadcasted_iota(jnp.int32, shape, 1))
        gx, gy, gz = gx_ref[:], gy_ref[:], gz_ref[:]

        def one_sample_grad(pvec, s):
            """d(Σ g·color_s)/d(pvec) via MANUAL per-bounce checkpointing:
            the forward stores only the small per-bounce carry states, then
            each bounce is re-linearized and transposed from its stored
            input.  (jax.checkpoint would express this directly, but Mosaic
            has no lowering for the remat2 primitive inside kernels.)"""
            noise = PixelNoise(seed_ref[0], sample_ref[0] + s, ii, jj)
            jx, jy, _ = noise.uniform3(0, rng.TAG_PIXEL_JITTER)

            def camera_rays(pv):
                pk = jax.tree.unflatten(treedef,
                                        [pv[i] for i in range(n_leaves)])
                return rays_for_pixels(pk.camera, ii.astype(jnp.float32),
                                       jj.astype(jnp.float32), image_height,
                                       width, jx, jy)

            def init_state(pv):
                ro, rd = camera_rays(pv)
                zero = jnp.zeros(ro.shape, jnp.float32)
                black = Vec3(zero, zero, zero)
                ones = Vec3(zero + 1.0, zero + 1.0, zero + 1.0)
                return _PathState(ro, rd, black, ones,
                                  jnp.ones(ro.shape, bool),
                                  jnp.zeros(ro.shape, bool), black, black)

            def step(pv, st, b):
                pk = jax.tree.unflatten(treedef,
                                        [pv[i] for i in range(n_leaves)])
                return _bounce_step(pk, st, noise, static=static, bounce=b,
                                    clamp_weight=True)

            import numpy as _np
            from jax import dtypes as _dtypes

            zero = jnp.zeros(ii.shape, jnp.float32)
            black = Vec3(zero, zero, zero)

            def _ct_like(ct, primal):
                # non-inexact primals (bool masks) take float0 cotangents
                if not jnp.issubdtype(primal.dtype, jnp.inexact):
                    return _np.zeros(primal.shape, _dtypes.float0)
                return ct

            def _seed_ct(final_state):
                return jax.tree.map(
                    _ct_like,
                    _PathState(black, black, Vec3(gx, gy, gz), black,
                               zero, zero, black, black),
                    final_state)

            dvec_acc = jnp.zeros((n_leaves,), jnp.float32)

            if mode == "store":
                # ONE primal sweep with linearization residuals kept live
                # (jax.vjp stores them at call time; applying vjp_fn later
                # does NOT re-run the primal).  All bounces' residuals
                # coexist in VMEM — fine at these tile sizes, and removes
                # the re-linearization 1.0x of the remat cost model.
                st, vjp_init = jax.vjp(init_state, pvec)
                vjp_fns = []
                for b in range(max_bounces):
                    st, fn = jax.vjp(
                        lambda pv, s_, b=b: step(pv, s_, b), pvec, st)
                    vjp_fns.append(fn)
                d_state = _seed_ct(st)
                for b in reversed(range(max_bounces)):
                    d_pv, d_state = vjp_fns[b](d_state)
                    dvec_acc = dvec_acc + d_pv
                (d_pv0,) = vjp_init(d_state)
                return dvec_acc + d_pv0

            # mode == "remat": forward sweep keeps each bounce's small input
            # carry; the reverse sweep re-linearizes bounce b from states[b]
            # (second primal run) and transposes it.
            states = [init_state(pvec)]
            for b in range(max_bounces):
                states.append(step(pvec, states[b], b))

            d_state = _seed_ct(states[max_bounces])
            for b in reversed(range(max_bounces)):
                _, vjp_fn = jax.vjp(
                    lambda pv, st, b=b: step(pv, st, b), pvec, states[b])
                d_pv, d_state = vjp_fn(d_state)
                dvec_acc = dvec_acc + d_pv
            # camera-ray generation also depends on params (eye/basis)
            _, vjp_rays = jax.vjp(init_state, pvec)
            (d_pv0,) = vjp_rays(d_state)
            return dvec_acc + d_pv0

        unroll = BWD_SPP_UNROLL if spp_unroll is None else spp_unroll
        while spp % unroll:
            unroll = max(unroll // 2, 1)

        def body(k, dacc):
            # >1 independent sample adjoints per iteration for ILP (see
            # _trace_tile): accumulation stays strictly sample-ordered, so
            # gradients are bit-identical for any unroll.
            base = k * unroll
            for u in range(unroll):
                dacc = dacc + one_sample_grad(params_vec, base + u)
            return dacc

        dvec0 = jnp.zeros((n_leaves,), jnp.float32)
        if spp == 1:
            # no sample loop: keeps the CPU (interpret/eager) test path free
            # of staged control flow, whose XLA CPU compile is pathological
            dvec = one_sample_grad(params_vec, 0)
        else:
            dvec = jax.lax.fori_loop(0, spp // unroll, body, dvec0)

        @pl.when((ti == 0) & (tj == 0))
        def _():
            dout_ref[:] = jnp.zeros_like(dout_ref)

        dout_ref[0, :] += dvec

    if vma is None:
        out_shape = jax.ShapeDtypeStruct((1, n_leaves), jnp.float32)
    else:
        out_shape = jax.ShapeDtypeStruct((1, n_leaves), jnp.float32,
                                         vma=frozenset(vma))
    gblock = pl.BlockSpec((tile_rows, tile_cols), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    from ...ops import intersect as _isect
    saved_flag = _isect.IN_KERNEL_TRACE
    _isect.IN_KERNEL_TRACE = True   # unrolled winner-fold in-kernel
    try:
        dout = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                gblock, gblock, gblock,
            ],
            out_specs=pl.BlockSpec((1, n_leaves), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=out_shape,
            interpret=interpret,
        )(params, seed_arr, sample_arr, row0_arr, g.x, g.y, g.z)
    finally:
        _isect.IN_KERNEL_TRACE = saved_flag
    leaves = [dout[0, i] for i in range(n_leaves)]
    return jax.tree.unflatten(treedef, leaves)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def render_image_fast(packed, seed, static, height, width, spp, max_bounces):
    """Mean image via the Pallas megakernel forward; gradients via the Pallas
    backward megakernel (identical estimator — the backward re-traces the
    same paths with the same RNG).  `seed` is a regular (traceable) argument
    so jitted callers can vary it per step; its cotangent is float0."""
    acc = render_block_pallas(packed, static, height, width, spp, seed, 0,
                              max_bounces)
    return acc * (1.0 / spp)


def _fast_fwd(packed, seed, static, height, width, spp, max_bounces):
    out = render_image_fast(packed, seed, static, height, width, spp,
                            max_bounces)
    return out, (packed, seed)


def _fast_bwd(static, height, width, spp, max_bounces, res, g):
    import numpy as _np
    from jax import dtypes as _dtypes

    packed, seed = res
    # forward returned mean = sum/spp: scale the cotangent onto the sum
    g_sum = g * (1.0 / spp)
    dpacked = render_grad_block_pallas(packed, static, g_sum, height, width,
                                       spp, seed, 0, max_bounces)
    d_seed = _np.zeros(jnp.shape(seed), _dtypes.float0)
    return (dpacked, d_seed)


render_image_fast.defvjp(_fast_fwd, _fast_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def render_tile_fast(packed, seed, sample0, row0, static, rows, width, spp,
                     image_height, max_bounces, vma=None, interpret=None):
    """Sharded-tile entry: the spp-SUM of a `rows`×`width` block whose global
    first row is `row0`, inside an image `image_height` tall — forward and
    backward both Pallas megakernels.  `seed`/`sample0`/`row0` are traceable
    (device-varying under shard_map); cotangents are float0.

    `interpret`: force/deny the Pallas interpreter — callers sharding over a
    mesh must pass the MESH devices' platform decision (the default keys on
    `jax.default_backend()`, which is wrong when a CPU mesh coexists with a
    TPU default backend)."""
    return render_block_pallas(packed, static, rows, width, spp, seed,
                               sample0, max_bounces, row0=row0,
                               image_height=image_height, vma=vma,
                               interpret=interpret)


def _tile_fwd(packed, seed, sample0, row0, static, rows, width, spp,
              image_height, max_bounces, vma=None, interpret=None):
    out = render_tile_fast(packed, seed, sample0, row0, static, rows, width,
                           spp, image_height, max_bounces, vma, interpret)
    return out, (packed, seed, sample0, row0)


def _tile_bwd(static, rows, width, spp, image_height, max_bounces, vma,
              interpret, res, g):
    import numpy as _np
    from jax import dtypes as _dtypes

    packed, seed, sample0, row0 = res
    dpacked = render_grad_block_pallas(packed, static, g, rows, width, spp,
                                       seed, sample0, max_bounces,
                                       row0=row0, image_height=image_height,
                                       vma=vma, interpret=interpret)
    f0 = lambda v: _np.zeros(jnp.shape(v), _dtypes.float0)
    return (dpacked, f0(seed), f0(sample0), f0(row0))


render_tile_fast.defvjp(_tile_fwd, _tile_bwd)
