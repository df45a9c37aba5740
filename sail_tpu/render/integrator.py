"""Wavefront path-tracing integrator.

TPU-native replacement for the reference's megakernel bounce loop
(ref: src/shader/trace/path.glsl:16-37 `trace`, :1-14 `shade`, and the
per-pixel entry main/fstrace.glsl).  All rays advance one bounce per step in
lock-step SIMD over flat lane-aligned arrays; dead rays are masked, not
branched.  The bounce loop is a statically unrolled Python loop (MAX_BOUNCES
is small and static), letting XLA fuse intersect→shade→NEE per bounce into a
handful of VPU kernels.

RNG: a stateless per-pixel hash keyed on GLOBAL pixel coordinates and
(seed, sample, bounce, tag) — renders are bit-identical under any device
sharding layout (see core/rng.py), unlike the reference's wall-clock-seeded
fract-sin hash (util/random.glsl, tracer.js:98).

Estimator notes:
- NEE runs for matte, non-emissive hits only (like the reference); unlike the
  reference, emission picked up by the NEXT bounce's BSDF ray is skipped when
  the previous bounce already did NEE — removing the reference's
  double-counting of direct light on matte surfaces.
- Radiance is differentiable w.r.t. every scene float parameter; sampling
  decisions are detached (pdf-cancelled detached-sampling estimator).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..core import rng
from ..core import vecmath as vm
from ..core.camera import rays_for_pixels
from ..core.rng import PixelNoise
from ..core.vecmath import Vec3
from ..ops import intersect as isect
from ..ops import lights as lights_ops
from ..ops import materials as mat_ops
from ..ops import textures as tex_ops


class TraceResult(NamedTuple):
    color: Vec3     # radiance estimate per ray
    normal: Vec3    # first-hit shading normal (G-buffer)
    position: Vec3  # first-hit position (G-buffer)


class _PathState(NamedTuple):
    """Per-lane state carried across bounces (the loop-carried registers of
    the reference's bounce loop, trace/path.glsl:16-37)."""
    ro: Vec3
    rd: Vec3
    e: Vec3
    throughput: Vec3
    alive: jnp.ndarray
    skip_emission: jnp.ndarray
    g_normal: Vec3
    g_position: Vec3


def _bounce_step(scene, state: _PathState, noise: PixelNoise, *, static,
                 bounce: int, clamp_weight: bool,
                 rand_override=None, cull: bool = False) -> _PathState:
    """One bounce: intersect → shade → NEE → continue.  Pure function of
    (scene, state) so it can be rematerialized per-bounce
    (`jax.checkpoint`) in memory-tight backward passes."""
    hit = isect.intersect_scene(scene.objects, static, state.ro, state.rd,
                                cull=cull)
    alive = state.alive & hit.valid
    return _bounce_shade(scene, state, hit, alive, noise, static=static,
                         bounce=bounce, clamp_weight=clamp_weight,
                         rand_override=rand_override, cull=cull)


def _bounce_shade(scene, state: _PathState, hit, alive, noise: PixelNoise,
                  *, static, bounce: int, clamp_weight: bool,
                  rand_override=None, cull: bool = False) -> _PathState:
    """Shade + NEE + path continuation for an already-intersected bounce —
    the post-intersect tail of `_bounce_step`, split out so the early-exit
    path can cond-skip it when NO lane in the batch hit anything (exact:
    miss lanes contribute zero radiance and are dead afterwards)."""
    ro, rd = state.ro, state.rd
    shape = ro.shape
    zero = jnp.zeros(shape, jnp.float32)
    black = Vec3(zero, zero, zero)
    n_lights = len(scene.lights)

    g_normal = hit.n if bounce == 0 else state.g_normal
    g_position = hit.p if bounce == 0 else state.g_position

    # Shading frame: ss from dpdu (fallback to any tangent when dpdu is
    # degenerate, e.g. sphere poles), ts completes the basis
    # (ref: trace/path.glsl:3).
    dpdu_ok = hit.dpdu.length_sq() > 1e-16
    ss = vm.where(dpdu_ok, hit.dpdu, vm.ortho(hit.n)).normalize()
    # Orthogonalize against n (dpdu need not be perpendicular to n).
    ss = (ss - hit.n * ss.dot(hit.n)).normalize()
    ts = hit.n.cross(ss)
    wo = vm.world_to_local(-rd, hit.n, ss, ts)

    sc = tex_ops.surface_color(scene.textures, static, hit.tex_row, hit.p,
                               hit.u, hit.v, hit.sc_override, hit.use_override)

    if rand_override is not None:
        rb = rand_override[bounce]
        u1, u2, u_lobe = rb["u1"], rb["u2"], rb["u_lobe"]
    else:
        u1, u2, u_lobe = noise.uniform3(bounce, rng.TAG_BSDF)
    ms = mat_ops.sample_material(scene.materials, static, hit.mat_row, sc,
                                 u1, u2, u_lobe, wo, hit.into)

    weight = ms.weight.clip(0.0, 1.0) if clamp_weight else ms.weight

    # Emission pickup; skipped if the previous bounce's NEE already
    # accounted for direct light onto this path vertex.
    emit = vm.where(state.skip_emission & (hit.emissive > 0), black,
                    hit.emission)
    contrib = emit

    did_nee = jnp.zeros(shape, bool)
    if n_lights > 0:
        if rand_override is not None:
            rb = rand_override[bounce]
            lu1, lu2, lidx = rb["lu1"], rb["lu2"], rb["lidx"]
        else:
            lu1, lu2, lr = noise.uniform3(bounce, rng.TAG_LIGHT_U)
            lidx = jnp.minimum((lr * n_lights).astype(jnp.int32),
                               n_lights - 1)
        nee_mask = (ms.is_matte > 0) & (hit.emissive == 0) & alive
        direct, wi_light = lights_ops.sample_direct(
            scene.objects, scene.lights, static, hit.p, hit.n, lu1, lu2,
            lidx, cull=cull)
        wi_light_local = vm.world_to_local(wi_light, hit.n, ss, ts)
        f_light = mat_ops.eval_matte_f(scene.materials, static, hit.mat_row,
                                       sc, wo, wi_light_local)
        direct = direct * f_light
        contrib = contrib + vm.where(nee_mask, direct, black)
        did_nee = nee_mask

    e = state.e + state.throughput * vm.where(alive, contrib, black)
    throughput = state.throughput * weight

    # Continue the path: offset origin along ±normal (path.glsl:32-34).
    wi_world = vm.local_to_world(ms.wi, hit.n, ss, ts)
    outdot = hit.n.dot(wi_world)
    ro = hit.p + hit.n * jnp.where(outdot > C.EPSILON, 1e-4, -1e-4)
    rd = wi_world
    alive = alive & (throughput.max_component() > 0.0)

    return _PathState(ro, rd, e, throughput, alive, did_nee,
                      g_normal, g_position)


def trace_rays(scene, static, ro: Vec3, rd: Vec3, noise: PixelNoise,
               max_bounces: int = C.MAX_BOUNCES,
               clamp_weight: bool = True,
               rand_override=None,
               remat_bounces: bool = False,
               early_exit: bool = False,
               cull: bool = False) -> TraceResult:
    """Trace a batch of rays through the packed scene.

    `scene` is a PackedScene pytree; `static` a SceneStatic; `ro`/`rd` Vec3s
    of identically-shaped arrays; `noise` a PixelNoise carrying the global
    pixel coordinates and sample index.

    `rand_override`: optional list (length max_bounces) of dicts with keys
    u1,u2,u_lobe,lu1,lu2,lidx — per-bounce uniform fields replacing the
    internal RNG, for deterministic parity against the CPU oracle.

    `remat_bounces`: rematerialize each bounce in the backward pass
    (`jax.checkpoint` around the bounce body) — peak residual memory drops
    from all-bounces to one bounce; identical primal values.

    `early_exit` (opt-in, default False): skip a whole bounce when EVERY
    lane in this batch is dead (one any-reduce + lax.cond per bounce).
    Mathematically exact — dead lanes contribute exactly zero — but NOT
    bit-identical: wrapping the bounce in lax.cond changes XLA/Mosaic
    fusion and float codegen by a few ulp even when the branch is always
    taken (measured 2.7e-7 max abs on 8x8 closed scenes), so results match
    the masked loop to allclose, not bitwise.  Whole-batch-dead only pays
    off when the batch is a small tile (the Pallas megakernel's 8-row
    blocks): the measured upper bound for any compaction scheme on the
    closed benchmark scenes is 1.18-1.24x, while open scenes (escaped rays
    die in coherent sky regions) reach 3x (docs/OCCUPANCY.md).

    `cull` (opt-in): per-batch AABB cond culls for BATCHED same-category
    object groups — both intersect scans skip an object when no lane in
    this batch can reach its bound box.  Exact (a culled object cannot
    change the fold) but cond-wrapped, so like early_exit the results are
    allclose-not-bitwise vs the uncondited fold.  Pays only when the batch
    is a small tile of a many-object scene (the per-tile broad phase —
    ref: src/shader/shape/boundbox.glsl:6-16 prunes per pixel).
    """
    shape = jnp.broadcast_shapes(ro.shape, rd.shape)
    ro = ro.broadcast_to(shape)
    rd = rd.broadcast_to(shape)

    zero = jnp.zeros(shape, jnp.float32)
    black = Vec3(zero, zero, zero)
    ones = Vec3(jnp.ones(shape, jnp.float32), jnp.ones(shape, jnp.float32),
                jnp.ones(shape, jnp.float32))
    state = _PathState(ro, rd, black, ones,
                       jnp.ones(shape, bool), jnp.zeros(shape, bool),
                       black, black)

    # Masks cross lax.cond as int32: Mosaic cannot legalize chained
    # scf.ifs that yield freshly-computed i1 vectors (minimal repro: two
    # conds whose true branch computes a new bool mask fail; int32 masks
    # chain fine — measured on v5e, 2026-08-20).
    def _mask_safe(st):
        return st._replace(alive=st.alive.astype(jnp.int32),
                           skip_emission=st.skip_emission.astype(jnp.int32))

    def _mask_bool(st):
        return st._replace(alive=st.alive != 0,
                           skip_emission=st.skip_emission != 0)

    for bounce in range(max_bounces):
        step = lambda s, st, b=bounce: _bounce_step(
            s, st, noise, static=static, bounce=b,
            clamp_weight=clamp_weight, rand_override=rand_override,
            cull=cull)
        if remat_bounces:
            step = jax.checkpoint(step)
        if early_exit and bounce == 0:
            # bounce 0: primary intersect always runs (it feeds the
            # G-buffer), but the SHADE tail is cond-skipped when no lane
            # hit anything — exact (miss lanes add zero and die), and the
            # main saving on open scenes: sky tiles otherwise pay the full
            # shade+NEE for every sample (docs/OCCUPANCY.md r4: the
            # tile-level oracle charges dead tiles only their primary scan).
            hit = isect.intersect_scene(scene.objects, static,
                                        state.ro, state.rd, cull=cull)
            alive0 = state.alive & hit.valid
            gbuf = state._replace(g_normal=hit.n, g_position=hit.p,
                                  alive=alive0)

            def _shade0(st):
                st = _mask_bool(st)
                return _mask_safe(_bounce_shade(
                    scene, st, hit, st.alive, noise, static=static,
                    bounce=0, clamp_weight=clamp_weight,
                    rand_override=rand_override, cull=cull))

            state = _mask_bool(jax.lax.cond(
                jnp.any(alive0), _shade0, lambda st: st, _mask_safe(gbuf)))
        elif early_exit and bounce > 0:
            state = _mask_bool(jax.lax.cond(
                jnp.any(state.alive),
                lambda st: _mask_safe(step(scene, _mask_bool(st))),
                lambda st: st, _mask_safe(state)))
        else:
            state = step(scene, state)

    return TraceResult(state.e, state.g_normal, state.g_position)


def alive_fractions(scene, static, ro: Vec3, rd: Vec3, noise: PixelNoise,
                    max_bounces: int = C.MAX_BOUNCES,
                    weak_threshold: float = 1e-2):
    """Per-bounce occupancy diagnostics for the ray-compaction study
    (docs/OCCUPANCY.md): returns (alive_frac, weak_frac) arrays of shape
    (max_bounces,) where alive_frac[b] is the fraction of lanes still alive
    AFTER bounce b (the lanes bounce b+1 would do useful work for) and
    weak_frac[b] the fraction of lanes whose remaining throughput
    max-component is below `weak_threshold` (what Russian roulette would
    additionally reclaim)."""
    shape = jnp.broadcast_shapes(ro.shape, rd.shape)
    ro = ro.broadcast_to(shape)
    rd = rd.broadcast_to(shape)
    zero = jnp.zeros(shape, jnp.float32)
    black = Vec3(zero, zero, zero)
    ones = Vec3(zero + 1.0, zero + 1.0, zero + 1.0)
    state = _PathState(ro, rd, black, ones, jnp.ones(shape, bool),
                       jnp.zeros(shape, bool), black, black)
    alive, weak = [], []
    for bounce in range(max_bounces):
        state = _bounce_step(scene, state, noise, static=static,
                             bounce=bounce, clamp_weight=True)
        alive.append(state.alive.astype(jnp.float32).mean())
        tp = state.throughput.max_component()
        weak.append((state.alive & (tp < weak_threshold))
                    .astype(jnp.float32).mean())
    return jnp.stack(alive), jnp.stack(weak)


def render_sample(scene, static, height: int, width: int, seed, sample_idx,
                  max_bounces: int = C.MAX_BOUNCES,
                  jitter: bool = True, row0=None,
                  image_height: int = None,
                  early_exit: bool = False) -> TraceResult:
    """One 1-spp progressive pass over an image block
    (ref: main/fstrace.glsl + sub-pixel jitter src/core/tracer.js:94-96).

    `row0`: global row of this block's first row (for sharded tiles); the
    block is `height` rows tall and `width` wide, inside an image of
    `image_height` total rows (defaults to `height`).
    """
    image_height = height if image_height is None else image_height
    r0 = jnp.asarray(0 if row0 is None else row0, jnp.int32)
    ii = jnp.broadcast_to((r0 + jnp.arange(height, dtype=jnp.int32))[:, None],
                          (height, width))
    jj = jnp.broadcast_to(jnp.arange(width, dtype=jnp.int32)[None, :],
                          (height, width))
    noise = rng.pixel_noise(seed, sample_idx, ii=ii, jj=jj)
    if jitter:
        jx, jy, _ = noise.uniform3(0, rng.TAG_PIXEL_JITTER)
    else:
        jx = jy = None
    ro, rd = rays_for_pixels(scene.camera, ii.astype(jnp.float32),
                             jj.astype(jnp.float32), image_height, width, jx, jy)
    return trace_rays(scene, static, ro, rd, noise, max_bounces,
                      early_exit=early_exit)


def render_image(scene, static, height: int, width: int, spp: int, seed=0,
                 max_bounces: int = C.MAX_BOUNCES):
    """Average `spp` progressive passes — the batch analog of the reference's
    frame accumulation (src/core/tracer.js:97 textureWeight blend), kept
    entirely on-device in HBM.

    Each pass is rematerialized (`jax.checkpoint`): the backward pass
    re-traces a sample's forward instead of storing every bounce's residuals
    for every sample — without it, grad at 1024²·4spp·5 bounces needs >20 GB
    of HBM; with it, memory is single-sample scale (FLOPs-for-HBM trade,
    the standard TPU remat recipe)."""

    @jax.checkpoint
    def one_sample(scene, i):
        return render_sample(scene, static, height, width, seed, i,
                             max_bounces).color

    def body(i, acc):
        return jax.tree.map(lambda a, b: a + b, acc, one_sample(scene, i))

    zero = jnp.zeros((height, width), jnp.float32)
    acc = Vec3(zero, zero, zero)
    acc = jax.lax.fori_loop(0, spp, body, acc)
    return acc * (1.0 / spp)
