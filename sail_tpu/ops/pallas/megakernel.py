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
re-traces the pure-XLA integrator — identical math, so gradients are exactly
the XLA path's, while the forward runs the megakernel.
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


def _flatten_scene(packed):
    leaves, treedef = jax.tree.flatten(packed)
    params = jnp.stack([jnp.asarray(l, jnp.float32).reshape(()) for l in leaves])
    return params, treedef, len(leaves)


def _trace_tile(pk, static, ii, jj, height, width, seed, sample0, spp,
                max_bounces):
    """Accumulate `spp` samples for one tile — shared by the kernel body and
    (for parity testing) the interpreter path."""
    from ...render.integrator import trace_rays

    def one(s, acc):
        noise = PixelNoise(seed, sample0 + s, ii, jj)
        jx, jy, _ = noise.uniform3(0, rng.TAG_PIXEL_JITTER)
        ro, rd = rays_for_pixels(pk.camera, ii.astype(jnp.float32),
                                 jj.astype(jnp.float32), height, width, jx, jy)
        res = trace_rays(pk, static, ro, rd, noise, max_bounces)
        return acc + res.color

    zero = jnp.zeros(ii.shape, jnp.float32)
    # fori_loop (not Python unroll): one traced trace body regardless of spp,
    # keeping Mosaic compile time flat.
    return jax.lax.fori_loop(0, spp, one, Vec3(zero, zero, zero))


def render_block_pallas(packed, static, height: int, width: int, spp: int,
                        seed, sample0, max_bounces: int = C.MAX_BOUNCES,
                        tile_rows: int = 8, interpret=None) -> Vec3:
    """Forward render of an H×W image via the Pallas megakernel.

    Returns the SUM of `spp` sample passes (divide by spp for the mean)."""
    if interpret is None:
        # Mosaic only lowers for TPU; fall back to the interpreter on CPU
        # (tests / virtual-device meshes).
        interpret = jax.default_backend() == "cpu"
    assert height % tile_rows == 0, (height, tile_rows)
    params, treedef, n_leaves = _flatten_scene(packed)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape((1,))
    sample_arr = jnp.asarray(sample0, jnp.int32).reshape((1,))

    def kernel(params_ref, seed_ref, sample_ref, out_x, out_y, out_z):
        vals = [params_ref[i] for i in range(n_leaves)]
        pk = jax.tree.unflatten(treedef, vals)
        ti = pl.program_id(0)
        ii = (ti * tile_rows +
              jax.lax.broadcasted_iota(jnp.int32, (tile_rows, width), 0))
        jj = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, width), 1)
        acc = _trace_tile(pk, static, ii, jj, height, width,
                          seed_ref[0], sample_ref[0],
                          spp, max_bounces)
        out_x[:] = acc.x
        out_y[:] = acc.y
        out_z[:] = acc.z

    out_shape = jax.ShapeDtypeStruct((height, width), jnp.float32)
    block = pl.BlockSpec((tile_rows, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(height // tile_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(block, block, block),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(params, seed_arr, sample_arr)
    return Vec3(*outs)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def render_image_fast(packed, static, height, width, spp, seed, max_bounces):
    """Mean image via the Pallas megakernel forward; gradients via the XLA
    integrator (identical estimator)."""
    acc = render_block_pallas(packed, static, height, width, spp, seed, 0,
                              max_bounces)
    return acc * (1.0 / spp)


def _fast_fwd(packed, static, height, width, spp, seed, max_bounces):
    out = render_image_fast(packed, static, height, width, spp, seed,
                            max_bounces)
    return out, packed


def _fast_bwd(static, height, width, spp, seed, max_bounces, packed, g):
    from ...render.integrator import render_image

    _, vjp_fn = jax.vjp(
        lambda p: render_image(p, static, height, width, spp, seed,
                               max_bounces), packed)
    return vjp_fn(g)


render_image_fast.defvjp(_fast_fwd, _fast_bwd)
