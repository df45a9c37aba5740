"""Per-ray material dispatch.

TPU-native counterpart of the reference's generated `material()` dispatcher
(ref: src/shader/material/shader.material.js:21-29): a static unrolled loop
over the scene's (deduped) material rows with per-ray row masks.  Only the
material models the scene uses are compiled — the same specialization the
reference gets from stitching only used GLSL plugins.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..core import vecmath as vm
from ..core.vecmath import Vec3
from . import bsdf


class MaterialSample(NamedTuple):
    wi: Vec3             # local frame
    weight: Vec3         # f·|cosθi|/pdf
    f_nee: Vec3          # BSDF value for NEE (zero for non-matte, like ref)
    is_matte: jax.Array  # int32 0/1
    is_specular: jax.Array  # int32 0/1


def sample_material(materials: tuple, static, mat_row, sc: Vec3,
                    u1, u2, u_lobe, wo: Vec3, into) -> MaterialSample:
    shape = wo.shape
    zero = jnp.zeros(shape, jnp.float32)
    out = MaterialSample(Vec3(zero, zero, zero), Vec3(zero, zero, zero),
                         Vec3(zero, zero, zero), jnp.zeros(shape, jnp.int32),
                         jnp.zeros(shape, jnp.int32))
    for row, (cat, p) in enumerate(zip(static.material_categories, materials)):
        mask = mat_row == row
        kind = static.material_variants[row] or C.TROWBRIDGE_REITZ
        if cat == C.MATTE:
            s = bsdf.matte_sample(p.kd, p.sigma, sc, u1, u2, wo)
            is_matte = jnp.ones(shape, jnp.int32)
        elif cat == C.MIRROR:
            s = bsdf.mirror_sample(p.kr, sc, wo)
            is_matte = jnp.zeros(shape, jnp.int32)
        elif cat == C.METAL:
            s = bsdf.metal_sample(p, sc, u1, u2, wo, kind=kind)
            is_matte = jnp.zeros(shape, jnp.int32)
        elif cat == C.GLASS:
            s = bsdf.glass_sample(p, sc, u1, u2, u_lobe, wo, into, kind=kind)
            is_matte = jnp.zeros(shape, jnp.int32)
        else:  # pragma: no cover
            raise ValueError(f"unknown material category {cat}")
        out = MaterialSample(
            vm.where(mask, s.wi, out.wi),
            vm.where(mask, s.weight, out.weight),
            vm.where(mask, s.f_nee, out.f_nee),
            jnp.where(mask, is_matte, out.is_matte),
            jnp.where(mask, s.is_specular.astype(jnp.int32), out.is_specular),
        )
    return out


def eval_matte_f(materials: tuple, static, mat_row, sc: Vec3,
                 wo: Vec3, wi: Vec3) -> Vec3:
    """Matte BSDF value at an arbitrary direction (used to weight NEE at the
    true light direction; trace/path.glsl:10 wrongly reuses the BSDF-sampled
    direction's f — corrected here)."""
    shape = wo.shape
    zero = jnp.zeros(shape, jnp.float32)
    f = Vec3(zero, zero, zero)
    for row, (cat, p) in enumerate(zip(static.material_categories, materials)):
        if cat != C.MATTE:
            continue
        mask = (mat_row == row) & vm.same_hemisphere(wo, wi)
        val = bsdf.matte_f(p.kd, p.sigma, sc, wo, wi)
        f = vm.where(mask, val, f)
    return f
