"""BSDF models: Fresnel, microfacet distributions, and the four material
categories (Matte, Mirror, Metal, Glass).

TPU-native counterpart of the reference's PBRT-style GLSL BSDF library
(ref: src/shader/material/{bsdf,fresnel,microfacet,ssutility}.glsl and the
per-material kernels matte/mirror/metal/glass.glsl).  All functions operate
in the local shading frame (z = shading normal) on Vec3s of flat arrays;
branches are masks so the whole material dispatch fuses into VPU code.

Sampling decisions (directions, lobe choices) are detached from the gradient
graph via stop_gradient on the *pdf-cancelled* estimator pieces where the
standard score-free detached-sampling estimator requires it; BSDF values and
throughput weights remain differentiable w.r.t. material parameters.

Corrections vs the reference (documented deviations, see also scene/light.py):
- `fr_dielectric` swaps etaI/etaT for rays exiting the medium
  (fresnel.glsl:78-95 does not, giving wrong TIR on exit).
- Fresnel-weighted specular transmission uses throughput T (the reference
  multiplies an extra (1-F), bsdf.glsl:155-160, biasing glass dark).
- Specular/microfacet transmission applies the radiance-transport eta² scale.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..core import fastmath
from ..core import samplers
from ..core import vecmath as vm
from ..core.vecmath import Vec3

_EPS = C.EPSILON


class BSDFSample(NamedTuple):
    wi: Vec3            # sampled direction, local frame
    weight: Vec3        # f * |cos θi| / pdf  (path throughput multiplier)
    f_nee: Vec3         # BSDF value for light-sampling (0 for specular)
    is_specular: jax.Array  # int32 0/1 per ray


def _black(shape):
    z = jnp.zeros(shape, jnp.float32)
    return Vec3(z, z, z)


# --------------------------------------------------------------------------
# Fresnel (ref: src/shader/material/fresnel.glsl)
# --------------------------------------------------------------------------

def fr_dielectric(cos_theta_i, eta_i, eta_t):
    """Unpolarized dielectric Fresnel reflectance.  Negative cosθi means the
    ray is exiting, so the indices swap (PBRT semantics; the reference omits
    the swap — fresnel.glsl:78)."""
    cos_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    entering = cos_i > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    cos_i = jnp.abs(cos_i)

    sin_i = jnp.sqrt(jnp.maximum(1.0 - cos_i * cos_i, 1e-12))
    sin_t = ei / et * sin_i
    tir = sin_t >= 1.0
    cos_t = jnp.sqrt(jnp.where(tir, 1.0, jnp.maximum(1.0 - sin_t * sin_t, 1e-12)))
    ti = et * cos_i
    it = ei * cos_t
    ii = ei * cos_i
    tt = et * cos_t
    r_parl = (ti - it) / jnp.maximum(ti + it, 1e-20)
    r_perp = (ii - tt) / jnp.maximum(ii + tt, 1e-20)
    fr = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, fr)


def fr_conductor(cos_theta_i, eta_i: Vec3, eta_t: Vec3, k: Vec3) -> Vec3:
    """Conductor Fresnel (ref: fresnel.glsl:97-119)."""
    cos_i = jnp.clip(jnp.abs(cos_theta_i), 0.0, 1.0)
    eta = eta_t / eta_i
    etak = k / eta_i

    cos2 = cos_i * cos_i
    sin2 = 1.0 - cos2
    eta2 = eta * eta
    etak2 = etak * etak

    t0 = eta2 - etak2 - sin2
    a2b2_sq = t0 * t0 + eta2 * etak2 * 4.0
    a2b2 = Vec3(jnp.sqrt(jnp.maximum(a2b2_sq.x, 0.0)),
                jnp.sqrt(jnp.maximum(a2b2_sq.y, 0.0)),
                jnp.sqrt(jnp.maximum(a2b2_sq.z, 0.0)))
    t1 = a2b2 + cos2
    half = (a2b2 + t0) * 0.5
    a = Vec3(jnp.sqrt(jnp.maximum(half.x, 0.0)),
             jnp.sqrt(jnp.maximum(half.y, 0.0)),
             jnp.sqrt(jnp.maximum(half.z, 0.0)))
    t2 = a * (2.0 * cos_i)
    rs = (t1 - t2) / (t1 + t2)
    t3 = a2b2 * cos2 + sin2 * sin2
    t4 = t2 * sin2
    rp = rs * ((t3 - t4) / (t3 + t4))
    return (rp + rs) * 0.5


# --------------------------------------------------------------------------
# Microfacet distributions (ref: src/shader/material/microfacet.glsl)
# --------------------------------------------------------------------------

def _sample_wh(u1, u2, alphax, alphay, wo: Vec3, kind: int) -> Vec3:
    """Sample a half-vector from D(wh)|cosθh|.  `kind` is static
    (BECKMANN / TROWBRIDGE_REITZ), selecting the compiled formula."""
    iso = True  # anisotropy handled below via the general branch
    ax = alphax
    ay = alphay
    if kind == C.BECKMANN:
        log_sample = jnp.log(jnp.maximum(u1, 1e-20))
        # isotropic closed form
        tan2_i = -ax * ax * log_sample
        phi_i = u2 * 2.0 * C.PI
        # anisotropic
        phi_a = fastmath.atan(ay / ax * fastmath.tan(2.0 * C.PI * u1 + 0.5 * C.PI))
        phi_a = jnp.where(u1 > 0.5, phi_a + C.PI, phi_a)
        sp, cp = jnp.sin(phi_a), jnp.cos(phi_a)
        tan2_a = -log_sample / (cp * cp / (ax * ax) + sp * sp / (ay * ay))
        is_iso = jnp.abs(ax - ay) < 1e-3
        tan2 = jnp.where(is_iso, tan2_i, tan2_a)
        phi = jnp.where(is_iso, phi_i, phi_a)
    else:  # Trowbridge-Reitz / GGX
        phi_i = 2.0 * C.PI * u2
        tan2_i = ax * ax * u1 / jnp.maximum(1.0 - u1, 1e-7)
        phi_a = fastmath.atan(ay / ax * fastmath.tan(C.PI_OVER_2 + 2.0 * C.PI * u1))
        phi_a = jnp.where(u1 > 0.5, phi_a + C.PI, phi_a)
        sp, cp = jnp.sin(phi_a), jnp.cos(phi_a)
        alpha2 = 1.0 / (cp * cp / (ax * ax) + sp * sp / (ay * ay))
        tan2_a = alpha2 * u1 / jnp.maximum(1.0 - u1, 1e-7)
        is_iso = jnp.abs(ax - ay) < 1e-7
        tan2 = jnp.where(is_iso, tan2_i, tan2_a)
        phi = jnp.where(is_iso, phi_i, phi_a)

    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-12))
    wh = vm.spherical_direction(sin_t, cos_t, phi)
    flip = ~vm.same_hemisphere(wo, wh)
    return vm.where(flip, -wh, wh)


def _distribution_d(wh: Vec3, alphax, alphay, kind: int):
    tan2 = vm.tan2_theta(wh)
    cos4 = vm.cos2_theta(wh) ** 2
    term = vm.cos2_phi(wh) / (alphax * alphax) + vm.sin2_phi(wh) / (alphay * alphay)
    if kind == C.BECKMANN:
        d = jnp.exp(-tan2 * term) / (C.PI * alphax * alphay * jnp.maximum(cos4, 1e-20))
    else:
        e = term * tan2
        d = 1.0 / (C.PI * alphax * alphay * jnp.maximum(cos4 * (1.0 + e) ** 2, 1e-20))
    return jnp.where(tan2 >= C.INF, 0.0, d)


def _distribution_pdf(wo: Vec3, wh: Vec3, alphax, alphay, kind: int):
    """pdf of wh under D(wh)|cosθh| sampling (microfacet.glsl:35-38,69-71)."""
    return _distribution_d(wh, alphax, alphay, kind) * vm.abs_cos_theta(wh)


# --------------------------------------------------------------------------
# Matte: Lambertian / Oren-Nayar (ref: matte.glsl, bsdf.glsl:1-78)
# --------------------------------------------------------------------------

def oren_nayar_ab(sigma):
    """In-graph Oren-Nayar A/B from sigma in radians (the reference
    precomputes these host-side: src/scene/material.js:44-49)."""
    s2 = sigma * sigma
    a = 1.0 - s2 / (2.0 * (s2 + 0.33))
    b = 0.45 * s2 / (s2 + 0.09)
    return a, b


def matte_f(kd, sigma, sc: Vec3, wo: Vec3, wi: Vec3) -> Vec3:
    """Matte BSDF value; Lambertian for sigma≈0 else Oren-Nayar."""
    r = sc * kd
    lam = r * C.INV_PI

    a, b = oren_nayar_ab(sigma)
    sin_ti = vm.sin_theta(wi)
    sin_to = vm.sin_theta(wo)
    d_cos = vm.cos_phi(wi) * vm.cos_phi(wo) + vm.sin_phi(wi) * vm.sin_phi(wo)
    max_cos = jnp.where((sin_ti > _EPS) & (sin_to > _EPS), jnp.maximum(0.0, d_cos), 0.0)
    aci = vm.abs_cos_theta(wi)
    aco = vm.abs_cos_theta(wo)
    wi_steeper = aci > aco
    sin_alpha = jnp.where(wi_steeper, sin_to, sin_ti)
    tan_beta = jnp.where(wi_steeper, sin_ti / jnp.maximum(aci, 1e-7),
                         sin_to / jnp.maximum(aco, 1e-7))
    on = r * (C.INV_PI * (a + b * max_cos * sin_alpha * tan_beta))

    return vm.where(sigma < _EPS, lam, on)


def lambertian_t_f(t: Vec3, wo: Vec3, wi: Vec3) -> Vec3:
    """Lambertian transmission BTDF value: T/π for directions in opposite
    hemispheres, else 0 (ref: material/bsdf.glsl:21-38 LambertianT — present
    in the reference's library but unreachable from its four material
    dispatchers; implemented for library parity)."""
    opposite = ~vm.same_hemisphere(wo, wi)
    val = t * C.INV_PI
    return vm.where(opposite, val, _black(wo.shape))


def lambertian_t_pdf(wo: Vec3, wi: Vec3):
    """Cosine pdf on the transmission hemisphere (bsdf.glsl:27-30)."""
    opposite = ~vm.same_hemisphere(wo, wi)
    return jnp.where(opposite, vm.abs_cos_theta(wi) * C.INV_PI, 0.0)


def lambertian_t_sample(t: Vec3, u1, u2, wo: Vec3) -> BSDFSample:
    """Sample cosine-weighted on the hemisphere OPPOSITE wo
    (bsdf.glsl:32-38): weight = f·|cosθi|/pdf = T."""
    wi = samplers.cosine_hemisphere(u1, u2)
    wi = vm.where(wo.z > 0.0, Vec3(wi.x, wi.y, -wi.z), wi)
    pdf = lambertian_t_pdf(wo, wi)
    f = lambertian_t_f(t, wo, wi)
    w = f * jnp.where(pdf > 0.0, vm.abs_cos_theta(wi) / jnp.maximum(pdf, 1e-20), 0.0)
    return BSDFSample(wi, w, f, jnp.zeros(wo.shape, jnp.int32))


def matte_sample(kd, sigma, sc: Vec3, u1, u2, wo: Vec3) -> BSDFSample:
    wi = samplers.cosine_hemisphere(u1, u2)
    # Sampled below the horizon ⇒ pdf 0 ⇒ zero weight (mask, not NaN).
    same = vm.same_hemisphere(wo, wi)
    pdf = jnp.where(same, vm.abs_cos_theta(wi) * C.INV_PI, 0.0)
    f = matte_f(kd, sigma, sc, wo, wi)
    w = f * jnp.where(pdf > 0.0, vm.abs_cos_theta(wi) / jnp.maximum(pdf, 1e-20), 0.0)
    shape = wo.shape
    return BSDFSample(wi, w, f, jnp.zeros(shape, jnp.int32))


# --------------------------------------------------------------------------
# Mirror: perfect specular reflection (ref: mirror.glsl, bsdf.glsl:80-103)
# --------------------------------------------------------------------------

def mirror_sample(kr, sc: Vec3, wo: Vec3) -> BSDFSample:
    wi = Vec3(-wo.x, -wo.y, wo.z)
    weight = sc * kr  # noop Fresnel: f = R/|cos|, pdf = 1 ⇒ weight = R
    shape = wo.shape
    return BSDFSample(wi, weight, _black(shape), jnp.ones(shape, jnp.int32))


# --------------------------------------------------------------------------
# Metal: conductor microfacet reflection (ref: metal.glsl, bsdf.glsl:162-196)
# --------------------------------------------------------------------------

def microfacet_r_f(r: Vec3, wo: Vec3, wi: Vec3, alphax, alphay, kind: int,
                   fresnel_fn) -> Vec3:
    cos_o = vm.abs_cos_theta(wo)
    cos_i = vm.abs_cos_theta(wi)
    wh = wo + wi
    degenerate = (cos_i < _EPS) | (cos_o < _EPS) | (wh.length_sq() < 1e-12)
    wh = wh.normalize()
    f = fresnel_fn(wi.dot(wh))
    d = _distribution_d(wh, alphax, alphay, kind)
    val = r * f * (d / jnp.maximum(4.0 * cos_i * cos_o, 1e-12))
    return vm.where(degenerate, _black(wo.shape), val)


def microfacet_r_sample(r: Vec3, u1, u2, wo: Vec3, alphax, alphay, kind: int,
                        fresnel_fn) -> BSDFSample:
    shape = wo.shape
    wh = _sample_wh(u1, u2, alphax, alphay, wo, kind)
    wi = vm.reflect(wo, wh)
    ok = (wo.z >= _EPS) & vm.same_hemisphere(wo, wi)
    pdf = _distribution_pdf(wo, wh, alphax, alphay, kind) / \
        jnp.maximum(4.0 * wo.dot(wh), 1e-12)
    f = microfacet_r_f(r, wo, wi, alphax, alphay, kind, fresnel_fn)
    w = f * jnp.where(ok & (pdf > 1e-12),
                      vm.abs_cos_theta(wi) / jnp.maximum(pdf, 1e-12), 0.0)
    return BSDFSample(wi, w, vm.where(ok, f, _black(shape)), jnp.zeros(shape, jnp.int32))


def metal_sample(p, sc: Vec3, u1, u2, wo: Vec3,
                 kind: int = C.TROWBRIDGE_REITZ) -> BSDFSample:
    """p: MetalP. Microfacet conductor (metal.glsl:9-24).  `kind` selects the
    compiled distribution — the reference hardcodes Trowbridge-Reitz; its
    Beckmann library code (microfacet.glsl:1-44) is reachable here via
    Metal(distribution="beckmann")."""
    ones = Vec3(jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0))
    fres = lambda ci: fr_conductor(ci, ones, p.eta, p.k)
    ax = jnp.maximum(p.uroughness, 1e-4)
    ay = jnp.maximum(p.vroughness, 1e-4)
    return microfacet_r_sample(sc, u1, u2, wo, ax, ay, kind, fres)


# --------------------------------------------------------------------------
# Glass: specular or rough dielectric (ref: glass.glsl, bsdf.glsl:105-160,198-246)
# --------------------------------------------------------------------------

def _specular_glass_sample(kr, kt, eta, sc: Vec3, u_lobe, wo: Vec3,
                           into) -> BSDFSample:
    shape = wo.shape
    f_refl = fr_dielectric(vm.cos_theta(wo), 1.0, eta)
    pick_reflect = u_lobe < f_refl

    wi_r = Vec3(-wo.x, -wo.y, wo.z)
    w_r = sc * kr  # F·R/|cos| / (pdf=F) · |cos| = R

    eta_i = jnp.where(into, 1.0, eta)
    eta_t = jnp.where(into, eta, 1.0)
    rel = eta_i / eta_t
    n = Vec3(jnp.zeros_like(wo.x), jnp.zeros_like(wo.y),
             jnp.where(wo.z >= 0.0, 1.0, -1.0))
    wi_t, tir = vm.refract_dir(-wo, n, rel)
    # Radiance transport scaling (etaI/etaT)²; reference omits it.
    w_t = sc * (kt * rel * rel)
    w_t = vm.where(tir, _black(shape), w_t)

    wi = vm.where(pick_reflect, wi_r, wi_t)
    w = vm.where(pick_reflect, w_r, w_t)
    return BSDFSample(wi, w, _black(shape), jnp.ones(shape, jnp.int32))


def microfacet_t_f(t_col: Vec3, wo: Vec3, wi: Vec3, eta, into, alphax, alphay,
                   kind: int) -> Vec3:
    """Rough dielectric transmission BTDF (bsdf.glsl:205-224), with the
    radiance eta² factor."""
    shape = wo.shape
    cos_o = vm.cos_theta(wo)
    cos_i = vm.cos_theta(wi)
    bad = vm.same_hemisphere(wo, wi) | (jnp.abs(cos_i) < 1e-3) | (jnp.abs(cos_o) < 1e-3)
    eta_rel = jnp.where(into, eta / 1.0, 1.0 / eta)  # etaB/etaA on entry
    wh = (wo + wi * eta_rel).normalize()
    wh = vm.where(wh.z < 0.0, -wh, wh)
    f = fr_dielectric(wo.dot(wh), 1.0, eta)
    denom = wo.dot(wh) + eta_rel * wi.dot(wh)
    d = _distribution_d(wh, alphax, alphay, kind)
    factor = jnp.abs(d * eta_rel * eta_rel * jnp.abs(wi.dot(wh)) * jnp.abs(wo.dot(wh)) /
                     jnp.where(jnp.abs(cos_i * cos_o * denom * denom) < 1e-12, 1e-12,
                               cos_i * cos_o * denom * denom))
    # transport scale: (1/eta_rel)² relative to PBRT convention wo-side
    val = t_col * ((1.0 - f) * factor / jnp.maximum(eta_rel * eta_rel, 1e-12))
    return vm.where(bad, _black(shape), val)


def microfacet_t_pdf(wo: Vec3, wi: Vec3, eta, into, alphax, alphay, kind: int):
    bad = vm.same_hemisphere(wo, wi)
    eta_rel = jnp.where(into, eta / 1.0, 1.0 / eta)
    wh = (wo + wi * eta_rel).normalize()
    denom = wo.dot(wh) + eta_rel * wi.dot(wh)
    dwh_dwi = jnp.abs(eta_rel * eta_rel * wi.dot(wh) /
                      jnp.where(jnp.abs(denom * denom) < 1e-12, 1e-12, denom * denom))
    pdf = _distribution_pdf(wo, wh, alphax, alphay, kind) * dwh_dwi
    return jnp.where(bad, 0.0, pdf)


def _rough_glass_sample(p, sc: Vec3, u1, u2, u_lobe, wo: Vec3, into,
                        kind: int = C.TROWBRIDGE_REITZ) -> BSDFSample:
    shape = wo.shape
    ax = jnp.maximum(p.uroughness, 1e-4)
    ay = jnp.maximum(p.vroughness, 1e-4)

    # 50/50 lobe choice (glass.glsl:24-33); each branch weight doubled.
    fres = lambda ci: Vec3(*(3 * (fr_dielectric(ci, 1.0, p.eta),)))
    refl = microfacet_r_sample(sc * p.kr, u1, u2, wo, ax, ay, kind, fres)

    wh = _sample_wh(u1, u2, ax, ay, wo, kind)
    eta_rel_in = jnp.where(into, 1.0 / p.eta, p.eta)  # etaA/etaB for refract
    wi_t, tir = vm.refract_dir(-wo, vm.where(wo.dot(wh) < 0, -wh, wh), eta_rel_in)
    f_t = microfacet_t_f(sc * p.kt, wo, wi_t, p.eta, into, ax, ay, kind)
    pdf_t = microfacet_t_pdf(wo, wi_t, p.eta, into, ax, ay, kind)
    w_t = f_t * jnp.where(pdf_t > 1e-9, vm.abs_cos_theta(wi_t) / jnp.maximum(pdf_t, 1e-9), 0.0)
    w_t = vm.where(tir, _black(shape), w_t)

    pick_t = u_lobe >= 0.5
    wi = vm.where(pick_t, wi_t, refl.wi)
    w = vm.where(pick_t, w_t * 2.0, refl.weight * 2.0)
    return BSDFSample(wi, w, _black(shape), jnp.zeros(shape, jnp.int32))


def glass_sample(p, sc: Vec3, u1, u2, u_lobe, wo: Vec3, into,
                 kind: int = C.TROWBRIDGE_REITZ) -> BSDFSample:
    """p: GlassP.  Static specialization: smooth vs rough is decided from the
    packed roughness *values* dynamically (mask), since both variants share
    most math the extra cost is small; scenes with only smooth glass still
    fold the rough branch away when roughness is structurally zero."""
    spec = _specular_glass_sample(p.kr, p.kt, p.eta, sc, u_lobe, wo, into)
    rough = _rough_glass_sample(p, sc, u1, u2, u_lobe, wo, into, kind)
    is_spec = (p.uroughness < _EPS) & (p.vroughness < _EPS)
    return BSDFSample(
        vm.where(is_spec, spec.wi, rough.wi),
        vm.where(is_spec, spec.weight, rough.weight),
        _black(wo.shape),
        jnp.broadcast_to(is_spec, wo.shape).astype(jnp.int32),
    )
