"""Next-event-estimation light sampling.

TPU-native counterpart of the reference's generated `light_sample` dispatcher
(ref: src/shader/light/shader.light.js:12-28 and light/{area,point,spot}.glsl).
One light is picked uniformly per ray; every light's candidate sample point is
computed (static unrolled loop over the scene's lights) and masked-selected,
so only ONE shadow ray is traced per ray per bounce.

Estimator corrections vs the reference (see scene/light.py docstring):
inverse-square falloff for area/point lights, ×n_lights for the uniform pick,
and correct area pdfs (uniform sphere = 1/(4πr²); area.glsl uses INVPI/r²).

Returned value is the incident direct radiance ESTIMATE divided by the
light-pick pdf, times the surface cosine — everything except the BSDF value,
which the integrator multiplies in (evaluated at the true light direction,
not at the BSDF-sampled direction like trace/path.glsl:10 does).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..core import samplers
from ..core import vecmath as vm
from ..core.vecmath import Vec3
from . import intersect as isect


class LightSample(NamedTuple):
    radiance: Vec3   # E · G · n_lights / pdf — pending visibility and BSDF
    point: Vec3      # sampled point on the light
    wi: Vec3         # normalized direction surface→light
    dist: jax.Array


def _sample_geometry(cat: int, params, u1, u2, shape):
    """Sample a point+normal+area-pdf on an emissive geometry
    (ref: shape/shader.shape.js:53-67 sampleGeometry dispatch)."""
    if cat == C.SPHERE:
        d = samplers.uniform_sphere(u1, u2)
        p = isect.from_object(d * params.radius) + params.center
        n = isect.from_object(d) * params.reverse
        pdf = jnp.broadcast_to(1.0 / (4.0 * C.PI * params.radius ** 2), shape)
        return p, n, pdf
    if cat == C.RECTANGLE:
        ex, ey, n = isect.rectangle_frame(params)
        p = params.bmin + ex * u1 + ey * u2
        area = ex.length() * ey.length()
        pdf = jnp.broadcast_to(1.0 / jnp.maximum(area, 1e-12), shape)
        return p.broadcast_to(shape) if p.shape != shape else p, \
            (n * params.reverse).broadcast_to(shape), pdf
    if cat == C.DISK:
        dx, dy = samplers.concentric_disk(u1, u2)
        # Disk lies in the world xz-plane, normal +y (ref: disk.glsl:76-82).
        p = Vec3(params.p.x + dx * params.r, jnp.broadcast_to(params.p.y, shape),
                 params.p.z + dy * params.r)
        area = C.PI * (params.r ** 2 - params.inner_r ** 2)
        n = Vec3(jnp.zeros(shape, jnp.float32),
                 jnp.broadcast_to(params.reverse, shape).astype(jnp.float32),
                 jnp.zeros(shape, jnp.float32))
        pdf = jnp.broadcast_to(1.0 / jnp.maximum(area, 1e-12), shape)
        return p, n, pdf
    if cat == C.CUBE:
        # Uniform-over-surface sampling: face picked area-weighted from u1
        # (u1 rescaled within the face), point from (u1', u2).  pdf = 1/A.
        # The reference only stubs this (ref: shape/cube.glsl:50); analytic
        # per-face sampling is the correct analog of rectangle.glsl:65-69.
        ext = params.bmax - params.bmin
        ax = ext.y * ext.z   # each x-normal face
        ay = ext.x * ext.z
        az = ext.x * ext.y
        area = 2.0 * (ax + ay + az)
        r = u1 * area
        # cumulative areas for faces [x-, x+, y-, y+, z-, z+]
        c1, c2, c3, c4, c5 = ax, 2 * ax, 2 * ax + ay, 2 * (ax + ay), \
            2 * (ax + ay) + az
        face = (jnp.asarray(0, jnp.int32) + (r >= c1) + (r >= c2) +
                (r >= c3) + (r >= c4) + (r >= c5)).astype(jnp.int32)
        lo = jnp.stack([0.0 * r, c1 + 0.0 * r, c2 + 0.0 * r, c3 + 0.0 * r,
                        c4 + 0.0 * r, c5 + 0.0 * r])
        fa = jnp.stack([ax + 0.0 * r, ax + 0.0 * r, ay + 0.0 * r,
                        ay + 0.0 * r, az + 0.0 * r, az + 0.0 * r])
        idx = face[None]
        u1p = jnp.clip((r - jnp.take_along_axis(lo, idx, 0)[0]) /
                       jnp.maximum(jnp.take_along_axis(fa, idx, 0)[0], 1e-12),
                       0.0, 1.0)
        on_x = face < 2
        on_y = (face >= 2) & (face < 4)
        hi_face = (face % 2) == 1
        fx = jnp.where(on_x, jnp.where(hi_face, 1.0, 0.0),
                       jnp.where(on_y, u1p, u1p))
        fy = jnp.where(on_x, u1p,
                       jnp.where(on_y, jnp.where(hi_face, 1.0, 0.0), u2))
        fz = jnp.where(on_x, u2,
                       jnp.where(on_y, u2, jnp.where(hi_face, 1.0, 0.0)))
        p = Vec3(params.bmin.x + ext.x * fx, params.bmin.y + ext.y * fy,
                 params.bmin.z + ext.z * fz)
        zero = jnp.zeros(shape, jnp.float32)
        sgn = jnp.where(hi_face, 1.0, -1.0)
        n = Vec3(jnp.where(on_x, sgn, zero), jnp.where(on_y, sgn, zero),
                 jnp.where(on_x | on_y, zero, sgn)) * params.reverse
        pdf = jnp.broadcast_to(1.0 / jnp.maximum(area, 1e-12), shape)
        return p, n, pdf
    if cat in (C.CONE, C.CYLINDER, C.PARABOLOID, C.HYPERBOLOID):
        # Lateral surface of a z-revolution shape ρ = f(z): sample (φ, z)
        # UNIFORM IN PARAMETER SPACE and divide by the exact area-element
        # Jacobian |∂p/∂φ × ∂p/∂z| = ρ·√(1+ρ'²) — an unbiased area pdf
        # without needing the (shape-specific) inverse-CDF of the area
        # measure.  The reference ships stub samplers for these shapes
        # that silently return garbage (cone.glsl:101, cylinder.glsl:92);
        # this replaces the r1-r3 Scene.add rejection with real sampling.
        two_pi = 2.0 * jnp.pi
        phi = two_pi * u1
        if cat == C.CONE:
            zmin = jnp.zeros_like(params.h)
            zmax = params.h
            z = zmin + (zmax - zmin) * u2
            rho = params.r * (1.0 - z / jnp.maximum(params.h, 1e-9))
            drho = -params.r / jnp.maximum(params.h, 1e-9) + 0.0 * z
        elif cat == C.CYLINDER:
            zmin = jnp.zeros_like(params.h)
            zmax = params.h
            z = zmin + (zmax - zmin) * u2
            rho = params.r + 0.0 * z
            drho = 0.0 * z
        elif cat == C.PARABOLOID:
            zmin = jnp.minimum(params.z0, params.z1)
            zmax = jnp.maximum(params.z0, params.z1)
            k = zmax / jnp.maximum(params.r * params.r, 1e-12)
            # The surface z = k rho^2 only exists where sign(z) == sign(k);
            # clamp the sampled band to the realizable side, mirroring the
            # intersect clip (a z0<0 constructor arg with k>0 would
            # otherwise put samples off-surface near the axis -- ADVICE r4)
            zmin = jnp.where(k > 0, jnp.maximum(zmin, 0.0), zmin)
            zmax = jnp.where(k < 0, jnp.minimum(zmax, 0.0), zmax)
            z = zmin + (zmax - zmin) * u2
            rho = jnp.sqrt(jnp.maximum(z / jnp.maximum(k, 1e-12), 1e-12))
            drho = 1.0 / jnp.maximum(2.0 * k * rho, 1e-9)
        else:  # HYPERBOLOID: ah(x²+y²) − ch z² = 1
            zmin = jnp.minimum(params.p1.z, params.p2.z)
            zmax = jnp.maximum(params.p1.z, params.p2.z)
            z = zmin + (zmax - zmin) * u2
            rho = jnp.sqrt(jnp.maximum(
                (1.0 + params.ch * z * z) / jnp.maximum(params.ah, 1e-12),
                1e-12))
            drho = params.ch * z / jnp.maximum(params.ah * rho, 1e-9)
        cos_p = jnp.cos(phi)
        sin_p = jnp.sin(phi)
        local = Vec3(rho * cos_p, rho * sin_p, z)
        n_local = Vec3(cos_p, sin_p, -drho).normalize()
        p = isect.from_object(local) + params.p
        n = isect.from_object(n_local) * params.reverse
        jac = rho * jnp.sqrt(1.0 + drho * drho)
        pdf = 1.0 / jnp.maximum(
            two_pi * (zmax - zmin) * jac, 1e-12)
        return (p.broadcast_to(shape) if p.shape != shape else p,
                n.broadcast_to(shape) if n.shape != shape else n,
                jnp.broadcast_to(pdf, shape))
    raise NotImplementedError(
        f"area-light sampling for shape category {cat} is not supported "
        "(every packable geometry now has a sampler; this is unreachable "
        "from Scene.add)")


def sample_direct(objects: tuple, lights: tuple, static, hit_p: Vec3, hit_n: Vec3,
                  u1, u2, light_idx, cull: bool = False) -> tuple[Vec3, Vec3]:
    """Direct-lighting estimate at hit points.

    Returns (radiance, wi_world): incident radiance already weighted by the
    surface cosine, geometric terms, visibility, and the light-pick pdf; and
    the light direction for BSDF evaluation.  Zero where no lights.

    `cull`: forward the per-batch AABB cull to the shadow scan (pays only
    when the batch is a small tile — see intersect.occluded).
    """
    shape = hit_p.shape
    n_lights = len(lights)
    black = Vec3(*(jnp.zeros(shape, jnp.float32),) * 3)
    if n_lights == 0:
        return black, black

    # Per-light candidate sample points / pre-visibility radiance.
    cand_p = black
    cand_r = black
    for li, (cat, lp) in enumerate(zip(static.light_categories, lights)):
        mask = light_idx == li
        if cat == C.AREA:
            obj_idx = static.area_light_objects[li]
            gcat = static.object_categories[obj_idx]
            gparams = objects[obj_idx]
            p_l, n_l, pdf_a = _sample_geometry(gcat, gparams, u1, u2, shape)
            to_l = p_l - hit_p
            d2 = jnp.maximum(to_l.length_sq(), 1e-12)
            wi = to_l * jax.lax.rsqrt(d2)
            cos_l = jnp.maximum(0.0, n_l.dot(-wi))
            cos_s = jnp.maximum(0.0, wi.dot(hit_n))
            rad = lp.emission.broadcast_to(shape) * (cos_l * cos_s /
                                                     (d2 * pdf_a) * n_lights)
        elif cat == C.POINT:
            jitter = samplers.uniform_sphere(u1, u2) * lp.radius
            p_l = lp.origin.broadcast_to(shape) + jitter
            to_l = p_l - hit_p
            d2 = jnp.maximum(to_l.length_sq(), 1e-12)
            wi = to_l * jax.lax.rsqrt(d2)
            cos_s = jnp.maximum(0.0, wi.dot(hit_n))
            rad = lp.emission.broadcast_to(shape) * (cos_s / d2 * n_lights)
        elif cat == C.SPOT:
            p_l = lp.origin.broadcast_to(shape)
            to_l = p_l - hit_p
            d2 = jnp.maximum(to_l.length_sq(), 1e-12)
            wi = to_l * jax.lax.rsqrt(d2)
            # Falloff about the spot's -y axis (ref: spot.glsl:19-27: the
            # cone looks down world -y; cosTheta = -w.y with w = -wi).
            cos_t = wi.y
            delta = (cos_t - lp.cos_total_width) / jnp.maximum(
                lp.cos_falloff_start - lp.cos_total_width, 1e-7)
            fall = jnp.where(cos_t < lp.cos_total_width, 0.0,
                             jnp.where(cos_t >= lp.cos_falloff_start, 1.0,
                                       (delta * delta) * (delta * delta)))
            cos_s = jnp.maximum(0.0, wi.dot(hit_n))
            rad = lp.emission.broadcast_to(shape) * (fall * cos_s / d2 * n_lights)
        else:  # pragma: no cover
            raise ValueError(f"unknown light category {cat}")
        cand_p = vm.where(mask, p_l, cand_p)
        cand_r = vm.where(mask, rad, cand_r)

    # One shadow ray per surface point toward the selected light sample.
    to_l = cand_p - hit_p
    dist = to_l.length()
    wi = to_l * (1.0 / jnp.maximum(dist, 1e-12))
    origin = hit_p + hit_n * 1e-4
    occ = isect.occluded(objects, static, origin, wi, dist * (1.0 - 1e-3),
                         cull=cull)
    vis = jnp.where(occ, 0.0, 1.0)
    return cand_r * vis, wi
