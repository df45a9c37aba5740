"""Ray–primitive intersection ops.

TPU-native replacement for the reference's generated GLSL intersect megakernel
(ref: src/shader/shape/shader.shape.js:28-52 and src/shader/shape/*.glsl).
Each shape op is a pure elementwise function over N rays (Vec3 of flat
arrays → VPU lanes); the scene dispatcher is a *static* Python loop over the
scene's objects, so XLA compiles exactly the shapes the scene uses (the
reference achieves the same by string-stitching only used plugins) and fuses
the whole nearest-hit fold into a few VPU kernels.  Branches become masks:
a missing hit is `t = MAX_DISTANCE`, never divergent control flow.

Shadow rays reuse the same ops with `detail=False`, which skips normal/uv
computation — the any-hit specialization of the closest-hit kernel.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..core import fastmath
from ..core import vecmath as vm
from ..core.vecmath import Vec3
from ..scene.geometry import BoxP, DiskP, FrustumP, HyperboloidP, ParaboloidP, SphereP

TWO_PI = 2.0 * C.PI


def to_object(v: Vec3) -> Vec3:
    """World → object space, basis N=(0,1,0) S=(0,0,-1) T=(1,0,0): local z is
    world up (ref: const/define.glsl:62-64, util/utility.glsl:1-3)."""
    return Vec3(-v.z, v.x, v.y)


def from_object(v: Vec3) -> Vec3:
    return Vec3(v.y, v.z, -v.x)


class Hit(NamedTuple):
    """Per-ray intersection record (cf. GLSL `Intersect`, const/struct.glsl)."""
    t: jax.Array
    p: Vec3          # world hit point
    ng: Vec3         # geometric normal, NOT reversed / flipped
    dpdu: Vec3       # world tangent (shading frame seed)
    u: jax.Array
    v: jax.Array
    # Cornell-box walls carry baked colors (shape/cornellbox.glsl:21-34).
    sc_override: Vec3
    use_override: jax.Array  # int32 0/1 (bool-valued vectors break Mosaic select)


def _zeros_vec(shape):
    z = jnp.zeros(shape, jnp.float32)
    return Vec3(z, z, z)


def miss(shape) -> Hit:
    z = jnp.zeros(shape, jnp.float32)
    zv = _zeros_vec(shape)
    return Hit(jnp.full(shape, C.MAX_DISTANCE, jnp.float32), zv, zv, zv, z, z,
               zv, jnp.zeros(shape, jnp.int32))


def _finish(valid, t, p, ng, dpdu, u, v, shape, sc=None, use_sc=None) -> Hit:
    t = jnp.where(valid, t, C.MAX_DISTANCE)
    if sc is None:
        sc = _zeros_vec(shape)
        use_sc = jnp.zeros(shape, jnp.int32)
    return Hit(t, p, ng, dpdu, u, v, sc, use_sc)


def _safe_div(num, den, eps=1e-12):
    return num / jnp.where(jnp.abs(den) < eps, jnp.where(den < 0, -eps, eps), den)


def _phi_of(x, y):
    phi = fastmath.atan2(y, x)
    return jnp.where(phi < 0.0, phi + TWO_PI, phi)


# --------------------------------------------------------------------------
# Sphere (ref: src/shader/shape/sphere.glsl)
# --------------------------------------------------------------------------

def sphere_intersect(ro: Vec3, rd: Vec3, s: SphereP, detail: bool = True) -> Hit:
    shape = ro.shape
    o = to_object(ro - s.center)
    d = to_object(rd)

    a = d.dot(d)
    b = 2.0 * o.dot(d)
    c2 = o.dot(o) - s.radius * s.radius
    ok, t1, t2 = vm.quadratic(a, b, c2)
    t = jnp.where(t1 < C.EPSILON, t2, t1)
    valid = ok & (t2 >= C.EPSILON) & (t < C.MAX_DISTANCE)
    if not detail:
        return _finish(valid, t, _zeros_vec(shape), _zeros_vec(shape),
                       _zeros_vec(shape), 0.0 * t, 0.0 * t, shape)

    h = o + d * t
    # Avoid the azimuthal singularity on the pole axis.
    hx = jnp.where((h.x == 0.0) & (h.y == 0.0), 1e-5 * s.radius, h.x)
    h = Vec3(hx, h.y, h.z)
    phi = _phi_of(h.x, h.y)
    u = phi / TWO_PI
    # Clip strictly inside (-1,1): d(acos)/dx diverges at ±1 and would poison
    # the backward pass at the poles.
    cos_t = jnp.clip(h.z / s.radius, -1.0 + 1e-6, 1.0 - 1e-6)
    theta = fastmath.acos(cos_t)
    v = theta / C.PI

    dpdu = Vec3(-TWO_PI * h.y, TWO_PI * h.x, jnp.zeros(shape, jnp.float32))
    # Geometric normal: unit radial direction (== normalize(cross(dpdv,dpdu))
    # away from the poles, but numerically robust everywhere).
    ng = h * (1.0 / s.radius)

    p = from_object(h) + s.center
    return _finish(valid, t, p, from_object(ng), from_object(dpdu), u, v, shape)


# --------------------------------------------------------------------------
# Cube (ref: src/shader/shape/cube.glsl)
# --------------------------------------------------------------------------

def _slab(ro: Vec3, rd: Vec3, bmin: Vec3, bmax: Vec3):
    inv = Vec3(_safe_div(1.0, rd.x), _safe_div(1.0, rd.y), _safe_div(1.0, rd.z))
    tmin = (bmin - ro) * inv
    tmax = (bmax - ro) * inv
    t1 = Vec3(jnp.minimum(tmin.x, tmax.x), jnp.minimum(tmin.y, tmax.y),
              jnp.minimum(tmin.z, tmax.z))
    t2 = Vec3(jnp.maximum(tmin.x, tmax.x), jnp.maximum(tmin.y, tmax.y),
              jnp.maximum(tmin.z, tmax.z))
    return t1.max_component(), t2.min_component()


def _box_face_normal(h: Vec3, bmin: Vec3, bmax: Vec3) -> Vec3:
    """Face normal by nearest-bound comparison (ref: cube.glsl:25-39)."""
    eps = 1e-4
    zero = jnp.zeros_like(h.x)
    one = jnp.ones_like(h.x)
    nx = jnp.where(h.x < bmin.x + eps, -one, jnp.where(h.x > bmax.x - eps, one, zero))
    ny = jnp.where(h.y < bmin.y + eps, -one, jnp.where(h.y > bmax.y - eps, one, zero))
    nz = jnp.where(h.z < bmin.z + eps, -one, jnp.where(h.z > bmax.z - eps, one, zero))
    # Priority x > y > z like the reference's if/else chain; default +z.
    has_x = nx != 0.0
    has_y = ny != 0.0
    has_z = nz != 0.0
    n = Vec3(
        jnp.where(has_x, nx, zero),
        jnp.where(~has_x & has_y, ny, zero),
        jnp.where(~has_x & ~has_y, jnp.where(has_z, nz, one), zero),
    )
    return n


def _box_dpdu(n: Vec3) -> Vec3:
    """Tangent via axis cross (ref: cube.glsl:41-48)."""
    x_axis = Vec3(jnp.ones_like(n.x), jnp.zeros_like(n.x), jnp.zeros_like(n.x))
    y_axis = Vec3(jnp.zeros_like(n.x), jnp.ones_like(n.x), jnp.zeros_like(n.x))
    use_x = jnp.abs(n.x) < 0.5
    return vm.where(use_x, n.cross(x_axis), n.cross(y_axis))


def cube_intersect(ro: Vec3, rd: Vec3, cb: BoxP, detail: bool = True) -> Hit:
    shape = ro.shape
    tnear, tfar = _slab(ro, rd, cb.bmin, cb.bmax)
    hit_outside = (tnear > C.EPSILON) & (tnear < tfar)
    t = jnp.where(hit_outside, tnear, tfar)
    valid = (tnear < tfar) & (t > C.EPSILON)
    if not detail:
        return _finish(valid, t, _zeros_vec(shape), _zeros_vec(shape),
                       _zeros_vec(shape), 0.0 * t, 0.0 * t, shape)

    p = ro + rd * t
    n = _box_face_normal(p, cb.bmin, cb.bmax)
    dpdu = _box_dpdu(n)
    # Face-local uv from the two tangential extents.
    ext = cb.bmax - cb.bmin
    rel = Vec3(_safe_div(p.x - cb.bmin.x, ext.x),
               _safe_div(p.y - cb.bmin.y, ext.y),
               _safe_div(p.z - cb.bmin.z, ext.z))
    on_x = jnp.abs(n.x) > 0.5
    on_y = jnp.abs(n.y) > 0.5
    u = jnp.where(on_x, rel.y, rel.x)
    v = jnp.where(on_x, rel.z, jnp.where(on_y, rel.z, rel.y))
    return _finish(valid, t, p, n, dpdu, u, v, shape)


# --------------------------------------------------------------------------
# Rectangle (ref: src/shader/shape/rectangle.glsl)
# --------------------------------------------------------------------------

def rectangle_frame(r: BoxP):
    """Rectangle spanning edges x=(dx,0,0), y=(0,dy,dz) from min
    (ref: rectangle.glsl:24-30)."""
    ext = r.bmax - r.bmin
    zero = jnp.zeros_like(ext.x)
    ex = Vec3(ext.x, zero, zero)
    ey = Vec3(zero, ext.y, ext.z)
    n = ex.cross(ey).normalize()
    return ex, ey, n


def rectangle_intersect(ro: Vec3, rd: Vec3, r: BoxP, detail: bool = True) -> Hit:
    shape = ro.shape
    ex, ey, n = rectangle_frame(r)
    len_x = ex.length()
    len_y = ey.length()
    ss = ex * (1.0 / jnp.maximum(len_x, 1e-20))
    ts = n.cross(ss)

    d_l = vm.world_to_local(rd, n, ss, ts)
    o_l = vm.world_to_local(ro - r.bmin, n, ss, ts)
    t = -_safe_div(o_l.z, d_l.z)
    h = o_l + d_l * t
    valid = (jnp.abs(d_l.z) > 1e-12) & (t >= C.EPSILON) & \
            (h.x <= len_x) & (h.y <= len_y) & \
            (h.x >= -C.EPSILON) & (h.y >= -C.EPSILON) & (t < C.MAX_DISTANCE)
    if not detail:
        return _finish(valid, t, _zeros_vec(shape), _zeros_vec(shape),
                       _zeros_vec(shape), 0.0 * t, 0.0 * t, shape)

    u = h.x / jnp.maximum(len_x, 1e-20)
    v = h.y / jnp.maximum(len_y, 1e-20)
    p = vm.local_to_world(h, n, ss, ts) + r.bmin
    ng = n.broadcast_to(shape)
    return _finish(valid, t, p, ng, ex.broadcast_to(shape), u, v, shape)


# --------------------------------------------------------------------------
# Cone / Cylinder (ref: src/shader/shape/{cone,cylinder}.glsl)
# --------------------------------------------------------------------------

def _clipped_quadratic(o: Vec3, d: Vec3, a, b, c2, zlo, zhi):
    """Solve quadratic, picking nearest root whose hit lies in z∈[zlo,zhi];
    fall back to the far root (shared by cone/cylinder/quadrics)."""
    ok, t1, t2 = vm.quadratic(a, b, c2)
    ok = ok & (t2 >= -C.EPSILON)
    t1c = jnp.where(t1 < C.EPSILON, t2, t1)
    z1 = o.z + d.z * t1c
    in1 = (z1 >= zlo) & (z1 <= zhi)
    # If near fails the clip, try far (only if near wasn't already far).
    z2 = o.z + d.z * t2
    in2 = (z2 >= zlo) & (z2 <= zhi) & (t1c != t2)
    t = jnp.where(in1, t1c, t2)
    valid = ok & (in1 | in2) & (t < C.MAX_DISTANCE) & (t >= C.EPSILON)
    return valid, t


def cone_intersect(ro: Vec3, rd: Vec3, cn: FrustumP, detail: bool = True) -> Hit:
    shape = ro.shape
    o = to_object(ro - cn.p)
    d = to_object(rd)
    k = (cn.r / cn.h) ** 2
    a = d.x * d.x + d.y * d.y - k * d.z * d.z
    b = 2.0 * (d.x * o.x + d.y * o.y - k * d.z * (o.z - cn.h))
    c2 = o.x * o.x + o.y * o.y - k * (o.z - cn.h) * (o.z - cn.h)
    valid, t = _clipped_quadratic(o, d, a, b, c2, -C.EPSILON, cn.h)
    if not detail:
        return _finish(valid, t, _zeros_vec(shape), _zeros_vec(shape),
                       _zeros_vec(shape), 0.0 * t, 0.0 * t, shape)

    h = o + d * t
    phi = _phi_of(h.x, h.y)
    u = phi / TWO_PI
    v = h.z / cn.h
    zero = jnp.zeros(shape, jnp.float32)
    dpdu = Vec3(-TWO_PI * h.y, TWO_PI * h.x, zero)
    inv1mv = _safe_div(1.0, 1.0 - v)
    dpdv = Vec3(-h.x * inv1mv, -h.y * inv1mv, jnp.broadcast_to(cn.h, shape).astype(jnp.float32))
    ng = dpdu.cross(dpdv).normalize()
    p = from_object(h) + cn.p
    return _finish(valid, t, p, from_object(ng), from_object(dpdu), u, v, shape)


def cylinder_intersect(ro: Vec3, rd: Vec3, cy: FrustumP, detail: bool = True) -> Hit:
    shape = ro.shape
    o = to_object(ro - cy.p)
    d = to_object(rd)
    a = d.x * d.x + d.y * d.y
    b = 2.0 * (d.x * o.x + d.y * o.y)
    c2 = o.x * o.x + o.y * o.y - cy.r * cy.r
    valid, t = _clipped_quadratic(o, d, a, b, c2, -C.EPSILON, cy.h)
    if not detail:
        return _finish(valid, t, _zeros_vec(shape), _zeros_vec(shape),
                       _zeros_vec(shape), 0.0 * t, 0.0 * t, shape)

    h = o + d * t
    phi = _phi_of(h.x, h.y)
    u = phi / TWO_PI
    v = h.z / cy.h
    zero = jnp.zeros(shape, jnp.float32)
    dpdu = Vec3(-TWO_PI * h.y, TWO_PI * h.x, zero)
    dpdv = Vec3(zero, zero, jnp.broadcast_to(cy.h, shape).astype(jnp.float32))
    ng = dpdu.cross(dpdv).normalize()
    p = from_object(h) + cy.p
    return _finish(valid, t, p, from_object(ng), from_object(dpdu), u, v, shape)


# --------------------------------------------------------------------------
# Disk (ref: src/shader/shape/disk.glsl)
# --------------------------------------------------------------------------

def disk_intersect(ro: Vec3, rd: Vec3, dk: DiskP, detail: bool = True) -> Hit:
    shape = ro.shape
    o = to_object(ro - dk.p)
    d = to_object(rd)
    t = -_safe_div(o.z, d.z)
    h = o + d * t
    dist2 = h.x * h.x + h.y * h.y
    valid = (jnp.abs(d.z) > 1e-12) & (t > 0.0) & (t < C.MAX_DISTANCE) & \
            (dist2 <= dk.r * dk.r) & (dist2 >= dk.inner_r * dk.inner_r)
    if not detail:
        return _finish(valid, t, _zeros_vec(shape), _zeros_vec(shape),
                       _zeros_vec(shape), 0.0 * t, 0.0 * t, shape)

    phi = _phi_of(h.x, h.y)
    u = phi / TWO_PI
    r_hit = jnp.sqrt(dist2)
    v = 1.0 - _safe_div(r_hit - dk.inner_r, dk.r - dk.inner_r)
    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)
    dpdu = Vec3(-TWO_PI * h.y, TWO_PI * h.x, zero)
    ng = Vec3(zero, zero, one)  # local +z == world +y (ref: disk.glsl:33)
    p = from_object(h) + dk.p
    return _finish(valid, t, p, from_object(ng), from_object(dpdu), u, v, shape)


# --------------------------------------------------------------------------
# Hyperboloid / Paraboloid (ref: src/shader/shape/{hyperboloid,paraboloid}.glsl)
# --------------------------------------------------------------------------

def hyperboloid_intersect(ro: Vec3, rd: Vec3, hy: HyperboloidP, detail: bool = True) -> Hit:
    shape = ro.shape
    o = to_object(ro - hy.p)
    d = to_object(rd)
    a = hy.ah * (d.x * d.x + d.y * d.y) - hy.ch * d.z * d.z
    b = 2.0 * (hy.ah * (d.x * o.x + d.y * o.y) - hy.ch * d.z * o.z)
    c2 = hy.ah * (o.x * o.x + o.y * o.y) - hy.ch * o.z * o.z - 1.0
    zmin = jnp.minimum(hy.p1.z, hy.p2.z)
    zmax = jnp.maximum(hy.p1.z, hy.p2.z)
    valid, t = _clipped_quadratic(o, d, a, b, c2, zmin, zmax)
    if not detail:
        return _finish(valid, t, _zeros_vec(shape), _zeros_vec(shape),
                       _zeros_vec(shape), 0.0 * t, 0.0 * t, shape)

    h = o + d * t
    v = _safe_div(h.z - hy.p1.z, hy.p2.z - hy.p1.z)
    pr = vm.lerp(hy.p1.broadcast_to(shape), hy.p2.broadcast_to(shape), v)
    phi = _phi_of(pr.x * h.x + pr.y * h.y, pr.x * h.y - h.x * pr.y)
    u = phi / TWO_PI
    sin_p = jnp.sin(phi)
    cos_p = jnp.cos(phi)
    zero = jnp.zeros(shape, jnp.float32)
    dpdu = Vec3(-TWO_PI * h.y, TWO_PI * h.x, zero)
    dx = hy.p2.x - hy.p1.x
    dy = hy.p2.y - hy.p1.y
    dz = hy.p2.z - hy.p1.z
    dpdv = Vec3(dx * cos_p - dy * sin_p, dx * sin_p + dy * cos_p,
                jnp.broadcast_to(dz, shape).astype(jnp.float32))
    ng = dpdu.cross(dpdv).normalize()
    p = from_object(h) + hy.p
    return _finish(valid, t, p, from_object(ng), from_object(dpdu), u, v, shape)


def paraboloid_intersect(ro: Vec3, rd: Vec3, pb: ParaboloidP, detail: bool = True) -> Hit:
    shape = ro.shape
    o = to_object(ro - pb.p)
    d = to_object(rd)
    zmin = jnp.minimum(pb.z0, pb.z1)
    zmax = jnp.maximum(pb.z0, pb.z1)
    k = _safe_div(zmax, pb.r * pb.r)
    a = k * (d.x * d.x + d.y * d.y)
    b = 2.0 * k * (d.x * o.x + d.y * o.y) - d.z
    c2 = k * (o.x * o.x + o.y * o.y) - o.z
    valid, t = _clipped_quadratic(o, d, a, b, c2, zmin, zmax)
    if not detail:
        return _finish(valid, t, _zeros_vec(shape), _zeros_vec(shape),
                       _zeros_vec(shape), 0.0 * t, 0.0 * t, shape)

    h = o + d * t
    phi = _phi_of(h.x, h.y)
    u = phi / TWO_PI
    v = _safe_div(h.z - zmin, zmax - zmin)
    zero = jnp.zeros(shape, jnp.float32)
    dpdu = Vec3(-TWO_PI * h.y, TWO_PI * h.x, zero)
    hz = jnp.where(jnp.abs(h.z) < 1e-8, 1e-8, h.z)
    dpdv = Vec3((zmax - zmin) * h.x / (2.0 * hz), (zmax - zmin) * h.y / (2.0 * hz),
                jnp.broadcast_to(zmax - zmin, shape).astype(jnp.float32))
    ng = dpdu.cross(dpdv).normalize()
    p = from_object(h) + pb.p
    return _finish(valid, t, p, from_object(ng), from_object(dpdu), u, v, shape)


# --------------------------------------------------------------------------
# Cornell box (ref: src/shader/shape/cornellbox.glsl)
# --------------------------------------------------------------------------

def cornellbox_intersect(ro: Vec3, rd: Vec3, cb: BoxP, detail: bool = True) -> Hit:
    shape = ro.shape
    tnear, tfar = _slab(ro, rd, cb.bmin, cb.bmax)
    t = tfar  # always the far wall: the box is viewed from inside
    valid = (tnear < tfar) & (t > C.EPSILON)
    if not detail:
        return _finish(valid, t, _zeros_vec(shape), _zeros_vec(shape),
                       _zeros_vec(shape), 0.0 * t, 0.0 * t, shape)

    p = ro + rd * t
    n = -_box_face_normal(p, cb.bmin, cb.bmax)
    dpdu = _box_dpdu(n)
    # Baked wall colors: left GREEN, right BLUE, floor/ceiling/front WHITE,
    # back BLACK (ref: cornellbox.glsl:21-37).
    eps = 1e-4
    green = vm.splat(C.GREEN).broadcast_to(shape)
    blue = vm.splat(C.BLUE).broadcast_to(shape)
    white = vm.splat(C.WHITE).broadcast_to(shape)
    black = vm.splat(C.BLACK).broadcast_to(shape)
    sc = vm.where(p.x < cb.bmin.x + eps, green,
         vm.where(p.x > cb.bmax.x - eps, blue,
         vm.where((p.y < cb.bmin.y + eps) | (p.y > cb.bmax.y - eps) |
                  (p.z > cb.bmin.z + eps), white, black)))
    ext = cb.bmax - cb.bmin
    rel = Vec3(_safe_div(p.x - cb.bmin.x, ext.x),
               _safe_div(p.y - cb.bmin.y, ext.y),
               _safe_div(p.z - cb.bmin.z, ext.z))
    on_x = jnp.abs(n.x) > 0.5
    on_y = jnp.abs(n.y) > 0.5
    u = jnp.where(on_x, rel.y, rel.x)
    v = jnp.where(on_x, rel.z, jnp.where(on_y, rel.z, rel.y))
    return _finish(valid, t, p, n, dpdu, u, v, shape, sc, jnp.ones(shape, jnp.int32))


# --------------------------------------------------------------------------
# Scene dispatcher
# --------------------------------------------------------------------------

SHAPE_FNS = {
    C.SPHERE: sphere_intersect,
    C.CUBE: cube_intersect,
    C.RECTANGLE: rectangle_intersect,
    C.CONE: cone_intersect,
    C.CYLINDER: cylinder_intersect,
    C.DISK: disk_intersect,
    C.HYPERBOLOID: hyperboloid_intersect,
    C.PARABOLOID: paraboloid_intersect,
    C.CORNELLBOX: cornellbox_intersect,
}

# Objects per category at or above which intersect_scene switches from the
# static unrolled fold (one compiled kernel chain per object — ideal for the
# reference-scale ~10-object scenes, bit-stable) to the BATCHED fold (one
# fori_loop over stacked params — compile time flat in object count).
BATCH_THRESHOLD = 8

# Set (and restored) by the Pallas megakernel around its kernel trace: the
# winner-fold then runs its object loop PYTHON-UNROLLED with static row
# lookups instead of fori_loop + dynamic picks — inside Mosaic the dynamic
# pick needs cross-lane reduces on 1-vreg arrays (the slow small-geometry
# regime, docs/PERF.md §3) and measured ~1.6x slower than XLA's batched
# fold; unrolled, per-step params are direct scalars.  Compile time grows
# with object count again, but Mosaic compiles are seconds on this relay.
IN_KERNEL_TRACE = False

# Unroll cap for in-kernel groups: at 256 unrolled spheres the Mosaic
# remote compile crashes outright (tpu_compile_helper exit 1, r5) —
# groups above this fall back to the fori+dynamic-pick fold (slower per
# ray, but it compiles and stays flat in object count).
KERNEL_UNROLL_MAX = 128


def object_aabb(cat: int, p):
    """Conservative world AABB of one packed shape, for the per-object
    bound-box cull (ref: src/shader/shape/boundbox.glsl:6-16 culls each
    shape the same way).  Comparison-only — never differentiated."""
    if cat in (C.CUBE, C.RECTANGLE, C.CORNELLBOX):
        # Pad so degenerate (zero-thickness) axes survive the strict slab
        # test: an axis-aligned RECTANGLE (e.g. a flat ceiling light) has
        # bmin == bmax on one axis, for which tn == tf on every ray that
        # hits the plane and a strict tn < tf cull would silently drop the
        # object (ADVICE r3).  The DISK case below pads for the same reason.
        # The pad scales with coordinate magnitude: at |coord| ~ 1e4 the
        # f32 spacing is ~1e-3, so an absolute 1e-4 pad would round away
        # and re-expose the degenerate axis (ADVICE r4).
        mag = jnp.maximum(
            jnp.maximum(jnp.abs(p.bmin.x), jnp.abs(p.bmax.x)),
            jnp.maximum(jnp.maximum(jnp.abs(p.bmin.y), jnp.abs(p.bmax.y)),
                        jnp.maximum(jnp.abs(p.bmin.z), jnp.abs(p.bmax.z))))
        eps = 1e-4 * (1.0 + mag)
        pad = Vec3(eps, eps, eps)
        return p.bmin - pad, p.bmax + pad
    if cat == C.SPHERE:
        r = p.radius
        return p.center - Vec3(r, r, r), p.center + Vec3(r, r, r)
    if cat in (C.CONE, C.CYLINDER):
        # local z ∈ [0, h] is world y; radial extent r in world x/z
        return (p.p + Vec3(-p.r, 0.0 * p.h, -p.r),
                p.p + Vec3(p.r, p.h, p.r))
    if cat == C.DISK:
        eps = 1e-4 * (1.0 + jnp.abs(p.p.y))   # relative pad (see above)
        return (p.p + Vec3(-p.r, -eps, -p.r),
                p.p + Vec3(p.r, eps, p.r))
    if cat == C.PARABOLOID:
        zmax = jnp.maximum(p.z0, p.z1)
        zmin = jnp.minimum(jnp.minimum(p.z0, p.z1), 0.0 * p.z0)
        return (p.p + Vec3(-p.r, zmin, -p.r), p.p + Vec3(p.r, zmax, p.r))
    if cat == C.HYPERBOLOID:
        r1 = jnp.sqrt(p.p1.x ** 2 + p.p1.y ** 2)
        r2 = jnp.sqrt(p.p2.x ** 2 + p.p2.y ** 2)
        r = jnp.maximum(r1, r2)
        zlo = jnp.minimum(p.p1.z, p.p2.z)
        zhi = jnp.maximum(p.p1.z, p.p2.z)
        return p.p + Vec3(-r, zlo, -r), p.p + Vec3(r, zhi, r)
    raise ValueError(f"no AABB for category {cat}")  # pragma: no cover


class SceneHit(NamedTuple):
    """Nearest hit over all objects, with per-ray scene bookkeeping."""
    t: jax.Array
    p: Vec3
    n: Vec3           # shading normal, flipped to face the ray
    ng: Vec3          # geometric normal, unflipped
    dpdu: Vec3
    u: jax.Array
    v: jax.Array
    into: jax.Array   # entered the surface from outside (for dielectrics)
    emission: Vec3    # zeroed on back faces (w.r.t. reverse-adjusted normal)
    mat_row: jax.Array   # i32 material row per ray
    tex_row: jax.Array   # i32 texture row per ray
    obj_id: jax.Array    # i32 object index per ray
    emissive: jax.Array  # int32 0/1: hit object is an emitter
    sc_override: Vec3
    use_override: jax.Array
    valid: jax.Array  # bool: t < MAX_DISTANCE


def _dyn_at(a, k):
    """Mosaic-safe dynamic element pick a[k] for a 1-D traced array: `a[k]`
    lowers to `dynamic_slice`, which Pallas TPU does not implement inside
    kernels — a 2-D iota-masked reduction (compare + select + sum on a
    (1, n) view) lowers to plain vector ops instead and is exact (one
    nonzero term).  Used by the batched folds so they work both in XLA and
    inside the megakernel."""
    a2 = a.reshape(1, -1)
    iota = jax.lax.broadcasted_iota(jnp.int32, a2.shape, 1)
    return jnp.sum(jnp.where(iota == k, a2, jnp.zeros_like(a2)))


def _select_hit(closer, a: Hit, b: Hit) -> Hit:
    return jax.tree.map(lambda x, y: jnp.where(closer, x, y), a, b)


def _stack_group(objects, idxs):
    """Stack same-category param pytrees along a leading object axis."""
    return jax.tree.map(
        lambda *ls: jnp.stack([jnp.asarray(l, jnp.float32) for l in ls]),
        *[objects[i] for i in idxs])


def _fold_one(cat, params, i, static, ro, rd, shape, carry,
              mat_row=None, tex_row=None, emissive=None, detail=True):
    """Fold one object's hit into the (best, best_aux) carry.  Row/flag
    metadata defaults to the static tables (unrolled path) or comes in as
    traced scalars (batched path)."""
    best, best_aux = carry
    h = SHAPE_FNS[cat](ro, rd, params, detail=detail)
    # Emission is visible only from the front of the reverse-adjusted
    # normal (ref: shape/shader.shape.js:47-50).
    face = (h.ng * params.reverse).dot(rd) < -C.EPSILON
    emission = vm.where(face, params.emission.broadcast_to(shape),
                        _zeros_vec(shape))
    closer = h.t < best.t
    best = _select_hit(closer, h, best)
    aux = {
        "emission": emission,
        "mat_row": jnp.broadcast_to(
            jnp.asarray(static.object_mat_rows[i] if mat_row is None
                        else mat_row, jnp.int32), shape),
        "tex_row": jnp.broadcast_to(
            jnp.asarray(static.object_tex_rows[i] if tex_row is None
                        else tex_row, jnp.int32), shape),
        "obj_id": jnp.broadcast_to(jnp.asarray(i, jnp.int32), shape),
        "emissive": jnp.broadcast_to(
            jnp.asarray(int(static.object_emissive[i]) if emissive is None
                        else emissive, jnp.int32), shape),
    }
    best_aux = jax.tree.map(lambda x, y: jnp.where(closer, x, y),
                            aux, best_aux)
    return best, best_aux


def _batched_fold(cat, idxs, objects, static, ro, rd, shape, carry,
                  cull: bool, unroll: bool = False):
    """One fori_loop over a stacked same-category group: ONE compiled
    kernel chain regardless of group size (compile time flat in object
    count — VERDICT r2 missing #4), with an optional per-object AABB cull
    (ref: shape/boundbox.glsl:6-16): a lax.cond skips the shape kernel when
    NO lane in this batch/tile can hit the object's bound box closer than
    the current best (exact — a culled object cannot change the fold).

    Winner-only detail (r4, VERDICT r3 stretch #9): the per-object loop
    runs the CHEAP t-only kernel (`detail=False`) and folds the winning
    object's PARAMETERS into the carry (~20 selects/object); the expensive
    detail computation (hit point, normal, dpdu, uv, emission facing) runs
    ONCE per group from the selected per-lane parameters — so the
    per-object cost drops from (quadratic + detail) to (quadratic +
    selects).  The winner's t comes from the LOOP (t_group), so the
    nearest-hit merge is exact by construction; the recomputed detail
    fields (p/n/uv) agree to allclose, not bit-equal — the detail kernel
    compiles in a different fusion context and may drift a few ulp
    (ADVICE r4).  No gather needed (Mosaic has no 1D
    gather): the selection rides the same masked-fold pattern as the hits.
    """
    stacked = _stack_group(objects, idxs)
    # Per-object STATIC int tables (material/texture rows, ids, emissive
    # flags) must NOT materialize as constant arrays: a Pallas kernel trace
    # cannot capture non-scalar constants ("captures constants [i32[n]]"),
    # which silently barred the batched fold from the megakernel until r5.
    # The values are static Python ints, so synthesize the step-k value
    # with an affine formula (consecutive scene rows — the common case) or
    # a scalar select chain (everything stays SMEM scalars).
    mat_rows = [static.object_mat_rows[i] for i in idxs]
    tex_rows = [static.object_tex_rows[i] for i in idxs]
    obj_ids = list(idxs)
    emissives = [int(static.object_emissive[i]) for i in idxs]

    def _static_at(vals, k):
        if isinstance(k, int):           # unrolled loop: direct lookup
            return jnp.int32(vals[k])
        if len(vals) == 1:
            return jnp.int32(vals[0])
        stride = vals[1] - vals[0]
        if all(v == vals[0] + stride * j for j, v in enumerate(vals)):
            return jnp.int32(vals[0]) + jnp.int32(stride) * k
        acc = jnp.int32(vals[0])
        for j in range(1, len(vals)):
            acc = jnp.where(k == j, jnp.int32(vals[j]), acc)
        return acc

    def pick(a, k):
        if isinstance(k, int):           # static index: always legal
            return a[k]
        return _dyn_at(a, k)

    zero = jnp.zeros(shape, jnp.float32)
    # init winner params = object 0 of the group (REAL params, not zeros:
    # the end-of-group detail kernel must see valid geometry on no-hit
    # lanes or NaNs poison gradients through the final where)
    win0 = jax.tree.map(lambda a: jnp.broadcast_to(a[0], shape), stacked)
    aux0 = {
        "mat_row": jnp.zeros(shape, jnp.int32),
        "tex_row": jnp.zeros(shape, jnp.int32),
        "obj_id": jnp.full(shape, -1, jnp.int32),
        "emissive": jnp.zeros(shape, jnp.int32),
    }
    group0 = (jnp.full(shape, C.MAX_DISTANCE, jnp.float32), aux0, win0)

    def fold_obj(k, c):
        pk = jax.tree.map(lambda a: pick(a, k), stacked)
        t_best, aux, win = c
        h = SHAPE_FNS[cat](ro, rd, pk, detail=False)
        closer = h.t < t_best
        t_best = jnp.where(closer, h.t, t_best)
        aux = {
            "mat_row": jnp.where(closer, _static_at(mat_rows, k),
                                 aux["mat_row"]),
            "tex_row": jnp.where(closer, _static_at(tex_rows, k),
                                 aux["tex_row"]),
            "obj_id": jnp.where(closer, _static_at(obj_ids, k),
                                aux["obj_id"]),
            "emissive": jnp.where(closer, _static_at(emissives, k),
                                  aux["emissive"]),
        }
        win = jax.tree.map(lambda a, b: jnp.where(closer, a, b),
                           pk, win)
        return (t_best, aux, win)

    def body(k, c):
        if not cull:
            return fold_obj(k, c)
        pk = jax.tree.map(lambda a: pick(a, k), stacked)
        amin, amax = object_aabb(cat, pk)
        tn, tf = _slab(ro, rd, amin, amax)
        possible = jnp.any((tn < tf) & (tf > C.EPSILON) & (tn < c[0]))
        return jax.lax.cond(possible, lambda c: fold_obj(k, c),
                            lambda c: c, c)

    def _cluster_aabb(sub):
        amin = amax = None
        for k in sub:
            pk = jax.tree.map(lambda a: a[k], stacked)
            a0, a1 = object_aabb(cat, pk)
            if amin is None:
                amin, amax = a0, a1
            else:
                amin = Vec3(jnp.minimum(amin.x, a0.x),
                            jnp.minimum(amin.y, a0.y),
                            jnp.minimum(amin.z, a0.z))
                amax = Vec3(jnp.maximum(amax.x, a1.x),
                            jnp.maximum(amax.y, a1.y),
                            jnp.maximum(amax.z, a1.z))
        return amin, amax

    if unroll:
        # Inside a Mosaic kernel the fori_loop's dynamic pick costs
        # cross-lane reduces on 1-vreg arrays — the slow small-geometry
        # regime (docs/PERF.md §3); a Python-unrolled loop gives every
        # step DIRECT scalar params and static row lookups at zero pick
        # cost (measured: fori+pick 0.073 s vs XLA 0.047 at 16 spheres,
        # 512^2x8spp; compile time is the tradeoff and Mosaic compiles
        # are seconds on this relay).
        c = group0
        if cull:
            # CLUSTER-level cull: one cond per ~CLUSTER scene-order-
            # adjacent objects (a per-OBJECT cond was measured 2.5x slower
            # at 64 objects — Mosaic cond overhead dominates).  Cluster
            # membership must be static, so it uses scene ORDER; builders
            # that add objects in spatial order (grids, meshes) get
            # spatially tight cluster AABBs.
            CLUSTER = 8
            for c0 in range(0, len(idxs), CLUSTER):
                sub = list(range(c0, min(c0 + CLUSTER, len(idxs))))
                amin, amax = _cluster_aabb(sub)
                tn, tf = _slab(ro, rd, amin, amax)
                possible = jnp.any((tn < tf) & (tf > C.EPSILON)
                                   & (tn < c[0]))

                def do(c, sub=sub):
                    for k in sub:
                        c = fold_obj(k, c)
                    return c

                c = jax.lax.cond(possible, do, lambda c: c, c)
        else:
            for k in range(len(idxs)):
                c = fold_obj(k, c)
        t_group, aux_g, win = c
    else:
        t_group, aux_g, win = jax.lax.fori_loop(0, len(idxs), body, group0)

    # ONE detail pass from the per-lane winning parameters.  The detail
    # kernel repeats the same ops on the same values, but it compiles in a
    # DIFFERENT fusion context than the fori_loop's cheap kernel, so its t
    # could drift a few ulp (the repo's documented lax.cond codegen effect).
    # Use the loop's t_group for t/closer so the merge is exact by
    # construction (ADVICE r4); the detail fields (p/n/uv) come from h.
    h = SHAPE_FNS[cat](ro, rd, win, detail=True)
    h = h._replace(t=t_group)
    face = (h.ng * win.reverse).dot(rd) < -C.EPSILON
    emission = vm.where(face, win.emission, _zeros_vec(shape))

    best, best_aux = carry
    closer = t_group < best.t
    best = _select_hit(closer, h, best)
    merged_aux = dict(aux_g)
    merged_aux["emission"] = emission
    best_aux = jax.tree.map(lambda x, y: jnp.where(closer, x, y),
                            merged_aux, best_aux)
    return best, best_aux


def _category_groups(static):
    """Indices grouped by category, preserving scene order inside groups."""
    groups = {}
    for i, cat in enumerate(static.object_categories):
        groups.setdefault(cat, []).append(i)
    return groups


def intersect_scene(objects: tuple, static, ro: Vec3, rd: Vec3,
                    cull: bool = None) -> SceneHit:
    """Nearest-hit fold over the scene's (static) object list
    (ref: shape/shader.shape.js:28-42 intersect dispatcher).

    Categories with < BATCH_THRESHOLD objects use the static unrolled fold
    (one fused kernel chain per object, bit-stable — the reference-scale
    path).  Larger categories switch to the batched winner-fold; inside a
    Mosaic kernel trace (IN_KERNEL_TRACE, set by the megakernel) the fold
    is PYTHON-UNROLLED up to KERNEL_UNROLL_MAX objects — measured 1.6x
    faster in-kernel than fori+dynamic-pick and 2.7x faster than the XLA
    batched path at 64 spheres (MANYOBJ_r05.json) — and fori_loop
    otherwise (compile time flat in object count).

    `cull` (default OFF) adds the AABB cond-cull to batched groups —
    per-object under fori, per 8-object CLUSTER when unrolled.  It is a
    MEASURED NEGATIVE everywhere tried on this hardware (whole-image XLA:
    any-reduce always true, 1.7x slower at 64 spheres MANYOBJ_r03;
    in-kernel per-object conds 1.7-2.5x slower; in-kernel cluster conds
    8-38% slower, MANYOBJ_r05) — the Mosaic cond cost inside the
    spp/bounce loops exceeds the skipped intersection work.  Kept opt-in
    for future hardware where branch cost may drop."""
    shape = jnp.broadcast_shapes(ro.shape, rd.shape)
    ro = ro.broadcast_to(shape)
    rd = rd.broadcast_to(shape)

    best = miss(shape)
    best_aux = {
        "emission": _zeros_vec(shape),
        "mat_row": jnp.zeros(shape, jnp.int32),
        "tex_row": jnp.zeros(shape, jnp.int32),
        "obj_id": jnp.full(shape, -1, jnp.int32),
        "emissive": jnp.zeros(shape, jnp.int32),
    }
    carry = (best, best_aux)

    groups = _category_groups(static)
    batched_cats = [c for c, v in groups.items()
                    if len(v) >= BATCH_THRESHOLD]
    if cull is None:
        cull = False
    # unbatched objects fold in EXACT scene order (bit-stable vs the
    # committed goldens); batched groups fold after, in first-seen order
    for i, cat in enumerate(static.object_categories):
        if cat not in batched_cats:
            carry = _fold_one(cat, objects[i], i, static, ro, rd, shape,
                              carry)
    for cat in batched_cats:
        carry = _batched_fold(
            cat, groups[cat], objects, static, ro, rd, shape, carry, cull,
            unroll=IN_KERNEL_TRACE and len(groups[cat]) <= KERNEL_UNROLL_MAX)
    best, best_aux = carry

    into = best.ng.dot(rd) < -C.EPSILON
    n = vm.where(into, best.ng, -best.ng)
    return SceneHit(
        t=best.t, p=best.p, n=n, ng=best.ng, dpdu=best.dpdu, u=best.u, v=best.v,
        into=into, emission=best_aux["emission"], mat_row=best_aux["mat_row"],
        tex_row=best_aux["tex_row"], obj_id=best_aux["obj_id"],
        emissive=best_aux["emissive"], sc_override=best.sc_override,
        use_override=best.use_override, valid=best.t < C.MAX_DISTANCE,
    )


def occluded(objects: tuple, static, ro: Vec3, rd: Vec3, max_t,
             cull: bool = False) -> jax.Array:
    """Any-hit shadow query along normalized `rd`, accepting occluders with
    t ∈ (EPSILON, max_t) (ref: light/shader.light.js:21-28 testShadow,
    parameterized there on the unnormalized segment instead).  Large
    same-category groups fold via fori_loop like intersect_scene (the
    shadow pass is the second full intersect scan — it must scale the same
    way); occlusion is carried as int32 inside the loop (Mosaic-safe).

    `cull` (opt-in, batched groups): per-BATCH AABB cond — skip an object
    when no still-unoccluded lane's segment can reach its bound box.  Like
    the closest-hit cull this only pays when the batch is a small tile
    (the Pallas megakernel), where the any-reduce has a chance to be false;
    it also short-circuits once every lane in the tile is occluded."""
    shape = jnp.broadcast_shapes(ro.shape, rd.shape)
    ro = ro.broadcast_to(shape)
    rd = rd.broadcast_to(shape)
    occ = jnp.zeros(shape, bool)

    groups = _category_groups(static)
    batched_cats = [c for c, v in groups.items()
                    if len(v) >= BATCH_THRESHOLD]
    for i, cat in enumerate(static.object_categories):
        if cat in batched_cats:
            continue
        h = SHAPE_FNS[cat](ro, rd, objects[i], detail=False)
        occ = occ | ((h.t > C.EPSILON) & (h.t < max_t))
    for cat in batched_cats:
        idxs = groups[cat]
        stacked = _stack_group(objects, idxs)

        def body(k, occ32, cat=cat, stacked=stacked):
            if isinstance(k, int):
                pk = jax.tree.map(lambda a: a[k], stacked)
            else:
                pk = jax.tree.map(lambda a: _dyn_at(a, k), stacked)

            def do(occ32):
                h = SHAPE_FNS[cat](ro, rd, pk, detail=False)
                return occ32 | ((h.t > C.EPSILON) & (h.t < max_t)).astype(
                    jnp.int32)

            if cull:
                amin, amax = object_aabb(cat, pk)
                tn, tf = _slab(ro, rd, amin, amax)
                reachable = (tn < tf) & (tf > C.EPSILON) & (tn < max_t)
                possible = jnp.any(reachable & (occ32 == 0))
                return jax.lax.cond(possible, do, lambda o: o, occ32)
            return do(occ32)

        if IN_KERNEL_TRACE and len(idxs) <= KERNEL_UNROLL_MAX:
            occ32 = occ.astype(jnp.int32)

            def shadow_obj(k, occ32):
                pk = jax.tree.map(lambda a: a[k], stacked)
                h = SHAPE_FNS[cat](ro, rd, pk, detail=False)
                return occ32 | ((h.t > C.EPSILON)
                                & (h.t < max_t)).astype(jnp.int32)

            if cull:
                # cluster-level cond, mirroring the closest-hit fold
                CLUSTER = 8
                for c0 in range(0, len(idxs), CLUSTER):
                    sub = list(range(c0, min(c0 + CLUSTER, len(idxs))))
                    amin = amax = None
                    for k in sub:
                        pk = jax.tree.map(lambda a: a[k], stacked)
                        a0, a1 = object_aabb(cat, pk)
                        if amin is None:
                            amin, amax = a0, a1
                        else:
                            amin = Vec3(jnp.minimum(amin.x, a0.x),
                                        jnp.minimum(amin.y, a0.y),
                                        jnp.minimum(amin.z, a0.z))
                            amax = Vec3(jnp.maximum(amax.x, a1.x),
                                        jnp.maximum(amax.y, a1.y),
                                        jnp.maximum(amax.z, a1.z))
                    tn, tf = _slab(ro, rd, amin, amax)
                    reachable = ((tn < tf) & (tf > C.EPSILON)
                                 & (tn < max_t))
                    possible = jnp.any(reachable & (occ32 == 0))

                    def do(o, sub=sub):
                        for k in sub:
                            o = shadow_obj(k, o)
                        return o

                    occ32 = jax.lax.cond(possible, do, lambda o: o, occ32)
            else:
                for k in range(len(idxs)):
                    occ32 = shadow_obj(k, occ32)
        else:
            occ32 = jax.lax.fori_loop(0, len(idxs), body,
                                      occ.astype(jnp.int32))
        occ = occ32 != 0
    return occ
