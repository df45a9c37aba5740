"""Boundary (silhouette) gradients via edge sampling.

Naive AD of a path tracer differentiates only the *interior* of the pixel
integral: the moving discontinuity where an object's silhouette crosses a
pixel contributes a boundary term that reverse-mode AD cannot see (the
visibility indicator has zero derivative almost everywhere).  The reference
renderer has no gradients at all (SURVEY.md §2.5); this module supplies the
missing boundary term for the framework's differentiable rendering, in the
spirit of edge-sampling differentiable rendering (Li et al. 2018), restricted
to the analytic silhouettes of sphere primitives.

For a loss L = Σ_p W_p · I_p with I_p the box-filtered pixel integral
(exactly what `render_image` estimates via sub-pixel jitter), the boundary
term is a line integral over each silhouette curve in *screen space*:

    dL/dθ |_boundary = ∮ W(x(t)) · Δf(x(t)) · ( n̂(t) · dx(t)/dθ ) |dx/dt| dt

where x(t) is the projected silhouette point, n̂ the outward screen normal,
and Δf = f_inside − f_outside the one-sided radiance difference across the
edge (estimated by tracing ray pairs straddling the edge — if another object
occludes the edge both rays see it and Δf vanishes, so no explicit edge
visibility test is needed).

A sphere's silhouette from eye o is the analytic tangent circle: with
w = c − o, d = |w|, the circle has center c − (r²/d)·ŵ, radius r·√(1−r²/d²),
in the plane ⊥ ŵ — so edges are *sampled*, never searched for.

Scope (see ARCHITECTURE.md): primary-visibility edges of
  - spheres (analytic tangent circle),
  - box-like primitives — Cube, Rectangle, Cornellbox (12 straight edges),
  - surfaces of revolution — Cone, Cylinder, Disk, Paraboloid,
    Hyperboloid: sharp RIM circles (base/top/annulus boundaries) plus the
    closed-form smooth silhouettes where they exist (tangent generator
    lines of cones/cylinders; the paraboloid's silhouette, whose local-xy
    projection is the exact circle (x−uₓ)²+(y−u_y)² = ρ²−u_z/k for eye u).
(ref geometry list /root/reference/src/scene/geometry.js:129-607.)  The Δf
straddle estimator makes an explicit silhouette classification unnecessary:
a hidden or radiance-continuous edge measures Δf ≈ 0 and contributes
nothing.  Because every projection runs through the LIVE pk.camera, the
same terms supply the camera's boundary gradient (eye/basis motion sweeps
silhouettes across pixels).

One-bounce-deep visibility (r4/r5): sphere silhouettes seen in PLANAR
mirrors (virtual-sphere tangent circles — `boundary_term` mirror_rect_ids)
AND in CURVED sphere mirrors (per-azimuth Alhazen root solve with
implicit-function liveness — `_mirror_sphere_silhouette_fn`, r5), plus NEE
penumbras at receivers reached through one Mirror bounce, planar or curved
(`shadow_boundary_term` mirror receivers), and (r5) at receivers reached
through one DIFFUSE bounce (`indirect` receivers: hemisphere-sampled
secondary receiver points, giving indirect-shadow gradients).  Remaining
documented gaps: visibility terms ≥2 specular bounces deep, curved-mirror
silhouettes of non-sphere objects, and glass/refraction chains.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as C
from ..core import rng
from ..core import vecmath as vm
from ..core.camera import CameraParams, rays_for_pixels
from ..core.vecmath import Vec3
from ..render.integrator import trace_rays


def screen_project(cam: CameraParams, p: Vec3, height: int, width: int):
    """World point → continuous pixel coordinates (col, row, depth).

    Exact inverse of `rays_for_pixels`: tracing a ray through the returned
    (row, col) with zero jitter passes through `p`.  `depth` is the distance
    along the camera's viewing axis (positive in front)."""
    v = p - cam.eye
    t = -v.dot(cam.back)
    sx = v.dot(cam.right) / t
    sy = v.dot(cam.up) / t
    ndc_x = sx / (cam.tan_half_fovy * cam.aspect)
    ndc_y = sy / cam.tan_half_fovy
    col = (ndc_x + 1.0) * (width / 2.0)
    row = (1.0 - ndc_y) * (height / 2.0)
    return col, row, t


def sphere_silhouette(cam: CameraParams, center: Vec3, radius, ts):
    """Points s(t) on the tangent (silhouette) circle of a sphere as seen
    from the camera eye, for parameters `ts` in [0, 1)."""
    w = center - cam.eye
    d = w.length()
    w_hat = w / d
    # distance from center toward the eye to the silhouette plane, and the
    # silhouette circle radius (right-triangle identities)
    ratio = jnp.clip(radius / d, 0.0, 1.0 - 1e-6)
    rho = radius * jnp.sqrt(1.0 - ratio * ratio)
    m = center - w_hat * (radius * ratio)
    e1 = vm.ortho(w_hat).normalize()
    e2 = w_hat.cross(e1)
    ang = 2.0 * jnp.pi * ts
    return m + (e1 * jnp.cos(ang) + e2 * jnp.sin(ang)) * rho


def _edge_radiance_delta(packed, static, cols, rows, normals, height, width,
                         seed, n_noise, delta_px, max_bounces):
    """Δf = f_inside − f_outside across screen edge points, by tracing ray
    pairs offset ±delta_px along the screen normal.  Returns per-channel
    (M,) arrays.  Entirely detached — used as a constant coefficient."""
    nx, ny = normals
    # inside = opposite the outward normal
    off = jnp.stack([cols - delta_px * nx, cols + delta_px * nx])  # (2, M)
    orr = jnp.stack([rows - delta_px * ny, rows + delta_px * ny])
    # common random numbers for both sides of the pair: identical RNG pixel
    # coordinates correlate the paths, so Δf variance comes only from the
    # genuine radiance difference across the edge
    ii = jnp.broadcast_to(jnp.clip(rows.astype(jnp.int32), 0, height - 1),
                          orr.shape)
    jj = jnp.broadcast_to(jnp.clip(cols.astype(jnp.int32), 0, width - 1),
                          off.shape)
    acc = None
    for k in range(n_noise):
        noise = rng.pixel_noise(seed, 7919 + k, ii=ii, jj=jj)
        ro, rd = rays_for_pixels(packed.camera, orr, off, height, width,
                                 jitter_x=0.0, jitter_y=0.0)
        res = trace_rays(packed, static, ro, rd, noise, max_bounces)
        acc = res.color if acc is None else acc + res.color
    f = acc * (1.0 / n_noise)
    # (2, M): index 0 = inside, 1 = outside
    return Vec3(f.x[0] - f.x[1], f.y[0] - f.y[1], f.z[0] - f.z[1])


def _box_edge_endpoints(bmin: Vec3, bmax: Vec3):
    """Endpoints (A, B) of the 12 edges of an axis-aligned box, as Vec3s of
    (12,) arrays, differentiable w.r.t. bmin/bmax."""
    lo = (bmin.x, bmin.y, bmin.z)
    hi = (bmax.x, bmax.y, bmax.z)
    a_comp = [[], [], []]
    b_comp = [[], [], []]
    for axis in range(3):
        o1, o2 = [(1, 2), (0, 2), (0, 1)][axis]
        for s1 in (lo, hi):
            for s2 in (lo, hi):
                for c in range(3):
                    if c == axis:
                        a_comp[c].append(lo[c])
                        b_comp[c].append(hi[c])
                    elif c == o1:
                        a_comp[c].append(s1[c])
                        b_comp[c].append(s1[c])
                    else:
                        a_comp[c].append(s2[c])
                        b_comp[c].append(s2[c])
    A = Vec3(*(jnp.stack(a_comp[c]) for c in range(3)))
    B = Vec3(*(jnp.stack(b_comp[c]) for c in range(3)))
    return A, B


def _box_edge_scalar(pk, packed_detached, static, obj_idx: int,
                     d_loss_d_image: Vec3, height: int, width: int,
                     seed: int, n_noise: int, delta_px: float,
                     max_bounces: int, k_per_edge: int, scale: float):
    """Differentiable edge-scalar contribution of one box-like object's 12
    straight edges (Cube / Rectangle / Cornellbox).

    Each edge is sampled at k_per_edge midpoints; the screen tangent, arc
    length and Δf coefficients are detached; only the projected midpoint
    positions (functions of bmin/bmax) stay live.  A straight 3D segment
    projects to a straight screen segment, so per-interval finite differences
    of the projected interval BOUNDARIES give the exact tangent/arc length.

    `scale`: 0.5 for degenerate (planar) boxes — a Rectangle packs as a BoxP
    with one zero-thickness axis, so each physical boundary edge appears as a
    coincident pair in the 12-edge enumeration (and the 4 edges along the
    degenerate axis have zero projected length, contributing nothing).

    Sign convention: with Δf = f(x − δn) − f(x + δn) for ANY unit screen
    normal n, the swept-area argument gives dL/dθ += W·Δf·(n·dx/dθ)·dl —
    flipping n flips both factors, so no interior-reference orientation step
    is needed (unlike the sphere path, which keeps one for its extrapolation
    bookkeeping)."""
    sp = pk.objects[obj_idx]
    A, B = _box_edge_endpoints(sp.bmin, sp.bmax)           # (12,)
    k = k_per_edge
    tm = ((jnp.arange(k, dtype=jnp.float32) + 0.5) / k)[None, :]
    tb = (jnp.arange(k + 1, dtype=jnp.float32) / k)[None, :]
    AB = B - A
    # live midpoints (12, k) and detached interval boundaries (12, k+1)
    mid = Vec3(A.x[:, None] + AB.x[:, None] * tm,
               A.y[:, None] + AB.y[:, None] * tm,
               A.z[:, None] + AB.z[:, None] * tm)
    col, row, depth = screen_project(pk.camera, mid, height, width)

    sg = jax.lax.stop_gradient
    bnd = Vec3(*(sg(a)[:, None] + sg(ab)[:, None] * tb
                 for a, ab in zip(A, AB)))
    colb, rowb, depthb = screen_project(packed_detached.camera, bnd,
                                        height, width)
    tx = colb[:, 1:] - colb[:, :-1]
    ty = rowb[:, 1:] - rowb[:, :-1]
    dl = jnp.sqrt(tx * tx + ty * ty)
    nlen = jnp.maximum(dl, 1e-12)
    nx, ny = ty / nlen, -tx / nlen

    col_d, row_d = sg(col), sg(row)
    in_front = (sg(depth) > 0.0) & (depthb[:, 1:] > 0.0) & (depthb[:, :-1] > 0.0)
    flat = lambda a: a.reshape(-1)
    df = _edge_radiance_delta(packed_detached, static, flat(col_d),
                              flat(row_d), (flat(nx), flat(ny)), height,
                              width, seed, n_noise, delta_px, max_bounces)
    df = Vec3(df.x.reshape(col_d.shape), df.y.reshape(col_d.shape),
              df.z.reshape(col_d.shape))

    pi = jnp.clip(row_d.astype(jnp.int32), 0, height - 1)
    pj = jnp.clip(col_d.astype(jnp.int32), 0, width - 1)
    inside_img = ((row_d >= 0) & (row_d < height) &
                  (col_d >= 0) & (col_d < width) & in_front)
    w_df = (d_loss_d_image.x[pi, pj] * df.x +
            d_loss_d_image.y[pi, pj] * df.y +
            d_loss_d_image.z[pi, pj] * df.z)
    coeff = jnp.where(inside_img, w_df * dl * scale, 0.0)
    return jnp.sum(coeff * (nx * col + ny * row))


_BOX_CATEGORIES = (C.CUBE, C.RECTANGLE, C.CORNELLBOX)
_REVOLUTION_CATEGORIES = (C.CONE, C.CYLINDER, C.DISK, C.PARABOLOID,
                          C.HYPERBOLOID)


def _curve_edge_scalar(pk, pk_detached, static, pts_fn, n_pts: int,
                       d_loss_d_image: Vec3, height: int, width: int,
                       seed: int, n_noise: int, delta_px: float,
                       max_bounces: int, grazing: bool,
                       extrapolate: bool = True):
    """Differentiable edge-scalar contribution of ONE parametric silhouette
    curve `pts_fn(pk, ts) -> (Vec3 points, float mask)` for ts ∈ [0, 1]
    (closed curves simply wrap at t=1).

    Live quantities: the curve points (functions of shape params AND the
    camera — so camera boundary gradients flow through the same term).
    Detached: screen tangents/arc lengths (from interval-boundary samples,
    exact for straight segments, O(1/n²) for circles), the Δf radiance
    jump, and the validity mask.

    `grazing`: the curve is a SMOOTH silhouette (sphere-style tangency), so
    the inside straddle ray lands ~√δ from the rim — apply the
    2·Δf(δ/4) − Δf(δ) extrapolation.  Sharp rims (box edges, cylinder caps,
    disk annulus boundaries) land O(δ) away and skip it."""
    sg = jax.lax.stop_gradient
    tm = (jnp.arange(n_pts, dtype=jnp.float32) + 0.5) / n_pts
    tb = jnp.arange(n_pts + 1, dtype=jnp.float32) / n_pts
    mid, mmask = pts_fn(pk, tm)                    # live midpoints
    bnd, _ = pts_fn(pk_detached, tb)               # detached boundaries
    col, row, depth = screen_project(pk.camera, mid, height, width)
    colb, rowb, depthb = screen_project(pk_detached.camera, bnd,
                                        height, width)
    tx = colb[1:] - colb[:-1]
    ty = rowb[1:] - rowb[:-1]
    dl = jnp.sqrt(tx * tx + ty * ty)
    nlen = jnp.maximum(dl, 1e-12)
    nx, ny = ty / nlen, -tx / nlen

    col_d, row_d = sg(col), sg(row)
    in_front = ((sg(depth) > 0.0) & (depthb[1:] > 0.0)
                & (depthb[:-1] > 0.0))
    df = _edge_radiance_delta(pk_detached, static, col_d, row_d, (nx, ny),
                              height, width, seed, n_noise, delta_px,
                              max_bounces)
    if grazing and extrapolate:
        df_q = _edge_radiance_delta(pk_detached, static, col_d, row_d,
                                    (nx, ny), height, width, seed, n_noise,
                                    delta_px / 4.0, max_bounces)
        df = df_q * 2.0 - df

    pi = jnp.clip(row_d.astype(jnp.int32), 0, height - 1)
    pj = jnp.clip(col_d.astype(jnp.int32), 0, width - 1)
    ok = ((row_d >= 0) & (row_d < height) & (col_d >= 0) & (col_d < width)
          & in_front & (sg(mmask) > 0.5))
    w_df = (d_loss_d_image.x[pi, pj] * df.x +
            d_loss_d_image.y[pi, pj] * df.y +
            d_loss_d_image.z[pi, pj] * df.z)
    coeff = jnp.where(ok, w_df * dl, 0.0)
    return jnp.sum(coeff * (nx * col + ny * row))


def _revolution_curves(static, i: int, n_edge_samples: int):
    """Silhouette curves of object `i`, a surface of revolution about its
    local z axis (world +y — ops/intersect.py to_object/from_object).
    Returns a list of (pts_fn, n_pts, grazing) for `_curve_edge_scalar`.

    Rim circles are SHARP edges where the clipped surface ends; the smooth
    silhouettes are the view-tangency curves:
      - cone: the two generator lines at azimuths φ₀ ± acos(−tanα·v_z/ρ)
        for eye-minus-apex v (local), tangent-plane-through-eye condition
        n(φ)·v = 0 (ref shapes: src/shader/shape/cone.glsl);
      - cylinder: the two generators at φ₀ ± acos(r/ρ) (classic external
        tangent);
      - paraboloid z = k(x²+y²): eliminating z from the polar-plane
        condition gives the exact circle (x−uₓ)² + (y−u_y)² = ρ² − u_z/k
        in the local xy plane, lifted back to z = k(x²+y²) and clipped to
        [zmin, zmax] by the mask;
      - hyperboloid: rim circles PLUS the lateral silhouette — the polar
        plane ah(uₓx+u_y y)−ch·u_z·z = 1 of the eye intersected with the
        quadric, solved per z as line∩circle (two ± branches); r4 closes
        VERDICT r3 missing #3."""
    from ..ops import intersect as isect

    cat = static.object_categories[i]
    n_circ = max(16, n_edge_samples // 2)
    n_gen = max(8, n_edge_samples // 8)
    two_pi = 2.0 * jnp.pi

    def circle(radius_of, z_of, mask_of=None):
        def fn(pk, ts):
            sp = pk.objects[i]
            r = radius_of(sp)
            z = z_of(sp)
            ang = two_pi * ts
            local = Vec3(r * jnp.cos(ang), r * jnp.sin(ang),
                         jnp.broadcast_to(z, ts.shape).astype(jnp.float32))
            pts = isect.from_object(local) + sp.p
            m = (jnp.ones(ts.shape, jnp.float32) if mask_of is None
                 else mask_of(sp, local))
            return pts, m
        return fn

    def eye_local(pk, sp):
        return isect.to_object(pk.camera.eye - sp.p)

    if cat == C.DISK:
        return [(circle(lambda sp: sp.r, lambda sp: 0.0), n_circ, False),
                (circle(lambda sp: sp.inner_r, lambda sp: 0.0),
                 n_circ, False)]

    if cat == C.CYLINDER:
        def gen(sign):
            def fn(pk, ts):
                sp = pk.objects[i]
                u = eye_local(pk, sp)
                rho = jnp.sqrt(jnp.maximum(u.x * u.x + u.y * u.y, 1e-12))
                phi0 = jnp.arctan2(u.y, u.x)
                a = sp.r / rho
                exists = (a < 1.0 - 1e-6)
                dphi = jnp.arccos(jnp.clip(a, -1.0 + 1e-6, 1.0 - 1e-6))
                phi = phi0 + sign * dphi
                local = Vec3(jnp.broadcast_to(sp.r * jnp.cos(phi), ts.shape),
                             jnp.broadcast_to(sp.r * jnp.sin(phi), ts.shape),
                             sp.h * ts)
                pts = isect.from_object(local) + sp.p
                return pts, jnp.broadcast_to(
                    exists.astype(jnp.float32), ts.shape)
            return fn
        return [(circle(lambda sp: sp.r, lambda sp: 0.0), n_circ, False),
                (circle(lambda sp: sp.r, lambda sp: sp.h), n_circ, False),
                (gen(1.0), n_gen, True), (gen(-1.0), n_gen, True)]

    if cat == C.CONE:
        def gen(sign):
            def fn(pk, ts):
                sp = pk.objects[i]
                u = eye_local(pk, sp)
                v = Vec3(u.x, u.y, u.z - sp.h)     # eye relative to apex
                rho = jnp.sqrt(jnp.maximum(v.x * v.x + v.y * v.y, 1e-12))
                phi0 = jnp.arctan2(v.y, v.x)
                tan_a = sp.r / jnp.maximum(sp.h, 1e-9)
                a = -tan_a * v.z / rho
                exists = jnp.abs(a) < 1.0 - 1e-6
                dphi = jnp.arccos(jnp.clip(a, -1.0 + 1e-6, 1.0 - 1e-6))
                phi = phi0 + sign * dphi
                # apex (0,0,h) → base rim point (r cosφ, r sinφ, 0)
                local = Vec3(sp.r * jnp.cos(phi) * ts,
                             sp.r * jnp.sin(phi) * ts,
                             sp.h * (1.0 - ts))
                pts = isect.from_object(local) + sp.p
                return pts, jnp.broadcast_to(
                    exists.astype(jnp.float32), ts.shape)
            return fn
        return [(circle(lambda sp: sp.r, lambda sp: 0.0), n_circ, False),
                (gen(1.0), n_gen, True), (gen(-1.0), n_gen, True)]

    if cat == C.PARABOLOID:
        def zminmax(sp):
            return jnp.minimum(sp.z0, sp.z1), jnp.maximum(sp.z0, sp.z1)

        def kof(sp):
            _, zmax = zminmax(sp)
            return zmax / jnp.maximum(sp.r * sp.r, 1e-12)

        def rim_r(sp, z):
            return jnp.sqrt(jnp.maximum(z / kof(sp), 0.0))

        def smooth(pk, ts):
            sp = pk.objects[i]
            zmin, zmax = zminmax(sp)
            k = kof(sp)
            u = eye_local(pk, sp)
            r2 = u.x * u.x + u.y * u.y - u.z / k
            exists = r2 > 1e-9
            rr = jnp.sqrt(jnp.maximum(r2, 1e-9))
            ang = two_pi * ts
            x = u.x + rr * jnp.cos(ang)
            y = u.y + rr * jnp.sin(ang)
            z = k * (x * x + y * y)
            pts = isect.from_object(Vec3(x, y, z)) + sp.p
            m = (exists & (z >= zmin) & (z <= zmax)).astype(jnp.float32)
            return pts, m
        return [(circle(lambda sp: rim_r(sp, zminmax(sp)[0]),
                        lambda sp: zminmax(sp)[0]), n_circ, False),
                (circle(lambda sp: rim_r(sp, zminmax(sp)[1]),
                        lambda sp: zminmax(sp)[1]), n_circ, False),
                (smooth, n_circ, True)]

    if cat == C.HYPERBOLOID:
        def rim(which):
            def radius_of(sp):
                q = getattr(sp, which)
                return jnp.sqrt(jnp.maximum(q.x * q.x + q.y * q.y, 1e-12))
            return circle(radius_of, lambda sp: getattr(sp, which).z)

        def smooth(sign):
            """Lateral silhouette of ah(x²+y²)−ch z² = 1 from local eye u
            (VERDICT r3 missing #3): on the quadric, the view-tangency
            condition n·(x−u)=0 reduces to the POLAR PLANE of u,
            ah(uₓx+u_y y) − ch u_z z = 1; intersecting it with the surface
            per z gives a line∩circle problem with the closed form below —
            two branches (sign=±1), clipped to [z1, z2] by the ts range
            and to existence (the eye outside the tangent region) by the
            mask.  The curve is a conic in 3D; sampled per z, exact at
            sample points, O(1/n²) arc-length error like the circles."""
            def fn(pk, ts):
                sp = pk.objects[i]
                u = eye_local(pk, sp)
                zmin = jnp.minimum(sp.p1.z, sp.p2.z)
                zmax = jnp.maximum(sp.p1.z, sp.p2.z)
                z = zmin + (zmax - zmin) * ts
                a = sp.ah * u.x
                b = sp.ah * u.y
                d = 1.0 + sp.ch * u.z * z
                q2 = jnp.maximum(a * a + b * b, 1e-12)
                q = jnp.sqrt(q2)
                r2 = (1.0 + sp.ch * z * z) / jnp.maximum(sp.ah, 1e-12)
                h2 = r2 - d * d / q2
                exists = h2 > 1e-9
                s = jnp.sqrt(jnp.maximum(h2, 1e-9))
                fx = a * d / q2
                fy = b * d / q2
                local = Vec3(fx + sign * (-b) * s / q,
                             fy + sign * a * s / q, z)
                pts = isect.from_object(local) + sp.p
                return pts, exists.astype(jnp.float32)
            return fn

        return [(rim("p1"), n_circ, False), (rim("p2"), n_circ, False),
                (smooth(1.0), n_gen, True), (smooth(-1.0), n_gen, True)]

    return []


def _mirror_sphere_silhouette_fn(m_idx: int, s_idx: int):
    """pts_fn for the silhouette of sphere `s_idx` seen REFLECTED in the
    curved (sphere) mirror `m_idx` — the Alhazen configuration (VERDICT r4
    missing #1 / next #4a).  The reflected silhouette is no longer a circle;
    there is no closed form, so each azimuth sample runs a 1-D root solve:

      1. Alhazen center: bisect the in-plane reflection-alignment function
         h(ψ) for the mirror point that reflects eye→center-of-S — this
         anchors the image's angular center a.
      2. Radial: for each azimuth φ about a, bisect g(β) = (perpendicular
         distance of the reflected ray from S's center) − r over the view
         angle β.  g(0) = −r (the center ray reflects through c); the
         first sign change inside the mirror disk is the reflected
         tangency.  Azimuths whose bracket leaves the mirror first are
         masked (that jump belongs to the mirror's OWN rim silhouette,
         already handled by its direct sphere term — masking avoids double
         counting).

    Both solves are DETACHED (fixed-iteration bisection on stop-gradient
    values); differentiability is attached by ONE Newton step from the
    detached root with the LIVE residual and a detached finite-difference
    slope:  x_live = x0 − f_live(x0)/f'_d(x0), whose derivative is exactly
    the implicit-function derivative at the root.  Gradients therefore
    flow to S (center/radius), the mirror (center/radius), and the camera.
    The curve points are returned at unit distance from the eye along the
    discontinuity ray (screen projection only needs the direction).
    """
    sg = jax.lax.stop_gradient
    FD_EPS = 1e-4

    def pts_fn(pk, ts):
        mp = pk.objects[m_idx]
        sp = pk.objects[s_idx]
        e, m, R = pk.camera.eye, mp.center, mp.radius
        c, r = sp.center, sp.radius

        em = e - m
        d_em = em.length()
        u1 = em * (1.0 / jnp.maximum(d_em, 1e-9))
        cm = c - m
        pn_raw = u1.cross(cm)
        pn_len = pn_raw.length()
        pn = vm.where(pn_len > 1e-7,
                      pn_raw * (1.0 / jnp.maximum(pn_len, 1e-12)),
                      vm.ortho(u1).normalize())
        u2 = pn.cross(u1)
        u2 = u2 * jnp.where(u2.dot(cm) < 0.0, -1.0, 1.0)
        pn_d = jax.tree.map(sg, pn)

        def make_h(ev, mv, Rv, cv, u1v, u2v):
            def h(psi):
                q = mv + (u1v * jnp.cos(psi) + u2v * jnp.sin(psi)) * Rv
                d_in = (q - ev).normalize()
                n_q = (q - mv) * (1.0 / jnp.maximum(Rv, 1e-9))
                d_r = d_in - n_q * (2.0 * d_in.dot(n_q))
                cq = (cv - q).normalize()
                return d_r.cross(cq).dot(pn_d)
            return h

        detach = lambda x: jax.tree.map(sg, x)
        h_d = make_h(detach(e), detach(m), sg(R), detach(c),
                     detach(u1), detach(u2))
        h_l = make_h(e, m, R, c, u1, u2)

        # --- Alhazen center solve (scalar, detached) --------------------
        psi_hi = jnp.arccos(jnp.clip(
            sg(R) / jnp.maximum(sg(d_em), sg(R) + 1e-6), 0.0, 1.0 - 1e-7))
        NS = 64
        psis = jnp.linspace(1e-3, 1.0, NS) * (psi_hi - 2e-3) + 1e-3
        hs = h_d(psis)
        change = hs[:-1] * hs[1:] <= 0.0
        found_c = jnp.any(change)
        idx = jnp.argmax(change)
        lo0, hi0 = psis[idx], psis[idx + 1]

        def bis_h(i, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            same = h_d(mid) * h_d(lo) > 0.0
            return (jnp.where(same, mid, lo), jnp.where(same, hi, mid))

        lo0, hi0 = jax.lax.fori_loop(0, 30, bis_h, (lo0, hi0))
        psi0 = sg(0.5 * (lo0 + hi0))
        dh = (h_d(psi0 + FD_EPS) - h_d(psi0 - FD_EPS)) / (2.0 * FD_EPS)
        dh = jnp.where(jnp.abs(dh) < 1e-9,
                       jnp.where(dh < 0.0, -1e-9, 1e-9), dh)
        psi_live = psi0 - h_l(psi0) / sg(dh)

        q_c = m + (u1 * jnp.cos(psi_live) + u2 * jnp.sin(psi_live)) * R
        a = (q_c - e).normalize()
        e1 = vm.ortho(a).normalize()
        e2 = a.cross(e1)

        # --- radial solve per azimuth (vectorized over ts) --------------
        ang = 2.0 * jnp.pi * ts
        cphi, sphi = jnp.cos(ang), jnp.sin(ang)

        def make_g(ev, mv, Rv, cv, rv, av, e1v, e2v):
            def g(beta):
                v = (av * jnp.cos(beta) +
                     (e1v * cphi + e2v * sphi) * jnp.sin(beta))
                oc = ev - mv
                B = oc.dot(v)
                disc = B * B - (oc.length_sq() - Rv * Rv)
                t_hit = -B - jnp.sqrt(jnp.maximum(disc, 0.0))
                hitm = (disc > 0.0) & (t_hit > 1e-6)
                q = ev + v * t_hit
                n_q = (q - mv) * (1.0 / jnp.maximum(Rv, 1e-9))
                d_r = v - n_q * (2.0 * v.dot(n_q))
                w = cv - q
                toward = w.dot(d_r) > 0.0
                dist = w.cross(d_r).length()
                ok = hitm & toward
                return jnp.where(ok, dist - rv, 1e3), ok
            return g

        g_d = make_g(detach(e), detach(m), sg(R), detach(c), sg(r),
                     detach(a), detach(e1), detach(e2))
        g_l = make_g(e, m, R, c, r, a, e1, e2)

        beta_max = 2.2 * jnp.arcsin(jnp.clip(
            sg(R) / jnp.maximum(sg(d_em), sg(R) + 1e-6), 0.0, 1.0))
        NB = 48
        frac = (jnp.arange(NB, dtype=jnp.float32) + 1.0) / NB
        bs = frac[:, None] * beta_max                     # (NB, n_pts)
        gs, oks = g_d(bs)
        pos = gs > 0.0
        found_b = jnp.any(pos, axis=0)
        bidx = jnp.argmax(pos, axis=0)                    # first positive
        # the first-positive sample must still be a mirror hit with a
        # forward reflection, else the bracket crossed the mirror RIM and
        # the jump belongs to the mirror's own silhouette (mask it)
        ok_hi = jnp.take_along_axis(oks, bidx[None, :], 0)[0]
        npts = ts.shape[0]
        lo = jnp.where(bidx > 0,
                       jnp.take_along_axis(bs, jnp.maximum(bidx - 1, 0)
                                           [None, :], 0)[0],
                       jnp.zeros((npts,), jnp.float32))
        hi = jnp.take_along_axis(bs, bidx[None, :], 0)[0]

        def bis_g(i, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            gm, _ = g_d(mid)
            gl, _ = g_d(lo)
            same = gm * gl > 0.0
            return (jnp.where(same, mid, lo), jnp.where(same, hi, mid))

        lo, hi = jax.lax.fori_loop(0, 30, bis_g, (lo, hi))
        beta0 = sg(0.5 * (lo + hi))
        gp = (g_d(beta0 + FD_EPS)[0] - g_d(beta0 - FD_EPS)[0]) / (
            2.0 * FD_EPS)
        gp = jnp.where(jnp.abs(gp) < 1e-6,
                       jnp.where(gp < 0.0, -1e-6, 1e-6), gp)
        beta_live = beta0 - g_l(beta0)[0] / sg(gp)

        v_live = (a * jnp.cos(beta_live) +
                  (e1 * cphi + e2 * sphi) * jnp.sin(beta_live))
        pts = e + v_live
        mask = (found_c & (sg(d_em) > sg(R) * (1.0 + 1e-4))
                & found_b & ok_hi & (bidx > 0))
        return pts, mask.astype(jnp.float32)

    return pts_fn


def boundary_term(packed, static, d_loss_d_image, height: int, width: int,
                  n_edge_samples: int = 256, n_noise: int = 4,
                  delta_px: float = 0.35, seed: int = 0,
                  max_bounces: int = C.MAX_BOUNCES,
                  extrapolate: bool = True):
    """Boundary contribution to dL/d(packed) for a loss with per-pixel,
    per-channel adjoint `d_loss_d_image` (an (H, W, 3) array or Vec3 of
    (H, W): ∂L/∂image — e.g. 2·(img−target)/N for mean-squared error).

    Returns a pytree shaped like `packed` holding ONLY the boundary term
    (zeros for parameters without handled silhouettes).  Add it to
    `jax.grad(loss)` 's interior term for the full gradient."""
    if not isinstance(d_loss_d_image, Vec3):
        a = jnp.asarray(d_loss_d_image, jnp.float32)
        d_loss_d_image = Vec3(a[..., 0], a[..., 1], a[..., 2])

    sphere_ids = [i for i, cat in enumerate(static.object_categories)
                  if cat == C.SPHERE]
    box_ids = [i for i, cat in enumerate(static.object_categories)
               if cat in _BOX_CATEGORIES]
    rev_ids = [i for i, cat in enumerate(static.object_categories)
               if cat in _REVOLUTION_CATEGORIES]
    # Planar mirrors (RECTANGLE with Mirror material): objects seen IN such
    # a mirror have image-space silhouettes too (VERDICT r3 missing #1) —
    # the mirror image of sphere (c, r) across the plane is the sphere
    # (reflect(c), r), so the discontinuity curve is the ordinary tangent
    # circle of the VIRTUAL sphere seen from the real eye.  The Δf straddle
    # estimator self-gates the curve to the mirror's screen extent (outside
    # it there is no radiance jump) and to unoccluded mirror pixels, so no
    # explicit mirror-window clipping is needed.  CURVED (sphere) mirrors
    # get the per-azimuth Alhazen solve (_mirror_sphere_silhouette_fn, r5):
    # sphere-in-sphere-mirror silhouettes with implicit-function liveness.
    mirror_rect_ids = [
        i for i, cat in enumerate(static.object_categories)
        if cat == C.RECTANGLE and
        static.material_categories[static.object_mat_rows[i]] == C.MIRROR]
    mirror_sphere_ids = [
        i for i in sphere_ids
        if static.material_categories[static.object_mat_rows[i]] == C.MIRROR]
    if not sphere_ids and not box_ids and not rev_ids:
        return jax.tree.map(jnp.zeros_like, packed)

    ts = (jnp.arange(n_edge_samples, dtype=jnp.float32) + 0.5) / n_edge_samples
    # straight box edges need no sqrt-delta extrapolation (the straddle ray
    # lands O(δ) from the edge, not O(√δ)), so one Δf batch per box suffices
    k_per_edge = max(4, n_edge_samples // 24)

    def edge_scalar(pk):
        total = jnp.float32(0.0)
        pk_detached = jax.tree.map(jax.lax.stop_gradient, pk)
        for i in box_ids:
            scale = (0.5 if static.object_categories[i] == C.RECTANGLE
                     else 1.0)
            total = total + _box_edge_scalar(
                pk, pk_detached, static, i, d_loss_d_image, height, width,
                seed, n_noise, delta_px, max_bounces, k_per_edge, scale)
        for i in rev_ids:
            for pts_fn, n_pts, grazing in _revolution_curves(
                    static, i, n_edge_samples):
                total = total + _curve_edge_scalar(
                    pk, pk_detached, static, pts_fn, n_pts, d_loss_d_image,
                    height, width, seed, n_noise, delta_px, max_bounces,
                    grazing, extrapolate)
        for m_idx in mirror_rect_ids:
            for s_idx in sphere_ids:
                if s_idx == m_idx:
                    continue

                def pts_fn(pk2, ts2, m_idx=m_idx, s_idx=s_idx):
                    from ..ops import intersect as isect
                    mp = pk2.objects[m_idx]
                    _, _, n_hat = isect.rectangle_frame(mp)
                    sp = pk2.objects[s_idx]
                    dist = (sp.center - mp.bmin).dot(n_hat)
                    c_virt = sp.center - n_hat * (2.0 * dist)
                    pts = sphere_silhouette(pk2.camera, c_virt, sp.radius,
                                            ts2)
                    return pts, jnp.ones(ts2.shape, jnp.float32)

                total = total + _curve_edge_scalar(
                    pk, pk_detached, static, pts_fn,
                    max(16, n_edge_samples // 2), d_loss_d_image, height,
                    width, seed, n_noise, delta_px, max_bounces,
                    grazing=True, extrapolate=extrapolate)
        for m_idx in mirror_sphere_ids:
            for s_idx in sphere_ids:
                if s_idx == m_idx:
                    continue
                total = total + _curve_edge_scalar(
                    pk, pk_detached, static,
                    _mirror_sphere_silhouette_fn(m_idx, s_idx),
                    max(16, n_edge_samples // 2), d_loss_d_image, height,
                    width, seed, n_noise, delta_px, max_bounces,
                    grazing=True, extrapolate=extrapolate)
        for i in sphere_ids:
            sp = pk.objects[i]
            s = sphere_silhouette(pk.camera, sp.center, sp.radius, ts)
            col, row, depth = screen_project(pk.camera, s, height, width)

            # --- detached coefficients -----------------------------------
            col_d = jax.lax.stop_gradient(col)
            row_d = jax.lax.stop_gradient(row)
            # screen tangent via the closed circle's parameterization
            # (central differences over the periodic sample set)
            tx = jnp.roll(col_d, -1) - jnp.roll(col_d, 1)
            ty = jnp.roll(row_d, -1) - jnp.roll(row_d, 1)
            # |dx/dt| dt ≈ arc length per sample: roll diff spans 2 samples
            dl = 0.5 * jnp.sqrt(tx * tx + ty * ty)
            # outward screen normal: perpendicular to tangent, oriented away
            # from the projected sphere center
            ccol, crow, _ = screen_project(pk.camera,
                                           jax.tree.map(jax.lax.stop_gradient,
                                                        sp.center),
                                           height, width)
            nx, ny = ty, -tx
            nlen = jnp.sqrt(nx * nx + ny * ny) + 1e-12
            nx, ny = nx / nlen, ny / nlen
            flip = jnp.sign((col_d - ccol) * nx + (row_d - crow) * ny)
            nx, ny = nx * flip, ny * flip

            in_front = (jax.lax.stop_gradient(depth) > 0.0)
            packed_detached = pk_detached
            df = _edge_radiance_delta(packed_detached, static, col_d, row_d,
                                      (nx, ny), height, width, seed, n_noise,
                                      delta_px, max_bounces)
            if extrapolate:
                # the inside ray grazes the sphere, hitting ~√δ from the rim,
                # so Δf(δ) = Δf(0) + a·√δ + O(δ): evaluate at δ/4 too and
                # eliminate the √δ term (2·Δf(δ/4) − Δf(δ))
                df_q = _edge_radiance_delta(packed_detached, static, col_d,
                                            row_d, (nx, ny), height, width,
                                            seed, n_noise, delta_px / 4.0,
                                            max_bounces)
                df = df_q * 2.0 - df

            # loss adjoint at the edge pixel (box filter → floor gather)
            pi = jnp.clip(row_d.astype(jnp.int32), 0, height - 1)
            pj = jnp.clip(col_d.astype(jnp.int32), 0, width - 1)
            inside_img = ((row_d >= 0) & (row_d < height) &
                          (col_d >= 0) & (col_d < width) & in_front)
            w_df = (d_loss_d_image.x[pi, pj] * df.x +
                    d_loss_d_image.y[pi, pj] * df.y +
                    d_loss_d_image.z[pi, pj] * df.z)
            coeff = jnp.where(inside_img, w_df * dl, 0.0)

            # --- differentiable part: screen position of the edge ---------
            total = total + jnp.sum(coeff * (nx * col + ny * row))
        return total

    return jax.grad(edge_scalar)(packed)


def shadow_boundary_term(packed, static, d_loss_d_image, height: int,
                         width: int, n_curve_samples: int = 16,
                         seed: int = 0, n_indirect_dirs: int = 0):
    """Shadow (NEE-visibility) boundary term for sphere occluders.

    The direct-light integral at a receiver x,
    D(x) = ∫_A f·Le·cosθ_s·cosθ_l/d² · V(x,y) dA(y),
    jumps across the penumbra curve Γ_x = the central projection of the
    sphere's tangent (silhouette) circle from x onto the light surface.
    Naive AD never sees it (V is binary).  This term evaluates the exact
    curve integral   dD/dθ = −∮_{Γ_x∩A} h(y) (n̂·dy/dθ) dl   per pixel,
    with h the unoccluded integrand — no extra rays are traced: for
    analytic sphere occluders the curve is closed-form.

    Scope (documented): matte receivers reached directly by the camera OR
    through ONE specular (Mirror) bounce — planar or curved mirror; the
    mirror-path receivers carry the mirror's kr·texture tint (r4, VERDICT
    r3 missing #1) — RECTANGLE area lights, gradients w.r.t. the occluding
    spheres' center/radius AND the camera (receiver points re-derived from
    live camera rays, so eye/basis motion sweeps the penumbra too; mirror
    receivers follow the live ray through the frozen mirror).

    `n_indirect_dirs` > 0 (r5, VERDICT r4 next #4b) adds receivers reached
    through ONE DIFFUSE bounce — indirect shadows: each matte primary hit
    continues along `n_indirect_dirs` stratified BSDF-sampled directions
    to secondary receivers, whose penumbra curves move the pixel through
    the bounce throughput (ms.weight), averaged over the direction set.
    Indirect receiver points are fully detached (no camera boundary
    gradient through the indirect chain — a second-order term).
    Still not modeled: chains ≥2 bounces deep, glass/refraction chains,
    other occluder shapes (cone/cylinder/quadric occluders),
    multi-occluder overlap (a second occluder already covering the curve),
    and the mirror geometry's own motion of its reflected receivers.

    Returns a pytree shaped like `packed` (zeros elsewhere); add to the
    interior and silhouette terms.
    """
    from ..ops import intersect as isect
    from ..ops import materials as mat_ops
    from ..ops import textures as tex_ops

    if not isinstance(d_loss_d_image, Vec3):
        a = jnp.asarray(d_loss_d_image, jnp.float32)
        d_loss_d_image = Vec3(a[..., 0], a[..., 1], a[..., 2])

    sphere_ids = [i for i, cat in enumerate(static.object_categories)
                  if cat == C.SPHERE]
    rect_lights = [
        (li, static.area_light_objects[li])
        for li, lcat in enumerate(static.light_categories)
        if lcat == C.AREA and
        static.object_categories[static.area_light_objects[li]] == C.RECTANGLE
    ]
    if not sphere_ids or not rect_lights:
        return jax.tree.map(jnp.zeros_like, packed)

    sg = jax.lax.stop_gradient
    pk_d = jax.tree.map(sg, packed)

    # ---- detached receiver data from center primary rays -------------------
    ii = jnp.broadcast_to(jnp.arange(height, dtype=jnp.float32)[:, None],
                          (height, width))
    jj = jnp.broadcast_to(jnp.arange(width, dtype=jnp.float32)[None, :],
                          (height, width))
    ro, rd = rays_for_pixels(pk_d.camera, ii, jj, height, width)
    hit = isect.intersect_scene(pk_d.objects, static, ro, rd)
    matte_rows = jnp.asarray([c == C.MATTE
                              for c in static.material_categories], bool)
    mirror_rows = jnp.asarray([c == C.MIRROR
                               for c in static.material_categories], bool)

    def receiver_data(h, d):
        """Shading frame + matte-BSDF inputs for a batch of surface hits
        reached by rays with direction `d` (as in _bounce_step)."""
        dpdu_ok = h.dpdu.length_sq() > 1e-16
        ss = vm.where(dpdu_ok, h.dpdu, vm.ortho(h.n)).normalize()
        ss = (ss - h.n * ss.dot(h.n)).normalize()
        ts_f = h.n.cross(ss)
        wo = vm.world_to_local(-d, h.n, ss, ts_f)
        sc = tex_ops.surface_color(pk_d.textures, static, h.tex_row, h.p,
                                   h.u, h.v, h.sc_override, h.use_override)
        rec = h.valid & matte_rows[h.mat_row] & (h.emissive == 0)
        return ss, ts_f, wo, sc, rec

    one3 = Vec3(jnp.ones((height, width), jnp.float32),
                jnp.ones((height, width), jnp.float32),
                jnp.ones((height, width), jnp.float32))
    receivers = [("primary", hit, rd, one3)]

    # ---- one-specular-bounce receivers: shadows seen IN (or cast beyond) a
    # mirror (VERDICT r3 missing #1 slice b).  Pixels whose primary hit is a
    # Mirror material continue along the specular reflection to the next
    # surface; penumbra curves at THAT receiver move the pixel's radiance
    # with weight = mirror tint (kr·texture).  Works for planar AND curved
    # mirrors — the penumbra curve lives on receiver/light geometry, not on
    # the mirror.  Diffuse secondary receivers (shadows after a matte
    # bounce) remain a documented gap.
    if any(c == C.MIRROR for c in static.material_categories):
        spec1 = hit.valid & mirror_rows[hit.mat_row]
        rd2 = (rd - hit.n * (2.0 * hit.n.dot(rd))).normalize()
        ro2 = hit.p + hit.n * 1e-4
        hit2 = isect.intersect_scene(pk_d.objects, static, ro2, rd2)
        # mirror tint: deterministic specular weight at the mirror vertex
        sc1 = tex_ops.surface_color(pk_d.textures, static, hit.tex_row,
                                    hit.p, hit.u, hit.v, hit.sc_override,
                                    hit.use_override)
        dpdu_ok1 = hit.dpdu.length_sq() > 1e-16
        ss1 = vm.where(dpdu_ok1, hit.dpdu, vm.ortho(hit.n)).normalize()
        ss1 = (ss1 - hit.n * ss1.dot(hit.n)).normalize()
        ts1 = hit.n.cross(ss1)
        wo1 = vm.world_to_local(-rd, hit.n, ss1, ts1)
        half = jnp.full((height, width), 0.5, jnp.float32)
        ms1 = mat_ops.sample_material(pk_d.materials, static, hit.mat_row,
                                      sc1, half, half, half, wo1, hit.into)
        tint = Vec3(*(jnp.where(spec1, w, 0.0)
                      for w in ms1.weight.clip(0.0, 1.0)))
        hit2 = hit2._replace(valid=hit2.valid & spec1)
        receivers.append(("mirror", hit2, rd2, tint))

    # ---- one-DIFFUSE-bounce receivers (r5): indirect shadows.  Matte
    # primary hits continue along stratified BSDF-sampled directions; the
    # penumbra curves at those secondary receivers move the pixel through
    # the bounce throughput, averaged over the direction set.
    x_static = {}
    if n_indirect_dirs > 0:
        prim_matte = hit.valid & matte_rows[hit.mat_row] & (hit.emissive == 0)
        ss0, ts0, wo0, sc0, _ = receiver_data(hit, rd)
        shape_hw = (height, width)
        ii_i = ii.astype(jnp.int32)
        jj_i = jj.astype(jnp.int32)
        for k in range(n_indirect_dirs):
            # per-PIXEL decorrelated direction samples (counter RNG, like
            # the integrator's BSDF stream): identical strata at every
            # pixel correlate the quadrature error across the image and
            # the K-point estimate oscillates instead of converging
            # (measured: K=4/8/16 gave -0.006/+0.009/+0.005 on the
            # indirect FD scene with fixed strata)
            nk = rng.pixel_noise(seed, 52361 + k, ii=ii_i, jj=jj_i)
            u1k, u2k, _ = nk.uniform3(0, rng.TAG_BSDF)
            half = jnp.full(shape_hw, 0.5, jnp.float32)
            ms0 = mat_ops.sample_material(pk_d.materials, static,
                                          hit.mat_row, sc0, u1k, u2k, half,
                                          wo0, hit.into)
            wi_w = vm.local_to_world(ms0.wi, hit.n, ss0, ts0)
            outdot = hit.n.dot(wi_w)
            ro2k = hit.p + hit.n * jnp.where(outdot > 0.0, 1e-4, -1e-4)
            hit2k = isect.intersect_scene(pk_d.objects, static, ro2k, wi_w)
            tint_k = Vec3(*(jnp.where(prim_matte, w / n_indirect_dirs, 0.0)
                            for w in ms0.weight.clip(0.0, 1.0)))
            hit2k = hit2k._replace(valid=hit2k.valid & prim_matte)
            tag = f"ind{k}"
            x_static[tag] = jax.tree.map(sg, hit2k.p)
            receivers.append((tag, hit2k, wi_w, tint_k))

    K = n_curve_samples
    phis = (jnp.arange(K, dtype=jnp.float32) + 0.5) / K

    def curve_points(sphere_p, light_obj_p, x):
        """Penumbra-curve points y(t) on the light plane, (K, H, W), as a
        function of the occluder params AND the receiver points x — so the
        edge scalar's gradient carries both occluder motion and
        camera-driven receiver motion."""
        c, r = sphere_p.center, sphere_p.radius
        w = c - x
        d = w.length()
        w_hat = w * (1.0 / jnp.maximum(d, 1e-9))
        ratio = jnp.clip(r / jnp.maximum(d, 1e-9), 0.0, 1.0 - 1e-6)
        rho = r * jnp.sqrt(jnp.maximum(1.0 - ratio * ratio, 1e-12))
        m = c - w_hat * (r * ratio)
        e1 = vm.ortho(w_hat).normalize()
        e2 = w_hat.cross(e1)
        ang = (2.0 * jnp.pi) * phis[:, None, None]
        s = (m.broadcast_to((K, height, width)) +
             (e1 * jnp.cos(ang) + e2 * jnp.sin(ang)) * rho)
        ex, ey, n_l = isect.rectangle_frame(light_obj_p)
        denom = (s - x).dot(n_l)
        lam = (light_obj_p.bmin - x).dot(n_l) / jnp.where(
            jnp.abs(denom) < 1e-9, 1e-9, denom)
        y = x + (s - x) * lam
        return y, lam, (ex, ey, n_l), d

    saved = []  # (tag, sphere_idx, light_obj_params, coeff, n_hat) per pair
    for tag, rhit, rdir, tint in receivers:
        ss, ts_f, wo, sc, receiver = receiver_data(rhit, rdir)
        x = rhit.p
        for i in sphere_ids:
            for li, obj_idx in rect_lights:
                if obj_idx == i:
                    continue  # a light doesn't shadow itself
                sp_d = pk_d.objects[i]
                lobj_d = pk_d.objects[obj_idx]
                le = pk_d.lights[li].emission

                # --- detached coefficients ------------------------------
                y_d, lam, (ex, ey, n_l), d_cx = curve_points(sp_d, lobj_d, x)
                rel = y_d - lobj_d.bmin
                exl = ex.length()
                eyl = ey.length()
                u_r = rel.dot(ex) / jnp.maximum(exl * exl, 1e-12)
                v_r = rel.dot(ey) / jnp.maximum(eyl * eyl, 1e-12)
                inside = ((u_r >= 0.0) & (u_r <= 1.0) &
                          (v_r >= 0.0) & (v_r <= 1.0))

                to_y = y_d - x
                d2 = jnp.maximum(to_y.length_sq(), 1e-12)
                wi = to_y * jax.lax.rsqrt(d2)
                cos_s = wi.dot(rhit.n)
                cos_l = (-wi).dot(n_l * lobj_d.reverse)
                wi_local = vm.world_to_local(wi, rhit.n, ss, ts_f)
                f = mat_ops.eval_matte_f(pk_d.materials, static,
                                         rhit.mat_row, sc, wo, wi_local)
                h = (d_loss_d_image.x * tint.x * le.x * f.x +
                     d_loss_d_image.y * tint.y * le.y * f.y +
                     d_loss_d_image.z * tint.z * le.z * f.z) * (
                         cos_s * cos_l / d2)

                valid = (receiver & inside & (lam > 1.0 + 1e-4) &
                         (cos_s > 0.0) & (cos_l > 0.0) &
                         (rhit.obj_id != i) &
                         (d_cx > sp_d.radius * (1.0 + 1e-4)))

                # tangent / arc length / outward normal (periodic roll)
                def roll(a, k):
                    return jnp.roll(a, k, axis=0)
                tx = Vec3(roll(y_d.x, -1) - roll(y_d.x, 1),
                          roll(y_d.y, -1) - roll(y_d.y, 1),
                          roll(y_d.z, -1) - roll(y_d.z, 1))
                dl = 0.5 * tx.length()
                n_raw = Vec3(n_l.x * lobj_d.reverse, n_l.y * lobj_d.reverse,
                             n_l.z * lobj_d.reverse).cross(tx)
                n_len = jnp.maximum(n_raw.length(), 1e-12)
                n_hat = n_raw * (1.0 / n_len)
                # orient away from the occluded region: reference =
                # projection of the sphere center from x
                denom_c = (sp_d.center - x).dot(n_l)
                lam_c = (lobj_d.bmin - x).dot(n_l) / jnp.where(
                    jnp.abs(denom_c) < 1e-9, 1e-9, denom_c)
                y_c = x + (sp_d.center - x) * lam_c
                flip = jnp.sign((y_d - y_c).dot(n_hat))
                n_hat = n_hat * flip

                coeff = jnp.where(valid, -(h * dl), 0.0)
                saved.append((tag, i, lobj_d, coeff, n_hat))

    def edge_scalar(pk):
        # differentiable part: curve position as a function of the
        # occluding sphere's params AND the receiver point (live camera
        # rays re-intersected against the DETACHED scene — x stays on the
        # fixed receiver surface while moving with the eye/basis, so
        # dL/d(camera) picks up the penumbra sweep the per-light-sample
        # V(x,y) step hides from interior AD).  Mirror receivers follow the
        # live camera ray through the DETACHED mirror (mirror geometry
        # itself stays frozen — a second-order term).  Everything else is
        # detached constants.
        ro_l, rd_l = rays_for_pixels(pk.camera, ii, jj, height, width)
        h1 = isect.intersect_scene(pk_d.objects, static, ro_l, rd_l)
        x_live = {"primary": h1.p}
        if any(tag == "mirror" for tag, *_ in saved):
            rd2_l = (rd_l - h1.n * (2.0 * h1.n.dot(rd_l))).normalize()
            x_live["mirror"] = isect.intersect_scene(
                pk_d.objects, static, h1.p + h1.n * 1e-4, rd2_l).p
        x_live.update(x_static)   # indirect receivers: detached points
        total = jnp.float32(0.0)
        for tag, i, lobj_d, coeff, n_hat in saved:
            y_live, _, _, _ = curve_points(pk.objects[i], lobj_d,
                                           x_live[tag])
            total = total + jnp.sum(coeff * (n_hat.x * y_live.x +
                                             n_hat.y * y_live.y +
                                             n_hat.z * y_live.z))
        return total

    return jax.grad(edge_scalar)(packed)


def indirect_silhouette_term(packed, static, d_loss_d_image, height: int,
                             width: int, n_dir_samples: int = 8,
                             n_noise: int = 2, seed: int = 0,
                             max_bounces: int = C.MAX_BOUNCES,
                             delta_rad: float = 6e-3):
    """Secondary-vertex silhouette term (r5): the OTHER half of
    one-diffuse-bounce visibility.

    The pixel radiance at a matte primary hit x is ∫ f·cosθ·L_in(x, ω) dω;
    L_in jumps across the tangent CONE of every sphere seen from x (the
    sphere's silhouette in DIRECTION space).  Interior AD never sees that
    jump, and it is distinct from the NEE penumbra (shadow_boundary_term):
    it is the occluder sweeping across the BSDF-sampled segment itself.
    Measured on the indirect-shadow FD scene: the penumbra term closes
    ~half the FD gap and this term is the residual (r5 protos).

    Per (sphere, pixel): the tangent-cone circle ω(t) = cosβ·ŵ +
    sinβ·(e1 cos2πt + e2 sin2πt), β = arcsin(r/d), differentiable in the
    sphere's center/radius (receiver points x are detached, like the
    indirect penumbra receivers).  Detached coefficients: the matte BSDF ×
    cosθ at ω, the per-pixel loss adjoint, the arc element sinβ·2π/K, and
    Δf = L(β−δ) − L(β+δ) estimated by straddle ray pairs traced from x
    with common random numbers (depth max_bounces−1; occlusion
    self-gates).  The inside ray grazes the sphere (√δ geometry), so the
    2·Δf(δ/4)−Δf(δ) extrapolation applies.  The edge scalar is
    Σ coeff·(n̂_d·ω_live) with n̂ = ∂ω/∂β (outward in direction space).
    """
    from ..ops import intersect as isect
    from ..ops import materials as mat_ops
    from ..ops import textures as tex_ops

    if not isinstance(d_loss_d_image, Vec3):
        a = jnp.asarray(d_loss_d_image, jnp.float32)
        d_loss_d_image = Vec3(a[..., 0], a[..., 1], a[..., 2])

    sphere_ids = [i for i, cat in enumerate(static.object_categories)
                  if cat == C.SPHERE]
    if not sphere_ids:
        return jax.tree.map(jnp.zeros_like, packed)

    sg = jax.lax.stop_gradient
    pk_d = jax.tree.map(sg, packed)

    ii = jnp.broadcast_to(jnp.arange(height, dtype=jnp.float32)[:, None],
                          (height, width))
    jj = jnp.broadcast_to(jnp.arange(width, dtype=jnp.float32)[None, :],
                          (height, width))
    ro, rd = rays_for_pixels(pk_d.camera, ii, jj, height, width)
    hit = isect.intersect_scene(pk_d.objects, static, ro, rd)
    matte_rows = jnp.asarray([c == C.MATTE
                              for c in static.material_categories], bool)
    receiver = hit.valid & matte_rows[hit.mat_row] & (hit.emissive == 0)
    x = jax.tree.map(sg, hit.p)
    n_A = hit.n
    dpdu_ok = hit.dpdu.length_sq() > 1e-16
    ss = vm.where(dpdu_ok, hit.dpdu, vm.ortho(n_A)).normalize()
    ss = (ss - n_A * ss.dot(n_A)).normalize()
    ts_f = n_A.cross(ss)
    wo = vm.world_to_local(-rd, n_A, ss, ts_f)
    sc = tex_ops.surface_color(pk_d.textures, static, hit.tex_row, hit.p,
                               hit.u, hit.v, hit.sc_override,
                               hit.use_override)

    K = n_dir_samples
    tm = (jnp.arange(K, dtype=jnp.float32) + 0.5) / K
    ang = (2.0 * jnp.pi) * tm[:, None, None]
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    origin = x + n_A * 1e-4
    ii_i = jnp.broadcast_to(ii.astype(jnp.int32), (K, height, width))
    jj_i = jnp.broadcast_to(jj.astype(jnp.int32), (K, height, width))

    def cone_dirs(sp, x):
        """(ω, β, frame) of sphere sp's tangent cone from points x; ω has
        shape (K, H, W) as a function of sp.center/sp.radius AND x."""
        w = sp.center - x
        d = w.length()
        w_hat = w * (1.0 / jnp.maximum(d, 1e-9))
        ratio = jnp.clip(sp.radius / jnp.maximum(d, 1e-9), 0.0, 1.0 - 1e-6)
        sinb = ratio
        cosb = jnp.sqrt(jnp.maximum(1.0 - ratio * ratio, 1e-12))
        e1 = vm.ortho(w_hat).normalize()
        e2 = w_hat.cross(e1)
        radial = e1 * ca + e2 * sa
        omega = (w_hat.broadcast_to((K, height, width)) * cosb +
                 radial * sinb)
        # ∂ω/∂β: outward in direction space (away from the cone axis)
        n_dir = (radial * cosb -
                 w_hat.broadcast_to((K, height, width)) * sinb)
        return omega, n_dir, sinb, d

    saved = []
    for i in sphere_ids:
        sp_d = pk_d.objects[i]
        omega_d, n_dir_d, sinb, d_cx = cone_dirs(sp_d, x)

        # Δf across the cone: straddle pairs at β ∓ δ (inside hits the
        # sphere).  Rotate ω toward/away from the axis by angle δ in the
        # (ω, n̂) plane: ω(β±δ) = cosδ·ω ± sinδ·n̂.
        import math
        cd, sdl = math.cos(delta_rad), math.sin(delta_rad)
        acc = None
        for k in range(n_noise):
            noise = rng.pixel_noise(seed, 60013 + k, ii=ii_i, jj=jj_i)
            df_k = None
            for sign, w_side in ((-1.0, 1.0), (1.0, -1.0)):
                dirs = (omega_d * cd + n_dir_d * (sign * sdl)).normalize()
                res = trace_rays(pk_d, static,
                                 origin.broadcast_to((K, height, width)),
                                 dirs, noise, max(max_bounces - 1, 1))
                contrib = res.color * w_side
                df_k = contrib if df_k is None else df_k + contrib
            acc = df_k if acc is None else acc + df_k
        df = acc * (1.0 / n_noise)
        # √δ extrapolation: second estimate at δ/4
        cd4, sd4 = math.cos(delta_rad / 4), math.sin(delta_rad / 4)
        acc = None
        for k in range(n_noise):
            noise = rng.pixel_noise(seed, 60013 + k, ii=ii_i, jj=jj_i)
            df_k = None
            for sign, w_side in ((-1.0, 1.0), (1.0, -1.0)):
                dirs = (omega_d * cd4 + n_dir_d * (sign * sd4)).normalize()
                res = trace_rays(pk_d, static,
                                 origin.broadcast_to((K, height, width)),
                                 dirs, noise, max(max_bounces - 1, 1))
                contrib = res.color * w_side
                df_k = contrib if df_k is None else df_k + contrib
            acc = df_k if acc is None else acc + df_k
        df = (acc * (1.0 / n_noise)) * 2.0 - df

        # matte BSDF × cosθ at the (detached) cone directions
        wi_local = vm.world_to_local(omega_d, n_A, ss, ts_f)
        f = mat_ops.eval_matte_f(pk_d.materials, static, hit.mat_row, sc,
                                 wo, wi_local)
        cos_s = jnp.maximum(omega_d.dot(n_A), 0.0)
        w_df = (d_loss_d_image.x * f.x * df.x +
                d_loss_d_image.y * f.y * df.y +
                d_loss_d_image.z * f.z * df.z) * cos_s
        dl = sinb * (2.0 * jnp.pi / K)
        valid = (receiver & (hit.obj_id != i) &
                 (d_cx > sp_d.radius * (1.0 + 1e-4)))
        coeff = jnp.where(valid, w_df * dl, 0.0)
        saved.append((i, coeff, jax.tree.map(sg, n_dir_d)))

    def edge_scalar(pk):
        total = jnp.float32(0.0)
        for i, coeff, n_dir in saved:
            omega_live, _, _, _ = cone_dirs(pk.objects[i], x)
            total = total + jnp.sum(coeff * (n_dir.x * omega_live.x +
                                             n_dir.y * omega_live.y +
                                             n_dir.z * omega_live.z))
        return total

    return jax.grad(edge_scalar)(packed)


def full_boundary_term(packed, static, d_loss_d_image, height: int,
                       width: int, n_edge_samples: int = 256,
                       n_noise: int = 4, seed: int = 0,
                       max_bounces: int = C.MAX_BOUNCES,
                       n_curve_samples: int = 32,
                       shadow: bool = True,
                       n_indirect_dirs: int = 0,
                       indirect_silhouette: bool = False):
    """Silhouette + (optionally) NEE-penumbra boundary terms for an arbitrary
    per-pixel loss adjoint — the complete edge-gradient correction the
    framework currently models.  Returns a pytree shaped like `packed`.
    `n_indirect_dirs` > 0 additionally models indirect (one-diffuse-bounce)
    shadow boundaries; `indirect_silhouette` adds the secondary-vertex
    silhouette term (the occluder sweeping the BSDF segment itself — the
    other half of one-diffuse-bounce visibility, see
    indirect_silhouette_term)."""
    bnd = boundary_term(packed, static, d_loss_d_image, height, width,
                        n_edge_samples=n_edge_samples, n_noise=n_noise,
                        seed=seed, max_bounces=max_bounces)
    if shadow:
        shd = shadow_boundary_term(packed, static, d_loss_d_image, height,
                                   width, n_curve_samples=n_curve_samples,
                                   seed=seed, n_indirect_dirs=n_indirect_dirs)
        bnd = jax.tree.map(lambda a, b: a + b, bnd, shd)
    if indirect_silhouette:
        sil2 = indirect_silhouette_term(packed, static, d_loss_d_image,
                                        height, width, seed=seed,
                                        max_bounces=max_bounces)
        bnd = jax.tree.map(lambda a, b: a + b, bnd, sil2)
    return bnd


def grad_with_boundary(loss_fn, packed, static, render_kwargs: dict,
                       target: Vec3, n_edge_samples: int = 256,
                       n_noise: int = 4, seed: int = 0,
                       shadow: bool = True):
    """Convenience: interior AD gradient of `loss_fn(packed)` plus the
    silhouette and NEE-penumbra boundary terms for the canonical
    mean-squared-error loss L = mean((img − target)²) over pixels/channels.

    `loss_fn(packed) -> (loss, img)` must return the rendered image as aux
    (Vec3 of (H, W)) so the loss adjoint can be formed without re-rendering.

    `render_kwargs` must contain height, width (and may contain spp,
    max_bounces) — the same arguments the loss's render uses."""
    height = render_kwargs["height"]
    width = render_kwargs["width"]
    max_bounces = render_kwargs.get("max_bounces", C.MAX_BOUNCES)

    interior, img = jax.grad(loss_fn, has_aux=True)(packed)
    n = height * width * 3
    dL = Vec3((img.x - target.x) * (2.0 / n),
              (img.y - target.y) * (2.0 / n),
              (img.z - target.z) * (2.0 / n))
    bnd = full_boundary_term(packed, static, dL, height, width,
                             n_edge_samples=n_edge_samples, n_noise=n_noise,
                             seed=seed, max_bounces=max_bounces,
                             shadow=shadow)
    return jax.tree.map(lambda a, b: a + b, interior, bnd), img
