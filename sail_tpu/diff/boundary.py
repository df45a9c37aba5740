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

Scope (documented limitation, see ARCHITECTURE.md): primary-visibility
silhouettes of spheres only.  Shadow-edge and indirect boundary terms, and
other primitives' silhouettes, still carry interior-only gradients.
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
    if not sphere_ids:
        return jax.tree.map(jnp.zeros_like, packed)

    ts = (jnp.arange(n_edge_samples, dtype=jnp.float32) + 0.5) / n_edge_samples

    def edge_scalar(pk):
        total = jnp.float32(0.0)
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
            packed_detached = jax.tree.map(jax.lax.stop_gradient, pk)
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
                         seed: int = 0):
    """Shadow (NEE-visibility) boundary term for sphere occluders.

    The direct-light integral at a receiver x,
    D(x) = ∫_A f·Le·cosθ_s·cosθ_l/d² · V(x,y) dA(y),
    jumps across the penumbra curve Γ_x = the central projection of the
    sphere's tangent (silhouette) circle from x onto the light surface.
    Naive AD never sees it (V is binary).  This term evaluates the exact
    curve integral   dD/dθ = −∮_{Γ_x∩A} h(y) (n̂·dy/dθ) dl   per pixel,
    with h the unoccluded integrand — no extra rays are traced: for
    analytic sphere occluders the curve is closed-form.

    Scope (documented): first-bounce (camera-visible) matte receivers,
    RECTANGLE area lights, gradients w.r.t. the occluding spheres'
    center/radius.  Deeper-bounce shadows, other occluder shapes, and
    multi-occluder overlap (a second occluder already covering the curve)
    are not modeled.

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
    receiver = hit.valid & matte_rows[hit.mat_row] & (hit.emissive == 0)

    # shading frame + BSDF toward arbitrary directions (as in _bounce_step)
    dpdu_ok = hit.dpdu.length_sq() > 1e-16
    ss = vm.where(dpdu_ok, hit.dpdu, vm.ortho(hit.n)).normalize()
    ss = (ss - hit.n * ss.dot(hit.n)).normalize()
    ts_f = hit.n.cross(ss)
    wo = vm.world_to_local(-rd, hit.n, ss, ts_f)
    sc = tex_ops.surface_color(pk_d.textures, static, hit.tex_row, hit.p,
                               hit.u, hit.v, hit.sc_override,
                               hit.use_override)

    K = n_curve_samples
    phis = (jnp.arange(K, dtype=jnp.float32) + 0.5) / K
    x = hit.p  # receivers, (H, W)

    def curve_points(sphere_p, light_obj_p):
        """Penumbra-curve points y(t) on the light plane, (K, H, W)."""
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

    saved = []  # (sphere_idx, light_obj_params, coeff, n_hat) per pair
    for i in sphere_ids:
        for li, obj_idx in rect_lights:
            if obj_idx == i:
                continue  # a light doesn't shadow itself
            sp_d = pk_d.objects[i]
            lobj_d = pk_d.objects[obj_idx]
            le = pk_d.lights[li].emission

            # --- detached coefficients --------------------------------------
            y_d, lam, (ex, ey, n_l), d_cx = curve_points(sp_d, lobj_d)
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
            cos_s = wi.dot(hit.n)
            cos_l = (-wi).dot(n_l * lobj_d.reverse)
            wi_local = vm.world_to_local(wi, hit.n, ss, ts_f)
            f = mat_ops.eval_matte_f(pk_d.materials, static, hit.mat_row, sc,
                                     wo, wi_local)
            h = (d_loss_d_image.x * le.x * f.x +
                 d_loss_d_image.y * le.y * f.y +
                 d_loss_d_image.z * le.z * f.z) * (cos_s * cos_l / d2)

            valid = (receiver & inside & (lam > 1.0 + 1e-4) &
                     (cos_s > 0.0) & (cos_l > 0.0) &
                     (hit.obj_id != i) & (d_cx > sp_d.radius * (1.0 + 1e-4)))

            # tangent / arc length / outward normal (periodic roll over K)
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
            # orient away from the occluded region: reference = projection
            # of the sphere center from x
            denom_c = (sp_d.center - x).dot(n_l)
            lam_c = (lobj_d.bmin - x).dot(n_l) / jnp.where(
                jnp.abs(denom_c) < 1e-9, 1e-9, denom_c)
            y_c = x + (sp_d.center - x) * lam_c
            flip = jnp.sign((y_d - y_c).dot(n_hat))
            n_hat = n_hat * flip

            coeff = jnp.where(valid, -(h * dl), 0.0)
            saved.append((i, lobj_d, coeff, n_hat))

    def edge_scalar(pk):
        # differentiable part: curve position as a function of the occluding
        # sphere's params (everything else is detached constants)
        total = jnp.float32(0.0)
        for i, lobj_d, coeff, n_hat in saved:
            y_live, _, _, _ = curve_points(pk.objects[i], lobj_d)
            total = total + jnp.sum(coeff * (n_hat.x * y_live.x +
                                             n_hat.y * y_live.y +
                                             n_hat.z * y_live.z))
        return total

    return jax.grad(edge_scalar)(packed)


def grad_with_boundary(loss_fn, packed, static, render_kwargs: dict,
                       target: Vec3, n_edge_samples: int = 256,
                       n_noise: int = 4, seed: int = 0):
    """Convenience: interior AD gradient of `loss_fn(packed)` plus the
    silhouette boundary term for the canonical mean-squared-error loss
    L = mean((img − target)²) over pixels and channels.

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
    bnd = boundary_term(packed, static, dL, height, width,
                        n_edge_samples=n_edge_samples, n_noise=n_noise,
                        seed=seed, max_bounces=max_bounces)
    return jax.tree.map(lambda a, b: a + b, interior, bnd), img
