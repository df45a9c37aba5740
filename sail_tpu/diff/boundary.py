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
                  max_bounces: int = C.MAX_BOUNCES):
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
