"""Silhouette (boundary) gradients: edge-sampled term vs finite differences.

Naive AD misses the boundary term of the pixel integral; these tests check
that (a) the silhouette geometry is exact, (b) the edge-sampled boundary
term matches finite differences of the true (jittered, multi-spp) pixel
integral — including an analytic cross-check where the term is exactly
d(pi * R_screen^2)/d(theta) / N.

Scope matches the estimator (sail_tpu/diff/boundary.py): PRIMARY-visibility
silhouettes.  The test scenes are built so that the camera silhouette is the
only discontinuity (emissive sphere, 1 bounce): in scenes with NEE shadows
or indirect bounces, FD additionally sees shadow/indirect boundary terms
that the estimator intentionally does not model (documented limitation).
The reference has no gradients at all (SURVEY.md §2.5); this is SURVEY.md §7
hard part (a).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sail_tpu as sail
from sail_tpu.core.vecmath import Vec3, splat
from sail_tpu.diff.boundary import (boundary_term, screen_project,
                                    sphere_silhouette)
from sail_tpu.render.integrator import render_image

H = W = 40
SPP = 192
BOUNCES = 1
SEED = 3


def _scene(dx=0.0, radius=0.38):
    """Emissive sphere inside a (dark, 1-bounce) Cornell box: the camera
    silhouette is the only discontinuity, but the multi-object scene still
    exercises object indexing, projection, and the image-adjoint gather."""
    scene = sail.Scene()
    scene.add(sail.Camera([0.0, 0.0, 2.5], [0.0, 0.0, 0.0]))
    scene.add(sail.Cornellbox([-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]))
    scene.add(sail.Sphere([0.15 + dx, -0.2, 0.2], radius,
                          emission=[1.0, 1.0, 1.0]))
    return scene


def test_silhouette_is_tangent_circle():
    from sail_tpu.core.camera import make_camera
    cam = make_camera([0.0, 0.0, 2.5], [0.0, 0.0, 0.0])
    c = splat([0.3, -0.2, 0.1])
    r = jnp.float32(0.4)
    ts = (jnp.arange(32, dtype=jnp.float32) + 0.5) / 32
    s = sphere_silhouette(cam, c, r, ts)
    # on the sphere
    np.testing.assert_allclose(np.asarray((s - c).length()), 0.4, atol=1e-5)
    # tangency: view direction is perpendicular to the surface normal at s
    tang = (s - c).dot(s - cam.eye)
    np.testing.assert_allclose(np.asarray(tang), 0.0, atol=1e-5)


def test_screen_project_inverts_ray_generation():
    from sail_tpu.core.camera import make_camera, rays_for_pixels
    cam = make_camera([0.2, -0.1, 2.5], [0.0, 0.1, 0.0])
    ii = jnp.array([3.25, 17.5, 38.9])
    jj = jnp.array([1.75, 22.0, 39.1])
    ro, rd = rays_for_pixels(cam, ii, jj, H, W, jitter_x=0.0, jitter_y=0.0)
    p = ro + rd * 2.1
    col, row, depth = screen_project(cam, p, H, W)
    np.testing.assert_allclose(np.asarray(col), np.asarray(jj), atol=1e-4)
    np.testing.assert_allclose(np.asarray(row), np.asarray(ii), atol=1e-4)
    assert (np.asarray(depth) > 0).all()


@pytest.fixture(scope="module")
def loss_and_adjoint():
    """Loss with an x-ramp weight (so translation has first-order signal):
    L = mean(ramp · img) over pixels/channels; adjoint = ramp / (3·H·W)."""
    ramp = jnp.linspace(0.25, 2.0, W)[None, :] * jnp.ones((H, 1))

    def make(scene):
        packed, static = scene.pack()

        @jax.jit
        def loss(pk):
            img = render_image(pk, static, H, W, SPP, seed=SEED,
                               max_bounces=BOUNCES)
            return ((img.x + img.y + img.z) * ramp).mean() / 3.0, img

        return packed, static, loss

    wn = ramp / (3.0 * H * W)
    return make, Vec3(wn, wn, wn)


@pytest.mark.slow
def test_boundary_term_matches_fd_translation(loss_and_adjoint):
    make, dL = loss_and_adjoint
    packed, static, loss = make(_scene())
    eps = 0.02

    lp, _ = loss(make(_scene(dx=+eps))[0])
    lm, _ = loss(make(_scene(dx=-eps))[0])
    g_fd = (float(lp) - float(lm)) / (2 * eps)

    interior, _ = jax.grad(loss, has_aux=True)(packed)
    g_int = float(interior.objects[1].center.x)

    bnd = boundary_term(packed, static, dL, H, W, n_edge_samples=512,
                        n_noise=4, seed=11, max_bounces=BOUNCES)
    g_total = g_int + float(bnd.objects[1].center.x)

    # interior alone misses the (dominant) silhouette term
    assert abs(g_int - g_fd) > 2 * abs(g_total - g_fd), \
        f"fd={g_fd} int={g_int} total={g_total}"
    assert g_total == pytest.approx(g_fd, rel=0.25, abs=2e-3), \
        f"fd={g_fd} total={g_total}"


@pytest.mark.slow
def test_boundary_term_matches_fd_and_analytic_radius(loss_and_adjoint):
    """Radius: FD, edge-sampled boundary, and the analytic
    d(area)/dr / N all agree (for an emissive sphere the boundary term is
    exactly the swept screen area times the weighted emission delta)."""
    make, dL = loss_and_adjoint
    packed, static, loss = make(_scene())
    r0 = 0.38
    eps = 0.015

    lp, _ = loss(make(_scene(radius=r0 + eps))[0])
    lm, _ = loss(make(_scene(radius=r0 - eps))[0])
    g_fd = (float(lp) - float(lm)) / (2 * eps)

    interior, _ = jax.grad(loss, has_aux=True)(packed)
    bnd = boundary_term(packed, static, dL, H, W, n_edge_samples=512,
                        n_noise=4, seed=11, max_bounces=BOUNCES)
    g_total = (float(interior.objects[1].radius) +
               float(bnd.objects[1].radius))
    assert g_total == pytest.approx(g_fd, rel=0.2, abs=2e-3), \
        f"fd={g_fd} total={g_total}"
    assert float(bnd.objects[1].radius) > 0  # growing a bright sphere


def _cone_scene(dx=0.0, radius=0.5):
    """Emissive cone in a dark 1-bounce box: the camera silhouette (base
    rim circle + the two tangent generator lines,
    diff/boundary._revolution_curves) is the only discontinuity."""
    scene = sail.Scene()
    scene.add(sail.Camera([0.0, 0.2, 2.5], [0.0, 0.0, 0.0]))
    scene.add(sail.Cornellbox([-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]))
    scene.add(sail.Cone([0.0 + dx, -0.6, 0.0], 1.1, radius,
                        emission=[1.0, 1.0, 1.0]))
    return scene


@pytest.mark.slow
def test_boundary_cone_translation(loss_and_adjoint):
    """Cone silhouette gradients (VERDICT r2 missing #1): the generator +
    base-rim edge terms must close the FD gap for the cone's base position,
    exactly like the sphere translation test above."""
    make, dL = loss_and_adjoint
    packed, static, loss = make(_cone_scene())
    eps = 0.02

    lp, _ = loss(make(_cone_scene(dx=+eps))[0])
    lm, _ = loss(make(_cone_scene(dx=-eps))[0])
    g_fd = (float(lp) - float(lm)) / (2 * eps)

    interior, _ = jax.grad(loss, has_aux=True)(packed)
    g_int = float(interior.objects[1].p.x)

    bnd = boundary_term(packed, static, dL, H, W, n_edge_samples=512,
                        n_noise=4, seed=11, max_bounces=BOUNCES)
    g_total = g_int + float(bnd.objects[1].p.x)

    assert abs(g_int - g_fd) > 2 * abs(g_total - g_fd), \
        f"fd={g_fd} int={g_int} total={g_total}"
    assert g_total == pytest.approx(g_fd, rel=0.25, abs=2e-3), \
        f"fd={g_fd} total={g_total}"


@pytest.mark.slow
def test_boundary_cone_radius(loss_and_adjoint):
    make, dL = loss_and_adjoint
    packed, static, loss = make(_cone_scene())
    r0 = 0.5
    eps = 0.015

    lp, _ = loss(make(_cone_scene(radius=r0 + eps))[0])
    lm, _ = loss(make(_cone_scene(radius=r0 - eps))[0])
    g_fd = (float(lp) - float(lm)) / (2 * eps)

    interior, _ = jax.grad(loss, has_aux=True)(packed)
    bnd = boundary_term(packed, static, dL, H, W, n_edge_samples=512,
                        n_noise=4, seed=11, max_bounces=BOUNCES)
    g_total = float(interior.objects[1].r) + float(bnd.objects[1].r)
    assert g_total == pytest.approx(g_fd, rel=0.25, abs=2e-3), \
        f"fd={g_fd} total={g_total}"


@pytest.mark.slow
def test_boundary_camera_eye(loss_and_adjoint):
    """Camera boundary gradients: every silhouette projection runs through
    the LIVE pk.camera, so dL/d(eye) carries the screen-space silhouette
    sweep interior AD misses (interior AD of this piecewise-constant scene
    is ~0).  FD perturbs the packed camera.eye.x leaf directly (fixed
    basis), matching what AD differentiates."""
    make, dL = loss_and_adjoint
    packed, static, loss = make(_scene())
    eps = 0.02

    flat, treedef = jax.tree.flatten(packed)
    idx = next(i for i, l in enumerate(flat) if l is packed.camera.eye.x)

    def at(v):
        f = list(flat)
        f[idx] = jnp.float32(v)
        l, _ = loss(jax.tree.unflatten(treedef, f))
        return float(l)

    v0 = float(flat[idx])
    g_fd = (at(v0 + eps) - at(v0 - eps)) / (2 * eps)

    interior, _ = jax.grad(loss, has_aux=True)(packed)
    g_int = float(interior.camera.eye.x)
    bnd = boundary_term(packed, static, dL, H, W, n_edge_samples=512,
                        n_noise=4, seed=11, max_bounces=BOUNCES)
    g_total = g_int + float(bnd.camera.eye.x)

    assert abs(g_int - g_fd) > 2 * abs(g_total - g_fd), \
        f"fd={g_fd} int={g_int} total={g_total}"
    assert g_total == pytest.approx(g_fd, rel=0.25, abs=2e-3), \
        f"fd={g_fd} total={g_total}"


@pytest.mark.slow
def test_shadow_boundary_closes_nee_gap():
    """Matte sphere + area light at 1 bounce: the full gradient is
    interior + camera-silhouette + shadow(penumbra-curve) terms.

    The FD references were measured offline on this exact scene/loss at
    spp=256, eps=0.025/0.02, averaged over 10 (x) / 6 (r) seeds:
        fd_x = +0.004687 ± 0.000205,   fd_r = −0.009466 ± 0.000242
    (reproduce with the loop in /tmp-style scripts: central differences of
    the jitted loss below with seeds 3,13,...,93).  Interior-only is wildly
    off for BOTH (int_x ≈ +0.0079, int_r ≈ −0.061): the two edge terms must
    close the gap."""
    from sail_tpu.diff.boundary import shadow_boundary_term

    spp = 256
    scene = sail.Scene()
    scene.add(sail.Camera([0.0, 0.0, 2.5], [0.0, 0.0, 0.0]))
    scene.add(sail.Cornellbox([-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]))
    scene.add(sail.Sphere([0.15, -0.2, 0.2], 0.38, sail.Matte(0.9)))
    lamp = sail.Rectangle([-0.4, 0.97, -0.4], [0.4, 0.97, 0.4])
    scene.add(sail.AreaLight(lamp, [6.0, 6.0, 6.0]))
    packed, static = scene.pack()

    def loss(pk, seed):
        img = render_image(pk, static, H, W, spp, seed=seed, max_bounces=1)
        return (img.x ** 2 + img.y ** 2 + img.z ** 2).mean() / 3.0, img

    fd_x, fd_r = 0.004687, -0.009466

    g3, img = jax.grad(lambda p: loss(p, 3), has_aux=True)(packed)
    g13, _ = jax.grad(lambda p: loss(p, 13), has_aux=True)(packed)
    int_x = (float(g3.objects[1].center.x) + float(g13.objects[1].center.x)) / 2
    int_r = (float(g3.objects[1].radius) + float(g13.objects[1].radius)) / 2

    n = 3.0 * H * W
    dL = Vec3(img.x * (2.0 / n), img.y * (2.0 / n), img.z * (2.0 / n))
    sil = boundary_term(packed, static, dL, H, W, n_edge_samples=1024,
                        n_noise=8, seed=7, max_bounces=1)
    shd = shadow_boundary_term(packed, static, dL, H, W, n_curve_samples=96)

    tot_x = int_x + float(sil.objects[1].center.x) + float(shd.objects[1].center.x)
    tot_r = int_r + float(sil.objects[1].radius) + float(shd.objects[1].radius)

    # both edge terms must be load-bearing and close most of the gap
    # (tolerances allow the estimators' own MC noise: the sqrt-delta
    # extrapolation amplifies the Δf sampling noise ~3x)
    assert abs(tot_x - fd_x) < 0.65 * abs(int_x - fd_x), (tot_x, int_x, fd_x)
    assert abs(tot_r - fd_r) < 0.1 * abs(int_r - fd_r), (tot_r, int_r, fd_r)
    assert tot_x == pytest.approx(fd_x, rel=0.45, abs=5e-4), (tot_x, fd_x)
    assert tot_r == pytest.approx(fd_r, rel=0.30, abs=1.5e-3), (tot_r, fd_r)


@pytest.mark.slow
def test_inverse_recovers_sphere_center():
    """End-to-end geometry recovery: sign-SGD with interior+boundary
    gradients pulls a sphere's center.x back to the target position.  The
    scene (emissive sphere, 1 bounce) makes the silhouette term carry
    essentially ALL of the signal — interior-only AD would not move at all
    in the right direction."""
    from sail_tpu.diff.boundary import grad_with_boundary
    from sail_tpu.render.integrator import render_sample

    Hs = Ws = 24
    SPPs = 32
    X_TGT = 0.15  # _scene(dx=0) sphere center x
    packed, static = _scene(dx=0.25).pack()
    target_packed, _ = _scene(dx=0.0).pack()

    def render(pk, seed):
        def one(i):
            return render_sample(pk, static, Hs, Ws, seed, i,
                                 max_bounces=BOUNCES).color
        c = jax.vmap(one)(jnp.arange(SPPs))
        return Vec3(c.x.mean(0), c.y.mean(0), c.z.mean(0))

    render_j = jax.jit(render)
    target = jax.tree.map(jnp.asarray, render_j(target_packed, 5))
    n = 3.0 * Hs * Ws

    @jax.jit
    def loss(pk):
        img = render(pk, 7)
        l = ((img.x - target.x) ** 2 + (img.y - target.y) ** 2 +
             (img.z - target.z) ** 2).sum() / n
        return l, img

    kwargs = dict(height=Hs, width=Ws, max_bounces=BOUNCES)
    step = 0.05
    for it in range(9):
        g, _ = grad_with_boundary(loss, packed, static, kwargs, target,
                                  n_edge_samples=192, n_noise=2, seed=it,
                                  shadow=False)
        gx = float(g.objects[1].center.x)
        sp = packed.objects[1]
        new_center = Vec3(sp.center.x - step * jnp.sign(gx),
                          sp.center.y, sp.center.z)
        objs = list(packed.objects)
        objs[1] = sp._replace(center=new_center)
        packed = packed._replace(objects=tuple(objs))
    final_x = float(packed.objects[1].center.x)
    # started 0.25 away; sign-SGD at 0.05/step must land within one step
    assert abs(final_x - X_TGT) <= 0.0501, final_x


def test_boundary_term_zero_without_spheres():
    scene = sail.Scene()
    scene.add(sail.Camera([0.0, 0.0, 2.5], [0.0, 0.0, 0.0]))
    scene.add(sail.Cornellbox([-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]))
    lamp = sail.Rectangle([-0.4, 0.97, -0.4], [0.4, 0.97, 0.4])
    scene.add(sail.AreaLight(lamp, [6.0, 6.0, 6.0]))
    packed, static = scene.pack()
    zero_img = Vec3(*(jnp.zeros((H, W), jnp.float32),) * 3)
    g = boundary_term(packed, static, zero_img, H, W, n_edge_samples=8,
                      n_noise=1)
    assert all(float(jnp.abs(l).max()) == 0.0 for l in jax.tree.leaves(g))


def _mirror_scene(dx=0.0, radius=0.8):
    """Open scene: a planar mirror filling the view and an emissive sphere
    BEHIND the camera — the sphere is visible ONLY as its mirror image
    (direct silhouette has camera-depth < 0 and direct rays can't reach
    it), so the mirror-image silhouette (diff/boundary.py mirror_rect_ids,
    VERDICT r3 missing #1) is the one and only discontinuity."""
    s = sail.Scene()
    s.add(sail.Camera([0.0, 0.0, 2.5], [0.0, 0.0, 0.0]))
    s.add(sail.Rectangle([-0.9, -0.9, -0.99], [0.9, 0.9, -0.99],
                         sail.Mirror(kr=1.0)))
    s.add(sail.Sphere([0.5 + dx, 0.0, 3.4], radius,
                      emission=[1.0, 1.0, 1.0]))
    return s


@pytest.mark.slow
def test_mirror_silhouette_matches_fd_translation():
    """A sphere moved behind the mirror's image: FD of the loss must be
    closed by the virtual-sphere boundary term alone (interior AD is ~0:
    nothing about the image is smooth in the sphere position except
    through the silhouette).  Measured at proto time (72^2, 128 spp,
    seed 3): fd=-0.00589, boundary=-0.00639 (8.5%); rel tolerance covers
    the straddle estimator's MC noise."""
    hb, wb, sppb, bounces = 72, 72, 128, 2
    ramp = jnp.linspace(0.25, 2.0, wb)[None, :] * jnp.ones((hb, 1))

    def make(scene):
        packed, static = scene.pack()

        @jax.jit
        def loss(pk):
            img = render_image(pk, static, hb, wb, sppb, seed=3,
                               max_bounces=bounces)
            return ((img.x + img.y + img.z) * ramp).mean() / 3.0, img
        return packed, static, loss

    packed, static, loss = make(_mirror_scene())
    eps = 0.03
    lp, _ = make(_mirror_scene(dx=+eps))[2](make(_mirror_scene(dx=+eps))[0])
    lm, _ = make(_mirror_scene(dx=-eps))[2](make(_mirror_scene(dx=-eps))[0])
    g_fd = (float(lp) - float(lm)) / (2 * eps)

    interior, _ = jax.grad(loss, has_aux=True)(packed)
    g_int = float(interior.objects[1].center.x)
    wn = ramp / (3.0 * hb * wb)
    bnd = boundary_term(packed, static, Vec3(wn, wn, wn), hb, wb,
                        n_edge_samples=512, n_noise=4, seed=11,
                        max_bounces=bounces)
    g_bnd = float(bnd.objects[1].center.x)

    assert abs(g_fd) > 1e-3          # the FD signal exists
    assert abs(g_int) < 0.25 * abs(g_fd)   # interior alone misses it
    assert g_int + g_bnd == pytest.approx(g_fd, rel=0.25, abs=1e-3), \
        f"fd={g_fd} int={g_int} bnd={g_bnd}"


@pytest.mark.slow
def test_mirror_silhouette_matches_fd_radius():
    """Radius of the mirror-imaged sphere (proto: fd=0.0760 vs
    boundary=0.0775, 2.1%)."""
    hb, wb, sppb, bounces = 72, 72, 128, 2
    ramp = jnp.linspace(0.25, 2.0, wb)[None, :] * jnp.ones((hb, 1))

    def make(scene):
        packed, static = scene.pack()

        @jax.jit
        def loss(pk):
            img = render_image(pk, static, hb, wb, sppb, seed=3,
                               max_bounces=bounces)
            return ((img.x + img.y + img.z) * ramp).mean() / 3.0, img
        return packed, static, loss

    packed, static, loss = make(_mirror_scene())
    r0, eps = 0.8, 0.02
    lp, _ = make(_mirror_scene(radius=r0 + eps))[2](
        make(_mirror_scene(radius=r0 + eps))[0])
    lm, _ = make(_mirror_scene(radius=r0 - eps))[2](
        make(_mirror_scene(radius=r0 - eps))[0])
    g_fd = (float(lp) - float(lm)) / (2 * eps)

    interior, _ = jax.grad(loss, has_aux=True)(packed)
    wn = ramp / (3.0 * hb * wb)
    bnd = boundary_term(packed, static, Vec3(wn, wn, wn), hb, wb,
                        n_edge_samples=512, n_noise=4, seed=11,
                        max_bounces=bounces)
    g_tot = float(interior.objects[1].radius) + float(bnd.objects[1].radius)
    assert abs(g_fd) > 1e-2
    assert g_tot == pytest.approx(g_fd, rel=0.2, abs=2e-3), \
        f"fd={g_fd} tot={g_tot}"


@pytest.mark.slow
def test_mirror_shadow_receivers_close_fd_gap():
    """Penumbra seen THROUGH a mirror (VERDICT r3 missing #1 slice b): the
    occluder sits BEHIND the camera; its shadow falls on a floor region
    visible only in the far-wall mirror.  Moving it changes the image only
    through (a) its mirror-image silhouette and (b) the mirror-seen
    penumbra — the mirror-receiver extension of shadow_boundary_term must
    be load-bearing.  Proto measurements (96^2, 128 spp, 6 seeds):
    fd=+0.000305±0.000021, int=+0.000112, sil=−0.000154, shd=+0.000336 —
    int+sil alone lands at −0.000042 (wrong sign), total +0.000293 (4%)."""
    from sail_tpu.diff.boundary import shadow_boundary_term

    hb = wb = 96
    sppb, bounces = 128, 2

    def scene(dx=0.0):
        s = sail.Scene()
        s.add(sail.Camera([0.0, 0.0, 2.5], [0.0, 0.0, 0.0]))
        s.add(sail.Rectangle([-0.9, -1.2, -0.99], [0.9, 0.9, -0.99],
                             sail.Mirror(kr=1.0)))
        s.add(sail.Rectangle([-1.4, -0.95, -0.95], [1.4, -0.95, 3.7],
                             sail.Matte(kd=0.95)))
        s.add(sail.Sphere([0.1 + dx, 0.0, 3.1], 0.45, sail.Matte(kd=0.3)))
        s.add(sail.AreaLight(
            sail.Rectangle([-0.3, 1.6, 2.85], [0.5, 1.6, 3.35],
                           sail.Matte()), [12.0, 12.0, 12.0]))
        return s

    ramp = jnp.linspace(0.1, 3.0, wb)[None, :] * jnp.ones((hb, 1))

    def make(sc):
        packed, static = sc.pack()

        @jax.jit
        def loss(pk, seed):
            img = render_image(pk, static, hb, wb, sppb, seed=seed,
                               max_bounces=bounces)
            return ((img.x + img.y + img.z) * ramp).mean() / 3.0, img
        return packed, static, loss

    packed, static, loss = make(scene())
    eps = 0.03
    fds = []
    for seed in (3, 13, 23):
        lp, _ = make(scene(dx=+eps))[2](make(scene(dx=+eps))[0], seed)
        lm, _ = make(scene(dx=-eps))[2](make(scene(dx=-eps))[0], seed)
        fds.append((float(lp) - float(lm)) / (2 * eps))
    g_fd = float(np.mean(fds))

    interior, _ = jax.grad(lambda p: loss(p, 3), has_aux=True)(packed)
    g_int = float(interior.objects[2].center.x)
    wn = ramp / (3.0 * hb * wb)
    dL = Vec3(wn, wn, wn)
    sil = boundary_term(packed, static, dL, hb, wb, n_edge_samples=512,
                        n_noise=6, seed=11, max_bounces=bounces)
    shd = shadow_boundary_term(packed, static, dL, hb, wb,
                               n_curve_samples=64)
    g_sil = float(sil.objects[2].center.x)
    g_shd = float(shd.objects[2].center.x)

    tot_no_shd = g_int + g_sil
    tot = tot_no_shd + g_shd
    assert abs(g_fd) > 1.5e-4                      # FD signal exists
    # without the mirror-receiver shadow term the estimate misses badly;
    # with it the gap closes
    assert abs(tot - g_fd) < 0.5 * abs(tot_no_shd - g_fd), \
        f"fd={g_fd} no_shd={tot_no_shd} tot={tot}"
    assert tot == pytest.approx(g_fd, rel=0.35, abs=1e-4), \
        f"fd={g_fd} tot={tot} (int={g_int} sil={g_sil} shd={g_shd})"


@pytest.mark.slow
def test_hyperboloid_lateral_silhouette_matches_fd():
    """Hyperboloid lateral (polar-plane conic) silhouette, r4 — VERDICT r3
    missing #3: an emissive hyperboloid in a dark 1-bounce box, translated
    in x.  Rims alone miss most of the gradient (the lateral branches ARE
    the outline seen side-on); with the conic curves the FD gap closes to
    ~20% (proto 2026-08-21: fd=-0.1398, bnd=-0.113, stable across
    n_edge_samples 512-2048 and seeds — residual is estimator bias of the
    same order the cone test tolerates)."""
    hb = wb = 48
    sppb, bounces = 160, 1

    def scene(dx=0.0):
        s = sail.Scene()
        s.add(sail.Camera([0.0, 0.2, 2.5], [0.0, 0.0, 0.0]))
        s.add(sail.Cornellbox([-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]))
        s.add(sail.Hyperboloid([0.0 + dx, -0.4, 0.0], [0.45, 0.0, -0.35],
                               [0.6, 0.0, 0.55], emission=[1.0, 1.0, 1.0]))
        return s

    ramp = jnp.linspace(0.25, 2.0, wb)[None, :] * jnp.ones((hb, 1))

    def make(sc):
        packed, static = sc.pack()

        @jax.jit
        def loss(pk):
            img = render_image(pk, static, hb, wb, sppb, seed=3,
                               max_bounces=bounces)
            return ((img.x + img.y + img.z) * ramp).mean() / 3.0, img
        return packed, static, loss

    packed, static, loss = make(scene())
    eps = 0.02
    lp, _ = make(scene(dx=+eps))[2](make(scene(dx=+eps))[0])
    lm, _ = make(scene(dx=-eps))[2](make(scene(dx=-eps))[0])
    g_fd = (float(lp) - float(lm)) / (2 * eps)

    interior, _ = jax.grad(loss, has_aux=True)(packed)
    g_int = float(interior.objects[1].p.x)
    wn = ramp / (3.0 * hb * wb)
    bnd = boundary_term(packed, static, Vec3(wn, wn, wn), hb, wb,
                        n_edge_samples=512, n_noise=4, seed=11,
                        max_bounces=bounces)
    g_tot = g_int + float(bnd.objects[1].p.x)

    assert abs(g_fd) > 0.05
    # interior alone is ~0 for an emissive shape; the boundary term must
    # carry the signal and land within the estimator's tolerance
    assert abs(g_int) < 0.1 * abs(g_fd)
    assert g_tot == pytest.approx(g_fd, rel=0.25), \
        f"fd={g_fd} tot={g_tot} int={g_int}"


# ---------------------------------------------------------------------------
# FAST mirror-boundary smokes (VERDICT r4 weak #5): baked expected gradients,
# no FD, no rendering — seconds, so the default suite guards the mirror-path
# machinery every round.  Baked on CPU (deterministic counter RNG; the same
# scenes' slow FD twins above validate the values' correctness).
# ---------------------------------------------------------------------------

def test_mirror_silhouette_smoke_baked():
    """Tiny twin of test_mirror_silhouette_matches_fd_*: the mirror-imaged
    sphere's silhouette term, 24^2 / 128 edge samples, vs values baked
    2026-08-21 (center.x=-0.0061958, radius=+0.0770737; the 72^2 FD twins
    measured fd=-0.00589 / +0.0760 — same sign and magnitude)."""
    h = w = 24
    packed, static = _mirror_scene().pack()
    ramp = jnp.linspace(0.25, 2.0, w)[None, :] * jnp.ones((h, 1))
    wn = ramp / (3.0 * h * w)
    bnd = boundary_term(packed, static, Vec3(wn, wn, wn), h, w,
                        n_edge_samples=128, n_noise=2, seed=11,
                        max_bounces=2)
    gx = float(bnd.objects[1].center.x)
    gr = float(bnd.objects[1].radius)
    assert gx < 0 and gr > 0, (gx, gr)
    assert gx == pytest.approx(-0.0061958, rel=0.15), gx
    assert gr == pytest.approx(0.0770737, rel=0.15), gr


def test_mirror_penumbra_smoke_baked():
    """Tiny twin of test_mirror_shadow_receivers_close_fd_gap: the occluder
    behind the camera casts a shadow visible only in the mirror; the
    mirror-receiver NEE penumbra term must be positive and match the value
    baked 2026-08-21 (+0.00026220 at 48^2/32 curve samples; the 96^2 FD
    twin measured shd=+0.000336)."""
    from sail_tpu.diff.boundary import shadow_boundary_term

    h = w = 48
    s = sail.Scene()
    s.add(sail.Camera([0.0, 0.0, 2.5], [0.0, 0.0, 0.0]))
    s.add(sail.Rectangle([-0.9, -1.2, -0.99], [0.9, 0.9, -0.99],
                         sail.Mirror(kr=1.0)))
    s.add(sail.Rectangle([-1.4, -0.95, -0.95], [1.4, -0.95, 3.7],
                         sail.Matte(kd=0.95)))
    s.add(sail.Sphere([0.1, 0.0, 3.1], 0.45, sail.Matte(kd=0.3)))
    s.add(sail.AreaLight(
        sail.Rectangle([-0.3, 1.6, 2.85], [0.5, 1.6, 3.35], sail.Matte()),
        [12.0, 12.0, 12.0]))
    packed, static = s.pack()
    ramp = jnp.linspace(0.1, 3.0, w)[None, :] * jnp.ones((h, 1))
    wn = ramp / (3.0 * h * w)
    shd = shadow_boundary_term(packed, static, Vec3(wn, wn, wn), h, w,
                               n_curve_samples=32)
    gx = float(shd.objects[2].center.x)
    assert gx > 0, gx
    assert gx == pytest.approx(0.00026220, rel=0.15), gx


def _curved_mirror_scene(dx=0.0, radius=0.8):
    """A MIRROR SPHERE filling the view and an emissive sphere BEHIND the
    camera: the emissive sphere is visible ONLY as its reflection in the
    curved mirror, so the Alhazen silhouette (r5,
    _mirror_sphere_silhouette_fn) is the dominant discontinuity.  The
    emissive sphere is unshaded (uniform emission), so interior AD w.r.t.
    its center is ~0 and the boundary term must carry the FD signal."""
    s = sail.Scene()
    s.add(sail.Camera([0.0, 0.0, 2.5], [0.0, 0.0, 0.0]))
    s.add(sail.Sphere([0.0, 0.0, -0.3], 0.7, sail.Mirror(kr=1.0)))
    s.add(sail.Sphere([0.6 + dx, 0.2, 3.6], radius,
                      emission=[1.0, 1.0, 1.0]))
    return s


@pytest.mark.slow
def test_curved_mirror_silhouette_matches_fd_translation():
    """FD of the loss w.r.t. the reflected sphere's x-translation vs
    interior AD + the Alhazen boundary term (VERDICT r4 next #4a)."""
    hb, wb, sppb, bounces = 72, 72, 128, 2
    ramp = jnp.linspace(0.25, 2.0, wb)[None, :] * jnp.ones((hb, 1))

    def make(scene):
        packed, static = scene.pack()

        @jax.jit
        def loss(pk):
            img = render_image(pk, static, hb, wb, sppb, seed=3,
                               max_bounces=bounces)
            return ((img.x + img.y + img.z) * ramp).mean() / 3.0, img
        return packed, static, loss

    packed, static, loss = make(_curved_mirror_scene())
    eps = 0.04
    lp, _ = make(_curved_mirror_scene(dx=+eps))[2](
        make(_curved_mirror_scene(dx=+eps))[0])
    lm, _ = make(_curved_mirror_scene(dx=-eps))[2](
        make(_curved_mirror_scene(dx=-eps))[0])
    g_fd = (float(lp) - float(lm)) / (2 * eps)

    interior, _ = jax.grad(loss, has_aux=True)(packed)
    g_int = float(interior.objects[1].center.x)
    wn = ramp / (3.0 * hb * wb)
    bnd = boundary_term(packed, static, Vec3(wn, wn, wn), hb, wb,
                        n_edge_samples=512, n_noise=4, seed=11,
                        max_bounces=bounces)
    g_bnd = float(bnd.objects[1].center.x)

    assert abs(g_fd) > 2e-4          # the FD signal exists
    assert abs(g_int) < 0.25 * abs(g_fd)   # interior alone misses it
    assert g_int + g_bnd == pytest.approx(g_fd, rel=0.3, abs=5e-4), \
        f"fd={g_fd} int={g_int} bnd={g_bnd}"


@pytest.mark.slow
def test_curved_mirror_silhouette_matches_fd_radius():
    """Radius of the sphere imaged in the curved mirror."""
    hb, wb, sppb, bounces = 72, 72, 128, 2
    ramp = jnp.linspace(0.25, 2.0, wb)[None, :] * jnp.ones((hb, 1))

    def make(scene):
        packed, static = scene.pack()

        @jax.jit
        def loss(pk):
            img = render_image(pk, static, hb, wb, sppb, seed=3,
                               max_bounces=bounces)
            return ((img.x + img.y + img.z) * ramp).mean() / 3.0, img
        return packed, static, loss

    packed, static, loss = make(_curved_mirror_scene())
    r0, eps = 0.8, 0.03
    lp, _ = make(_curved_mirror_scene(radius=r0 + eps))[2](
        make(_curved_mirror_scene(radius=r0 + eps))[0])
    lm, _ = make(_curved_mirror_scene(radius=r0 - eps))[2](
        make(_curved_mirror_scene(radius=r0 - eps))[0])
    g_fd = (float(lp) - float(lm)) / (2 * eps)

    interior, _ = jax.grad(loss, has_aux=True)(packed)
    wn = ramp / (3.0 * hb * wb)
    bnd = boundary_term(packed, static, Vec3(wn, wn, wn), hb, wb,
                        n_edge_samples=512, n_noise=4, seed=11,
                        max_bounces=bounces)
    g_tot = (float(interior.objects[1].radius) +
             float(bnd.objects[1].radius))
    assert abs(g_fd) > 1e-3
    assert g_tot == pytest.approx(g_fd, rel=0.3, abs=1e-3), \
        f"fd={g_fd} tot={g_tot}"


def test_curved_mirror_silhouette_smoke_baked():
    """FAST guard for the Alhazen machinery: tiny twin of the FD tests,
    baked expected gradients (values recorded 2026-08-21 after the FD
    twins passed; deterministic counter RNG)."""
    h = w = 24
    packed, static = _curved_mirror_scene().pack()
    ramp = jnp.linspace(0.25, 2.0, w)[None, :] * jnp.ones((h, 1))
    wn = ramp / (3.0 * h * w)
    bnd = boundary_term(packed, static, Vec3(wn, wn, wn), h, w,
                        n_edge_samples=128, n_noise=2, seed=11,
                        max_bounces=2)
    gx = float(bnd.objects[1].center.x)
    gr = float(bnd.objects[1].radius)
    # baked after FD validation (see slow twins): -0.00057653 / 0.00831524
    assert gx == pytest.approx(-0.00057653, rel=0.15), gx
    assert gr == pytest.approx(0.00831524, rel=0.15), gr


@pytest.mark.slow
def test_indirect_shadow_receivers_close_fd_gap():
    """Indirect (one-diffuse-bounce) shadows (VERDICT r4 next #4b): the
    occluder's penumbra on the floor changes the BACK WALL's radiance only
    through the wall->floor diffuse bounce.  The n_indirect_dirs receivers
    must be load-bearing for FD agreement.  Proto (64^2, 128 spp, 3 seeds,
    2026-08-21): fd=+0.04356, int+sil+direct=+0.03602 (17% short), indirect
    penumbra +0.0039 -> total +0.0399 (8% short) — the residual is the
    UNMODELED secondary-vertex silhouette (the sphere occluding the
    wall->floor BSDF segment itself); see shadow_boundary_term's scope."""
    from sail_tpu.diff.boundary import shadow_boundary_term

    hb = wb = 96
    sppb, bounces = 160, 2

    def scene(dx=0.0):
        s = sail.Scene()
        s.add(sail.Camera([0.0, 0.3, 2.5], [0.0, 0.3, 0.0]))
        # vertical back wall (the indirectly-lit receiver the camera sees)
        s.add(sail.Rectangle([-1.4, -0.98, -1.0], [1.4, 1.8, -1.0],
                             sail.Matte(kd=0.9)))
        # floor (the directly-lit surface carrying the penumbra)
        s.add(sail.Rectangle([-1.4, -1.0, -1.0], [1.4, -1.0, 2.6],
                             sail.Matte(kd=0.9)))
        s.add(sail.Sphere([0.2 + dx, 0.1, 0.8], 0.4, sail.Matte(kd=0.3)))
        s.add(sail.AreaLight(
            sail.Rectangle([-0.2, 1.5, 0.5], [0.4, 1.5, 1.1],
                           sail.Matte()), [14.0, 14.0, 14.0]))
        return s

    ramp = jnp.linspace(0.1, 3.0, wb)[None, :] * jnp.ones((hb, 1))

    def make(sc):
        packed, static = sc.pack()

        @jax.jit
        def loss(pk, seed):
            img = render_image(pk, static, hb, wb, sppb, seed=seed,
                               max_bounces=bounces)
            return ((img.x + img.y + img.z) * ramp).mean() / 3.0, img
        return packed, static, loss

    packed, static, loss = make(scene())
    eps = 0.04
    fds = []
    for seed in (3, 13, 23):
        lp, _ = make(scene(dx=+eps))[2](make(scene(dx=+eps))[0], seed)
        lm, _ = make(scene(dx=-eps))[2](make(scene(dx=-eps))[0], seed)
        fds.append((float(lp) - float(lm)) / (2 * eps))
    g_fd = float(np.mean(fds))

    interior, _ = jax.grad(lambda p: loss(p, 3), has_aux=True)(packed)
    g_int = float(interior.objects[2].center.x)
    wn = ramp / (3.0 * hb * wb)
    dL = Vec3(wn, wn, wn)
    sil = boundary_term(packed, static, dL, hb, wb, n_edge_samples=512,
                        n_noise=6, seed=11, max_bounces=bounces)
    shd0 = shadow_boundary_term(packed, static, dL, hb, wb,
                                n_curve_samples=64)
    shd1 = shadow_boundary_term(packed, static, dL, hb, wb,
                                n_curve_samples=64, n_indirect_dirs=8)
    g_sil = float(sil.objects[2].center.x)
    g_direct = float(shd0.objects[2].center.x)
    g_all = float(shd1.objects[2].center.x)

    tot_no_ind = g_int + g_sil + g_direct
    tot = g_int + g_sil + g_all
    assert abs(g_fd) > 2e-4
    # the indirect receivers close (most of) the gap the direct-only term
    # leaves open
    assert abs(tot - g_fd) < abs(tot_no_ind - g_fd), \
        f"fd={g_fd} no_ind={tot_no_ind} tot={tot}"
    assert tot == pytest.approx(g_fd, rel=0.35, abs=2e-4), \
        f"fd={g_fd} tot={tot} (int={g_int} sil={g_sil} " \
        f"dir={g_direct} all={g_all})"


def test_indirect_shadow_smoke_baked():
    """FAST guard for the indirect-receiver machinery: baked expected
    center.x gradient of the indirect-shadow contribution (all - direct),
    recorded 2026-08-21 after the FD twin passed."""
    from sail_tpu.diff.boundary import shadow_boundary_term

    h = w = 48
    s = sail.Scene()
    s.add(sail.Camera([0.0, 0.3, 2.5], [0.0, 0.3, 0.0]))
    s.add(sail.Rectangle([-1.4, -0.98, -1.0], [1.4, 1.8, -1.0],
                         sail.Matte(kd=0.9)))
    s.add(sail.Rectangle([-1.4, -1.0, -1.0], [1.4, -1.0, 2.6],
                         sail.Matte(kd=0.9)))
    s.add(sail.Sphere([0.2, 0.1, 0.8], 0.4, sail.Matte(kd=0.3)))
    s.add(sail.AreaLight(
        sail.Rectangle([-0.2, 1.5, 0.5], [0.4, 1.5, 1.1], sail.Matte()),
        [14.0, 14.0, 14.0]))
    packed, static = s.pack()
    ramp = jnp.linspace(0.1, 3.0, w)[None, :] * jnp.ones((h, 1))
    wn = ramp / (3.0 * h * w)
    dL = Vec3(wn, wn, wn)
    shd0 = shadow_boundary_term(packed, static, dL, h, w,
                                n_curve_samples=32)
    shd1 = shadow_boundary_term(packed, static, dL, h, w,
                                n_curve_samples=32, n_indirect_dirs=4)
    g_ind = (float(shd1.objects[2].center.x) -
             float(shd0.objects[2].center.x))
    assert g_ind == pytest.approx(0.00377, rel=0.15), g_ind


def _secondary_sil_scene(dx=0.0):
    """Secondary-vertex silhouette dominant: a side-lit matte sphere BEHIND
    the camera, seen only through the back wall's diffuse bounce.  Interior
    AD (hit-point shading motion) and the silhouette sweep nearly cancel;
    the wrong-sign interior-only estimate is 7x the true FD value."""
    s = sail.Scene()
    s.add(sail.Camera([0.0, 0.0, 2.5], [0.0, 0.0, 0.0]))
    s.add(sail.Rectangle([-1.4, -1.4, -1.0], [1.4, 1.4, -1.0],
                         sail.Matte(kd=0.9)))
    s.add(sail.Sphere([0.3 + dx, 0.0, 3.2], 0.5, sail.Matte(kd=0.8)))
    s.add(sail.AreaLight(sail.Rectangle([-3.4, 2.2, 2.2], [-1.2, 2.2, 4.2],
                                        sail.Matte()), [10.0, 10.0, 10.0]))
    return s


@pytest.mark.slow
def test_secondary_vertex_silhouette_matches_fd():
    """indirect_silhouette_term (r5): FD vs interior + the direction-space
    silhouette boundary at one-diffuse-bounce receivers.  Proto (64^2,
    160 spp, 3 seeds, 2026-08-21): fd=-0.000532, int=+0.00387 (wrong sign
    alone), s2=-0.00463 -> total -0.00076."""
    from sail_tpu.diff.boundary import indirect_silhouette_term

    hb = wb = 64
    sppb, bounces = 160, 2
    ramp = jnp.linspace(0.25, 2.0, wb)[None, :] * jnp.ones((hb, 1))

    def make(sc):
        packed, static = sc.pack()

        @jax.jit
        def loss(pk, seed):
            img = render_image(pk, static, hb, wb, sppb, seed=seed,
                               max_bounces=bounces)
            return ((img.x + img.y + img.z) * ramp).mean() / 3.0, img
        return packed, static, loss

    packed, static, loss = make(_secondary_sil_scene())
    eps = 0.05
    fds = []
    for seed in (3, 13, 23):
        lp, _ = make(_secondary_sil_scene(dx=+eps))[2](
            make(_secondary_sil_scene(dx=+eps))[0], seed)
        lm, _ = make(_secondary_sil_scene(dx=-eps))[2](
            make(_secondary_sil_scene(dx=-eps))[0], seed)
        fds.append((float(lp) - float(lm)) / (2 * eps))
    g_fd = float(np.mean(fds))

    ints = []
    for seed in (3, 13, 23):
        interior, _ = jax.grad(lambda p, s=seed: loss(p, s),
                               has_aux=True)(packed)
        ints.append(float(interior.objects[1].center.x))
    g_int = float(np.mean(ints))

    wn = ramp / (3.0 * hb * wb)
    s2 = indirect_silhouette_term(packed, static, Vec3(wn, wn, wn), hb, wb,
                                  n_dir_samples=16, n_noise=2, seed=11,
                                  max_bounces=bounces)
    g_s2 = float(s2.objects[1].center.x)

    assert abs(g_fd) > 2e-4
    # interior alone has the WRONG SIGN and ~7x magnitude
    assert g_int * g_fd < 0
    tot = g_int + g_s2
    assert abs(tot - g_fd) < 0.25 * abs(g_int - g_fd), \
        f"fd={g_fd} int={g_int} s2={g_s2} tot={tot}"


def test_secondary_vertex_silhouette_smoke_baked():
    """FAST guard for indirect_silhouette_term: baked value at 32^2
    (recorded 2026-08-21 after the FD twin passed)."""
    from sail_tpu.diff.boundary import indirect_silhouette_term

    h = w = 32
    packed, static = _secondary_sil_scene().pack()
    ramp = jnp.linspace(0.25, 2.0, w)[None, :] * jnp.ones((h, 1))
    wn = ramp / (3.0 * h * w)
    s2 = indirect_silhouette_term(packed, static, Vec3(wn, wn, wn), h, w,
                                  n_dir_samples=8, n_noise=1, seed=11,
                                  max_bounces=2)
    gx = float(s2.objects[1].center.x)
    assert gx < 0, gx
    assert gx == pytest.approx(-0.0043837, rel=0.15), gx
