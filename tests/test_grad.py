"""Differentiability: pixel-loss gradients w.r.t. material / light / geometry
parameters, validated against central finite differences (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sail_tpu import scenes
from sail_tpu.core.camera import generate_rays
from sail_tpu.core.rng import pixel_noise
from sail_tpu.render.integrator import trace_rays


BOUNCES = 2
H = W = 8


def loss_fn(packed, static, key):
    del key
    ro, rd = generate_rays(packed.camera, H, W)
    noise = pixel_noise(0, 0, (H, W))
    res = trace_rays(packed, static, ro, rd, noise, max_bounces=BOUNCES)
    c = res.color
    return jnp.mean(c.x + c.y + c.z)


def fd_check(get_set_path, rel_tol=0.12, abs_tol=5e-4, eps=3e-3, scene_fn=None):
    """Compare AD gradient of one scalar leaf against central differences."""
    scene = (scene_fn or scenes.cornell_matte)()
    packed, static = scene.pack()
    key = jax.random.PRNGKey(0)

    flat, treedef = jax.tree.flatten(packed)
    # locate the leaf by predicate
    idx = get_set_path(packed, flat, treedef)

    def loss_at(val):
        f = list(flat)
        f[idx] = jnp.asarray(val, jnp.float32)
        return loss_fn(jax.tree.unflatten(treedef, f), static, key)

    v0 = float(flat[idx])
    g_ad = float(jax.grad(loss_at)(jnp.float32(v0)))
    lp = float(loss_at(v0 + eps))
    lm = float(loss_at(v0 - eps))
    g_fd = (lp - lm) / (2 * eps)
    assert np.isfinite(g_ad)
    if abs(g_fd) < abs_tol and abs(g_ad) < abs_tol:
        return  # both effectively zero
    assert g_ad == pytest.approx(g_fd, rel=rel_tol, abs=abs_tol), \
        f"AD {g_ad} vs FD {g_fd}"


def _leaf_index_of(packed, flat, target):
    """Index of a specific array (by identity) in the flat leaves."""
    for i, leaf in enumerate(flat):
        if leaf is target:
            return i
    raise AssertionError("leaf not found")


def test_grad_matte_kd():
    def locate(packed, flat, treedef):
        return _leaf_index_of(packed, flat, packed.materials[0].kd)
    fd_check(locate)


def test_grad_light_emission():
    def locate(packed, flat, treedef):
        # emission of the area light
        return _leaf_index_of(packed, flat, packed.lights[0].emission.x)
    fd_check(locate)


# --------------------------------------------------------------------------
# Geometry gradients: interior AD + boundary (silhouette + penumbra) terms
# vs seed-averaged finite differences of the true (jittered) pixel integral.
#
# Interior-only AD is structurally wrong for geometry parameters — the
# visibility discontinuities (camera silhouette, NEE shadow edge) that FD
# crosses carry most of the gradient.  The edge terms (diff/boundary.py)
# supply them; FD of a Monte-Carlo render must be seed-averaged with common
# random numbers or it measures noise (CLAUDE.md).
# --------------------------------------------------------------------------

GEOM_H = GEOM_W = 16
GEOM_SPP = 48
GEOM_SEEDS = (3, 13, 23, 33)


def _geom_loss(pk, static, seed):
    """Box-filtered pixel-integral estimate: mean over jittered samples.
    vmap (not fori_loop) over samples keeps the CPU reverse-mode compile
    sane (no transpose-of-scan)."""
    from sail_tpu.render.integrator import render_sample

    def one(i):
        return render_sample(pk, static, GEOM_H, GEOM_W, seed, i,
                             max_bounces=1).color
    c = jax.vmap(one)(jnp.arange(GEOM_SPP))
    return (c.x + c.y + c.z).mean()


def _geom_fd_check(locate, eps, rel_tol, scene_fn=None, abs_tol=2.5e-3,
                   shadow=True):
    from sail_tpu.core.vecmath import Vec3
    from sail_tpu.diff.boundary import full_boundary_term

    scene = (scene_fn or scenes.cornell_matte)()
    packed, static = scene.pack()
    flat, treedef = jax.tree.flatten(packed)
    idx = locate(packed, flat)
    v0 = float(flat[idx])

    loss_j = jax.jit(lambda pk, s: _geom_loss(pk, static, s))
    grad_j = jax.jit(jax.grad(lambda pk, s: _geom_loss(pk, static, s)))

    def at(v, s):
        f = list(flat)
        f[idx] = jnp.float32(v)
        return float(loss_j(jax.tree.unflatten(treedef, f), s))

    fds, ints = [], []
    for s in GEOM_SEEDS:
        fds.append((at(v0 + eps, s) - at(v0 - eps, s)) / (2 * eps))
        ints.append(float(jax.tree.flatten(grad_j(packed, s))[0][idx]))
    g_fd = float(np.mean(fds))
    g_int = float(np.mean(ints))

    # loss = mean over pixels of (x+y+z)/ (H*W)  ⇒ ∂L/∂img_c = 1/(H·W)
    wn = jnp.full((GEOM_H, GEOM_W), 1.0 / (GEOM_H * GEOM_W), jnp.float32)
    bnd = full_boundary_term(packed, static, Vec3(wn, wn, wn),
                             GEOM_H, GEOM_W, n_edge_samples=512, n_noise=4,
                             seed=11, max_bounces=1, n_curve_samples=64,
                             shadow=shadow)
    g_bnd = float(jax.tree.flatten(bnd)[0][idx])
    g_total = g_int + g_bnd

    # the edge term must be load-bearing AND close the FD gap
    assert abs(g_total - g_fd) < abs(g_int - g_fd), \
        f"FD {g_fd} interior {g_int} total {g_total}"
    assert g_total == pytest.approx(g_fd, rel=rel_tol, abs=abs_tol), \
        f"FD {g_fd} interior {g_int} boundary {g_bnd} total {g_total}"


@pytest.mark.slow
def test_grad_sphere_radius():
    def locate(packed, flat):
        # sphere is object index 1 in cornell_matte
        return _leaf_index_of(packed, flat, packed.objects[1].radius)
    _geom_fd_check(locate, eps=0.01, rel_tol=0.30)


@pytest.mark.slow
def test_grad_sphere_center():
    def locate(packed, flat):
        return _leaf_index_of(packed, flat, packed.objects[1].center.y)
    _geom_fd_check(locate, eps=0.01, rel_tol=0.30)


# Cone-silhouette and camera-eye FD-vs-(AD+boundary) tests live in
# tests/test_boundary_grad.py (the ramp-weighted-loss harness there gives
# translation a first-order signal; the unweighted mean loss here only sees
# the tiny projected-area change of a translating emissive object, so FD is
# MC noise).


def test_grad_camera_eye_finite():
    """Camera gradients stay finite through the full interior estimator
    (the FD-parity camera check is test_grad_camera_eye_boundary)."""
    scene = scenes.cornell_matte()
    packed, static = scene.pack()
    key = jax.random.PRNGKey(0)

    def loss_of_eye(eye_z):
        flat, treedef = jax.tree.flatten(packed)
        idx = _leaf_index_of(packed, flat, packed.camera.eye.z)
        flat[idx] = eye_z
        return loss_fn(jax.tree.unflatten(treedef, flat), static, key)

    g = float(jax.grad(loss_of_eye)(jnp.float32(2.5)))
    assert np.isfinite(g)


def test_grad_mirror_kr():
    def locate(packed, flat, treedef):
        # mirror material row in cornell_mirror: find the MirrorP leaf
        return _leaf_index_of(packed, flat, packed.materials[1].kr)
    fd_check(locate, scene_fn=scenes.cornell_mirror)


def test_grad_all_params_finite():
    """grad w.r.t. EVERY scene float leaf is finite (north-star requirement:
    gradients w.r.t. all BSDF params)."""
    scene = scenes.material_demo()
    packed, static = scene.pack()
    key = jax.random.PRNGKey(1)
    g = jax.grad(lambda p: loss_fn(p, static, key))(packed)
    leaves = jax.tree.leaves(g)
    assert len(leaves) > 20
    for leaf in leaves:
        assert np.isfinite(np.asarray(leaf)).all()


def test_grad_inverse_step_decreases_loss():
    """One SGD step on material kd reduces an image-matching loss."""
    import optax

    scene = scenes.cornell_matte()
    packed, static = scene.pack()
    key = jax.random.PRNGKey(2)

    ro, rd = generate_rays(packed.camera, H, W)
    noise = pixel_noise(2, 0, (H, W))
    target = trace_rays(packed, static, ro, rd, noise, max_bounces=BOUNCES).color

    # perturb kd and recover
    flat, treedef = jax.tree.flatten(packed)
    kd_idx = None
    for i, leaf in enumerate(flat):
        if leaf is packed.materials[0].kd:
            kd_idx = i
    flat[kd_idx] = jnp.float32(0.5)
    perturbed = jax.tree.unflatten(treedef, flat)

    def img_loss(p):
        res = trace_rays(p, static, ro, rd, noise, max_bounces=BOUNCES).color
        return (jnp.mean((res.x - target.x) ** 2) +
                jnp.mean((res.y - target.y) ** 2) +
                jnp.mean((res.z - target.z) ** 2))

    l0, g = jax.value_and_grad(img_loss)(perturbed)
    opt = optax.sgd(0.2)
    state = opt.init(perturbed)
    updates, _ = opt.update(g, state)
    stepped = optax.apply_updates(perturbed, updates)
    l1 = img_loss(stepped)
    assert float(l1) < float(l0)
