import jax.numpy as jnp
import numpy as np
import pytest

from sail_tpu.core import vecmath as vm
from sail_tpu.core.vecmath import Vec3, vec3


def rand_vec(n, seed):
    r = np.random.RandomState(seed)
    return Vec3(*(jnp.asarray(r.randn(n), jnp.float32) for _ in range(3)))


def test_dot_cross_against_numpy():
    a = rand_vec(64, 0)
    b = rand_vec(64, 1)
    an = np.stack([a.x, a.y, a.z], -1)
    bn = np.stack([b.x, b.y, b.z], -1)
    np.testing.assert_allclose(a.dot(b), np.sum(an * bn, -1), rtol=1e-5)
    cr = a.cross(b)
    np.testing.assert_allclose(np.stack([cr.x, cr.y, cr.z], -1),
                               np.cross(an, bn), rtol=1e-4, atol=1e-5)


def test_normalize_unit_length():
    v = rand_vec(128, 2)
    n = v.normalize()
    np.testing.assert_allclose(n.length(), np.ones(128), rtol=1e-5)


def test_frame_roundtrip():
    n = rand_vec(32, 3).normalize()
    s, t = vm.onb(n)
    v = rand_vec(32, 4)
    local = vm.world_to_local(v, n, s, t)
    back = vm.local_to_world(local, n, s, t)
    np.testing.assert_allclose(np.stack([back.x, back.y, back.z], -1),
                               np.stack([v.x, v.y, v.z], -1), rtol=1e-4, atol=1e-5)


def test_onb_orthonormal():
    n = rand_vec(32, 5).normalize()
    s, t = vm.onb(n)
    np.testing.assert_allclose(s.dot(n), np.zeros(32), atol=1e-6)
    np.testing.assert_allclose(s.dot(t), np.zeros(32), atol=1e-6)
    np.testing.assert_allclose(t.length(), np.ones(32), rtol=1e-5)


def test_quadratic_roots():
    # (x-2)(x-5) = x² -7x + 10
    ok, t0, t1 = vm.quadratic(jnp.float32(1.0), jnp.float32(-7.0), jnp.float32(10.0))
    assert bool(ok)
    np.testing.assert_allclose([t0, t1], [2.0, 5.0], rtol=1e-5)
    ok, _, _ = vm.quadratic(jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0))
    assert not bool(ok)


def test_reflect():
    wo = vec3(0.5, 0.0, np.sqrt(1 - 0.25))
    n = vec3(0.0, 0.0, 1.0)
    r = vm.reflect(wo, n)
    np.testing.assert_allclose([r.x, r.y, r.z], [-0.5, 0.0, np.sqrt(0.75)], rtol=1e-5)


def test_refract_snell():
    # normal incidence: straight through
    i = vec3(0.0, 0.0, -1.0)
    n = vec3(0.0, 0.0, 1.0)
    d, tir = vm.refract_dir(i, n, 1.0 / 1.5)
    assert not bool(tir)
    np.testing.assert_allclose([d.x, d.y, d.z], [0.0, 0.0, -1.0], atol=1e-6)
    # TIR beyond critical angle going from dense to sparse
    sin_c = 1.0 / 1.5
    ang = np.arcsin(sin_c) + 0.1
    i = vec3(np.sin(ang), 0.0, -np.cos(ang))
    d, tir = vm.refract_dir(i, n, 1.5)
    assert bool(tir)


def test_refract_angle():
    # 45° into glass: sinθt = sin45/1.5
    ang = np.pi / 4
    i = vec3(np.sin(ang), 0.0, -np.cos(ang))
    n = vec3(0.0, 0.0, 1.0)
    d, tir = vm.refract_dir(i, n, 1.0 / 1.5)
    assert not bool(tir)
    sin_t = np.sin(ang) / 1.5
    np.testing.assert_allclose(float(d.x), sin_t, rtol=1e-5)
    np.testing.assert_allclose(float(d.z), -np.sqrt(1 - sin_t**2), rtol=1e-5)


def test_shading_trig_identities():
    w = rand_vec(64, 6).normalize()
    np.testing.assert_allclose(vm.cos2_theta(w) + vm.sin2_theta(w),
                               np.ones(64), rtol=1e-5)
    c2p = vm.cos2_phi(w) + vm.sin2_phi(w)
    assert np.all(np.asarray(c2p) <= 1.0 + 1e-4)
