import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sail_tpu.core.vecmath import Vec3
from sail_tpu.ops import filters


def img_of(a):
    a = jnp.asarray(a, jnp.float32)
    return Vec3(a, a * 0.5, a * 0.25)


def rand_img(h, w, seed=0):
    r = np.random.RandomState(seed)
    return Vec3(*(jnp.asarray(r.rand(h, w), jnp.float32) for _ in range(3)))


def test_color_passthrough():
    img = rand_img(8, 8)
    out = filters.apply_filter("color", img)
    np.testing.assert_array_equal(out.x, img.x)


def test_gamma():
    img = img_of(np.full((4, 4), 0.25))
    out = filters.apply_filter("gamma", img, c=2.0)
    np.testing.assert_allclose(out.x, 0.5, rtol=1e-5)


def test_tonemap_range():
    img = rand_img(8, 8, 1) * 10.0
    out = filters.apply_filter("tonemapping", img)
    a = np.asarray(out.stack())
    assert a.min() >= 0.0 and a.max() <= 1.0 + 1e-5


@pytest.mark.parametrize("name", ["box", "triangle", "gaussian", "mitchell", "sinc"])
def test_window_filters_preserve_constant(name):
    """A constant image must pass through any normalized window filter."""
    img = img_of(np.full((16, 16), 0.7))
    out = filters.apply_filter(name, img, r=(2.0, 2.0))
    a = np.asarray(out.x)
    np.testing.assert_allclose(a, 0.7, rtol=1e-4)


def test_window_filter_smooths_noise():
    img = rand_img(32, 32, 2)
    out = filters.apply_filter("gaussian", img, r=(2.0, 2.0))
    assert float(jnp.std(out.x)) < float(jnp.std(img.x))
    # mean approximately preserved
    assert float(jnp.mean(out.x)) == pytest.approx(float(jnp.mean(img.x)), abs=0.02)


def test_wavelet_smooths_but_keeps_edges():
    h = w = 32
    base = np.zeros((h, w), np.float32)
    base[:, w // 2:] = 1.0  # hard edge
    noisy = base + np.random.RandomState(3).randn(h, w).astype(np.float32) * 0.05
    img = Vec3(jnp.asarray(noisy), jnp.asarray(noisy), jnp.asarray(noisy))
    normal = Vec3(jnp.zeros((h, w)), jnp.zeros((h, w)), jnp.ones((h, w)))
    pos = Vec3(jnp.asarray(base), jnp.zeros((h, w)), jnp.zeros((h, w)))
    out = filters.apply_filter("wavelet", img, normal, pos)
    a = np.asarray(out.x)
    # noise reduced on the flat left half
    assert a[:, :w // 2 - 2].std() < noisy[:, :w // 2 - 2].std()
    # edge preserved: big jump across the middle remains
    assert (a[:, w // 2 + 2] - a[:, w // 2 - 3]).mean() > 0.8


def test_normal_position_views():
    img = rand_img(4, 4)
    n = Vec3(jnp.zeros((4, 4)), jnp.zeros((4, 4)), jnp.ones((4, 4)))
    out = filters.apply_filter("normal", img, n, n)
    np.testing.assert_allclose(np.asarray(out.z), 1.0, rtol=1e-5)
    out = filters.apply_filter("position", img, n, n)
    assert np.isfinite(np.asarray(out.stack())).all()
