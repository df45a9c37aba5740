import jax
import jax.numpy as jnp
import numpy as np

from sail_tpu.core import samplers


def uniforms(n, seed=0):
    k = jax.random.PRNGKey(seed)
    u = jax.random.uniform(k, (2, n))
    return u[0], u[1]


def test_uniform_sphere_is_unit_and_balanced():
    u1, u2 = uniforms(20000)
    d = samplers.uniform_sphere(u1, u2)
    r = np.asarray(d.length())
    np.testing.assert_allclose(r, 1.0, rtol=1e-5)
    # each component mean ~0 for a uniform sphere
    for comp in (d.x, d.y, d.z):
        assert abs(float(jnp.mean(comp))) < 0.02


def test_cosine_hemisphere_distribution():
    u1, u2 = uniforms(50000, 1)
    d = samplers.cosine_hemisphere(u1, u2)
    z = np.asarray(d.z)
    assert np.all(z >= -1e-6)
    # E[cosθ] under pdf cosθ/π is 2/3
    np.testing.assert_allclose(z.mean(), 2.0 / 3.0, atol=0.01)
    np.testing.assert_allclose(np.asarray(d.length()), 1.0, rtol=1e-4)


def test_concentric_disk_in_unit_disk():
    u1, u2 = uniforms(20000, 2)
    x, y = samplers.concentric_disk(u1, u2)
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    assert np.all(r2 <= 1.0 + 1e-6)
    # uniform density: E[r²] = 1/2
    np.testing.assert_allclose(r2.mean(), 0.5, atol=0.01)


def test_uniform_cone():
    u1, u2 = uniforms(20000, 3)
    ct_max = 0.8
    d = samplers.uniform_cone(u1, u2, ct_max)
    z = np.asarray(d.z)
    assert np.all(z >= ct_max - 1e-6)
    # E[cosθ] for uniform in cone = (1+cosθmax)/2
    np.testing.assert_allclose(z.mean(), (1 + ct_max) / 2, atol=0.005)


def test_uniform_triangle_barycentric():
    u1, u2 = uniforms(10000, 4)
    b0, b1 = samplers.uniform_triangle(u1, u2)
    b0 = np.asarray(b0)
    b1 = np.asarray(b1)
    assert np.all(b0 >= 0) and np.all(b1 >= 0)
    assert np.all(b0 + b1 <= 1.0 + 1e-6)
