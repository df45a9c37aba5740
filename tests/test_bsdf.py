"""BSDF unit tests: PBRT identities — energy conservation, pdf normalization,
sample/eval consistency, Fresnel physics (SURVEY.md §4 test strategy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sail_tpu import constants as C
from sail_tpu.core.vecmath import Vec3, vec3
from sail_tpu.ops import bsdf
from sail_tpu.scene.material import Glass, Matte, Metal, Mirror


def unis(n, seed=0):
    u = jax.random.uniform(jax.random.PRNGKey(seed), (3, n))
    return u[0], u[1], u[2]


def vfill(n, x, y, z):
    return Vec3(jnp.full((n,), x, jnp.float32), jnp.full((n,), y, jnp.float32),
                jnp.full((n,), z, jnp.float32))


WHITE3 = lambda n: vfill(n, 1.0, 1.0, 1.0)


# -- Fresnel ----------------------------------------------------------------

def test_fr_dielectric_normal_incidence():
    # R0 = ((n1-n2)/(n1+n2))² = (0.5/2.5)² = 0.04 for glass
    f = bsdf.fr_dielectric(jnp.float32(1.0), 1.0, 1.5)
    assert float(f) == pytest.approx(0.04, rel=1e-4)


def test_fr_dielectric_grazing_is_one():
    f = bsdf.fr_dielectric(jnp.float32(1e-4), 1.0, 1.5)
    assert float(f) > 0.98


def test_fr_dielectric_tir_on_exit():
    # exiting (cos<0) past critical angle: sinθc = 1/1.5 → θc ≈ 41.8°
    cos_c = np.sqrt(1 - (1 / 1.5) ** 2)
    f = bsdf.fr_dielectric(jnp.float32(-(cos_c - 0.05)), 1.0, 1.5)
    assert float(f) == pytest.approx(1.0)
    f = bsdf.fr_dielectric(jnp.float32(-(cos_c + 0.05)), 1.0, 1.5)
    assert float(f) < 1.0


def test_fr_conductor_reflectance_in_unit_range():
    ones = vec3(1.0, 1.0, 1.0)
    eta = vec3(*Metal().eta)
    k = vec3(*Metal().k)
    for ci in [0.1, 0.5, 0.9, 1.0]:
        f = bsdf.fr_conductor(jnp.float32(ci), ones, eta, k)
        for comp in (f.x, f.y, f.z):
            assert 0.0 <= float(comp) <= 1.0


# -- Matte ------------------------------------------------------------------

def test_lambert_white_furnace():
    """E[f·cos/pdf] = R for cosine-sampled Lambertian (energy conservation)."""
    n = 50000
    u1, u2, _ = unis(n)
    wo = vfill(n, 0.3, 0.1, 0.94).normalize()
    s = bsdf.matte_sample(jnp.float32(1.0), jnp.float32(0.0), WHITE3(n), u1, u2, wo)
    mean = float(jnp.mean(s.weight.x))
    assert mean == pytest.approx(1.0, abs=0.01)


def test_oren_nayar_reduces_to_lambert_at_sigma0():
    n = 8
    u1, u2, _ = unis(n, 1)
    wo = vfill(n, 0.2, -0.3, 0.93).normalize()
    wi = vfill(n, -0.5, 0.2, 0.84).normalize()
    f_on = bsdf.matte_f(jnp.float32(1.0), jnp.float32(1e-9), WHITE3(n), wo, wi)
    np.testing.assert_allclose(np.asarray(f_on.x), C.INV_PI, rtol=1e-4)


def test_oren_nayar_energy_below_lambert():
    n = 20000
    u1, u2, _ = unis(n, 2)
    wo = vfill(n, 0.0, 0.0, 1.0)
    sig = jnp.float32(np.deg2rad(20.0))
    s = bsdf.matte_sample(jnp.float32(1.0), sig, WHITE3(n), u1, u2, wo)
    assert float(jnp.mean(s.weight.x)) < 1.0


def test_matte_reciprocity():
    n = 16
    wo = vfill(n, 0.4, 0.1, 0.91).normalize()
    wi = vfill(n, -0.2, 0.6, 0.77).normalize()
    sig = jnp.float32(np.deg2rad(25.0))
    f1 = bsdf.matte_f(jnp.float32(0.8), sig, WHITE3(n), wo, wi)
    f2 = bsdf.matte_f(jnp.float32(0.8), sig, WHITE3(n), wi, wo)
    np.testing.assert_allclose(np.asarray(f1.x), np.asarray(f2.x), rtol=1e-4)


# -- LambertianT (library parity; unreachable from the reference's four
#    material dispatchers, ref bsdf.glsl:21-38) ------------------------------

def test_lambertian_t_transmits_and_conserves():
    """Samples land in the opposite hemisphere; white furnace E[w] = T."""
    n = 50000
    u1, u2, _ = unis(n, 9)
    wo = vfill(n, 0.3, 0.1, 0.94).normalize()
    s = bsdf.lambertian_t_sample(WHITE3(n), u1, u2, wo)
    assert np.all(np.asarray(s.wi.z) < 0)
    assert float(jnp.mean(s.weight.x)) == pytest.approx(1.0, abs=0.01)
    # and from below: transmits upward
    s2 = bsdf.lambertian_t_sample(WHITE3(n), u1, u2, -wo)
    assert np.all(np.asarray(s2.wi.z) > 0)


def test_lambertian_t_f_zero_in_reflection_hemisphere():
    n = 8
    wo = vfill(n, 0.2, -0.3, 0.93).normalize()
    wi_same = vfill(n, -0.5, 0.2, 0.84).normalize()
    wi_opp = vfill(n, -0.5, 0.2, -0.84).normalize()
    f_same = bsdf.lambertian_t_f(WHITE3(n), wo, wi_same)
    f_opp = bsdf.lambertian_t_f(WHITE3(n), wo, wi_opp)
    np.testing.assert_allclose(np.asarray(f_same.x), 0.0)
    np.testing.assert_allclose(np.asarray(f_opp.x), C.INV_PI, rtol=1e-5)
    assert float(bsdf.lambertian_t_pdf(wo, wi_same)[0]) == 0.0
    assert float(bsdf.lambertian_t_pdf(wo, wi_opp)[0]) > 0.0


def test_lambertian_t_pdf_normalized():
    """∫ pdf dω = 1 over the transmission hemisphere (MC, uniform)."""
    n = 200000
    u = jax.random.uniform(jax.random.PRNGKey(10), (2, n))
    z = -u[0]  # lower hemisphere
    r = jnp.sqrt(jnp.maximum(0.0, 1 - z * z))
    phi = 2 * np.pi * u[1]
    wi = Vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)
    wo = vfill(n, 0.0, 0.0, 1.0)
    pdf = bsdf.lambertian_t_pdf(wo, wi)
    integral = float(jnp.mean(pdf) * 2 * np.pi)
    assert integral == pytest.approx(1.0, abs=0.03)


# -- Mirror -----------------------------------------------------------------

def test_mirror_reflects_and_conserves():
    n = 4
    wo = vfill(n, 0.6, -0.2, 0.77).normalize()
    s = bsdf.mirror_sample(jnp.float32(1.0), WHITE3(n), wo)
    np.testing.assert_allclose(np.asarray(s.wi.x), -np.asarray(wo.x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s.wi.z), np.asarray(wo.z), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s.weight.x), 1.0, rtol=1e-5)
    assert bool(s.is_specular[0])


# -- Microfacet distributions ----------------------------------------------

@pytest.mark.parametrize("kind", [C.BECKMANN, C.TROWBRIDGE_REITZ])
def test_distribution_normalization(kind):
    """∫ D(wh) cosθ dω = 1 over the hemisphere."""
    n = 200000
    u = jax.random.uniform(jax.random.PRNGKey(3), (2, n))
    # uniform hemisphere directions, pdf = 1/(2π)
    z = u[0]
    r = jnp.sqrt(jnp.maximum(0.0, 1 - z * z))
    phi = 2 * np.pi * u[1]
    wh = Vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)
    alpha = 0.3
    d = bsdf._distribution_d(wh, jnp.float32(alpha), jnp.float32(alpha), kind)
    integral = float(jnp.mean(d * jnp.abs(wh.z)) * 2 * np.pi)
    assert integral == pytest.approx(1.0, abs=0.05)


@pytest.mark.parametrize("kind", [C.BECKMANN, C.TROWBRIDGE_REITZ])
def test_sample_wh_matches_pdf(kind):
    """Histogram of sampled wh cosθ matches D(wh)|cosθh| marginal."""
    n = 100000
    u1, u2, _ = unis(n, 4)
    wo = vfill(n, 0.0, 0.0, 1.0)
    alpha = jnp.float32(0.4)
    wh = bsdf._sample_wh(u1, u2, alpha, alpha, wo, kind)
    # E[cosθh] from samples vs numeric integral of pdf
    sampled = float(jnp.mean(wh.z))
    # integrate cosθ·D(θ)cosθ·2π sinθ dθ numerically
    theta = np.linspace(1e-4, np.pi / 2 - 1e-4, 2000)
    whg = Vec3(jnp.asarray(np.sin(theta), jnp.float32), jnp.zeros(2000, jnp.float32),
               jnp.asarray(np.cos(theta), jnp.float32))
    d = np.asarray(bsdf._distribution_d(whg, alpha, alpha, kind))
    pdf_theta = d * np.cos(theta) * 2 * np.pi * np.sin(theta)
    expect = np.trapezoid(np.cos(theta) * pdf_theta, theta) / np.trapezoid(pdf_theta, theta)
    assert sampled == pytest.approx(expect, abs=0.02)


# -- Metal ------------------------------------------------------------------

def test_metal_samples_upper_hemisphere():
    n = 10000
    u1, u2, _ = unis(n, 5)
    p = Metal(roughness=0.2).pack()
    wo = vfill(n, 0.2, 0.1, 0.97).normalize()
    s = bsdf.metal_sample(p, WHITE3(n), u1, u2, wo)
    w = np.asarray(s.weight.x)
    wiz = np.asarray(s.wi.z)
    # nonzero weights only in the same hemisphere
    assert np.all(wiz[w > 0] > 0)
    assert np.all(w >= 0)
    assert np.all(np.isfinite(w))


def test_metal_energy_bounded_by_fresnel():
    n = 50000
    u1, u2, _ = unis(n, 6)
    p = Metal(roughness=0.15).pack()
    wo = vfill(n, 0.0, 0.0, 1.0)
    s = bsdf.metal_sample(p, WHITE3(n), u1, u2, wo)
    # reflected energy cannot exceed 1 on average (no G term ⇒ near grazing
    # single samples can exceed; mean at normal incidence must be < 1)
    assert float(jnp.mean(jnp.clip(s.weight.x, 0, 10))) < 1.05


def test_metal_beckmann_branch():
    """Metal(distribution="beckmann") selects the Beckmann sampler end-to-end
    (the scene-static variant plumbing) and produces a valid estimator."""
    n = 50000
    u1, u2, _ = unis(n, 11)
    m = Metal(roughness=0.2, distribution="beckmann")
    assert m.variant == C.BECKMANN
    p = m.pack()
    wo = vfill(n, 0.2, 0.1, 0.97).normalize()
    s = bsdf.metal_sample(p, WHITE3(n), u1, u2, wo, kind=C.BECKMANN)
    w = np.asarray(s.weight.x)
    assert np.all(np.isfinite(w)) and np.all(w >= 0)
    assert np.all(np.asarray(s.wi.z)[w > 0] > 0)
    assert float(jnp.mean(jnp.clip(s.weight.x, 0, 10))) < 1.05
    # genuinely different compiled branch than GGX
    s_ggx = bsdf.metal_sample(p, WHITE3(n), u1, u2, wo, kind=C.TROWBRIDGE_REITZ)
    assert not np.allclose(np.asarray(s.wi.z), np.asarray(s_ggx.wi.z))


def test_metal_beckmann_scene_renders_finite():
    """Scene packing carries the distribution variant into the integrator."""
    import sail_tpu as sail
    from sail_tpu.core.camera import generate_rays
    from sail_tpu.core.rng import pixel_noise
    from sail_tpu.render.integrator import trace_rays

    scene = sail.Scene()
    scene.add(sail.Camera([0.0, 0.0, -2.5], [0.0, 0.0, 0.0]))
    scene.add(sail.Cornellbox([-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]))
    scene.add(sail.Sphere([0.0, -0.4, 0.0], 0.45,
                          sail.Metal(roughness=0.3, distribution="beckmann")))
    scene.add(sail.AreaLight(
        sail.Rectangle([-0.3, 0.98, -0.3], [0.3, 0.98, 0.3]), [5.0, 5.0, 5.0]))
    packed, static = scene.pack()
    assert static.material_variants[1] == C.BECKMANN
    ro, rd = generate_rays(packed.camera, 8, 8)
    res = trace_rays(packed, static, ro, rd, pixel_noise(0, 0, (8, 8)),
                     max_bounces=2)
    for a in (res.color.x, res.color.y, res.color.z):
        arr = np.asarray(a)
        assert np.isfinite(arr).all() and (arr >= 0).all()


# -- Glass ------------------------------------------------------------------

def test_smooth_glass_energy_conservation():
    """Reflection + transmission weights average to ~1 for kr=kt=1."""
    n = 100000
    _, _, ul = unis(n, 7)
    p = Glass(eta=1.5).pack()
    wo = vfill(n, 0.3, 0.0, 0.954).normalize()
    into = jnp.ones((n,), bool)
    s = bsdf.glass_sample(p, WHITE3(n), ul, ul, ul, wo, into)
    # transport-corrected: E[w] = F·1 + (1-F)·(1/1.5²)·... relative radiance
    w = np.asarray(s.weight.x)
    assert np.all(np.isfinite(w))
    assert np.all(w >= 0)
    ci = float(wo.z[0])
    f = float(bsdf.fr_dielectric(jnp.float32(ci), 1.0, 1.5))
    expect = f * 1.0 + (1 - f) * (1 / 1.5) ** 2
    assert float(np.mean(w)) == pytest.approx(expect, abs=0.02)


def test_smooth_glass_refracts_by_snell():
    n = 4
    p = Glass(eta=1.5).pack()
    ang = np.pi / 6
    wo = vfill(n, np.sin(ang), 0.0, np.cos(ang))
    into = jnp.ones((n,), bool)
    ul = jnp.ones((n,)) * 0.999  # force transmission branch
    s = bsdf.glass_sample(p, WHITE3(n), ul * 0, ul * 0, ul, wo, into)
    sin_t = np.sin(ang) / 1.5
    np.testing.assert_allclose(np.asarray(s.wi.x), -sin_t, rtol=1e-4)
    assert np.all(np.asarray(s.wi.z) < 0)  # crossed the interface


def test_rough_glass_finite():
    n = 10000
    u1, u2, ul = unis(n, 8)
    p = Glass(eta=1.5, uroughness=0.2, vroughness=0.2).pack()
    wo = vfill(n, 0.2, -0.1, 0.97).normalize()
    into = jnp.ones((n,), bool)
    s = bsdf.glass_sample(p, WHITE3(n), u1, u2, ul, wo, into)
    w = np.asarray(s.weight.x)
    assert np.all(np.isfinite(w))
    assert np.all(w >= 0)
