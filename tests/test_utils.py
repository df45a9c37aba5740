"""Utils: image IO (native + fallback), metrics, RNG statistical quality."""
import os
import struct
import zlib

import numpy as np
import pytest

from sail_tpu.utils import imageio
from sail_tpu.utils.metrics import RenderMeter, rays_per_sample


def decode_png_rgb(data: bytes) -> np.ndarray:
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h = struct.unpack(">II", body[:8])
            assert body[8] == 8 and body[9] == 2  # RGB8
        elif tag == b"IDAT":
            idat += body
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    rows = []
    prev = np.zeros(w * 3, np.uint8)
    for y in range(h):
        filt = raw[y * stride]
        row = np.frombuffer(raw[y * stride + 1:(y + 1) * stride], np.uint8)
        assert filt == 0, "only filter 0 expected"
        rows.append(row)
        prev = row
    return np.stack(rows).reshape(h, w, 3)


def test_png_roundtrip_python():
    img = np.random.RandomState(0).rand(16, 24, 3).astype(np.float32)
    u8 = imageio.to_uint8(img)
    data = imageio._png_bytes_py(u8)
    out = decode_png_rgb(data)
    np.testing.assert_array_equal(out, u8)


def test_png_native_matches_python():
    from sail_tpu.utils import native
    if not native.available():
        pytest.skip("native codec not built")
    img = np.random.RandomState(1).rand(32, 32, 3).astype(np.float32)
    a = decode_png_rgb(native.png_bytes(img))
    b = imageio.to_uint8(img)
    # LUT quantization: ≤ 3/255 difference
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 3


def test_ppm_writer(tmp_path):
    img = np.random.RandomState(2).rand(8, 8, 3)
    path = str(tmp_path / "x.ppm")
    imageio.write_ppm(path, img)
    data = open(path, "rb").read()
    assert data.startswith(b"P6\n8 8\n255\n")
    assert len(data) == len(b"P6\n8 8\n255\n") + 8 * 8 * 3


def test_render_meter():
    m = RenderMeter(64, 64, 5)
    m.start()
    m.stop(samples=2)
    assert m.total_rays == rays_per_sample(64, 64, 5) * 2
    rep = m.report()
    assert rep["samples"] == 2 and rep["mrays_per_s"] > 0


def test_rng_statistics():
    """PCG3D per-pixel streams: uniformity + independence."""
    from sail_tpu.core import rng
    n = rng.pixel_noise(7, 3, (128, 128))
    u1, u2, u3 = n.uniform3(2, rng.TAG_BSDF)
    for u in (u1, u2, u3):
        a = np.asarray(u).ravel()
        assert 0.49 < a.mean() < 0.51
        assert 0.283 < a.std() < 0.295  # uniform std = 1/sqrt(12) ≈ 0.2887
    # no correlation between the three outputs
    assert abs(np.corrcoef(np.ravel(u1), np.ravel(u2))[0, 1]) < 0.02
    assert abs(np.corrcoef(np.ravel(u1), np.ravel(u3))[0, 1]) < 0.02
    # adjacent pixels uncorrelated
    a = np.asarray(u1)
    assert abs(np.corrcoef(a[:, :-1].ravel(), a[:, 1:].ravel())[0, 1]) < 0.02
    # stream separation: different bounce/tag give different fields
    v1, _, _ = n.uniform3(3, rng.TAG_BSDF)
    w1, _, _ = n.uniform3(2, rng.TAG_LIGHT_U)
    assert not np.allclose(np.asarray(u1), np.asarray(v1))
    assert not np.allclose(np.asarray(u1), np.asarray(w1))


def test_rng_layout_invariance_of_tiles():
    """A tile's uniforms equal the same rows of the full-image field."""
    from sail_tpu.core import rng
    import jax.numpy as jnp
    full = rng.pixel_noise(0, 5, (32, 16))
    fu, _, _ = full.uniform3(1, rng.TAG_BSDF)
    ii = jnp.broadcast_to(jnp.arange(8, 16, dtype=jnp.int32)[:, None], (8, 16))
    jj = jnp.broadcast_to(jnp.arange(16, dtype=jnp.int32)[None, :], (8, 16))
    tile = rng.PixelNoise(full.seed, full.sample, ii, jj)
    tu, _, _ = tile.uniform3(1, rng.TAG_BSDF)
    np.testing.assert_array_equal(np.asarray(fu)[8:16], np.asarray(tu))


def test_opcount_integrator():
    """The jaxpr op counter (utils/opcount) behind bench.py's
    detail.vpu_ops: counts are positive, weighted >= raw, and every
    primitive in the flagship integrator trace is in the cost table
    (an unknown primitive would silently distort the roofline)."""
    import jax

    from sail_tpu import scenes
    from sail_tpu.utils import opcount

    packed, static = scenes.cornell_mirror().pack()
    w, raw = opcount.integrator_ops_per_lane(packed, static, 2)
    assert raw > 500            # two bounces of real work
    assert w >= raw
    # direct check for unknowns on the same trace
    import jax.numpy as jnp

    from sail_tpu.core import rng as rng_mod
    from sail_tpu.core.camera import rays_for_pixels
    from sail_tpu.core.rng import PixelNoise
    from sail_tpu.render.integrator import trace_rays

    ii = jnp.zeros((8, 128), jnp.int32)
    jj = jnp.zeros((8, 128), jnp.int32)

    def one(pk):
        noise = PixelNoise(jnp.int32(0), jnp.int32(0), ii, jj)
        jx, jy, _ = noise.uniform3(0, rng_mod.TAG_PIXEL_JITTER)
        ro, rd = rays_for_pixels(pk.camera, ii.astype(jnp.float32),
                                 jj.astype(jnp.float32), 8, 128, jx, jy)
        return trace_rays(pk, static, ro, rd, noise, 2).color.stack()

    unknown = {}
    opcount.count_jaxpr(jax.make_jaxpr(one)(packed), unknown=unknown)
    assert unknown == {}, unknown


def test_sanitize_check_finite_and_bit_equal():
    import jax.numpy as jnp
    import pytest as _pytest

    from sail_tpu.utils.sanitize import (assert_trees_bit_equal,
                                         check_finite)

    good = {"a": jnp.ones(4), "b": (jnp.zeros(2), jnp.float32(1.0))}
    assert check_finite(good) == []
    bad = {"a": jnp.array([1.0, jnp.nan])}
    with _pytest.raises(FloatingPointError):
        check_finite(bad, "grads")
    assert len(check_finite(bad, raise_error=False)) == 1

    assert_trees_bit_equal(good, good)
    with _pytest.raises(AssertionError):
        assert_trees_bit_equal({"a": jnp.ones(3)}, {"a": jnp.zeros(3)})
