"""Pallas megakernel parity vs the XLA integrator (interpreter mode on CPU;
the same comparison runs compiled on the real chip — see CLAUDE.md)."""
import jax
import numpy as np
import pytest

from sail_tpu import scenes
from sail_tpu.ops.pallas.megakernel import render_block_pallas
from sail_tpu.render.integrator import render_image


@pytest.mark.parametrize("scene_fn", [scenes.cornell_matte,
                                      scenes.cornell_mirror])
def test_megakernel_matches_xla(scene_fn):
    scene = scene_fn()
    packed, static = scene.pack()
    H = W = 8
    spp = 1
    a = np.asarray(render_block_pallas(packed, static, H, W, spp, 0, 0,
                                       max_bounces=2, tile_rows=8,
                                       interpret=True).stack()) / spp
    b = np.asarray(render_image(packed, static, H, W, spp, seed=0,
                                max_bounces=2).stack())
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_megakernel_custom_vjp_grads():
    from sail_tpu.ops.pallas.megakernel import render_image_fast
    import jax.numpy as jnp

    scene = scenes.cornell_matte()
    packed, static = scene.pack()

    def loss(p):
        # interpreter-mode pallas is slow; tiny image, 1 bounce
        img = render_image_fast(p, 0, static, 8, 8, 1, 1)
        return jnp.mean(img.x + img.y + img.z)

    # forward AND backward run the pallas megakernels (interpret on CPU)
    g = jax.grad(lambda p: loss(p))(packed)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_early_exit_bit_identical():
    """trace_rays(early_exit=True) skips all-dead bounces via lax.cond —
    results must be BIT-identical to the masked full-depth loop, on both an
    open scene (lanes actually die) and a closed one (cond always taken)."""
    import jax.numpy as jnp

    from sail_tpu.core import rng
    from sail_tpu.core.camera import rays_for_pixels
    from sail_tpu.render.integrator import trace_rays

    for scene_fn in (scenes.material_demo_open, scenes.cornell_mirror):
        packed, static = scene_fn().pack()
        h = w = 8
        ii = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None], (h, w))
        jj = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (h, w))
        noise = rng.pixel_noise(0, 0, ii=ii, jj=jj)
        jx, jy, _ = noise.uniform3(0, rng.TAG_PIXEL_JITTER)
        ro, rd = rays_for_pixels(packed.camera, ii.astype(jnp.float32),
                                 jj.astype(jnp.float32), h, w, jx, jy)
        a = trace_rays(packed, static, ro, rd, noise, 4, early_exit=False)
        b = trace_rays(packed, static, ro, rd, noise, 4, early_exit=True)
        for x, y in zip(jax.tree.leaves(a.color), jax.tree.leaves(b.color)):
            assert (np.asarray(x) == np.asarray(y)).all()
