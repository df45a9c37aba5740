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


def test_early_exit_default_off_and_allclose():
    """early_exit is OPT-IN (default False keeps the production kernels
    bit-equal to the XLA integrator).  When enabled, skipping all-dead
    bounces via lax.cond is mathematically exact but not bitwise: the cond
    perturbs XLA fusion by a few ulp even on always-taken branches — so the
    contract is tight allclose, on both an open scene (lanes actually die)
    and a closed one (cond always taken)."""
    import inspect

    import jax.numpy as jnp

    from sail_tpu.core import rng
    from sail_tpu.core.camera import rays_for_pixels
    from sail_tpu.ops.pallas import megakernel as mk
    from sail_tpu.render.integrator import trace_rays

    # the production entry points must default to the bit-exact masked loop
    # (the backward kernel has no early-exit at all — see megakernel.py)
    for fn in (trace_rays, mk.render_block_pallas, mk._trace_tile):
        assert inspect.signature(fn).parameters["early_exit"].default is False
    assert "early_exit" not in inspect.signature(
        mk.render_grad_block_pallas).parameters

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
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-5)


def test_megakernel_batched_fold_and_cull_match_xla():
    """A >=BATCH_THRESHOLD same-category scene exercises the BATCHED
    fori_loop fold INSIDE the kernel (r5: the static row tables must not
    materialize as captured constant arrays, and the per-step param pick
    must avoid dynamic_slice — both unsupported by Mosaic; this test plus
    the on-chip parity run in tools guard the Mosaic-legal encodings).
    The per-tile AABB cull must be exact: a culled object cannot change
    the fold."""
    import sail_tpu as sail

    scene = sail.Scene()
    scene.add(sail.Camera((0.0, 0.0, -2.5), (0.0, 0.0, 0.0)))
    scene.add(sail.Cornellbox((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)))
    for k in range(9):
        x = -0.7 + 0.7 * (k % 3)
        y = -0.7 + 0.7 * (k // 3)
        scene.add(sail.Sphere((x, y, 0.3), 0.22, sail.Matte(kd=0.8)))
    scene.add(sail.AreaLight(
        sail.Rectangle((-0.3, 0.98, -0.3), (0.3, 0.98, 0.3), sail.Matte()),
        (5.0, 5.0, 5.0)))
    packed, static = scene.pack()
    H = W = 16
    b = np.asarray(render_image(packed, static, H, W, 1, seed=0,
                                max_bounces=2).stack())
    a = np.asarray(render_block_pallas(packed, static, H, W, 1, 0, 0,
                                       max_bounces=2, tile_rows=8,
                                       interpret=True).stack())
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
    c = np.asarray(render_block_pallas(packed, static, H, W, 1, 0, 0,
                                       max_bounces=2, tile_rows=8,
                                       tile_cols=8, cull=True,
                                       interpret=True).stack())
    np.testing.assert_allclose(c, b, atol=1e-5, rtol=1e-5)
