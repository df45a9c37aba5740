"""Pallas backward megakernel: gradient parity with the XLA integrator.

The backward kernel re-traces each sample's paths inside VMEM (per-bounce
remat) and accumulates parameter gradients across the sequential TPU grid.
On CPU it runs in interpret mode.  Kept at 1 bounce / 1 spp: XLA *CPU*
compiles of deeper reverse-mode modules are pathologically slow (>10 min),
while TPU compiles are fine — full-depth parity runs on-chip (bench.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sail_tpu import scenes
from sail_tpu.core.vecmath import Vec3
from sail_tpu.ops.pallas.megakernel import render_grad_block_pallas
from sail_tpu.render.integrator import render_sample

H = W = 8
BOUNCES = 1


def test_pallas_backward_matches_xla_grads():
    packed, static = scenes.cornell_mirror().pack()

    def loss(p):
        res = render_sample(p, static, H, W, 0, 0, max_bounces=BOUNCES)
        c = res.color
        return jnp.sum(c.x * 0.3 + c.y * 0.5 + c.z * 0.2)

    g_xla = jax.grad(loss)(packed)  # eager: avoids the slow CPU jit

    g = Vec3(jnp.full((H, W), 0.3), jnp.full((H, W), 0.5),
             jnp.full((H, W), 0.2))
    g_pal = render_grad_block_pallas(packed, static, g, H, W, 1, 0, 0,
                                     max_bounces=BOUNCES,
                                     tile_rows=8, tile_cols=8)

    for a, b in zip(jax.tree.leaves(g_xla), jax.tree.leaves(g_pal)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_pallas_backward_multi_tile_accumulation():
    """Gradients must be identical whether the image is one tile or four:
    the sequential-grid accumulation can't double-count or miss tiles."""
    packed, static = scenes.cornell_matte().pack()
    g = Vec3(jnp.ones((H, W)), jnp.ones((H, W)), jnp.ones((H, W)))
    one = render_grad_block_pallas(packed, static, g, H, W, 1, 0, 0,
                                   max_bounces=BOUNCES,
                                   tile_rows=8, tile_cols=8)
    four = render_grad_block_pallas(packed, static, g, H, W, 1, 0, 0,
                                    max_bounces=BOUNCES,
                                    tile_rows=4, tile_cols=4)
    for a, b in zip(jax.tree.leaves(one), jax.tree.leaves(four)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_backward_open_scene():
    """Multi-bounce grads on an OPEN scene: sky lanes die after bounce 0
    and the masked adjoint must keep their cotangents at exactly zero
    (grads match interior AD; finite everywhere).  The round-2 lax.cond
    early-exit variant of this path produced NaNs and was removed —
    this pins the one remaining (masked) code path.  Marked slow: the
    interpret-mode in-kernel adjoint at 2 bounces costs minutes on CPU."""
    packed, static = scenes.material_demo_open().pack()
    h = w = 4
    bounces = 2

    def loss(p):
        res = render_sample(p, static, h, w, 0, 0, max_bounces=bounces)
        c = res.color
        return jnp.sum(c.x + c.y + c.z)

    g_xla = jax.grad(loss)(packed)  # eager
    g = Vec3(jnp.ones((h, w)), jnp.ones((h, w)), jnp.ones((h, w)))
    g_pal = render_grad_block_pallas(packed, static, g, h, w, 1, 0, 0,
                                     max_bounces=bounces,
                                     tile_rows=4, tile_cols=4)
    for a, b in zip(jax.tree.leaves(g_xla), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
