"""On-chip correctness checks — Pallas vs XLA on REAL TPU hardware.

The CPU test suite runs the Pallas kernels in interpreter mode; this script
is the committed, reproducible command exercising the actual Mosaic
lowerings (VERDICT r1 item 6).  Prints ONE JSON line; recorded in
BASELINE.md.

    PYTHONPATH=/root/repo python tools/tpu_checks.py [--size 128 --spp 2]

Checks:
  1. forward bit-equality: Pallas megakernel == XLA integrator (identical
     math traced into both — any Mosaic lowering divergence shows up here)
  2. gradient parity: Pallas backward megakernel vs jax.grad of the XLA
     integrator (relative L-inf over all parameter cotangents)
  3. sharded path on a 1-device ("tile","spp") mesh == single-chip render
     (exercises render_tile_fast + the shard_map vma plumbing on-chip)
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--bounces", type=int, default=5)
    args = ap.parse_args()

    from sail_tpu import scenes
    from sail_tpu.ops.pallas.megakernel import (render_block_pallas,
                                                render_grad_block_pallas)
    from sail_tpu.parallel.mesh import make_mesh
    from sail_tpu.parallel.render_sharded import render_sharded
    from sail_tpu.render.integrator import render_image, render_sample
    from sail_tpu.core.vecmath import Vec3

    assert jax.default_backend() != "cpu", (
        "tpu_checks must run on the real chip; on CPU the kernels fall back "
        "to interpret mode and prove nothing about Mosaic")

    h = w = args.size
    spp, bounces = args.spp, args.bounces
    packed, static = scenes.cornell_mirror().pack()
    t0 = time.time()

    # 1. forward bit-equality --------------------------------------------
    a = jax.jit(lambda p: render_block_pallas(
        p, static, h, w, spp, 0, 0, max_bounces=bounces))(packed)
    b = jax.jit(lambda p: render_image(
        p, static, h, w, spp, seed=0, max_bounces=bounces))(packed)
    a_np = np.asarray((a * (1.0 / spp)).stack())
    b_np = np.asarray(b.stack())
    fwd_bits_equal = bool((a_np == b_np).all())
    fwd_max_diff = float(np.abs(a_np - b_np).max())

    # 2. gradient parity ---------------------------------------------------
    gh = gw = min(args.size, 64)  # grads at a smaller block: XLA remat path

    def loss_xla(p):
        res = jax.checkpoint(
            lambda p, i: render_sample(p, static, gh, gw, 0, i,
                                       max_bounces=bounces).color)(p, 0)
        return jnp.mean(res.x + res.y + res.z)

    g_xla = jax.jit(jax.grad(loss_xla))(packed)
    # loss = mean over PIXELS of (x+y+z): the per-channel adjoint is
    # 1/(gh*gw) — NOT 1/(gh*gw*3); with the wrong scale every leaf of the
    # (linear-in-g) Pallas backward comes out exactly 1/3 of XLA's
    gv = Vec3(*(jnp.full((gh, gw), 1.0 / (gh * gw)),) * 3)
    g_pal = jax.jit(lambda p: render_grad_block_pallas(
        p, static, gv, gh, gw, 1, 0, 0, max_bounces=bounces))(packed)
    xa = np.array([float(x) for x in jax.tree.leaves(g_xla)])
    xb = np.array([float(x) for x in jax.tree.leaves(g_pal)])
    denom = max(float(np.abs(xa).max()), 1e-12)
    grad_rel_err = float(np.abs(xa - xb).max()) / denom

    # 3. sharded path on a 1-device mesh -----------------------------------
    mesh = make_mesh(1)
    s = render_sharded(packed, static, mesh, h, w, spp, seed=0,
                       max_bounces=bounces)
    s_np = np.asarray(s.stack())
    sharded_bits_equal = bool((s_np == a_np).all())
    sharded_max_diff = float(np.abs(s_np - a_np).max())

    # 4. sharded GRADIENTS (check_vma=True end-to-end through the backward
    #    pallas kernel's vma plumbing) --------------------------------------
    from sail_tpu.parallel.render_sharded import sharded_loss

    target = Vec3(jnp.zeros((gh, gw)), jnp.zeros((gh, gw)),
                  jnp.zeros((gh, gw)))
    gmesh = make_mesh(1)
    g_sh = jax.jit(jax.grad(lambda p: sharded_loss(
        p, target, static, gmesh, gh, gw, 1, 0, bounces)))(packed)

    def loss_plain(p):
        img = render_image(p, static, gh, gw, 1, seed=0,
                           max_bounces=bounces)
        return (jnp.sum(img.x ** 2) + jnp.sum(img.y ** 2) +
                jnp.sum(img.z ** 2)) / (gh * gw * 3)

    g_pl = jax.jit(jax.grad(loss_plain))(packed)
    ya = np.array([float(x) for x in jax.tree.leaves(g_pl)])
    yb = np.array([float(x) for x in jax.tree.leaves(g_sh)])
    sharded_grad_rel = (float(np.abs(ya - yb).max())
                        / max(float(np.abs(ya).max()), 1e-12))

    ok = (fwd_bits_equal and grad_rel_err < 1e-5
          and sharded_max_diff < 1e-6 and sharded_grad_rel < 1e-4)
    print(json.dumps({
        "metric": "on-chip pallas-vs-xla checks",
        "value": 1 if ok else 0,
        "unit": "pass",
        "ok": ok,
        "fwd_bits_equal": fwd_bits_equal,
        "fwd_max_abs_diff": fwd_max_diff,
        "grad_rel_linf": grad_rel_err,
        "sharded_bits_equal": sharded_bits_equal,
        "sharded_max_abs_diff": sharded_max_diff,
        "sharded_grad_rel_linf": sharded_grad_rel,
        "check_vma": True,
        "config": f"{h}x{w} x{spp}spp x{bounces}b (grads {gh}x{gw})",
        "device": str(jax.devices()[0]),
        "seconds_total": round(time.time() - t0, 1),
    }))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
