"""On-chip determinism / race check (SURVEY.md §5 "race detection").

A SIMD path tracer's race-condition analog is nondeterminism: accumulation
order, RNG stream collisions, or unsynchronized grid writes would show up
as bit-level differences between repeated or re-sharded runs.  The
framework's invariants make all of that checkable exactly:

  1. repeat     — the same dispatch twice must be BIT-IDENTICAL (counter
                  RNG + deterministic accumulation; any on-chip race in
                  the megakernel's sequential-grid accumulation would
                  break this).
  2. chunking   — one 8-spp dispatch vs two 4-spp dispatches summed: NOT
                  bit-identical BY DESIGN (the kernel folds samples
                  sequentially; re-chunking re-associates the f32 sum —
                  measured 247k/786k values differing at ~ulp scale), so
                  the check is tight allclose + a repeatability check of
                  the chunked sum itself.  The elastic bit-identity
                  contract is the different, stronger one the tests pin:
                  FIXED chunks are bit-stable across mesh shrinks.
  3. tiling     — different Pallas tile shapes must be bit-identical
                  (lanes never interact; a cross-tile race would differ).
  4. grad_repeat— the Pallas backward twice: parameter gradients
                  accumulate across the sequential grid into one block —
                  the classic data-race spot — must be bit-identical.

Writes DETERMINISM_r05.json.  Run:
    PYTHONPATH=/root/repo python tools/determinism_check.py
"""
import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--bounces", type=int, default=3)
    ap.add_argument("--out", default="DETERMINISM_r05.json")
    args = ap.parse_args()

    from sail_tpu import scenes
    from sail_tpu.core.vecmath import Vec3
    from sail_tpu.ops.pallas.megakernel import (render_block_pallas,
                                                render_grad_block_pallas)

    t0 = time.time()
    packed, static = scenes.cornell_mirror().pack()
    H = W = args.size
    out = {"device": str(jax.devices()[0]),
           "config": f"{H}x{W} x{args.spp}spp x{args.bounces}b"}

    def render(spp, sample0=0, tile_cols=None):
        f = jax.jit(lambda p, s0: render_block_pallas(
            p, static, H, W, spp, 0, s0, max_bounces=args.bounces,
            tile_cols=tile_cols))
        img = f(packed, jnp.int32(sample0))
        return np.asarray(img.stack())

    def bitcmp(a, b):
        return bool((a == b).all()), int((a != b).sum())

    # 1. repeat
    a = render(args.spp)
    b = render(args.spp)
    eq, n = bitcmp(a, b)
    out["repeat_bit_identical"] = eq
    out["repeat_mismatched_values"] = n

    # 2. chunking: spp split across dispatches — allclose (re-chunking
    # re-associates the f32 sample sum) + bit-repeatability of the
    # chunked sum (the actual race check)
    half = args.spp // 2
    c = render(half, 0) + render(half, half)
    c2 = render(half, 0) + render(half, half)
    md = float(np.abs(a - c).max() / max(np.abs(a).max(), 1e-9))
    out["chunking_allclose_rel"] = md
    out["chunking_allclose_pass"] = bool(md < 1e-5)
    eq, n = bitcmp(c, c2)
    out["chunking_repeat_bit_identical"] = eq
    out["chunking_repeat_mismatched_values"] = n

    # 3. tiling
    d = render(args.spp, tile_cols=128)
    eq, n = bitcmp(a, d)
    out["tiling_bit_identical"] = eq
    out["tiling_mismatched_values"] = n

    # 4. backward repeat (sequential-grid gradient accumulation)
    g1 = jnp.full((H, W), 1.0 / (H * W), jnp.float32)
    g = Vec3(g1, g1, g1)

    def grad():
        dp = jax.jit(lambda p: render_grad_block_pallas(
            p, static, g, H, W, args.spp, 0, 0,
            max_bounces=args.bounces))(packed)
        return np.concatenate([np.ravel(l) for l in jax.tree.leaves(dp)])

    ga, gb = grad(), grad()
    eq, n = bitcmp(ga, gb)
    out["grad_repeat_bit_identical"] = eq
    out["grad_repeat_mismatched_values"] = n

    out["all_pass"] = (all(out[k] for k in out if k.endswith("identical"))
                       and out["chunking_allclose_pass"])
    out["seconds_total"] = round(time.time() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
