"""Per-bounce ray-occupancy study — the measurement behind the compaction
decision (docs/OCCUPANCY.md, VERDICT r1 item 2).

The reference's megakernel lets dead lanes idle past the `break`
(ref: /root/reference/src/shader/trace/path.glsl:22); SURVEY.md §2.5 proposed
per-bounce device-local compaction as the wavefront upgrade.  Whether that is
worth anything on TPU depends entirely on how many lanes actually die — this
script measures it on the benchmark configs.

Usage:  python tools/occupancy_study.py [--size 128] [--spp 4]
Prints one line per scene with alive%% and weak%% (throughput < 1e-2) per
bounce, plus the implied upper bound on compaction speedup
(= total_bounce_work / alive_bounce_work).
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--platform", default="cpu",
                    help="occupancy is hardware-independent; cpu avoids "
                         "minutes of TPU compiles")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from sail_tpu import scenes
    from sail_tpu.core import rng
    from sail_tpu.core.camera import rays_for_pixels
    from sail_tpu.render.integrator import alive_fractions

    configs = [
        ("config2_cornell_mirror", scenes.cornell_mirror()),
        ("config3_material_demo", scenes.material_demo()),
        ("config4_lights_quadrics", scenes.lights_and_quadrics()),
        ("open_material_demo", scenes.material_demo_open()),
    ]

    h = w = args.size
    results = {}
    import numpy as np

    from sail_tpu.core.vecmath import Vec3
    from sail_tpu.render.integrator import _PathState, _bounce_step

    for name, scene in configs:
        packed, static = scene.pack()

        # EAGER (no jit): a jitted variant of this loop — whether it
        # returns fractions or stacked masks — cold-compiles for 10-70 min
        # per scene on XLA CPU at 256^2 (measured r4), while eager runs in
        # ~a minute per scene.  Occupancy is an offline study; eager wins.
        def sample_masks(packed, s, weak_threshold=1e-2):
            ii = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None],
                                  (h, w))
            jj = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :],
                                  (h, w))
            noise = rng.pixel_noise(0, s, ii=ii, jj=jj)
            jx, jy, _ = noise.uniform3(0, rng.TAG_PIXEL_JITTER)
            ro, rd = rays_for_pixels(packed.camera, ii.astype(jnp.float32),
                                     jj.astype(jnp.float32), h, w, jx, jy)
            zero = jnp.zeros((h, w), jnp.float32)
            black = Vec3(zero, zero, zero)
            ones = Vec3(zero + 1.0, zero + 1.0, zero + 1.0)
            st = _PathState(ro, rd, black, ones, jnp.ones((h, w), bool),
                            jnp.zeros((h, w), bool), black, black)
            am, wm = [], []
            for b in range(args.bounces):
                st = _bounce_step(packed, st, noise, static=static,
                                  bounce=b, clamp_weight=True)
                am.append(np.asarray(st.alive))
                tp = np.asarray(st.throughput.max_component())
                wm.append(am[-1] & (tp < weak_threshold))
            return np.stack(am), np.stack(wm)

        masks_np = []
        alive_acc = np.zeros((args.bounces,))
        weak_acc = np.zeros((args.bounces,))
        for s in range(args.spp):
            am, wm = sample_masks(packed, s)
            masks_np.append(am)
            alive_acc += am.mean(axis=(1, 2))
            weak_acc += wm.mean(axis=(1, 2))
        alive = [float(v) / args.spp for v in alive_acc]
        weak = [float(v) / args.spp for v in weak_acc]
        # lanes doing useful work at bounce b = alive after bounce b-1
        # (bounce 0 is always 100% — primary rays)
        useful = [1.0] + alive[:-1]
        bound = args.bounces / sum(useful)
        useful_rr = [1.0] + [max(a - wq, 0.0) for a, wq in
                             zip(alive[:-1], weak[:-1])]
        bound_rr = args.bounces / sum(useful_rr)
        print(f"{name}: alive%={['%.1f' % (100*v) for v in alive]} "
              f"weak%={['%.1f' % (100*v) for v in weak]} "
              f"perfect-compaction speedup bound={bound:.3f}x "
              f"(+RR: {bound_rr:.3f}x)")
        results[name] = {
            "alive_pct": [round(100 * v, 1) for v in alive],
            "weak_pct": [round(100 * v, 1) for v in weak],
            "perfect_compaction_bound": round(bound, 3),
            "with_rr_bound": round(bound_rr, 3),
        }

        # ---- TILE-level bound: what the megakernel's per-tile bounce
        # early-exit could capture at best.  A tile does bounce b+1's work
        # iff ANY of its lanes is alive after bounce b — so the achievable
        # speedup is bounded by tile coherence, far below the per-lane
        # oracle (dead lanes inside a live tile still ride along).  This is
        # the honest ceiling for the implemented early_exit
        # (PROFILE_r04.json open_scene measures what it actually captures).
        tile_bounds = {}
        for tc in (128, 256, 512):
            tcc = min(tc, w)
            useful_t = [1.0]
            for b in range(args.bounces - 1):
                acc = 0.0
                for m in masks_np:
                    tiles = m[b].reshape(h // 8, 8, w // tcc, tcc)
                    acc += float(tiles.any(axis=(1, 3)).mean())
                useful_t.append(acc / args.spp)
            tile_bounds[f"8x{tcc}"] = round(args.bounces / sum(useful_t), 3)
        results[name]["tile_early_exit_bounds"] = tile_bounds
        print(f"  tile-level early-exit bounds: {tile_bounds}")

    import json
    print(json.dumps({
        "metric": "per-bounce ray occupancy / compaction bound",
        "config": f"{h}x{w} x{args.spp}spp x{args.bounces}b",
        "device": str(jax.devices()[0]),
        "scenes": results,
    }))


if __name__ == "__main__":
    main()
