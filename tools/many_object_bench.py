"""Many-object scaling benchmark (VERDICT r2 missing #4).

Measures COMPILE time and per-frame render time of the forward integrator
as the object count grows, for the static unrolled fold vs the batched
fori_loop fold (ops/intersect.py), with the per-object AABB cull on the
batched path.  The claim under test:

  - unrolled: compile time grows ~linearly with object count (one fused
    kernel chain per object);
  - batched: compile time ~flat (one fori_loop body per category), and
    with the cull the per-frame cost grows sub-linearly for spatially
    localized objects (most tiles cull most objects).

Run on the real chip and commit the JSON:

    PYTHONPATH=/root/repo python tools/many_object_bench.py \
        > MANYOBJ_r03.json

CPU smoke: add --platform cpu --size 64 --spp 2.
"""
import argparse
import json
import time


def build_scene(n_spheres: int):
    import sail_tpu as sail

    scene = sail.Scene()
    scene.add(sail.Camera((0.0, 0.0, -2.5), (0.0, 0.0, 0.0)))
    scene.add(sail.Cornellbox((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)))
    # grid of small spheres: spatially localized, so the AABB cull has
    # something to cull (each image tile sees a few spheres, not all)
    import math
    side = max(1, int(math.ceil(math.sqrt(n_spheres))))
    for k in range(n_spheres):
        x = -0.85 + 1.7 * (k % side) / max(1, side - 1)
        y = -0.85 + 1.7 * (k // side) / max(1, side - 1)
        scene.add(sail.Sphere((x, y, 0.3), 0.75 / side,
                              sail.Matte(kd=0.8)))
    scene.add(sail.AreaLight(
        sail.Rectangle((-0.3, 0.98, -0.3), (0.3, 0.98, 0.3), sail.Matte()),
        (5.0, 5.0, 5.0)))
    return scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--bounces", type=int, default=3)
    ap.add_argument("--counts", default="4,16,64")
    ap.add_argument("--tile-cols", type=int, default=128,
                    help="megakernel tile width for the pallas modes "
                         "(narrow tiles localize better for the cull)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from sail_tpu.ops import intersect as isect
    from sail_tpu.render.integrator import render_image

    from sail_tpu.ops.pallas.megakernel import render_block_pallas

    h = w = args.size
    counts = [int(c) for c in args.counts.split(",")]
    tile_cols = args.tile_cols
    rows = []
    for n in counts:
        scene = build_scene(n)
        packed, static = scene.pack()
        row = {"n_spheres": n}
        for mode in ("unrolled", "batched", "batched_cull",
                     "pallas", "pallas_cull"):
            isect.BATCH_THRESHOLD = 10 ** 9 if mode == "unrolled" else 8
            if mode == "unrolled" and n > 64:
                row[mode] = None  # unrolled compile explodes; skip
                continue
            cull = mode.endswith("_cull")

            if mode.startswith("pallas"):
                # In-kernel path (r5): the winner-fold runs PYTHON-
                # UNROLLED inside the megakernel (intersect.IN_KERNEL_
                # TRACE) — direct scalar params, no fori+dynamic-pick
                # (the pick's cross-lane reduces measured 1.6x slower
                # than XLA at 16 spheres).  pallas_cull adds CLUSTER-
                # level AABB conds (8 objects per cond): measured a NET
                # LOSS at <=64 objects (cond cost inside the spp/bounce
                # loops dominates the skipped quadratics) — kept opt-in
                # and benchmarked honestly here.
                def impl(p, seed, cull=cull):
                    img = render_block_pallas(
                        p, static, h, w, args.spp, seed, 0,
                        max_bounces=args.bounces, tile_rows=8,
                        tile_cols=tile_cols, cull=cull)
                    return img.x.sum() + img.y.sum() + img.z.sum()
            else:
                def impl(p, seed, cull=cull):
                    from functools import partial
                    import sail_tpu.ops.intersect as _i
                    orig = _i.intersect_scene
                    _i.intersect_scene = (partial(orig, cull=cull)
                                          if cull else orig)
                    try:
                        img = render_image(p, static, h, w, args.spp,
                                           seed=seed,
                                           max_bounces=args.bounces)
                    finally:
                        _i.intersect_scene = orig
                    return img.x.sum() + img.y.sum() + img.z.sum()

            try:
                t0 = time.perf_counter()
                compiled = jax.jit(impl).lower(packed, 0).compile()
                t_compile = time.perf_counter() - t0
                float(compiled(packed, 0))  # warm (readback = barrier)
                ts = []
                for i in range(3):
                    t0 = time.perf_counter()
                    float(compiled(packed, i))
                    ts.append(time.perf_counter() - t0)
                ts.sort()
                row[mode] = {"compile_s": round(t_compile, 2),
                             "render_s": round(ts[len(ts) // 2], 4)}
            except Exception as e:
                row[mode] = f"error: {type(e).__name__}: {str(e)[:160]}"
        rows.append(row)
        print(json.dumps({"progress": row}), flush=True)

    def ratio(a, b):
        return None if not (a and b) else round(a / b, 2)

    def rget(row, mode, key):
        v = row.get(mode)
        return v.get(key) if isinstance(v, dict) else None

    first, last = rows[0], rows[-1]
    growth = {
        "objects_ratio": counts[-1] / counts[0],
        "batched_compile_growth": ratio(
            rget(last, "batched", "compile_s"),
            rget(first, "batched", "compile_s")),
        "batched_render_growth": ratio(
            rget(last, "batched", "render_s"),
            rget(first, "batched", "render_s")),
        "pallas_render_growth": ratio(
            rget(last, "pallas", "render_s"),
            rget(first, "pallas", "render_s")),
        "pallas_cull_render_growth": ratio(
            rget(last, "pallas_cull", "render_s"),
            rget(first, "pallas_cull", "render_s")),
        "cull_speedup_at_max_n": ratio(
            rget(last, "pallas", "render_s"),
            rget(last, "pallas_cull", "render_s")),
        "unrolled_compile_growth": ratio(
            rget(last, "unrolled", "compile_s"),
            rget(first, "unrolled", "compile_s")),
    }
    print(json.dumps({
        "metric": "many-object scaling (compile flat, trace sub-linear)",
        "config": f"{h}x{w} x{args.spp}spp x{args.bounces}b",
        "device": str(jax.devices()[0]),
        "rows": rows,
        "growth": growth,
    }))


if __name__ == "__main__":
    main()
