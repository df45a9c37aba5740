"""Benchmark: Mrays/s on the flagship Cornell-box configs (BASELINE.md).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The headline metric is forward+backward Mrays/s per chip on the Cornell box
with mirror sphere (config 2 geometry) at 1024²: rays counted as
pixels × spp × (bounces + shadow rays), matching the path-tracing convention
of one closest-hit or any-hit query per ray.

vs_baseline: the reference publishes no measured numbers (SURVEY.md §6); its
only derivable figure is the implied 15.7 Mpaths/s upper bound at 512²·60fps
·5 bounces ≈ 94 Mrays/s (each path = 5 closest + ~1 shadow ray... using the
same ray-counting convention: 512²·60·6 ≈ 94 Mrays/s).  vs_baseline reports
our Mrays/s against that derived bound.

MFU accounting (docs/PERF.md): FLOPs are counted by XLA cost analysis on the
XLA integrator twin (identical math to the Pallas kernels, whose Mosaic
custom-calls cost analysis cannot see into) and divided by the documented
v5e VPU f32 peak (utils/metrics.py).
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    from sail_tpu import scenes
    from sail_tpu.render.integrator import render_image
    from sail_tpu.utils import metrics

    height = width = 1024
    spp = 64   # large spp per dispatch amortizes the ~30ms relay latency
    bounces = 5

    scene = scenes.cornell_mirror()
    packed, static = scene.pack()

    # Both timed functions reduce to a SCALAR inside jit and the timing loop
    # reads it back with float(): through the axon relay,
    # jax.block_until_ready can return BEFORE execution completes, so a
    # host readback is the only reliable completion barrier.
    from sail_tpu.ops.pallas.megakernel import (render_block_pallas,
                                                render_image_fast)

    def fwd_impl(p, seed):
        # Pallas megakernel forward (bit-identical to the XLA integrator)
        img = render_block_pallas(p, static, height, width, spp, seed, 0,
                                  max_bounces=bounces)
        return img.x.sum() + img.y.sum() + img.z.sum()

    def fwd_xla_impl(p, seed):
        img = render_image(p, static, height, width, spp, seed=seed,
                           max_bounces=bounces)
        return img.x.sum() + img.y.sum() + img.z.sum()

    def fwdbwd_impl(p, seed):
        # HEADLINE: Pallas forward + Pallas backward megakernels (gradients
        # match the XLA integrator's to f32 reassociation error)
        def loss(p):
            img = render_image_fast(p, seed, static, height, width, spp,
                                    bounces)
            return jnp.mean(img.x + img.y + img.z)
        g = jax.grad(loss)(p)
        return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(g))

    def fwdbwd_xla_impl(p, seed):
        def loss_xla(p):
            img = render_image(p, static, height, width, spp, seed=seed,
                               max_bounces=bounces)
            return jnp.mean(img.x + img.y + img.z)
        g = jax.grad(loss_xla)(p)
        return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(g))

    # AOT-compile so XLA cost analysis (FLOP counts) rides the same compile
    # the timing uses.
    def compile_fn(fn):
        compiled = jax.jit(fn).lower(packed, 0).compile()
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
        except Exception:
            flops = 0.0
        return compiled, flops

    fwd, _ = compile_fn(fwd_impl)                 # Mosaic: opaque to XLA
    fwd_xla, flops_fwd = compile_fn(fwd_xla_impl)
    fwdbwd, _ = compile_fn(fwdbwd_impl)
    fwdbwd_xla, flops_fwdbwd = compile_fn(fwdbwd_xla_impl)

    for f in (fwd, fwd_xla, fwdbwd, fwdbwd_xla):
        float(f(packed, 0))  # warm the relay path once

    def time_it(fn, iters=5):
        times = []
        for i in range(iters):
            t0 = time.perf_counter()
            float(fn(packed, i))
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2]  # median: robust to relay hiccups

    t_fwd = time_it(fwd)
    t_fwd_xla = time_it(fwd_xla)
    t_fwdbwd = time_it(fwdbwd)
    t_fwdbwd_xla = time_it(fwdbwd_xla)

    # Open-scene early-exit: the megakernel skips all-dead tile bounces
    # (docs/OCCUPANCY.md); measure the win where it exists.
    oh = ow = 512
    ospp = 32
    opacked, ostatic = scenes.material_demo_open().pack()

    def open_fwd(early):
        def impl(p, seed):
            img = render_block_pallas(p, ostatic, oh, ow, ospp, seed, 0,
                                      max_bounces=bounces, early_exit=early)
            return img.x.sum() + img.y.sum() + img.z.sum()
        c = jax.jit(impl).lower(opacked, 0).compile()
        float(c(opacked, 0))
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            float(c(opacked, i))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    t_open_on = open_fwd(True)
    t_open_off = open_fwd(False)

    # ray counting: per pixel-sample, `bounces` closest-hit rays + up to
    # `bounces` NEE shadow rays (matte vertices only; count 1/bounce as the
    # kernel traces them for all lanes).
    rays = height * width * spp * (bounces * 2)
    mrays_fwd = rays / t_fwd / 1e6
    mrays_fwdbwd = rays / t_fwdbwd / 1e6

    # reference derived upper bound (see module docstring)
    baseline_mrays = 512 * 512 * 60 * 6 / 1e6  # ≈ 94.4

    result = {
        "metric": "Mrays/s/chip fwd+bwd, Cornell box mirror 1024^2",
        "value": round(mrays_fwdbwd, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_fwdbwd / baseline_mrays, 3),
        "detail": {
            "fwd_mrays_per_s": round(mrays_fwd, 2),
            "fwd_xla_mrays_per_s": round(rays / t_fwd_xla / 1e6, 2),
            "fwdbwd_xla_mrays_per_s": round(rays / t_fwdbwd_xla / 1e6, 2),
            "fwd_s_per_frame": round(t_fwd, 4),
            "fwdbwd_s": round(t_fwdbwd, 4),
            "fwdbwd_xla_s": round(t_fwdbwd_xla, 4),
            "fwdbwd_over_fwd": round(t_fwdbwd / t_fwd, 3),
            "mfu": {
                # Pallas kernels run the same math as the XLA twin whose
                # FLOPs XLA counted; peak = documented v5e VPU f32 (FMA=2)
                "flops_per_ray": round(flops_fwd / rays, 1),
                "fwd_tflops": round(flops_fwd / t_fwd / 1e12, 3),
                "fwdbwd_tflops": round(flops_fwdbwd / t_fwdbwd / 1e12, 3),
                "fwd_vpu_mfu": round(metrics.mfu(flops_fwd, t_fwd), 4),
                "fwdbwd_vpu_mfu": round(metrics.mfu(flops_fwdbwd,
                                                    t_fwdbwd), 4),
                "peak_assumption": "v5e VPU f32 FMA peak 7.7e12 FLOP/s",
            },
            "open_scene": {
                "scene": "material_demo_open 512^2x32spp",
                "fwd_s_early_exit": round(t_open_on, 4),
                "fwd_s_no_early_exit": round(t_open_off, 4),
                "early_exit_speedup": round(t_open_off / t_open_on, 3),
            },
            "device": str(jax.devices()[0]),
            "resolution": f"{height}x{width}", "spp": spp,
            "bounces": bounces,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
