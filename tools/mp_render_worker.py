"""One process of a multi-process (multi-host-emulating) sharded render.

Used by tests/test_multiprocess.py (2-process correctness: the global-mesh
sharded render must equal the single-device render) and by
tools/scaling_efficiency.py (the BASELINE.md >=85% rays/s scaling metric).

Each process gets `--local-devices` virtual CPU devices
(xla_force_host_platform_device_count), joins the jax.distributed runtime at
`--coordinator`, and renders over a mesh spanning ALL processes' devices —
the exact code path a real 2-host TPU slice runs
(parallel/mesh.py initialize_distributed + render_sharded), with DCN/gloo
standing in for ICI.
"""
import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--size", type=int, default=16)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--bounces", type=int, default=2)
    ap.add_argument("--out", default=None,
                    help="write a JSON result file (every process)")
    ap.add_argument("--bench-iters", type=int, default=0,
                    help="also time repeated renders (scaling harness)")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}")

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import numpy as np

    from sail_tpu import scenes
    from sail_tpu.parallel.mesh import initialize_distributed, make_mesh
    from sail_tpu.parallel.render_sharded import render_sharded

    initialize_distributed(args.coordinator, args.num_processes,
                           args.process_id)
    assert jax.process_count() == args.num_processes, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == args.num_processes * args.local_devices

    scene = scenes.cornell_matte()
    packed, static = scene.pack()
    mesh = make_mesh()  # spans every process's devices
    h = w = args.size

    img = render_sharded(packed, static, mesh, h, w, args.spp, seed=0,
                         max_bounces=args.bounces)
    stacked = img.stack()

    from jax.experimental import multihost_utils
    full = np.asarray(
        multihost_utils.process_allgather(stacked, tiled=True))

    # single-device reference on this process's first local device
    from sail_tpu.render.integrator import render_image
    local = np.asarray(render_image(
        packed, static, h, w, args.spp, seed=0,
        max_bounces=args.bounces).stack())
    max_diff = float(np.abs(full - local).max())

    result = {
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": n_global,
        "mesh": {k: int(v) for k, v in mesh.shape.items()},
        "max_abs_diff_vs_single": max_diff,
        "ok": bool(max_diff < 1e-5),
    }

    if args.bench_iters:
        import jax.numpy as jnp

        # seed must be a TRACED argument: a Python-int seed bakes into the
        # trace as a constant and every new seed recompiles the whole
        # shard_map graph — the r3-era harness measured CPU compile time
        # (~10 s/iter at 64^2), not rendering.
        @jax.jit
        def render_seeded(packed, seed):
            return render_sharded(packed, static, mesh, h, w, args.spp,
                                  seed=seed, max_bounces=args.bounces)

        def run(seed):
            out = render_seeded(packed, jnp.int32(seed))
            # readback barrier (local shards only)
            return float(np.asarray(
                out.x.addressable_shards[0].data).sum())

        run(1)  # warm (the one compile)
        multihost_utils.sync_global_devices("bench_start")
        t0 = time.perf_counter()
        for i in range(args.bench_iters):
            run(2 + i)
        multihost_utils.sync_global_devices("bench_end")
        dt = time.perf_counter() - t0
        rays = h * w * args.spp * args.bounces * 2 * args.bench_iters
        result["seconds"] = dt
        result["mrays_per_s"] = rays / dt / 1e6

    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)
    print(json.dumps(result))
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
