"""Scaling-efficiency harness — the BASELINE.md ">=85% rays/s 1->2 hosts"
metric, runnable today on CPU emulation and unchanged on real multi-host TPU.

Launches the sharded render benchmark at 1 process and at N processes
(tools/mp_render_worker.py --bench-iters), each process holding
--local-devices devices, and reports

    efficiency = mrays/s(N procs) / (N * mrays/s(1 proc))

On real hardware: run the worker once per host with --coordinator pointing
at host 0 (exactly what the test-suite's 2-process test does on localhost)
and pass --skip-launch on all but the coordinator... i.e. nothing changes
but the addresses: the worker is the per-host entry point.

    python tools/scaling_efficiency.py --procs 2 --size 64 --spp 4
"""
import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "mp_render_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_group(n_procs, local_devices, size, spp, bounces, iters,
              pin_cpus=True):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    ncpu = os.cpu_count() or 1
    procs = []
    for pid in range(n_procs):
        # Pin each emulated host to ONE core: without this, the 1-process
        # baseline's XLA CPU threadpool spans every core while each of the
        # N processes gets 1/N of the machine — the "efficiency" would then
        # measure core oversubscription, not communication overhead.  On
        # real multi-host TPU each host has its own chips; equal-resources-
        # per-process is the honest emulation.
        prefix = (["taskset", "-c", str(pid % ncpu)]
                  if pin_cpus and n_procs <= ncpu else [])
        procs.append(subprocess.Popen(
            prefix + [sys.executable, WORKER,
             "--process-id", str(pid), "--num-processes", str(n_procs),
             "--coordinator", f"127.0.0.1:{port}",
             "--local-devices", str(local_devices),
             "--size", str(size), "--spp", str(spp),
             "--bounces", str(bounces), "--bench-iters", str(iters)],
            env=env, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True))
    results = []
    for p in procs:
        stdout, _ = p.communicate(timeout=3600)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{stdout[-4000:]}")
        results.append(json.loads(stdout.strip().splitlines()[-1]))
    return results[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--bounces", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    one = run_group(1, args.local_devices, args.size, args.spp,
                    args.bounces, args.iters)
    many = run_group(args.procs, args.local_devices, args.size, args.spp,
                     args.bounces, args.iters)
    eff = many["mrays_per_s"] / (args.procs * one["mrays_per_s"])
    print(json.dumps({
        "metric": f"rays/s scaling efficiency 1->{args.procs} processes",
        "value": round(eff, 4),
        "unit": "fraction",
        "target": 0.85,
        "pass": eff >= 0.85,
        "detail": {
            "mrays_1proc": round(one["mrays_per_s"], 3),
            f"mrays_{args.procs}proc": round(many["mrays_per_s"], 3),
            "local_devices": args.local_devices,
            "config": f"{args.size}^2 x {args.spp}spp x {args.bounces}b "
                      f"x {args.iters}it",
            "note": "CPU-emulated hosts (gloo); same worker runs per-host "
                    "on real multi-host TPU",
        },
    }))


if __name__ == "__main__":
    main()
