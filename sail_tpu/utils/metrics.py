"""Observability: rays/s counters, render timing, and profiler hooks.

The reference has no profiling at all (SURVEY.md §5 — its only clock is an
RNG seed).  This module provides the counters the benchmark and production
deployments use, plus a thin wrapper over the JAX profiler for TPU traces.
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field

import jax


def rays_per_sample(height: int, width: int, bounces: int,
                    nee: bool = True) -> int:
    """Rays traced per 1-spp pass: one closest-hit per bounce, plus one NEE
    shadow ray per bounce when lights are present (the wavefront traces both
    for every lane)."""
    per_pixel = bounces * (2 if nee else 1)
    return height * width * per_pixel


@dataclass
class RenderMeter:
    """Accumulates wall-clock and ray counts across progressive passes."""
    height: int
    width: int
    bounces: int
    nee: bool = True
    samples: int = 0
    seconds: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, samples: int = 1, sync=None):
        if sync is not None:
            jax.block_until_ready(sync)
        self.seconds += time.perf_counter() - self._t0
        self.samples += samples

    @property
    def total_rays(self) -> int:
        return rays_per_sample(self.height, self.width, self.bounces,
                               self.nee) * self.samples

    @property
    def mrays_per_s(self) -> float:
        return self.total_rays / max(self.seconds, 1e-12) / 1e6

    def report(self) -> dict:
        return {
            "samples": self.samples,
            "seconds": round(self.seconds, 4),
            "mrays_per_s": round(self.mrays_per_s, 2),
            "resolution": f"{self.height}x{self.width}",
            "bounces": self.bounces,
        }

    def __str__(self):
        return json.dumps(self.report())


# --------------------------------------------------------------------------
# FLOPs / MFU accounting (VERDICT r1 item 3: derive "speed of light", don't
# assert it).
# --------------------------------------------------------------------------

# TPU v5e VPU peak, f32: 1 TensorCore x 4 ALUs x (8x128) lanes x ~0.94 GHz,
# counting an FMA as 2 FLOPs (the XLA cost-analysis convention) =
# 7.7e12 FLOP/s upper bound; 3.85e12 if nothing fuses to FMA.  The path
# tracer is VPU-bound (elementwise f32 over ray lanes; no matmuls), so the
# MXU's 197 bf16 TFLOP/s is irrelevant to its roofline.
VPU_PEAK_F32_FMA = 7.7e12
VPU_PEAK_F32_NOFMA = 3.85e12


def xla_flops(fn, *args) -> float:
    """Total FLOPs of `fn(*args)` as counted by XLA's cost analysis on the
    compiled executable (FMA = 2 FLOPs).  Counts the *math*, which for the
    integrator is identical between the XLA path and the Pallas megakernel
    (the kernel body is the same traced jnp code), so this is the canonical
    FLOP count for both.  Note: cost analysis cannot see inside Mosaic
    custom-calls, which is WHY the XLA twin is the counting vehicle."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older JAX returned [dict]
        ca = ca[0]
    return float(ca["flops"])


def mfu(flops: float, seconds: float,
        peak: float = VPU_PEAK_F32_FMA) -> float:
    """Model-FLOPs-utilization against the documented VPU peak."""
    return flops / max(seconds, 1e-12) / peak


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/sail_tpu_profile"):
    """JAX profiler trace context — view with TensorBoard / xprof.
    Replaces the reference's nothing (console.log on shader failure was its
    entire observability story, src/core/webgl.js:185)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
