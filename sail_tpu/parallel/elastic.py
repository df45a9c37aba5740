"""Failure detection & elastic recovery (SURVEY.md §5: the reference has
nothing — its closest analog is a WebGL2-missing alert, webgl.js:223).

Design: because the RNG is a stateless hash on (seed, GLOBAL sample index,
GLOBAL pixel) (core/rng.py), a render is a sum of per-sample terms that do
not care which device computed them.  So elastic recovery is trivial-by-
construction: track which global sample ranges completed, and after a device
failure rebuild a smaller mesh from the survivors and keep accumulating the
remaining samples — the result is BIT-IDENTICAL to an uninterrupted run
(tests/test_elastic.py proves it).  No re-render, no checkpoint gymnastics:
the accumulator + sample cursor IS the checkpoint (render/renderer.py
stores the same pair to disk).

Failure detection: every device in the mesh is probed with a tiny
round-trip computation (`probe_devices`); step execution failures
(XLA/runtime errors out of a sharded step) also mark the epoch bad.  Both
funnel into `ElasticRenderer.render`, which shrinks the mesh and retries.
Fault injection for tests: pass `fault_hook(chunk_index)` that raises.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np

from .. import constants as C
from ..core.vecmath import Vec3
from .mesh import make_mesh
from .render_sharded import render_sharded


class DeviceFailure(RuntimeError):
    """Raised by fault-injection hooks / wrapped around runtime errors."""


def probe_devices(devices: Optional[Sequence] = None,
                  faulty: Callable[[object], bool] = None) -> list:
    """Return the subset of `devices` that complete a tiny round-trip
    computation.  `faulty`: test hook marking devices dead without real
    hardware failures."""
    if devices is None:
        devices = jax.devices()
    healthy = []
    for d in devices:
        if faulty is not None and faulty(d):
            continue
        try:
            x = jax.device_put(np.float32(2.0), d)
            if float(x * x) == 4.0:
                healthy.append(d)
        except Exception:
            continue
    return healthy


def _largest_pow2_leq(n: int) -> int:
    p = 1
    while p * 2 <= n:
        p *= 2
    return p


class ElasticRenderer:
    """Progressive sharded renderer that survives device loss mid-render.

    Renders `spp` samples in `chunk_spp`-sized chunks; each chunk runs on
    the current mesh.  When a chunk fails (device failure, injected fault),
    the survivors are re-probed, the mesh shrinks to the largest power-of-2
    healthy subset, and the SAME chunk re-runs — global sample indices make
    the retried chunk produce exactly the values the dead mesh would have.
    """

    def __init__(self, packed, static, height: int, width: int,
                 max_bounces: int = C.MAX_BOUNCES,
                 devices: Optional[Sequence] = None,
                 fault_hook: Callable[[int], None] = None,
                 faulty: Callable[[object], bool] = None,
                 max_retries: int = 3):
        self.packed = packed
        self.static = static
        self.height = height
        self.width = width
        self.max_bounces = max_bounces
        self.devices = list(devices) if devices is not None else jax.devices()
        self.fault_hook = fault_hook
        self.faulty = faulty
        self.max_retries = max_retries
        self.mesh = make_mesh(devices=self.devices)
        self.events: list[dict] = []       # observability: what failed when
        self._chunk_index = 0

    def _fit_mesh(self, chunk_n: int):
        """Build a mesh over the current devices whose axes divide the work:
        chunk_n % spp_axis == 0 and height % tile_axis == 0.  Falls back to
        spp_axis=1 (any chunk size shards over rows), then halves the device
        count until the tile axis divides the image height — without this,
        a retried chunk after a shrink can hit render_sharded's divisibility
        asserts in exactly the device-loss scenario elastic recovery exists
        to survive (ADVICE r2)."""
        devices = list(self.devices)
        while devices:
            mesh = make_mesh(devices=devices)
            if (chunk_n % mesh.shape["spp"] == 0
                    and self.height % mesh.shape["tile"] == 0):
                self.devices = devices
                self.mesh = mesh
                return
            mesh = make_mesh(devices=devices, spp_axis=1)
            if self.height % mesh.shape["tile"] == 0:
                self.devices = devices
                self.mesh = mesh
                self.events.append({"event": "mesh_reshape",
                                    "reason": "spp_remainder"})
                return
            devices = devices[:len(devices) // 2]
        raise DeviceFailure(
            f"no device subset fits height={self.height}")

    def _shrink_mesh(self, reason: str, chunk_n: int):
        healthy = probe_devices(self.devices, self.faulty)
        if not healthy:
            raise DeviceFailure("no healthy devices left")
        n = _largest_pow2_leq(len(healthy))
        self.devices = healthy[:n]
        self._fit_mesh(chunk_n)
        self.events.append({"event": "mesh_shrink", "reason": reason,
                            "devices": len(self.devices)})

    def render(self, spp: int, seed: int = 0, chunk_spp: int = None) -> Vec3:
        """Mean image over `spp` samples, elastically.  Bit-identical to
        render_sharded(spp) on a never-failing mesh."""
        if chunk_spp is None:
            chunk_spp = max(spp // 4, 1)
        zero = np.zeros((self.height, self.width), np.float32)
        acc = Vec3(zero.copy(), zero.copy(), zero.copy())
        done = 0
        while done < spp:
            n = min(chunk_spp, spp - done)
            if (n % self.mesh.shape["spp"]
                    or self.height % self.mesh.shape["tile"]):
                self._fit_mesh(n)
            retries = 0
            while True:
                try:
                    if self.fault_hook is not None:
                        self.fault_hook(self._chunk_index)
                    # raw spp-SUM per chunk: summing sums and dividing once
                    # at the end is bit-identical to one big render when
                    # every chunk divides over the spp axis the same way the
                    # reference render does (the tested pow2 chunk sizes);
                    # a chunk that forces the _fit_mesh spp_axis=1 fallback
                    # reassociates the float sum and identity degrades to
                    # allclose-level reassociation error (ADVICE r3)
                    out = render_sharded(
                        self.packed, self.static, self.mesh, self.height,
                        self.width, n, seed=seed,
                        max_bounces=self.max_bounces,
                        sample0=done, return_sum=True)
                    out = jax.tree.map(np.asarray, out)
                    break
                except DeviceFailure as e:
                    retries += 1
                    if retries > self.max_retries:
                        raise
                    self.events.append({"event": "chunk_failed",
                                        "chunk": self._chunk_index,
                                        "error": str(e)})
                    self._shrink_mesh(str(e), n)
                except RuntimeError as e:  # real device loss (XLA/runtime)
                    retries += 1
                    if retries > self.max_retries:
                        raise
                    self.events.append({"event": "chunk_failed",
                                        "chunk": self._chunk_index,
                                        "error": type(e).__name__})
                    self._shrink_mesh(type(e).__name__, n)
            self._chunk_index += 1
            acc = Vec3(acc.x + out.x, acc.y + out.y, acc.z + out.z)
            done += n
        return acc * (1.0 / spp)
