"""Device-mesh helpers.

The reference's only parallelism is the rasterizer's implicit fragment-per-
pixel SIMD on one GPU (SURVEY.md §2.5).  Here the same two axes the reference
exploits implicitly — pixels and samples — become explicit mesh axes:

  "tile": image rows sharded across devices (the fragment-parallel axis)
  "spp":  samples-per-pixel sharded across devices (the temporal-accumulation
          axis, spatialized)

Path tracing shards embarrassingly over both; the only communication is the
psum of sample sums over "spp" and of parameter gradients over the whole mesh
— both ride ICI within a slice.  Multi-host: call jax.distributed.initialize()
first and the same mesh spans all hosts' devices.
"""
from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, spp_axis: int | None = None,
              devices=None) -> Mesh:
    """Build a ("tile", "spp") mesh over the available devices.

    `spp_axis`: size of the spp axis (defaults to a near-square split).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are available "
                f"({[str(d) for d in devices]})")
        devices = devices[:n_devices]
    n = len(devices)
    if spp_axis is None:
        # near-square split favoring the tile axis
        spp_axis = 1
        for cand in range(int(math.isqrt(n)), 0, -1):
            if n % cand == 0:
                spp_axis = cand
                break
    tile_axis = n // spp_axis
    assert tile_axis * spp_axis == n, (tile_axis, spp_axis, n)
    dev_grid = np.array(devices).reshape(tile_axis, spp_axis)
    return Mesh(dev_grid, ("tile", "spp"))


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up (SURVEY.md §5 distributed backend): JAX's
    distributed runtime over ICI/DCN — no custom transport."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
