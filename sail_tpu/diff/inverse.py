"""Inverse rendering: recover scene parameters from target images.

BASELINE.md config 5: "recover BSDF + emitter params of Cornell box from
target image, grads sharded over 2+ hosts".  The reference has no analog —
this is the capability the differentiable redesign exists for.

Typical use:
    scene = ...; packed, static = scene.pack()
    target = render_sharded(packed, static, mesh, H, W, spp)   # or a photo
    perturbed = perturb(packed)
    result = optimize(perturbed, target, static, mesh, H, W, spp,
                      trainable=lambda k: ".materials" in k or ".lights" in k)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..core.vecmath import Vec3
from ..parallel.mesh import make_mesh
from ..parallel.render_sharded import (make_train_step, render_sharded,
                                       trainable_mask)


@dataclass
class OptimizeResult:
    params: object            # recovered PackedScene
    losses: list = field(default_factory=list)
    steps: int = 0


def optimize(packed, target: Vec3, static, mesh, height: int, width: int,
             spp: int, steps: int = 100, learning_rate: float = 5e-2,
             optimizer=None, trainable: Optional[Callable[[str], bool]] = None,
             seed: int = 0, max_bounces: int = 5,
             callback: Optional[Callable] = None,
             boundary: bool = True) -> OptimizeResult:
    """Gradient-descent recovery of scene parameters from a target image.

    `trainable`: predicate over pytree key paths selecting which parameters
    to optimize (default: material + light parameters).

    `boundary`: include the silhouette/penumbra edge-gradient terms (needed
    for unbiased geometry and camera gradients; see make_train_step).
    """
    if optimizer is None:
        optimizer = optax.adam(learning_rate)
    if trainable is None:
        trainable = lambda k: ".materials" in k or ".lights" in k
    mask = trainable_mask(packed, trainable)
    step = make_train_step(static, mesh, height, width, spp, optimizer,
                           seed=seed, max_bounces=max_bounces, trainable=mask,
                           boundary=boundary)
    state = optimizer.init(packed)
    result = OptimizeResult(params=packed)
    for i in range(steps):
        packed, state, loss = step(packed, state, target)
        result.losses.append(float(loss))
        result.steps = i + 1
        if callback is not None:
            callback(i, float(loss), packed)
    result.params = packed
    return result


def finite_difference_grad(loss_fn, packed, leaf_ref, eps: float = 1e-3):
    """Central-difference gradient of one scalar leaf — the validation tool
    the gradient tests use (SURVEY.md §4)."""
    flat, treedef = jax.tree.flatten(packed)
    idx = None
    for i, leaf in enumerate(flat):
        if leaf is leaf_ref:
            idx = i
    if idx is None:
        raise ValueError("leaf not found in pytree")
    v0 = float(flat[idx])

    def at(v):
        f = list(flat)
        f[idx] = jnp.float32(v)
        return float(loss_fn(jax.tree.unflatten(treedef, f)))

    return (at(v0 + eps) - at(v0 - eps)) / (2 * eps)
