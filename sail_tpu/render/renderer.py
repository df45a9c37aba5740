"""Progressive renderer — the top-level orchestrator.

Mirrors the reference's `Renderer` (ref: src/core/renderer.js): `update(scene)`
recompiles/repacks on structure change, `render(scene)` adds one progressive
sample per call with motion-reset semantics (renderer.js:57-60), and the
display output runs the scene's reconstruction filter.

TPU-native re-design: the accumulation ping-pong framebuffer
(src/core/webgl.js:88-92) becomes an on-HBM sample-sum + count — which also
makes render state a trivially checkpointable pytree (SURVEY.md §5
checkpoint/resume).  Scene serialization (three R32F textures,
src/core/tracer.js:42-90) becomes the typed PackedScene pytree; GLSL
recompilation becomes a jit cache keyed on the static scene structure.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..core.vecmath import Vec3
from ..ops import filters
from ..scene.scene import Scene
from .integrator import render_sample


def _use_megakernel() -> bool:
    """Batch spp through the Pallas megakernel on TPU (bit-identical to the
    per-sample XLA path, one dispatch instead of spp round-trips)."""
    return jax.default_backend() == "tpu"


class Renderer:
    def __init__(self, width: int = 512, height: int = 512, seed: int = 0,
                 max_bounces: int = C.MAX_BOUNCES, early_exit: bool = False):
        self.width = width
        self.height = height
        self.max_bounces = max_bounces
        self.seed = seed
        # opt-in per-tile bounce early-exit for open scenes (exact but not
        # bit-identical to the masked loop; worth ~1.3x where escaped rays
        # die in coherent sky tiles -- docs/OCCUPANCY.md r4/r5 calibration)
        self._early_exit = early_exit
        self._packed = None
        self._static = None
        self._accum: Optional[Vec3] = None
        self._normal: Optional[Vec3] = None
        self._position: Optional[Vec3] = None
        self.sample_count = 0
        self._sample_fn = None
        self._batch_fns = {}      # (spp, early_exit) -> jitted batch
        self._gbuffer_ok = False
        self._use_fallback = False   # set when the megakernel can't compile

    @property
    def early_exit(self) -> bool:
        return self._early_exit

    @early_exit.setter
    def early_exit(self, value: bool):
        # The flag is baked into the jitted kernels; invalidate the compiled
        # caches on change so a post-render toggle actually takes effect
        # (ADVICE r4: stale _sample_fn kept the old setting silently).
        value = bool(value)
        if value != self._early_exit:
            self._early_exit = value
            if self._sample_fn is not None:
                self._sample_fn = jax.jit(partial(
                    self._sample_impl, static=self._static,
                    height=self.height, width=self.width,
                    max_bounces=self.max_bounces, seed=self.seed,
                    early_exit=value))

    # -- scene (re)build: the reference's full-GLSL-recompile path ----------
    def update(self, scene: Scene):
        self._packed, self._static = scene.pack()
        self._batch_fns = {}   # closures capture the old SceneStatic
        self._sample_fn = jax.jit(partial(
            self._sample_impl, static=self._static, height=self.height,
            width=self.width, max_bounces=self.max_bounces,
            seed=self.seed, early_exit=self.early_exit))
        self.reset()
        scene.sample_count = 0

    @staticmethod
    def _sample_impl(packed, sample_idx, *, static, height, width,
                     max_bounces, seed, early_exit=False):
        res = render_sample(packed, static, height, width, seed, sample_idx,
                            max_bounces=max_bounces, early_exit=early_exit)
        return res

    def reset(self):
        zero = jnp.zeros((self.height, self.width), jnp.float32)
        self._accum = Vec3(zero, zero, zero)
        self._normal = Vec3(zero, zero, zero)
        self._position = Vec3(zero, zero, zero)
        self.sample_count = 0
        self._gbuffer_ok = False

    # -- one progressive sample (the reference's per-rAF trace pass) --------
    def render(self, scene: Scene):
        if self._sample_fn is None:
            self.update(scene)
        if scene.moving:
            # motion invalidates the accumulation; objects are repacked
            # (ref: renderer.js:57-60 re-serializes while dragging)
            self._packed, self._static = scene.pack()
            self.reset()
        res = self._sample_fn(self._packed, jnp.int32(self.sample_count))
        self._accum = self._accum + res.color
        # G-buffer: keep the latest (matches ref MRT overwrite per frame)
        self._normal = res.normal
        self._position = res.position
        self._gbuffer_ok = True
        self.sample_count += 1
        scene.sample_count = self.sample_count

    def render_spp(self, scene: Scene, spp: int):
        """Accumulate `spp` samples.  On TPU this is ONE megakernel dispatch
        (the whole sample batch runs in VMEM), identical results to `spp`
        calls of :meth:`render`; the G-buffer is filled lazily when a
        filter needs it."""
        if not _use_megakernel() or self._use_fallback:
            for _ in range(spp):
                self.render(scene)
            return
        if self._sample_fn is None:
            self.update(scene)
        if scene.moving:
            self._packed, self._static = scene.pack()
            self.reset()
        key = (spp, self.early_exit)
        if key not in self._batch_fns:
            from ..ops.pallas.megakernel import render_block_pallas
            static, h, w, b, seed = (self._static, self.height, self.width,
                                     self.max_bounces, self.seed)
            ee = self.early_exit
            # 8x512 tiles: best absolute early-exit time in the stable
            # 64-spp measurement (PROFILE_r05_part2 open_scene_64spp)
            tc = 512 if ee else None
            self._batch_fns[key] = jax.jit(
                lambda p, s0: render_block_pallas(p, static, h, w, spp, seed,
                                                  s0, b, tile_cols=tc,
                                                  early_exit=ee))
        try:
            acc = self._batch_fns[key](self._packed,
                                       jnp.int32(self.sample_count))
        except Exception:
            # Mosaic can refuse very large scenes (the remote compiler
            # crashes beyond ~KERNEL_UNROLL_MAX objects per category,
            # measured r5 at 256 spheres); fall back to the per-sample
            # XLA path permanently for this renderer.
            del self._batch_fns[key]
            self._use_fallback = True
            for _ in range(spp):
                self.render(scene)
            return
        self._accum = self._accum + acc
        self._gbuffer_ok = False
        self.sample_count += spp
        scene.sample_count = self.sample_count

    # -- display: filter pass (the reference's fsrender draw) ---------------
    def current(self) -> Vec3:
        n = max(self.sample_count, 1)
        return self._accum * (1.0 / n)

    def output(self, scene: Optional[Scene] = None) -> np.ndarray:
        """Filtered image as a float numpy (H, W, 3) array — the only
        device→host transfer (SURVEY.md §3.5)."""
        name = scene.filter if scene is not None else "color"
        params = scene.filter_params if scene is not None else {}
        if (name in ("normal", "position", "wavelet")
                and not self._gbuffer_ok and self._sample_fn is not None):
            # megakernel batches skip the G-buffer; fill it with one pass
            res = self._sample_fn(self._packed, jnp.int32(0))
            self._normal, self._position = res.normal, res.position
            self._gbuffer_ok = True
        img = filters.apply_filter(name, self.current(), self._normal,
                                   self._position, **params)
        out = np.asarray(img.stack())
        if scene is not None and scene.select is not None:
            # selection-box line pass (ref: src/core/renderer.js:65-71) —
            # composited host-side over the transferred frame
            from .overlay import draw_selection
            out = draw_selection(out, scene, scene.select)
        return out

    # -- checkpoint / resume -----------------------------------------------
    def checkpoint(self) -> dict:
        """Render state is (sample sum, count) — resume = keep accumulating
        (the reference's implicit frameCache checkpoint, SURVEY.md §5)."""
        return {
            "accum": np.asarray(self.current().stack()) * self.sample_count
            if self.sample_count else np.zeros((self.height, self.width, 3)),
            "sample_count": self.sample_count,
        }

    def restore(self, state: dict):
        a = jnp.asarray(state["accum"], jnp.float32)
        if a.shape[:2] != (self.height, self.width):
            raise ValueError(
                f"checkpoint is {a.shape[1]}x{a.shape[0]} but this Renderer "
                f"is {self.width}x{self.height}")
        self._accum = Vec3(a[..., 0], a[..., 1], a[..., 2])
        self.sample_count = int(state["sample_count"])

    def save(self, path: str):
        """Persist render state to disk; resume with :meth:`load` and keep
        accumulating samples (counter-based RNG makes the continuation
        identical to an uninterrupted render)."""
        np.savez(path, **self.checkpoint())

    def load(self, path: str):
        with np.load(path) as data:
            self.restore({"accum": data["accum"],
                          "sample_count": int(data["sample_count"])})
