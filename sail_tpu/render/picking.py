"""Mouse picking and object dragging.

Mirrors the reference's Pickup (ref: src/core/pickup.js) — but where the
reference duplicates every intersection kernel in CPU JavaScript
(pickup.js:46-66 calling geometry.js `intersect()` clones), this picker
reuses the SAME intersect ops as rendering on a single-ray batch: one source
of truth for geometry.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..core.vecmath import Vec3
from ..ops import intersect as isect
from ..scene.scene import Scene


def _pixel_ray(scene: Scene, x: float, y: float, width: int, height: int):
    """Single world ray through pixel center (x, y) — the picking analog of
    Ray.generate (ref: pickup.js:9-12), built from the camera basis
    directly instead of an inverse MVP."""
    packed, _ = scene.pack()
    ndc_x = (x + 0.5) * (2.0 / width) - 1.0
    ndc_y = 1.0 - (y + 0.5) * (2.0 / height)
    cam = packed.camera
    sx = ndc_x * float(cam.tan_half_fovy) * float(cam.aspect)
    sy = ndc_y * float(cam.tan_half_fovy)
    d = Vec3(
        cam.right.x * sx + cam.up.x * sy - cam.back.x,
        cam.right.y * sx + cam.up.y * sy - cam.back.y,
        cam.right.z * sx + cam.up.z * sy - cam.back.z,
    ).normalize()
    o = cam.eye
    one = lambda v: jnp.reshape(jnp.asarray(v, jnp.float32), (1,))
    return (Vec3(one(o.x), one(o.y), one(o.z)),
            Vec3(one(d.x), one(d.y), one(d.z)))


def pick(scene: Scene, x: float, y: float, width: int = 512,
         height: int = 512) -> Optional[int]:
    """Object index under pixel (x, y), or None (ref: pickup.js:46-66).
    Cornell boxes are not pickable (the reference also skips objects without
    a boundbox)."""
    packed, static = scene.pack()
    ro, rd = _pixel_ray(scene, x, y, width, height)
    hit = isect.intersect_scene(packed.objects, static, ro, rd)
    if not bool(hit.valid[0]):
        return None
    idx = int(hit.obj_id[0])
    if static.object_categories[idx] == C.CORNELLBOX:
        return None
    return idx


class Dragger:
    """Plane-constrained object dragging (ref: pickup.js:68-122
    movingBegin/moving/movingEnd)."""

    def __init__(self, scene: Scene, obj_index: int, x: float, y: float,
                 width: int = 512, height: int = 512):
        self.scene = scene
        self.obj = scene.objects[obj_index]
        self.width = width
        self.height = height
        packed, static = scene.pack()
        ro, rd = _pixel_ray(scene, x, y, width, height)
        hit = isect.intersect_scene(packed.objects, static, ro, rd)
        self._p0 = np.array([float(hit.p.x[0]), float(hit.p.y[0]),
                             float(hit.p.z[0])])
        # movement plane: perpendicular to the dominant view axis through p0
        eye = np.asarray(self.scene.camera.eye, float)
        view = self._p0 - eye
        self._axis = int(np.argmax(np.abs(view)))

    def drag(self, x: float, y: float):
        ro, rd = _pixel_ray(self.scene, x, y, self.width, self.height)
        o = np.array([float(ro.x[0]), float(ro.y[0]), float(ro.z[0])])
        d = np.array([float(rd.x[0]), float(rd.y[0]), float(rd.z[0])])
        denom = d[self._axis]
        if abs(denom) < 1e-9:
            return
        t = (self._p0[self._axis] - o[self._axis]) / denom
        p1 = o + d * t
        delta = p1 - self._p0
        self.obj.temporary_translate(delta)
        self.scene.moving = True

    def end(self):
        self.obj.translate()
        self.scene.moving = False
