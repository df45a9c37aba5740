"""Orbit camera controller.

Mirrors the reference's Control (ref: src/core/control.js): spherical-angle
orbit around `camera.center` (control.js:99-107), wheel zoom scaling the
radius by 0.9/1.1 (control.js:128-155), and drag-to-move plumbing via
picking.  DOM events become explicit method calls usable from notebooks.
"""
from __future__ import annotations

import math

from ..scene.scene import Scene
from . import picking


class Control:
    def __init__(self, scene: Scene, width: int = 512, height: int = 512):
        self.scene = scene
        self.width = width
        self.height = height
        self._dragger = None
        self._last = None
        self._sync_angles()

    def _sync_angles(self):
        cam = self.scene.camera
        ex, ey, ez = cam.eye
        cx, cy, cz = cam.center
        dx, dy, dz = ex - cx, ey - cy, ez - cz
        self.radius = math.sqrt(dx * dx + dy * dy + dz * dz)
        self.angle_x = math.asin(max(-1.0, min(1.0, dy / max(self.radius, 1e-9))))
        self.angle_y = math.atan2(dx, dz)

    def _apply(self):
        cam = self.scene.camera
        cx, cy, cz = cam.center
        r = self.radius
        ax, ay = self.angle_x, self.angle_y
        cam.eye = (cx + r * math.cos(ax) * math.sin(ay),
                   cy + r * math.sin(ax),
                   cz + r * math.cos(ax) * math.cos(ay))
        self.scene.update()
        self.scene.moving = True

    # -- orbit (ref: control.js:99-107) -------------------------------------
    def orbit(self, dx_pixels: float, dy_pixels: float):
        self.angle_y -= dx_pixels * 0.01
        self.angle_x += dy_pixels * 0.01
        limit = math.pi / 2 - 0.01
        self.angle_x = max(-limit, min(limit, self.angle_x))
        self._apply()

    # -- zoom (ref: control.js:128-155) --------------------------------------
    def zoom(self, wheel_delta: float):
        self.radius *= 0.9 if wheel_delta > 0 else 1.1
        self._apply()

    # -- drag objects via picking --------------------------------------------
    def mouse_down(self, x: float, y: float) -> bool:
        idx = picking.pick(self.scene, x, y, self.width, self.height)
        self.scene.select = idx
        if idx is not None:
            self._dragger = picking.Dragger(self.scene, idx, x, y,
                                            self.width, self.height)
            return True
        self._last = (x, y)
        return False

    def mouse_move(self, x: float, y: float):
        if self._dragger is not None:
            self._dragger.drag(x, y)
        elif self._last is not None:
            lx, ly = self._last
            self.orbit(x - lx, y - ly)
            self._last = (x, y)

    def mouse_up(self):
        if self._dragger is not None:
            self._dragger.end()
            self._dragger = None
        self._last = None
        self.scene.moving = False
