"""Host-side scene-graph geometry classes and their packed parameter pytrees.

Mirrors the reference's user-facing geometry API (ref: src/scene/geometry.js):
`Cube(min,max,...)`, `Sphere(center,radius,...)`, etc.  Instead of serializing
to an untyped R32F float texture (geometry.js:82-90), each object packs into a
small typed NamedTuple of float32 scalars/Vec3s — a differentiable JAX pytree.
Scene *structure* (shape category, material/texture row assignment) stays on
the host as static Python metadata that specializes the traced program, the
role the reference's string-stitched GLSL plugin selection plays.

Unlike the reference there is no separate CPU ray caster for picking
(pickup.js duplicates every GLSL kernel); picking reuses the same intersect
ops (see sail_tpu/render/picking.py) — one source of truth.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax.numpy as jnp

from .. import constants as C
from ..core.vecmath import Vec3, splat


# --------------------------------------------------------------------------
# Packed parameter pytrees (one per shape category)
# --------------------------------------------------------------------------

class SphereP(NamedTuple):
    center: Vec3
    radius: jnp.ndarray
    emission: Vec3
    reverse: jnp.ndarray  # +1.0 or -1.0 normal sign


class BoxP(NamedTuple):
    """Axis-aligned box params — used by Cube, Rectangle and Cornellbox."""
    bmin: Vec3
    bmax: Vec3
    emission: Vec3
    reverse: jnp.ndarray


class FrustumP(NamedTuple):
    """Cone / cylinder params: base position, height, radius."""
    p: Vec3
    h: jnp.ndarray
    r: jnp.ndarray
    emission: Vec3
    reverse: jnp.ndarray


class DiskP(NamedTuple):
    p: Vec3
    r: jnp.ndarray
    inner_r: jnp.ndarray
    emission: Vec3
    reverse: jnp.ndarray


class HyperboloidP(NamedTuple):
    p: Vec3
    p1: Vec3
    p2: Vec3
    ah: jnp.ndarray
    ch: jnp.ndarray
    emission: Vec3
    reverse: jnp.ndarray


class ParaboloidP(NamedTuple):
    p: Vec3
    z0: jnp.ndarray
    z1: jnp.ndarray
    r: jnp.ndarray
    emission: Vec3
    reverse: jnp.ndarray


# --------------------------------------------------------------------------
# Host classes
# --------------------------------------------------------------------------

class Object3D:
    """Base scene object (ref: src/scene/geometry.js:27-91)."""

    category: int = 0

    def __init__(self, material=None, texture=None, emission=(0, 0, 0),
                 reverse_normal: bool = False):
        from .material import Matte
        from .texture import UniformColor

        self.material = material if material is not None else Matte()
        self.texture = texture if texture is not None else UniformColor(C.WHITE)
        self.emission = tuple(float(e) for e in emission)
        self.reverse_normal = bool(reverse_normal)
        self.temporary_translation = (0.0, 0.0, 0.0)

    @property
    def light(self) -> bool:
        """Emissive iff emission != 0 (ref: geometry.js:36)."""
        return any(e != 0.0 for e in self.emission)

    # Sail API: drag preview without committing (ref: geometry.js:67-73)
    def temporary_translate(self, v):
        self.temporary_translation = (float(v[0]), float(v[1]), float(v[2]))

    def translate(self):
        self._commit_translation()
        self.temporary_translation = (0.0, 0.0, 0.0)

    def _commit_translation(self):  # pragma: no cover - overridden
        raise NotImplementedError

    def _common(self):
        rev = -1.0 if self.reverse_normal else 1.0
        return splat(self.emission), jnp.float32(rev)

    def _offset(self, p):
        t = self.temporary_translation
        return (p[0] + t[0], p[1] + t[1], p[2] + t[2])

    def pack(self):  # pragma: no cover - overridden
        raise NotImplementedError


class Cube(Object3D):
    category = C.CUBE

    def __init__(self, bmin, bmax, material=None, texture=None,
                 emission=(0, 0, 0), reverse_normal=False):
        super().__init__(material, texture, emission, reverse_normal)
        self.min = tuple(float(v) for v in bmin)
        self.max = tuple(float(v) for v in bmax)

    def _commit_translation(self):
        self.min = self._offset(self.min)
        self.max = self._offset(self.max)

    def pack(self) -> BoxP:
        e, rev = self._common()
        return BoxP(splat(self._offset(self.min)), splat(self._offset(self.max)), e, rev)


class Sphere(Object3D):
    category = C.SPHERE

    def __init__(self, center, radius, material=None, texture=None,
                 emission=(0, 0, 0), reverse_normal=False):
        super().__init__(material, texture, emission, reverse_normal)
        self.center = tuple(float(v) for v in center)
        self.radius = float(radius)

    def _commit_translation(self):
        self.center = self._offset(self.center)

    def pack(self) -> SphereP:
        e, rev = self._common()
        return SphereP(splat(self._offset(self.center)), jnp.float32(self.radius), e, rev)


class Rectangle(Object3D):
    """Axis-aligned-x rectangle via min/max, the area-light workhorse
    (ref: src/scene/geometry.js:256-265, src/shader/shape/rectangle.glsl)."""
    category = C.RECTANGLE

    def __init__(self, bmin, bmax, material=None, texture=None,
                 emission=(0, 0, 0), reverse_normal=False):
        super().__init__(material, texture, emission, reverse_normal)
        self.min = tuple(float(v) for v in bmin)
        self.max = tuple(float(v) for v in bmax)

    def _commit_translation(self):
        self.min = self._offset(self.min)
        self.max = self._offset(self.max)

    def pack(self) -> BoxP:
        e, rev = self._common()
        return BoxP(splat(self._offset(self.min)), splat(self._offset(self.max)), e, rev)


class Cone(Object3D):
    category = C.CONE

    def __init__(self, position, height, radius, material=None, texture=None,
                 emission=(0, 0, 0), reverse_normal=False):
        super().__init__(material, texture, emission, reverse_normal)
        self.position = tuple(float(v) for v in position)
        self.height = float(height)
        self.radius = float(radius)

    def _commit_translation(self):
        self.position = self._offset(self.position)

    def pack(self) -> FrustumP:
        e, rev = self._common()
        return FrustumP(splat(self._offset(self.position)), jnp.float32(self.height),
                        jnp.float32(self.radius), e, rev)


class Cylinder(Cone):
    category = C.CYLINDER


class Disk(Object3D):
    category = C.DISK

    def __init__(self, position, radius, inner_radius=0.0, material=None,
                 texture=None, emission=(0, 0, 0), reverse_normal=False):
        super().__init__(material, texture, emission, reverse_normal)
        self.position = tuple(float(v) for v in position)
        self.radius = float(radius)
        self.inner_radius = float(inner_radius)

    def _commit_translation(self):
        self.position = self._offset(self.position)

    def pack(self) -> DiskP:
        e, rev = self._common()
        return DiskP(splat(self._offset(self.position)), jnp.float32(self.radius),
                     jnp.float32(self.inner_radius), e, rev)


def _hyperboloid_coeffs(p1, p2):
    """Iteratively solve the implicit quadric coefficients ah, ch
    (ref: src/scene/geometry.js:473-487)."""
    pp1, pp2 = list(p1), list(p2)
    if pp2[2] == 0.0:
        pp1, pp2 = pp2, pp1
    pr = list(pp1)
    ah, ch = math.inf, math.inf
    for _ in range(1000):
        if not (math.isinf(ah) or math.isnan(ah)):
            break
        pr = [pr[i] + 2.0 * (pp2[i] - pp1[i]) for i in range(3)]
        xy1 = pr[0] * pr[0] + pr[1] * pr[1]
        xy2 = pp2[0] * pp2[0] + pp2[1] * pp2[1]
        denom = xy1 * pp2[2] * pp2[2] - xy2 * pr[2] * pr[2]
        if denom == 0.0:
            continue
        ah = (1.0 / xy1 - (pr[2] * pr[2]) / (xy1 * pp2[2] * pp2[2])) / \
             (1.0 - (xy2 * pr[2] * pr[2]) / (xy1 * pp2[2] * pp2[2]))
        ch = (ah * xy2 - 1.0) / (pp2[2] * pp2[2])
    if math.isinf(ah) or math.isnan(ah):
        raise ValueError("degenerate hyperboloid: cannot solve implicit coefficients")
    return pp1, pp2, ah, ch


class Hyperboloid(Object3D):
    category = C.HYPERBOLOID

    def __init__(self, position, p1, p2, material=None, texture=None,
                 emission=(0, 0, 0), reverse_normal=False):
        super().__init__(material, texture, emission, reverse_normal)
        self.position = tuple(float(v) for v in position)
        p1f = [float(v) for v in p1]
        p2f = [float(v) for v in p2]
        self.p1, self.p2, self.ah, self.ch = _hyperboloid_coeffs(p1f, p2f)

    def _commit_translation(self):
        self.position = self._offset(self.position)

    def pack(self) -> HyperboloidP:
        e, rev = self._common()
        return HyperboloidP(splat(self._offset(self.position)), splat(self.p1),
                            splat(self.p2), jnp.float32(self.ah), jnp.float32(self.ch),
                            e, rev)


class Paraboloid(Object3D):
    category = C.PARABOLOID

    def __init__(self, position, z0, z1, radius, material=None, texture=None,
                 emission=(0, 0, 0), reverse_normal=False):
        super().__init__(material, texture, emission, reverse_normal)
        self.position = tuple(float(v) for v in position)
        self.z0 = float(z0)
        self.z1 = float(z1)
        self.radius = float(radius)

    def _commit_translation(self):
        self.position = self._offset(self.position)

    def pack(self) -> ParaboloidP:
        e, rev = self._common()
        return ParaboloidP(splat(self._offset(self.position)), jnp.float32(self.z0),
                           jnp.float32(self.z1), jnp.float32(self.radius), e, rev)


class Cornellbox(Object3D):
    """Inside-out box with colored walls: left GREEN, right BLUE, others WHITE
    (ref: src/scene/geometry.js:623-631, src/shader/shape/cornellbox.glsl:21-34).
    Always Matte; wall colors are baked in the intersect op."""
    category = C.CORNELLBOX

    def __init__(self, bmin, bmax, material=None):
        from .material import Matte
        super().__init__(material if material is not None else Matte(), None)
        self.min = tuple(float(v) for v in bmin)
        self.max = tuple(float(v) for v in bmax)

    def _commit_translation(self):
        self.min = self._offset(self.min)
        self.max = self._offset(self.max)

    def pack(self) -> BoxP:
        e, rev = self._common()
        return BoxP(splat(self._offset(self.min)), splat(self._offset(self.max)), e, rev)
