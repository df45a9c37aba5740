"""Host-side light classes + packed parameter pytrees.

Mirrors the reference's lights (ref: src/scene/light.js): AreaLight (wraps an
emissive geometry that is injected into the scene's object list), PointLight,
SpotLight.

Estimator note: the reference's area/point samplers omit the 1/d² distance
falloff (ref: src/shader/light/area.glsl:13-22, point.glsl:13-19) and its
uniform random light pick never multiplies by the light count
(light/shader.light.js:12-18) — both physically wrong.  This framework uses
the correct estimators (solid-angle-converted area pdf, inverse-square
falloff, ×n_lights for the uniform pick); the CPU oracle shares those
semantics, so fwd/grad allclose checks are against correct light transport.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as C
from ..core.vecmath import Vec3, splat


class AreaLightP(NamedTuple):
    emission: Vec3


class PointLightP(NamedTuple):
    origin: Vec3
    emission: Vec3
    radius: jnp.ndarray  # soft-shadow jitter radius (ref uses fixed 0.1)


class SpotLightP(NamedTuple):
    origin: Vec3
    cos_total_width: jnp.ndarray
    cos_falloff_start: jnp.ndarray
    emission: Vec3


class Light:
    category: int = -1

    def __init__(self, emission):
        self.emission = tuple(float(e) for e in emission)

    def pack(self):  # pragma: no cover - overridden
        raise NotImplementedError


class AreaLight(Light):
    """Wraps an emissive geometry (ref: src/scene/light.js:33-77).  The
    geometry is added to the scene's objects when the light is added; the
    light keeps a reference for NEE sampling."""
    category = C.AREA

    def __init__(self, geometry, emission):
        super().__init__(emission)
        geometry.emission = tuple(float(e) for e in emission)
        self.geometry = geometry
        self.index = None  # object index, assigned by Scene.add

    def pack(self) -> AreaLightP:
        return AreaLightP(splat(self.emission))


class PointLight(Light):
    category = C.POINT

    def __init__(self, from_, emission, radius: float = 0.1):
        super().__init__(emission)
        self.from_ = tuple(float(v) for v in from_)
        self.radius = float(radius)

    def pack(self) -> PointLightP:
        return PointLightP(splat(self.from_), splat(self.emission),
                           jnp.float32(self.radius))


class SpotLight(Light):
    category = C.SPOT

    def __init__(self, from_, coneangle, conedelta, emission):
        super().__init__(emission)
        self.from_ = tuple(float(v) for v in from_)
        self.coneangle = float(coneangle)
        self.conedelta = float(conedelta)
        self.cos_total_width = math.cos(coneangle / 180.0 * math.pi)
        self.cos_falloff_start = math.cos((coneangle - conedelta) / 180.0 * math.pi)

    def pack(self) -> SpotLightP:
        return SpotLightP(splat(self.from_), jnp.float32(self.cos_total_width),
                          jnp.float32(self.cos_falloff_start), splat(self.emission))
