"""Host-side material classes + packed parameter pytrees.

Mirrors the reference's materials (ref: src/scene/material.js): Matte
(Lambertian / Oren-Nayar), Mirror (perfect specular), Metal (conductor GGX),
Glass (Fresnel-weighted specular or rough dielectric).  Parameters pack into
float32 NamedTuple pytrees so pixel gradients flow back into every BSDF
parameter; derived quantities the reference precomputes on the host (e.g. the
Oren-Nayar A/B terms, material.js:44-49) are instead computed in-graph from
sigma so they stay differentiable.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as C
from ..core.vecmath import Vec3, splat


class MatteP(NamedTuple):
    kd: jnp.ndarray
    sigma: jnp.ndarray  # radians


class MirrorP(NamedTuple):
    kr: jnp.ndarray


class MetalP(NamedTuple):
    uroughness: jnp.ndarray
    vroughness: jnp.ndarray
    eta: Vec3
    k: Vec3


class GlassP(NamedTuple):
    kr: jnp.ndarray
    kt: jnp.ndarray
    eta: jnp.ndarray
    uroughness: jnp.ndarray
    vroughness: jnp.ndarray


def roughness_to_alpha(roughness: float) -> float:
    """PBRT roughness→alpha mapping (ref: material.js:7-12; defined there but
    never called — kept for API parity)."""
    roughness = max(roughness, 1e-3)
    x = math.log(roughness)
    return (1.62142 + 0.819955 * x + 0.1734 * x * x +
            0.0171201 * x ** 3 + 0.000640711 * x ** 4)


_DISTRIBUTIONS = {"ggx": C.TROWBRIDGE_REITZ, "trowbridge-reitz": C.TROWBRIDGE_REITZ,
                  "beckmann": C.BECKMANN}


class Material:
    category: int = 0
    variant: int = 0    # static sub-type (microfacet distribution kind)

    def pack(self):  # pragma: no cover - overridden
        raise NotImplementedError


class Matte(Material):
    category = C.MATTE

    def __init__(self, kd: float = 1.0, sigma: float = 0.0):
        if kd <= 0:
            kd = 1.0
        self.kd = float(kd)
        self.sigma = float(sigma)  # degrees, like the reference API

    def pack(self) -> MatteP:
        return MatteP(jnp.float32(self.kd),
                      jnp.float32(self.sigma * math.pi / 180.0))


class Mirror(Material):
    category = C.MIRROR

    def __init__(self, kr: float = 1.0):
        if kr <= 0:
            kr = 0.5
        self.kr = float(kr)

    def pack(self) -> MirrorP:
        return MirrorP(jnp.float32(self.kr))


# Default conductor spectra: gold-ish eta/k (ref: material.js:87-88).
_DEFAULT_ETA = (9.530817595377695, 6.635831967341377, 4.47513354108444)
_DEFAULT_K = (13.028170336874789, 8.112634272577575, 5.502811570992323)


class Metal(Material):
    category = C.METAL

    def __init__(self, roughness: float = 0.01, uroughness: float = 0.0,
                 vroughness: float = 0.0, eta=None, k=None,
                 distribution: str = "ggx"):
        self.uroughness = float(uroughness) if uroughness != 0 else float(roughness)
        self.vroughness = float(vroughness) if vroughness != 0 else float(roughness)
        self.eta = tuple(float(v) for v in (eta if eta is not None else _DEFAULT_ETA))
        self.k = tuple(float(v) for v in (k if k is not None else _DEFAULT_K))
        # The reference hardcodes Trowbridge-Reitz (metal.glsl:16); Beckmann
        # exists in its library (microfacet.glsl:1-44) but is unreachable —
        # here it is selectable, compiled in via static scene structure.
        self.variant = _DISTRIBUTIONS[distribution.lower()]

    def pack(self) -> MetalP:
        return MetalP(jnp.float32(self.uroughness), jnp.float32(self.vroughness),
                      splat(self.eta), splat(self.k))


class Glass(Material):
    category = C.GLASS

    def __init__(self, kr: float = 1.0, kt: float = 1.0, eta: float = 1.5,
                 uroughness: float = 0.0, vroughness: float = 0.0,
                 distribution: str = "ggx"):
        self.kr = float(kr)
        self.kt = float(kt)
        self.eta = float(eta)
        self.uroughness = float(uroughness)
        self.vroughness = float(vroughness)
        self.variant = _DISTRIBUTIONS[distribution.lower()]

    def pack(self) -> GlassP:
        return GlassP(jnp.float32(self.kr), jnp.float32(self.kt),
                      jnp.float32(self.eta), jnp.float32(self.uroughness),
                      jnp.float32(self.vroughness))
