"""Host-side procedural texture classes + packed parameter pytrees.

Mirrors the reference's textures (ref: src/scene/texture.js and
src/shader/texture/*.glsl): UniformColor, Checkerboard (grid with grey
outline), Checkerboard2 (two-color checker), Bilerp, Mix, Scale, UV.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as C
from ..core.vecmath import Vec3, splat


class UniformColorP(NamedTuple):
    color: Vec3


class CheckerboardP(NamedTuple):
    size: jnp.ndarray
    line_width: jnp.ndarray


class Checkerboard2P(NamedTuple):
    color1: Vec3
    color2: Vec3
    size: jnp.ndarray


class BilerpP(NamedTuple):
    color00: Vec3
    color01: Vec3
    color10: Vec3
    color11: Vec3


class MixP(NamedTuple):
    color1: Vec3
    color2: Vec3
    amount: jnp.ndarray


class ScaleP(NamedTuple):
    color1: Vec3
    color2: Vec3


class UVP(NamedTuple):
    # No real parameters; a pad keeps the pytree non-empty.
    pad: jnp.ndarray


class Texture:
    category: int = 0

    def pack(self):  # pragma: no cover - overridden
        raise NotImplementedError


class UniformColor(Texture):
    category = C.UNIFORM_COLOR

    def __init__(self, color=C.WHITE):
        self.color = tuple(float(v) for v in color)

    def pack(self) -> UniformColorP:
        return UniformColorP(splat(self.color))


class Checkerboard(Texture):
    category = C.CHECKERBOARD

    def __init__(self, size: float = 0.1, line_width: float = 0.01):
        if size <= 0:
            size = 0.3
        if line_width < 0:
            line_width = 0.03
        self.size = float(size)
        self.line_width = float(line_width)

    def pack(self) -> CheckerboardP:
        return CheckerboardP(jnp.float32(self.size), jnp.float32(self.line_width))


class Checkerboard2(Texture):
    category = C.CHECKERBOARD2

    def __init__(self, color1=(1, 1, 1), color2=(0, 0, 0), size: float = 0.1):
        self.color1 = tuple(float(v) for v in color1)
        self.color2 = tuple(float(v) for v in color2)
        self.size = float(size)

    def pack(self) -> Checkerboard2P:
        return Checkerboard2P(splat(self.color1), splat(self.color2),
                              jnp.float32(self.size))


class Bilerp(Texture):
    category = C.BILERP

    def __init__(self, color00, color01, color10, color11):
        self.color00 = tuple(float(v) for v in color00)
        self.color01 = tuple(float(v) for v in color01)
        self.color10 = tuple(float(v) for v in color10)
        self.color11 = tuple(float(v) for v in color11)

    def pack(self) -> BilerpP:
        return BilerpP(splat(self.color00), splat(self.color01),
                       splat(self.color10), splat(self.color11))


class Mix(Texture):
    category = C.MIXF

    def __init__(self, color1, color2, amount: float = 0.5):
        self.color1 = tuple(float(v) for v in color1)
        self.color2 = tuple(float(v) for v in color2)
        self.amount = float(amount)

    def pack(self) -> MixP:
        return MixP(splat(self.color1), splat(self.color2), jnp.float32(self.amount))


class ScaleT(Texture):
    category = C.SCALE

    def __init__(self, color1, color2):
        self.color1 = tuple(float(v) for v in color1)
        self.color2 = tuple(float(v) for v in color2)

    def pack(self) -> ScaleP:
        return ScaleP(splat(self.color1), splat(self.color2))


class UV(Texture):
    category = C.UVF

    def pack(self) -> UVP:
        return UVP(jnp.float32(0.0))


class Color:
    """Named color factory (ref: src/core/color.js:7-30)."""
    BLACK = C.BLACK
    WHITE = C.WHITE
    GREY = C.GREY
    RED = C.RED
    GREEN = C.GREEN
    BLUE = C.BLUE

    @staticmethod
    def create_texture(color) -> UniformColor:
        return UniformColor(color)
