"""sail_tpu — a TPU-native differentiable path tracer.

Public API mirrors the reference renderer's `window.Sail` namespace
(ref: /root/reference/index.js:14-46): scene-graph classes, materials,
lights, textures, and a progressive `Renderer` — plus what the reference
never had: differentiability end-to-end, multi-device sharding, tests,
and benchmarks.
"""

from . import constants
from .constants import MAX_BOUNCES
from .core.camera import CameraParams, generate_rays, make_camera
from .core.vecmath import Vec3, vec3
from .scene.geometry import (Cone, Cornellbox, Cube, Cylinder, Disk,
                             Hyperboloid, Object3D, Paraboloid, Rectangle,
                             Sphere)
from .scene.light import AreaLight, Light, PointLight, SpotLight
from .scene.material import Glass, Material, Matte, Metal, Mirror
from .scene.scene import Camera, PackedScene, Scene, SceneStatic
from .scene.texture import (Bilerp, Checkerboard, Checkerboard2, Color, Mix,
                            ScaleT, Texture, UniformColor, UV)
from .utils.matrix import Matrix, Vector

# The reference names this texture `Scale` (ref: index.js:41); `ScaleT`
# avoided clashing with Matrix.Scale but the reference spelling works too.
Scale = ScaleT

__all__ = [
    "constants", "MAX_BOUNCES",
    "Vec3", "vec3", "CameraParams", "make_camera", "generate_rays",
    "Scene", "Camera", "PackedScene", "SceneStatic",
    "Object3D", "Cube", "Sphere", "Rectangle", "Cone", "Cylinder", "Disk",
    "Hyperboloid", "Paraboloid", "Cornellbox",
    "Material", "Matte", "Mirror", "Metal", "Glass",
    "Light", "AreaLight", "PointLight", "SpotLight",
    "Texture", "UniformColor", "Checkerboard", "Checkerboard2", "Bilerp",
    "Mix", "ScaleT", "Scale", "UV", "Color",
    "Matrix", "Vector",
    "Renderer", "Control", "ElasticRenderer",
]

__version__ = "0.1.0"


def __getattr__(name):
    # Renderer imports integrator/filters lazily to keep `import sail_tpu`
    # light for scene-building-only use.
    if name == "Renderer":
        from .render.renderer import Renderer
        return Renderer
    if name == "Control":
        from .render.control import Control
        return Control
    if name == "ElasticRenderer":
        from .parallel.elastic import ElasticRenderer
        return ElasticRenderer
    raise AttributeError(f"module 'sail_tpu' has no attribute {name!r}")
