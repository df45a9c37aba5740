"""Canonical benchmark scenes (the BASELINE.md measurement configs).

Cameras view from -z toward +z, matching the reference demo (ui/ui.js:12-14
camera [2.78,2.73,-6] -> [2.78,2.73,2.79]): the cornellbox's far z=max wall
is white; its z=min side (behind the camera) is the open/black one
(ref: shape/cornellbox.glsl getCornellboxColor falls through to BLACK for
z=min, and intersectCornellbox always takes tFar).

Scene 1/2 mirror the reference demo's default Cornell box
(ref: /root/reference/ui/ui.js:9-42); scene 3 the material demo
(img/ex_meterial.png); scene 4 exercises cone/quadric geometry and
point/spot lights.
"""
from __future__ import annotations

from . import (AreaLight, Camera, Checkerboard2, Cone, Cornellbox, Cylinder,
               Disk, Glass, Matte, Metal, Mirror, Paraboloid, PointLight,
               Rectangle, Scene, Sphere, SpotLight, UniformColor)


def cornell_matte(light_emission=(5.0, 5.0, 5.0)) -> Scene:
    """Config 1: Cornell box + single matte sphere + ceiling area light."""
    scene = Scene()
    scene.add(Camera((0.0, 0.0, -2.5), (0.0, 0.0, 0.0)))
    scene.add(Cornellbox((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)))
    scene.add(Sphere((0.0, -0.6, 0.0), 0.4, Matte(kd=1.0)))
    scene.add(AreaLight(
        Rectangle((-0.3, 0.98, -0.3), (0.3, 0.98, 0.3), Matte()),
        light_emission))
    return scene


def cornell_mirror(light_emission=(5.0, 5.0, 5.0)) -> Scene:
    """Config 2: Cornell box + mirror sphere + matte sphere."""
    scene = Scene()
    scene.add(Camera((0.0, 0.0, -2.5), (0.0, 0.0, 0.0)))
    scene.add(Cornellbox((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)))
    scene.add(Sphere((-0.45, -0.6, -0.2), 0.4, Mirror(kr=1.0)))
    scene.add(Sphere((0.45, -0.6, 0.2), 0.4, Matte(kd=1.0)))
    scene.add(AreaLight(
        Rectangle((-0.3, 0.98, -0.3), (0.3, 0.98, 0.3), Matte()),
        light_emission))
    return scene


def material_demo() -> Scene:
    """Config 3: metal/mirror/glass/matte spheres over a checkerboard."""
    scene = Scene()
    scene.add(Camera((0.0, 0.3, -2.8), (0.0, 0.0, 0.0)))
    scene.add(Cornellbox((-1.5, -1.0, -1.5), (1.5, 1.5, 1.5)))
    floor_tex = Checkerboard2((1.0, 1.0, 1.0), (0.2, 0.2, 0.2), 0.25)
    scene.add(Rectangle((-1.5, -0.99, -1.5), (1.5, -0.99, 1.5),
                        Matte(), floor_tex))
    scene.add(Sphere((-0.9, -0.65, 0.0), 0.33, Metal(roughness=0.1)))
    scene.add(Sphere((-0.3, -0.65, 0.0), 0.33, Mirror()))
    scene.add(Sphere((0.3, -0.65, 0.0), 0.33, Glass(eta=1.5)))
    scene.add(Sphere((0.9, -0.65, 0.0), 0.33, Matte(kd=0.9, sigma=20.0)))
    scene.add(AreaLight(
        Rectangle((-0.5, 1.48, -0.5), (0.5, 1.48, 0.5), Matte()),
        (6.0, 6.0, 6.0)))
    return scene


def lights_and_quadrics() -> Scene:
    """Config 4: area+spot+point lights, cone/cylinder/disk/paraboloid."""
    scene = Scene()
    scene.add(Camera((0.0, 0.6, -3.0), (0.0, 0.0, 0.0)))
    scene.add(Cornellbox((-1.5, -1.0, -1.5), (1.5, 1.8, 1.5)))
    scene.add(Cone((-0.8, -1.0, -0.3), 0.9, 0.35, Matte(kd=0.9)))
    scene.add(Cylinder((0.0, -1.0, -0.5), 0.7, 0.25, Metal(roughness=0.05)))
    scene.add(Disk((0.8, -0.99, 0.2), 0.45, 0.1, Matte(kd=1.0)))
    scene.add(Paraboloid((0.6, -1.0, 0.6), 0.0, 0.6, 0.3, Matte(kd=0.8)))
    scene.add(AreaLight(
        Rectangle((-0.4, 1.78, -0.4), (0.4, 1.78, 0.4), Matte()),
        (4.0, 4.0, 4.0)))
    scene.add(PointLight((-1.0, 1.2, 1.0), (0.6, 0.6, 0.6)))
    scene.add(SpotLight((1.0, 1.5, 0.0), 35.0, 10.0, (2.0, 2.0, 2.0)))
    return scene


def material_demo_open() -> Scene:
    """material_demo without the enclosing cornellbox: primary and secondary
    rays can escape into the sky, which kills lanes in spatially-coherent
    tiles — the scene the megakernel's per-tile bounce early-exit is for
    (docs/OCCUPANCY.md; measured perfect-compaction bound 3.05x vs 1.18x
    for the closed configs)."""
    scene = Scene()
    scene.add(Camera((0.0, 0.3, -2.8), (0.0, 0.0, 0.0)))
    floor_tex = Checkerboard2((1.0, 1.0, 1.0), (0.2, 0.2, 0.2), 0.25)
    scene.add(Rectangle((-1.5, -0.99, -1.5), (1.5, -0.99, 1.5),
                        Matte(), floor_tex))
    scene.add(Sphere((-0.9, -0.65, 0.0), 0.33, Metal(roughness=0.1)))
    scene.add(Sphere((-0.3, -0.65, 0.0), 0.33, Mirror()))
    scene.add(Sphere((0.3, -0.65, 0.0), 0.33, Glass(eta=1.5)))
    scene.add(Sphere((0.9, -0.65, 0.0), 0.33, Matte(kd=0.9, sigma=20.0)))
    scene.add(AreaLight(
        Rectangle((-0.5, 1.48, -0.5), (0.5, 1.48, 0.5), Matte()),
        (6.0, 6.0, 6.0)))
    return scene
