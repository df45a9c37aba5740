"""Selection-box overlay (the reference's line pass, renderer.js:65-71)."""
import numpy as np

import sail_tpu as sail
from sail_tpu import scenes
from sail_tpu.core.camera import rays_for_pixels
from sail_tpu.render import overlay


def test_object_bounds_all_shapes():
    cases = [
        (sail.Cube((-1, -2, -3), (1, 2, 3)), (-1, -2, -3), (1, 2, 3)),
        (sail.Sphere((1, 2, 3), 0.5), (0.5, 1.5, 2.5), (1.5, 2.5, 3.5)),
        (sail.Rectangle((0, 1, 0), (2, 1, 2)), (0, 1, 0), (2, 1, 2)),
        (sail.Cone((0, 0, 0), 2.0, 0.5), (-0.5, 0, -0.5), (0.5, 2, 0.5)),
        (sail.Cylinder((1, 0, 1), 1.0, 0.25), (0.75, 0, 0.75), (1.25, 1, 1.25)),
        (sail.Paraboloid((0, 0, 0), 0.0, 0.6, 0.3), (-0.3, 0, -0.3), (0.3, 0.6, 0.3)),
    ]
    for obj, lo, hi in cases:
        blo, bhi = overlay.object_bounds(obj)
        np.testing.assert_allclose(blo, lo, atol=1e-6)
        np.testing.assert_allclose(bhi, hi, atol=1e-6)
    # disk: thin in y
    blo, bhi = overlay.object_bounds(sail.Disk((0, 1, 0), 0.5))
    np.testing.assert_allclose(blo[[0, 2]], [-0.5, -0.5])
    np.testing.assert_allclose(bhi[[0, 2]], [0.5, 0.5])
    assert bhi[1] - blo[1] < 0.01


def test_bounds_follow_temporary_translate():
    s = sail.Sphere((0, 0, 0), 1.0)
    s.temporary_translate((2.0, 0.0, 0.0))
    lo, hi = overlay.object_bounds(s)
    np.testing.assert_allclose((lo + hi) / 2, [2, 0, 0], atol=1e-6)


def test_project_inverts_primary_rays():
    """A point along pixel (i, j)'s center ray must project back to (j, i)."""
    scene = scenes.cornell_mirror()
    packed, _ = scene.pack()
    h = w = 64
    for (i, j) in [(32, 32), (5, 50), (60, 8)]:
        ro, rd = rays_for_pixels(packed.camera, float(i), float(j), h, w)
        p = np.array([float(ro.x + rd.x * 3.0), float(ro.y + rd.y * 3.0),
                      float(ro.z + rd.z * 3.0)])[None]
        xy, front = overlay.project_points(scene.camera, p, w, h)
        assert front[0]
        np.testing.assert_allclose(xy[0], [j, i], atol=1e-3)


def test_point_behind_camera_flagged():
    scene = scenes.cornell_mirror()
    eye = np.asarray(scene.camera.eye)
    center = np.asarray(scene.camera.center)
    behind = eye + (eye - center)
    _, front = overlay.project_points(scene.camera, behind[None], 64, 64)
    assert not front[0]


def test_selection_segments_and_draw():
    scene = scenes.cornell_mirror()
    # object 1 = the mirror sphere (0 is the cornellbox)
    idx = next(i for i, o in enumerate(scene.objects)
               if isinstance(o, sail.Sphere))
    segs = overlay.selection_segments(scene, idx, 64, 64)
    assert len(segs) == 12  # full AABB wireframe visible
    img = np.zeros((64, 64, 3), np.float32)
    overlay.draw_selection(img, scene, idx)
    assert (img > 0).any()
    # None is a no-op
    img2 = np.zeros((64, 64, 3), np.float32)
    overlay.draw_selection(img2, scene, None)
    assert (img2 == 0).all()


def test_near_plane_corner_clipped_not_allocated():
    """A selected object with a corner at camera-depth ~1e-8 projects that
    corner to ~1e8 px; the raster walk must clip to the viewport before
    sizing its linspace (VERDICT r3 weak #4: unclipped length attempted a
    multi-GB allocation)."""
    scene = sail.Scene()
    eye = [0.0, 0.0, 2.0]
    scene.add(sail.Camera(eye, [0.0, 0.0, 0.0]))
    scene.add(sail.Cornellbox([-1, -1, -1], [1, 1, 1]))
    # cube whose near face passes 1e-8 in FRONT of the eye: two corners
    # project to astronomically large pixel coordinates but stay front=True
    scene.add(sail.Cube([-0.2, -0.2, -0.2], [0.4, 0.4, eye[2] - 1e-8]))
    idx = len(scene.objects) - 1
    img = np.zeros((64, 64, 3), np.float32)
    out = overlay.draw_selection(img, scene, idx)  # must not MemoryError/hang
    assert out.shape == img.shape


def test_clip_segment_cases():
    # fully inside: unchanged
    p = overlay._clip_segment((1.0, 1.0), (5.0, 5.0), 64, 64)
    np.testing.assert_allclose(p, [(1, 1), (5, 5)])
    # fully outside: dropped
    assert overlay._clip_segment((-10, -10), (-5, -20), 64, 64) is None
    # crossing: endpoints land on the viewport border
    (a, b) = overlay._clip_segment((-10.0, 32.0), (100.0, 32.0), 64, 64)
    assert a[0] == 0.0 and b[0] == 63.0


def test_renderer_output_draws_selection():
    scene = scenes.cornell_mirror()
    idx = next(i for i, o in enumerate(scene.objects)
               if isinstance(o, sail.Sphere))
    r = sail.Renderer(32, 32)
    r.update(scene)          # no samples: accumulation is zeros
    plain = r.output(scene)
    scene.select = idx
    marked = r.output(scene)
    scene.select = None
    assert (marked != plain).any()
