"""Public API / renderer behavior tests (progressive accumulation,
motion reset, checkpoint/resume, picking, orbit control, textures)."""
import numpy as np
import pytest

import sail_tpu as sail
from sail_tpu import scenes
from sail_tpu.render.control import Control
from sail_tpu.render import picking

H = W = 24


@pytest.fixture(scope="module")
def renderer_and_scene():
    scene = scenes.cornell_matte()
    r = sail.Renderer(W, H, max_bounces=2)
    r.update(scene)
    return r, scene


def test_progressive_accumulation(renderer_and_scene):
    r, scene = renderer_and_scene
    r.reset()
    r.render(scene)
    assert r.sample_count == 1
    img1 = r.output(scene)
    r.render(scene)
    img2 = r.output(scene)
    assert r.sample_count == 2
    assert img1.shape == (H, W, 3)
    # different samples → accumulation actually changes the estimate
    assert not np.allclose(img1, img2)
    # variance shrinks with more samples: just sanity that values stay bounded
    assert np.isfinite(img2).all()


def test_motion_resets_accumulation(renderer_and_scene):
    r, scene = renderer_and_scene
    r.reset()
    r.render(scene)
    r.render(scene)
    assert r.sample_count == 2
    scene.moving = True
    r.render(scene)
    assert r.sample_count == 1
    scene.moving = False


def test_checkpoint_resume(renderer_and_scene):
    r, scene = renderer_and_scene
    r.reset()
    r.render(scene)
    r.render(scene)
    state = r.checkpoint()
    img_before = r.output(scene)
    r.reset()
    r.restore(state)
    assert r.sample_count == 2
    np.testing.assert_allclose(r.output(scene), img_before, rtol=1e-5)


def test_checkpoint_to_disk_resume_continues_identically(
        renderer_and_scene, tmp_path):
    """Disk save/load then continued sampling must match an uninterrupted
    render bit-for-bit (counter-based RNG, SURVEY.md §5 checkpoint/resume)."""
    r, scene = renderer_and_scene
    r.reset()
    r.render(scene)
    r.render(scene)
    path = str(tmp_path / "state.npz")
    r.save(path)
    r.render(scene)                     # uninterrupted: 3 samples
    img_uninterrupted = r.output(scene)
    r.reset()
    r.load(path)
    assert r.sample_count == 2
    r.render(scene)                     # resumed: same 3rd sample
    np.testing.assert_allclose(r.output(scene), img_uninterrupted, rtol=1e-6)


def test_filter_switch(renderer_and_scene):
    r, scene = renderer_and_scene
    r.reset()
    r.render(scene)
    scene.filter = "gamma"
    img_g = r.output(scene)
    scene.filter = "color"
    img_c = r.output(scene)
    assert not np.allclose(img_g, img_c)
    scene.filter = "not-a-filter"
    assert scene.filter == "color"  # invalid names ignored (ref scene.js:24-27)


def test_pick_finds_sphere():
    scene = scenes.cornell_matte()
    # sphere at (0,-0.6,0) r=0.4 from eye (0,0,2.5): project to pixel
    # center-bottom area; scan a column to find it
    found = None
    for y in range(H // 2, H):
        idx = picking.pick(scene, W / 2, y, W, H)
        if idx is not None:
            found = idx
            break
    assert found == 1  # sphere is object 1 (cornellbox is 0, not pickable)


def test_drag_translates_object():
    scene = scenes.cornell_matte()
    sphere = scene.objects[1]
    c0 = sphere.center
    ctl = Control(scene, W, H)
    y_hit = None
    for y in range(H // 2, H):
        if picking.pick(scene, W / 2, y, W, H) is not None:
            y_hit = y
            break
    assert ctl.mouse_down(W / 2, y_hit)
    ctl.mouse_move(W / 2 + 2, y_hit)
    assert scene.moving
    ctl.mouse_up()
    assert sphere.center != c0
    assert not scene.moving


def test_orbit_moves_eye():
    scene = scenes.cornell_matte()
    eye0 = scene.camera.eye
    ctl = Control(scene, W, H)
    ctl.orbit(10, 0)
    assert scene.camera.eye != eye0
    # radius preserved under orbit
    import math
    d0 = math.dist(eye0, scene.camera.center)
    d1 = math.dist(scene.camera.eye, scene.camera.center)
    assert d1 == pytest.approx(d0, rel=1e-6)
    ctl.zoom(+1)
    d2 = math.dist(scene.camera.eye, scene.camera.center)
    assert d2 == pytest.approx(d0 * 0.9, rel=1e-6)


def test_texture_classes_roundtrip():
    from sail_tpu import Bilerp, Checkerboard, Checkerboard2, Mix, ScaleT, UV
    for tex in [Checkerboard(), Checkerboard2(), Bilerp((1, 0, 0), (0, 1, 0),
                (0, 0, 1), (1, 1, 1)), Mix((1, 0, 0), (0, 0, 1), 0.3),
                ScaleT((1, 1, 0), (0.5, 0.5, 0.5)), UV()]:
        packed = tex.pack()
        assert packed is not None


def test_scene_add_dispatch_and_area_light_injection():
    scene = sail.Scene()
    scene.add(sail.Camera((0, 0, 3), (0, 0, 0)))
    rect = sail.Rectangle((-1, 1, -1), (1, 1, 1), sail.Matte())
    scene.add(sail.AreaLight(rect, (3, 3, 3)))
    assert len(scene.objects) == 1  # geometry injected
    assert scene.objects[0] is rect
    assert rect.emission == (3.0, 3.0, 3.0)
    packed, static = scene.pack()
    assert static.area_light_objects == (0,)
    assert static.object_emissive == (True,)
