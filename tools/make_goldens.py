"""Generate the committed golden renders for tests/test_goldens.py.

The reference pins its estimator with checked-in example renders
(/root/reference/img/ex_cornellbox.png, ex_meterial.png, README.md:12,16);
these goldens play the same role with an actual regression test attached:
any estimator change (NEE weights, BSDF factors, RNG streams, filter math)
shifts the pixels and fails the comparison.

Run from the repo root after an INTENTIONAL estimator change, then commit
the regenerated .npy files together with the change:

    PYTHONPATH=/root/repo python tools/make_goldens.py
"""
import os

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

# (name, scene factory, bounces) — BASELINE.md measurement configs 1-4
CONFIGS = [
    ("config1_cornell_matte", "cornell_matte", 2),
    ("config2_cornell_mirror", "cornell_mirror", 3),
    ("config3_material_demo", "material_demo", 3),
    ("config4_lights_quadrics", "lights_and_quadrics", 3),
]
SIZE = 64
SPP = 4
SEED = 0


def render_one(scene_name: str, bounces: int) -> np.ndarray:
    from sail_tpu import scenes
    from sail_tpu.render.integrator import render_image

    scene = getattr(scenes, scene_name)()
    packed, static = scene.pack()
    img = render_image(packed, static, SIZE, SIZE, SPP, seed=SEED,
                       max_bounces=bounces)
    return np.asarray(img.stack(), dtype=np.float32)


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, scene_name, bounces in CONFIGS:
        img = render_one(scene_name, bounces)
        path = os.path.join(GOLDEN_DIR, f"{name}.npy")
        np.save(path, img)
        print(f"{name}: {img.shape} mean={img.mean():.5f} -> {path}")


if __name__ == "__main__":
    main()
