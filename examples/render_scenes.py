"""Render the benchmark scenes to PNG (the framework's analog of the
reference's golden images img/ex_cornellbox.png, img/ex_meterial.png)."""
import argparse
import time

import jax

from sail_tpu import scenes
from sail_tpu.render.integrator import render_image
from sail_tpu.utils.imageio import write_png
from sail_tpu.utils.metrics import RenderMeter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--scene", default="all",
                    choices=["all", "cornell_matte", "cornell_mirror",
                             "material_demo", "lights_and_quadrics"])
    ap.add_argument("--out", default=".")
    args = ap.parse_args()

    names = ([args.scene] if args.scene != "all" else
             ["cornell_matte", "cornell_mirror", "material_demo",
              "lights_and_quadrics"])
    use_megakernel = jax.default_backend() == "tpu"
    for name in names:
        scene = getattr(scenes, name)()
        packed, static = scene.pack()
        if use_megakernel:
            from sail_tpu.ops.pallas.megakernel import render_image_fast
            fn = jax.jit(lambda p: render_image_fast(
                p, 0, static, args.size, args.size, args.spp, args.bounces))
        else:
            fn = jax.jit(lambda p: render_image(
                p, static, args.size, args.size, args.spp,
                max_bounces=args.bounces))
        meter = RenderMeter(args.size, args.size, args.bounces)
        img = fn(packed)  # compile
        meter.start()
        img = fn(packed)
        meter.stop(args.spp, sync=img.x)
        path = f"{args.out}/{name}_{args.size}_{args.spp}spp.png"
        write_png(path, img.stack())
        print(name, "->", path, meter)


if __name__ == "__main__":
    main()
