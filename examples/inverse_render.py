"""Inverse rendering demo: recover material + emitter parameters from a
target image by gradient descent through the path tracer (the capability the
reference renderer entirely lacks — SURVEY.md §2.5 gradient communication).

Renders a target with the true scene, perturbs the mirror reflectance and
the lamp emission, then optimizes them back.  On TPU the loss/gradient ride
the Pallas forward+backward megakernels through the sharded train step.

Usage:  python examples/inverse_render.py --size 128 --spp 8 --steps 60
"""
import argparse

import jax
import jax.numpy as jnp

from sail_tpu import scenes
from sail_tpu.diff.inverse import optimize
from sail_tpu.parallel.mesh import make_mesh
from sail_tpu.parallel.render_sharded import render_sharded
from sail_tpu.utils.imageio import write_png


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--bounces", type=int, default=3)
    ap.add_argument("--lr", type=float, default=5e-2)
    ap.add_argument("--out", default=".")
    args = ap.parse_args()

    scene = scenes.cornell_mirror()
    packed, static = scene.pack()
    mesh = make_mesh(1)

    target = render_sharded(packed, static, mesh, args.size, args.size,
                            args.spp, seed=0, max_bounces=args.bounces)

    # perturb: dim the lamp, darken the mirror
    perturbed = packed._replace(
        lights=tuple(lp._replace(emission=lp.emission * 0.5)
                     for lp in packed.lights),
        materials=tuple(
            m._replace(kr=m.kr * 0.4) if hasattr(m, "kr") and
            not hasattr(m, "kt") else m
            for m in packed.materials),
    )

    losses = []
    result = optimize(
        perturbed, target, static, mesh, args.size, args.size, args.spp,
        steps=args.steps, learning_rate=args.lr,
        trainable=lambda k: ".materials" in k or ".lights" in k,
        max_bounces=args.bounces,
        callback=lambda i, l, p: losses.append(l))

    print(f"loss: {losses[0]:.6f} -> {losses[-1]:.6f} "
          f"({args.steps} steps)")
    for li, (true_lp, rec_lp) in enumerate(zip(packed.lights,
                                               result.params.lights)):
        print(f"light {li} emission: true {float(true_lp.emission.x):.3f} "
              f"recovered {float(rec_lp.emission.x):.3f}")

    img0 = render_sharded(perturbed, static, mesh, args.size, args.size,
                          args.spp, seed=0, max_bounces=args.bounces)
    img1 = render_sharded(result.params, static, mesh, args.size, args.size,
                          args.spp, seed=0, max_bounces=args.bounces)
    write_png(f"{args.out}/inverse_target.png", target.stack())
    write_png(f"{args.out}/inverse_initial.png", img0.stack())
    write_png(f"{args.out}/inverse_recovered.png", img1.stack())
    print(f"wrote {args.out}/inverse_{{target,initial,recovered}}.png")


if __name__ == "__main__":
    main()
