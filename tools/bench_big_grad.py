"""On-chip check + timing for BIG-scene deep gradients (VERDICT r5 item 2).

Runs book2-class scenes through the Pallas custom-VJP at the corpus's own
depth 50 (make_scene.py:348): one full-resolution training step
(value_and_grad of an L2 loss, full scene gradient), timed; plus an AD-vs-
central-FD gate on a material albedo at reduced resolution.

Usage: python tools/bench_big_grad.py SCENE.json [--res 600] [--spp 4]
       [--depth 50] [--fd-res 64] [--steps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--res", type=int, default=600)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--fd-res", type=int, default=64)
    ap.add_argument("--fd-depth", type=int, default=None)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--skip-fd", action="store_true")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    from raytrace2_tpu import grad as grad_mod
    from raytrace2_tpu.scene import loader, schema
    from raytrace2_tpu.ops.pallas import megakernel_grad as mkg
    from raytrace2_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    scene_host, _dims = loader.load_scene(args.scene)
    scene = schema.to_device(scene_host)
    feat = scene_host.features()
    feat["use_megakernel"] = True
    features = tuple(sorted(feat.items()))
    sizes = tuple(feat["mega_sizes"])
    print(json.dumps({"scene": os.path.basename(args.scene),
                      "sizes": sizes, "depth": args.depth,
                      "grad_supported": mkg.grad_supported(
                          sizes, args.depth,
                          bool(feat.get("has_noise")))}), flush=True)

    kw = dict(width=args.res, height=args.res, n_samples=args.spp,
              max_depth=args.depth, sqrt_spp=max(int(np.sqrt(args.spp)), 1))

    def loss_fn(img):
        return jnp.mean(jnp.square(img - 0.25))

    t0 = time.perf_counter()
    loss, g = grad_mod.value_and_grad_scene(
        loss_fn, scene, features, 0, **kw)
    loss.block_until_ready()
    print(json.dumps({"compile_plus_first_step_s":
                      round(time.perf_counter() - t0, 1),
                      "loss": float(loss)}), flush=True)
    alb = np.asarray(g.materials.albedo)
    print(json.dumps({"grad_albedo_norm": float(np.linalg.norm(alb)),
                      "grad_finite": bool(np.isfinite(alb).all())}),
          flush=True)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        loss, g = grad_mod.value_and_grad_scene(
            loss_fn, scene, features, 0, **kw)
    loss.block_until_ready()
    dt = (time.perf_counter() - t0) / args.steps
    paths = args.res * args.res * args.spp
    print(json.dumps({"train_step_s": round(dt, 3),
                      "res": args.res, "spp": args.spp,
                      "fwdbwd_mpaths_s": round(paths / dt / 1e6, 2)}),
          flush=True)

    if args.skip_fd:
        return
    # --- AD vs central FD on one material albedo channel ----------------
    fd_depth = args.fd_depth or args.depth
    kw_fd = dict(width=args.fd_res, height=args.fd_res, n_samples=1,
                 max_depth=fd_depth, sqrt_spp=1)
    # pick the first lambertian-ish material channel
    idx = (0, 0)

    def set_leaf(delta):
        m = scene.materials
        return dataclasses.replace(
            scene, materials=dataclasses.replace(
                m, albedo=m.albedo.at[idx].add(delta)))

    @jax.jit
    def f(delta):
        return jnp.mean(grad_mod.render_image(
            set_leaf(delta), features, 0, **kw_fd))

    got = float(jax.grad(f)(0.0))
    eps = 2e-3
    want = float((f(eps) - f(-eps)) / (2 * eps))
    rel = abs(got - want) / max(abs(want), 1e-12)
    print(json.dumps({"fd_depth": fd_depth, "ad": got, "fd": want,
                      "rel_err": round(rel, 5)}), flush=True)


if __name__ == "__main__":
    main()
