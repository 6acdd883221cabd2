"""On-chip AD-vs-FD gate for noise_impl="table" through the kernel VJP
(r5 item 6): builds a small noise scene, renders differentiably with the
reference's exact 256-entry Perlin tables on BOTH directions, and checks
the texture-scale and sphere-z gradients against central differences.

Usage: python tools/check_table_grad.py [--res 64] [--depth 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOISE_J = {
    "background_color": [0.7, 0.75, 0.8],
    "camera": {"fov": 42, "center": [0, 2, 5], "look_at": [0, 0.5, 0]},
    "textures": [{"type": "noise", "albedo": [0.85, 0.8, 0.75],
                  "scale": 0.6, "noise_type": 0}],
    "materials": [
        {"type": "texture", "tex_idx": 0},
        {"type": "metal", "albedo": [0.9, 0.9, 0.9], "fuzz": 0.0},
    ],
    "primitives": [
        {"type": "quad", "q": [-30, 0, -30], "u": [60, 0, 0],
         "v": [0, 0, 60], "material": 0},
        {"type": "sphere", "center": [0, 1.0, 0], "radius": 0.9,
         "material": 1},
    ],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--eps", type=float, default=5e-3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from raytrace2_tpu import grad as grad_mod
    from raytrace2_tpu.scene import loader, schema
    from raytrace2_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(NOISE_J, f)
        path = f.name
    scene_host, _ = loader.load_scene(path)
    scene = schema.to_device(scene_host)
    feat = scene_host.features()
    assert feat.get("has_noise")
    feat["use_megakernel"] = True
    feat["noise_impl"] = "table"
    features = tuple(sorted(feat.items()))
    kw = dict(width=args.res, height=args.res, n_samples=1,
              max_depth=args.depth, sqrt_spp=1)

    def case(name, move):
        @jax.jit
        def f(delta):
            return jnp.mean(grad_mod.render_image(
                move(delta), features, 0, **kw))

        got = float(jax.grad(f)(0.0))
        want = float((f(args.eps) - f(-args.eps)) / (2 * args.eps))
        rel = abs(got - want) / max(abs(want), 1e-12)
        ok = (np.isfinite(got)
              and (abs(want) < 5e-5 and abs(got) < 5e-5
                   or (np.sign(got) == np.sign(want)
                       and 0.5 < abs(got / want) < 2.0)))
        print(json.dumps({"leaf": name, "ad": got, "fd": want,
                          "rel_err": round(rel, 5), "ok": bool(ok)}),
              flush=True)
        return ok

    oks = []
    oks.append(case("tex_scale", lambda d: dataclasses.replace(
        scene, textures=dataclasses.replace(
            scene.textures, scale=scene.textures.scale.at[0].add(d)))))
    oks.append(case("sphere_z", lambda d: dataclasses.replace(
        scene, spheres=dataclasses.replace(
            scene.spheres,
            center0=scene.spheres.center0.at[0, 2].add(d)))))
    oks.append(case("tex_albedo_r", lambda d: dataclasses.replace(
        scene, textures=dataclasses.replace(
            scene.textures, albedo=scene.textures.albedo.at[0, 0].add(d)))))
    print(json.dumps({"all_ok": bool(all(oks))}))
    sys.exit(0 if all(oks) else 1)


if __name__ == "__main__":
    main()
