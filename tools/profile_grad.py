"""Decompose the gradient kernel's cost (VERDICT r4 weak #4 / item 5).

Times, on the attached chip, for a given scene/depth/sample-batch:

  * fwd       — the forward kernel alone (what bench.py times without --grad)
  * prepass   — the backward kernel in phase="prepass": camera + winner
                search + resolve/shade advance per bounce, winners stacked,
                NO vjp segments (the non-differentiable half of the replay)
  * full      — the production backward kernel (pre-pass + segment vjps +
                one-hot MXU scatter-adds)
  * full-prepass = the differentiated segments' cost
  * sublanes sweep — GRAD_SUBLANES alternatives

Usage: python tools/profile_grad.py [SCENE.json] [--res 600] [--depth 50]
       [--spp 4] [--sublanes 8,16,32]
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
    ap.add_argument("scene", nargs="?",
                    default="/root/reference/data/cornell_box_original.json")
    ap.add_argument("--res", type=int, default=600)
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--sublanes", default="16")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from raytrace2_tpu.scene import loader, schema
    from raytrace2_tpu.ops import camera as camera_ops
    from raytrace2_tpu.ops.pallas import megakernel as mk
    from raytrace2_tpu.ops.pallas import megakernel_grad as mkg
    from raytrace2_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    scene_host, _dims = loader.load_scene(args.scene)
    scene = schema.to_device(scene_host)
    feats = scene_host.features()
    W = H = args.res
    sizes = tuple(feats["mega_sizes"])
    n_total = W * H
    spp = args.spp
    frame = camera_ops.camera_frame(scene.camera, W, H)
    camv = jnp.concatenate([
        frame["pixel00"], frame["pixel_delta_u"], frame["pixel_delta_v"],
        frame["center"], frame["defocus_disk_u"], frame["defocus_disk_v"],
        jnp.stack([
            frame["defocus_angle"].astype(jnp.float32),
            jnp.float32(W), jnp.float32(n_total), jnp.float32(0),
            jnp.float32(spp), jnp.float32(max(int(np.sqrt(spp)), 1)),
            jnp.float32(0), jnp.float32(0), jnp.float32(1), jnp.float32(H),
        ]),
    ])
    tables = mk.pack_tables(scene, sizes)
    seedi = jnp.zeros(1, jnp.int32)
    fwd_sublanes = mk.SUBLANES
    tile_r = fwd_sublanes * mk.LANES
    n_rays = -(-n_total // tile_r) * tile_r
    g = jnp.ones((n_rays, 3), jnp.float32)
    kw = dict(
        n_rays=n_rays, max_depth=args.depth,
        has_checker=int(feats.get("has_checker", 1)),
        has_noise=bool(feats.get("has_noise", False)),
        sizes=sizes, interpret=False, fwd_sublanes=fwd_sublanes,
        linear_slots=True, n_samples=spp,
    )

    def readback(out):
        # Forced value readback: block_until_ready can return early
        # through the network-attached runtime (see bench.py).
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(leaf.ravel()[0])

    def timeit(fn, reps):
        readback(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        readback(out)
        return (time.perf_counter() - t0) / reps * 1e3

    paths = n_total * spp

    @jax.jit
    def fwd():
        return mk.trace_megakernel_batch(
            camv, seedi, tables, scene.background, n_rays=n_rays,
            max_depth=args.depth, has_checker=kw["has_checker"],
            has_noise=kw["has_noise"], sizes=sizes, interpret=False,
            sublanes=fwd_sublanes, wave_frac=1.0, linear_slots=True)

    res = {"scene": os.path.basename(args.scene), "res": args.res,
           "depth": args.depth, "spp": spp, "n_rays": n_rays}
    res["fwd_ms"] = round(timeit(lambda: fwd(), args.reps), 2)
    res["fwd_mpaths_s"] = round(paths / res["fwd_ms"] / 1e3, 1)

    for sub in [int(x) for x in args.sublanes.split(",")]:
        if n_rays % (sub * mk.LANES):
            continue
        for phase in ("prepass", "full"):
            t = timeit(lambda: mkg._grad_call(
                camv, seedi, tables, scene.background, g,
                phase=phase, sublanes=sub, **kw), args.reps)
            res[f"bwd_{phase}_s{sub}_ms"] = round(t, 2)
            print(json.dumps({f"bwd_{phase}_s{sub}_ms": round(t, 2)}),
                  flush=True)
        full = res[f"bwd_full_s{sub}_ms"]
        pre = res[f"bwd_prepass_s{sub}_ms"]
        res[f"segments_s{sub}_ms"] = round(full - pre, 2)
        res[f"fwdbwd_mpaths_s_s{sub}"] = round(
            paths / (res["fwd_ms"] + full) / 1e3, 1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
