#!/usr/bin/env python
"""On-chip validation + benchmark sweep (run on the TPU host).

Covers the BASELINE.md eval ladder end-to-end:
1. Cornell golden render (default 1024 spp, 600x600) -> PSNR vs the
   reference's shipped screenshot.
2. Throughput for cornell (megakernel + XLA), cornell_volume (media
   in-kernel), final_render_book_1 (DoF/motion blur/checker, megakernel),
   book2 final (media+noise in-kernel; routed to the sorted-wavefront
   megakernel by record count — integrator.mega_schedule).

Dispatches are capped (default 32 samples) because long device steps can
wedge network-attached runtimes; every timing forces a scalar readback.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--golden-spp", type=int, default=4096)
    p.add_argument("--bench-spp", type=int, default=64)
    p.add_argument("--max-batch", type=int, default=32)
    p.add_argument("--data", default="/root/reference/data")
    p.add_argument("--out", default="/tmp/tpu_validate")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from raytrace2_tpu.io import compare, image
    from raytrace2_tpu.ops import integrator
    from raytrace2_tpu.scene import loader, schema
    from raytrace2_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    results = {}

    def make_runner(scene_path, W, H, depth, sqrt_spp, mega):
        scene_host, dims = loader.load_scene(scene_path)
        feat = dict(scene_host.features(), use_megakernel=mega)
        scene = schema.to_device(scene_host)

        @jax.jit
        def run(scene, s0, n):
            return integrator.render_progressive(
                scene, feat, W, H, s0, n, 0, depth, sqrt_spp
            )

        def render(spp):
            acc = None
            done = 0
            while done < spp:
                step = min(args.max_batch, spp - done)
                r = run(scene, jnp.int32(done), jnp.int32(step))
                acc = r if acc is None else acc + r
                float(r.ravel()[0])  # force
                done += step
            return np.asarray(acc) / spp

        return scene, run, render

    # ---- 1. Golden PSNR --------------------------------------------------
    args.max_batch = 128
    scene, run, render = make_runner(
        f"{args.data}/cornell_box_original.json", 600, 600, 50, 64, mega=True
    )
    t0 = time.time()
    img = render(args.golden_spp)
    dt = time.time() - t0
    image.write_image(img, f"{args.out}/cornell_golden.png")
    ours = image.to_color(img)[::-1].astype(np.float64) / 255.0
    golden = compare.load_png_normalized("/root/reference/screenshots/cornell_box.png")
    psnr_full = compare.psnr(ours, golden)
    f = 4
    psnr_ds = compare.psnr(compare.downsample(ours, f), compare.downsample(golden, f))
    results["golden"] = {
        "spp": args.golden_spp, "seconds": round(dt, 1),
        "paths_per_sec": round(args.golden_spp * 360000 / dt, 1),
        "psnr_db": round(psnr_full, 2), "psnr_ds4_db": round(psnr_ds, 2),
        "mean": float(img.mean()),
    }
    print(json.dumps({"golden": results["golden"]}), flush=True)

    # ---- 2. Throughput sweep --------------------------------------------
    # (name, file, W, H, depth, mega, per-dispatch sample cap)
    sweeps = [
        ("cornell_mega", "cornell_box_original.json", 600, 600, 50, True, 128),
        ("cornell_xla", "cornell_box_original.json", 600, 600, 50, False, 32),
        ("volume_mega", "cornell_box_volume.json", 600, 600, 50, True, 64),
        ("book1_mega", "final_render_book_1.json", 600, 337, 50, True, 32),
        ("book2_mega", "book2_final_scene_10000_samples.json", 600, 600, 50, True, 16),
    ]
    for name, fname, W, H, depth, mega, cap in sweeps:
        try:
            args.max_batch = cap
            scene, run, render = make_runner(
                f"{args.data}/{fname}", W, H, depth, 8, mega
            )
            render(1)  # warm
            t0 = time.time()
            img = render(args.bench_spp)
            dt = time.time() - t0
            image.write_image(img, f"{args.out}/{name}.png")
            results[name] = {
                "paths_per_sec": round(args.bench_spp * W * H / dt, 1),
                "seconds": round(dt, 2), "mean": float(img.mean()),
            }
        except Exception as e:  # keep sweeping; report the failure
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps({name: results[name]}), flush=True)

    with open(f"{args.out}/results.json", "w") as f_out:
        json.dump(results, f_out, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
