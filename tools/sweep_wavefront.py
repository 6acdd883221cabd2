"""On-chip tuning sweep for the sorted-wavefront kernel (big scenes).

Sweeps the pure-scheduling knobs (sort key mode, bounces per launch, sort
cadence, tile sublanes) on a given scene and reports Mpaths/s per config.
Every config renders the bitwise-identical image (the knobs only permute
work), so the sweep needs no correctness check beyond the mean printed for
eyeballing.

Usage:  python tools/sweep_wavefront.py [scene.json] [--spp 8] [--res 600]
Reference workload: data/book2_final_scene_10000_samples.json
(/root/reference, SURVEY.md §6).
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?",
                    default="/root/reference/data/"
                            "book2_final_scene_10000_samples.json")
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--res", type=int, default=600)
    ap.add_argument("--keys", default="pos,pos8,depth")
    ap.add_argument("--kb", default="8,16,32")
    ap.add_argument("--sort-every", default="1,2")
    ap.add_argument("--sublanes", default="8")
    ap.add_argument("--tail-k", default="0",
                    help="phase-2 bounces/launch (0 = single phase)")
    ap.add_argument("--tail-frac", default="0.0",
                    help="runnable-population fraction switching to phase 2")
    ap.add_argument("--sort-impl", default="gather",
                    help="gather | multi (comma list)")
    ap.add_argument("--state-packed", default="0",
                    help="0 | 1 (comma list): one [17,rows,128] state "
                         "operand pair vs 17+17 separate blocks")
    ap.add_argument("--out", default=None, help="JSONL results file")
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode (CPU smoke test only)")
    args = ap.parse_args()

    import jax.numpy as jnp
    from raytrace2_tpu.scene import loader, schema
    from raytrace2_tpu.ops import integrator
    from raytrace2_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    scene_host, _dims = loader.load_scene(args.scene)
    scene = schema.to_device(scene_host)
    W = H = args.res
    base = dict(scene_host.features(), use_megakernel=True,
                mega_wavefront=True, mega_interpret=args.interpret)

    def run(feat, spp):
        r = integrator.render_progressive(
            scene, feat, W, H, jnp.int32(0), jnp.int32(spp), 0, 50, 10)
        return np.asarray(r)

    combos = list(itertools.product(
        args.keys.split(","),
        [int(x) for x in args.kb.split(",")],
        [int(x) for x in args.sort_every.split(",")],
        [int(x) for x in args.sublanes.split(",")],
        [int(x) for x in args.tail_k.split(",")],
        [float(x) for x in args.tail_frac.split(",")],
        args.sort_impl.split(","),
        [int(x) for x in args.state_packed.split(",")],
    ))
    results = []
    for key_mode, kb, se, sl, tk, tf, si, sp in combos:
        feat = dict(base, mega_sort_key=key_mode, mega_k_bounces=kb,
                    mega_sort_every=se, mega_sublanes=sl,
                    mega_tail_k=tk, mega_tail_frac=tf, mega_sort_impl=si,
                    mega_state_packed=bool(sp))
        run(feat, 1)  # compile
        t0 = time.perf_counter()
        r = run(feat, args.spp)
        dt = time.perf_counter() - t0
        mps = args.spp * W * H / dt / 1e6
        rec = {"key": key_mode, "k_bounces": kb, "sort_every": se,
               "sublanes": sl, "tail_k": tk, "tail_frac": tf,
               "sort_impl": si, "state_packed": sp,
               "mpaths_s": round(mps, 3),
               "mean": float(r.mean() / args.spp)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")

    best = max(results, key=lambda r: r["mpaths_s"])
    print("BEST:", json.dumps(best))


if __name__ == "__main__":
    main()
