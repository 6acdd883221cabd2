"""On-chip cost breakdown for the sorted-wavefront kernel (big scenes).

Decomposes a render into its three recurring costs, each timed separately
on REAL mid-render state snapshots:

  * sort        — coherence sort (argsort + packed row gather) per launch
  * step        — the K-bounce Pallas kernel, full sweeps (production)
  * step/nosweep— same kernel with the sphere+box cluster sweeps compiled
                  out (upper bound: everything except closest-hit)
  * step/linear — same kernel with the cluster hierarchy compiled out
                  (lower bound: brute-force sweep of every record)

launches x (sort + step) ~ render walltime; (step - nosweep) is the sweep
cost; (linear - nosweep) / (step - nosweep) is the hierarchy's skip factor.

Usage: python tools/profile_wavefront.py SCENE.json [--spp 32] [--res 600]
(e.g. SCENE = /root/reference/data/book2_final_scene_10000_samples.json on
the dev host — the scene argument is required so the tool is portable).
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@contextlib.contextmanager
def patched_sweep(mode):
    """Swap the megakernel cluster sweep (both SWEEP_MODE implementations,
    _hier_sweep and _bvh_sweep) during kernel tracing."""
    import jax
    from raytrace2_tpu.ops.pallas import megakernel as mk

    orig = mk._hier_sweep
    orig_bvh = mk._bvh_sweep
    repl = None
    if mode == "nosweep":
        repl = (
            lambda tbl, body_fn, rec, *a, **kw: rec)
    elif mode == "linear":
        def lin(tbl, body_fn, rec, alive, ox, oy, oz, ix, iy, iz,
                t_min, n_recs, cluster, super_, dir_idx):
            # Brute force with the SAME inner unrolling as the real sweep's
            # sweep_cluster (unroll=cluster) — only the AABB-skip logic is
            # removed, so (linear - nosweep) is a fair lower bound.
            n_cl = -(-n_recs // cluster)

            def cl_body(c1, rec):
                def inner(k, rec):
                    return body_fn(c1 * cluster + k, rec)
                return jax.lax.fori_loop(0, cluster, inner, rec,
                                         unroll=cluster)

            return jax.lax.fori_loop(0, n_cl, cl_body, rec)
        repl = lin
    if repl is not None:
        mk._hier_sweep = repl
        mk._bvh_sweep = repl
    try:
        yield
    finally:
        mk._hier_sweep = orig
        mk._bvh_sweep = orig_bvh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--res", type=int, default=600)
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--sublanes", type=int, default=None)
    ap.add_argument("--k-bounces", type=int, default=16)
    ap.add_argument("--key", default="pos")
    ap.add_argument("--snapshots", default="1,3,6,12,24")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--noise-impl", choices=("hash", "table"), default="hash",
                    help="Perlin mode on noise scenes; 'hash' matches the "
                         "production default (integrator.py noise_impl), "
                         "'table' packs the perm/grad tables like the "
                         "cross-backend goldens")
    ap.add_argument("--skip-modes", action="store_true",
                    help="skip the nosweep/linear recompiles")
    ap.add_argument("--ladder", type=int, default=0, metavar="N",
                    help="bounce-resolved mode: drive N (sort + K=1 step) "
                         "iterations from the fresh state, timing each "
                         "step for every sweep variant — shows coherence "
                         "decay per bounce (k-bounces is forced to 1)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from raytrace2_tpu.scene import loader, schema
    from raytrace2_tpu.ops import camera as camera_ops
    from raytrace2_tpu.ops.pallas import megakernel as mk
    from raytrace2_tpu.ops.pallas import wavefront_sorted as wf
    from raytrace2_tpu.ops import integrator
    from raytrace2_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    scene_host, _dims = loader.load_scene(args.scene)
    scene = schema.to_device(scene_host)
    feats = scene_host.features()
    W = H = args.res
    sizes = tuple(feats["mega_sizes"])
    n_sph, n_quad, n_mat, n_tex, n_med, n_box = sizes
    sublanes = wf.SORT_SUBLANES if args.sublanes is None else args.sublanes
    assert sublanes > 0 and sublanes % 8 == 0, (
        f"--sublanes must be a positive multiple of 8, got {sublanes}")
    tile_r = sublanes * mk.LANES
    n_total = W * H
    n_rays = -(-n_total // tile_r) * tile_r
    rows = n_rays // mk.LANES
    spp = args.spp
    print(json.dumps({"scene": os.path.basename(args.scene),
                      "records": n_sph + n_quad + n_med + n_box,
                      "n_rays": n_rays, "sublanes": sublanes,
                      "k_bounces": args.k_bounces, "spp": spp}))

    # --- camv exactly as integrator._render_batch_megakernel builds it ----
    frame = camera_ops.camera_frame(scene.camera, W, H)
    camv = jnp.concatenate([
        frame["pixel00"], frame["pixel_delta_u"], frame["pixel_delta_v"],
        frame["center"], frame["defocus_disk_u"], frame["defocus_disk_v"],
        jnp.stack([
            frame["defocus_angle"].astype(jnp.float32),
            jnp.float32(W), jnp.float32(n_total),
            jnp.float32(0),             # sample0
            jnp.float32(spp),           # n_samples
            jnp.float32(max(int(np.sqrt(spp)), 1)), jnp.float32(0),
            jnp.float32(0),             # slot0
            jnp.float32(1), jnp.float32(H),
        ]),
    ])
    tables = mk.pack_tables(scene, sizes)
    bb_lo, bb_hi = wf.scene_bounds(tables, sizes)
    packed, offsets, n_camv = wf.pack_smem_operand(
        camv, scene.background, tables)
    seedi = jnp.zeros(1, jnp.int32)
    # Mirror integrator._render_batch_megakernel's ntab wiring so 'table'
    # mode times the production table-Perlin kernel, not the hash fallback.
    ntab = None
    if feats.get("has_noise") and args.noise_impl == "table":
        ntab = mk.pack_noise_tables(scene, tuple(feats["noise_rows"]))
    kern_kw = dict(
        max_depth=args.depth, n_sph=n_sph, n_quad=n_quad, n_med=n_med,
        n_mat=n_mat, n_tex=n_tex, n_box=n_box,
        has_checker=int(feats.get("has_checker", 1)),
        has_noise=bool(feats.get("has_noise", False)),
        sublanes=sublanes, k_bounces=args.k_bounces,
    )

    n_samples = float(spp)

    @jax.jit
    def sort_fn(state):
        keys = wf.sort_keys(state, n_samples, bb_lo, bb_hi, args.key)
        perm = jnp.argsort(keys)
        pk = jnp.stack([state[k] for k in wf._STATE_KEYS], axis=1)[perm]
        return {k: pk[:, i] for i, k in enumerate(wf._STATE_KEYS)}

    def make_step(mode):
        with patched_sweep(mode):
            step = wf.build_step(
                offsets, n_camv, n_rays=n_rays, sublanes=sublanes,
                with_ntab=ntab is not None, interpret=False, kern_kw=kern_kw)
            ntab_ops = () if ntab is None else (ntab,)

            def run(state):
                outs = step(packed, seedi, *ntab_ops,
                            *(state[k].reshape(rows, mk.LANES)
                              for k in wf._STATE_KEYS))
                return {k: v.reshape(n_rays)
                        for k, v in zip(wf._STATE_KEYS, outs)}

            run = jax.jit(run)
            # trace+compile under the patch
            st0 = wf.init_wavefront_state(n_rays, camv)
            run(st0)["al"].block_until_ready()
        return run

    def timeit(fn, state, reps):
        fn(state)["al"].block_until_ready()
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(state)
        out["al"].block_until_ready()
        return (time.perf_counter() - t0) / reps * 1e3  # ms

    if args.ladder:
        kern_kw["k_bounces"] = 1
        variants = {"normal": make_step("normal")}
        if not args.skip_modes:
            variants["nosweep"] = make_step("nosweep")
            variants["linear"] = make_step("linear")
        state = wf.init_wavefront_state(n_rays, camv)
        for it in range(args.ladder):
            srt = sort_fn(state)
            srt["al"].block_until_ready()
            row = {"bounce": it, "alive": int((srt["al"] > 0).sum()),
                   "regen": int(((srt["al"] <= 0)
                                 & (srt["s_lane"] < n_samples - 1.0)
                                 & (srt["pid"] >= 0.0)).sum())}
            for name, fn in variants.items():
                row[name + "_ms"] = round(timeit(fn, srt, args.reps), 2)
            state = variants["normal"](srt)
            print(json.dumps(row), flush=True)
        return

    step_normal = make_step("normal")

    # --- drive the real loop eagerly, counting launches -------------------
    snap_at = set(int(x) for x in args.snapshots.split(","))
    state = wf.init_wavefront_state(n_rays, camv)
    snapshots = {}
    launches = 0
    t_loop0 = time.perf_counter()
    while True:
        runnable = (state["al"] > 0.0) | (
            (state["s_lane"] < n_samples - 1.0) & (state["pid"] >= 0.0))
        n_run = int(jnp.sum(runnable))
        if n_run == 0:
            break
        state = sort_fn(state)
        state = step_normal(state)
        launches += 1
        if launches in snap_at:
            snapshots[launches] = {k: v.copy() for k, v in state.items()}
        if launches > 500:
            print("runaway loop!", n_run)
            break
    state["al"].block_until_ready()
    t_loop = time.perf_counter() - t_loop0
    mps = spp * n_total / t_loop / 1e6
    print(json.dumps({"launches": launches,
                      "eager_loop_s": round(t_loop, 3),
                      "eager_mpaths_s": round(mps, 3),
                      "mean": float(
                          (state["rr"].sum() + state["rg"].sum()
                           + state["rb"].sum())
                          / (3 * n_total * spp))}))

    variants = {"normal": step_normal}
    if not args.skip_modes:
        variants["nosweep"] = make_step("nosweep")
        variants["linear"] = make_step("linear")

    for it, snap in sorted(snapshots.items()):
        alive = int((snap["al"] > 0).sum())
        row = {"snapshot": it, "alive": alive}
        sorted_snap = sort_fn(snap)
        row["sort_ms"] = round(timeit(
            lambda s: sort_fn(s), snap, args.reps * 4), 3)
        for name, fn in variants.items():
            row[name + "_ms"] = round(timeit(fn, sorted_snap, args.reps), 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
