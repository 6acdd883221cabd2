"""Microbench: decompose the wavefront's per-WAVE fixed cost on-chip.

The r4 ladder showed ~5.4 ms/launch of "nosweep" cost and ~4.4 ms/sort on
book2 — together 2x the actual sweep. This tool times each piece in
isolation on a REAL mid-render state:

  * keys        — sort-key computation only
  * argsort     — jnp.argsort of the keys
  * gather      — the packed [n,17] row gather by a fixed permutation
  * sort_full   — keys + argsort + gather + dict unpack (production do_sort)
  * step(...)   — the K=1 kernel launch: production (mtab like the
                  integrator), no-mtab (ladder's form), nosweep, and at
                  alternate sublane counts (grid-step scaling)

Usage: python tools/microbench_wavefront.py SCENE.json --state DIR/state_03.npz
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_wavefront import patched_sweep  # noqa: E402


def timeit(fn, reps=20):
    out = fn()
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax_block(out)
    return (time.perf_counter() - t0) / reps * 1e3


def jax_block(out):
    # Forced value readback — block_until_ready can return early through
    # the network-attached runtime (see bench.py); reading one element of
    # the LAST output drains the in-order device stream.
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--state", required=True)
    ap.add_argument("--res", type=int, default=600)
    ap.add_argument("--spp", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from raytrace2_tpu.scene import loader, schema
    from raytrace2_tpu.ops import camera as camera_ops
    from raytrace2_tpu.ops.pallas import megakernel as mk
    from raytrace2_tpu.ops.pallas import wavefront_sorted as wf
    from raytrace2_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    scene_host, _dims = loader.load_scene(args.scene)
    scene = schema.to_device(scene_host)
    feats = scene_host.features()
    W = H = args.res
    sizes = tuple(feats["mega_sizes"])
    n_sph, n_quad, n_mat, n_tex, n_med, n_box = sizes
    st_np = dict(np.load(args.state))
    n_rays = st_np["al"].shape[0]
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
    bb_lo, bb_hi = wf.scene_bounds(tables, sizes)
    packed, offsets, n_camv = wf.pack_smem_operand(
        camv, scene.background, tables)
    seedi = jnp.zeros(1, jnp.int32)
    ntab = None
    if feats.get("has_noise"):
        ntab = mk.pack_noise_tables(scene, tuple(feats["noise_rows"]))
    mtab = mk.pack_resolve_tables(tables[4], tables[5], n_mat, n_tex)
    state = {k: jnp.asarray(v) for k, v in st_np.items()}
    n_samples = float(spp)
    res = {"n_rays": n_rays, "n_mat": n_mat, "n_tex": n_tex,
           "alive": int((st_np["al"] > 0).sum())}

    # ---- sort pieces ----------------------------------------------------
    @jax.jit
    def keys_fn(state):
        return wf.sort_keys(state, n_samples, bb_lo, bb_hi, "pos")

    keys = keys_fn(state)

    @jax.jit
    def argsort_fn(keys):
        return jnp.argsort(keys)

    perm = argsort_fn(keys)

    @jax.jit
    def gather_fn(state, perm):
        pk = jnp.stack([state[k] for k in wf._STATE_KEYS], axis=1)[perm]
        return {k: pk[:, i] for i, k in enumerate(wf._STATE_KEYS)}

    @jax.jit
    def sort_full(state):
        k = wf.sort_keys(state, n_samples, bb_lo, bb_hi, "pos")
        p = jnp.argsort(k)
        pk = jnp.stack([state[kk] for kk in wf._STATE_KEYS], axis=1)[p]
        return {kk: pk[:, i] for i, kk in enumerate(wf._STATE_KEYS)}

    @jax.jit
    def sort_multi(state):
        # One multi-operand lax.sort instead of argsort + packed gather.
        k = wf.sort_keys(state, n_samples, bb_lo, bb_hi, "pos")
        outs = jax.lax.sort(
            (k,) + tuple(state[kk] for kk in wf._STATE_KEYS), num_keys=1)
        return dict(zip(wf._STATE_KEYS, outs[1:]))

    res["keys_ms"] = round(timeit(lambda: keys_fn(state)), 3)
    res["argsort_ms"] = round(timeit(lambda: argsort_fn(keys)), 3)
    res["gather_ms"] = round(timeit(lambda: gather_fn(state, perm)), 3)
    res["sort_full_ms"] = round(timeit(lambda: sort_full(state)), 3)
    res["sort_multi_ms"] = round(timeit(lambda: sort_multi(state)), 3)

    # ---- kernel step variants ------------------------------------------
    def make_run(sublanes, with_mtab, mode, k_bounces=1):
        if n_rays % (sublanes * mk.LANES):
            return None
        rows = n_rays // mk.LANES
        kern_kw = dict(
            max_depth=50, n_sph=n_sph, n_quad=n_quad, n_med=n_med,
            n_mat=n_mat, n_tex=n_tex, n_box=n_box,
            has_checker=int(feats.get("has_checker", 1)),
            has_noise=bool(feats.get("has_noise", False)),
            sublanes=sublanes, k_bounces=k_bounces,
        )
        with patched_sweep(mode):
            step = wf.build_step(
                offsets, n_camv, n_rays=n_rays, sublanes=sublanes,
                with_ntab=ntab is not None, interpret=False,
                kern_kw=kern_kw, with_mtab=with_mtab)
            ops = () if ntab is None else (jnp.asarray(ntab, jnp.float32),)
            if with_mtab:
                ops = ops + (jnp.asarray(mtab, jnp.float32),)

            @jax.jit
            def run(state):
                outs = step(packed, seedi, *ops,
                            *(state[k].reshape(rows, mk.LANES)
                              for k in wf._STATE_KEYS))
                return {k: v.reshape(n_rays)
                        for k, v in zip(wf._STATE_KEYS, outs)}

            jax_block(run(state))
        return run

    for name, sub, with_mtab, mode, kb in (
            ("step_prod_s24", 24, True, "normal", 1),
            ("step_nomtab_s24", 24, False, "normal", 1),
            ("step_nosweep_mtab_s24", 24, True, "nosweep", 1),
            ("step_nosweep_nomtab_s24", 24, False, "nosweep", 1),
            ("step_prod_s48", 48, True, "normal", 1),
            ("step_nosweep_mtab_s48", 48, True, "nosweep", 1),
            ("step_nosweep_mtab_s8", 8, True, "nosweep", 1),
            ("step_prod_s24_k2", 24, True, "normal", 2),
    ):
        run = make_run(sub, with_mtab, mode, kb)
        if run is None:
            res[name + "_ms"] = None
            continue
        res[name + "_ms"] = round(timeit(lambda r=run: r(state), reps=10), 3)
        print(json.dumps({name: res[name + "_ms"]}), flush=True)

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
