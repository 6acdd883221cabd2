"""Dump REAL sorted wavefront states (a few bounces) for offline sweep
analysis (tools/analyze_sweep.py): runs the production sort + K=1 step on
the attached chip and saves each post-sort state as an .npz.

Usage: python tools/dump_wavefront_states.py SCENE.json --out DIR
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--out", required=True)
    ap.add_argument("--res", type=int, default=600)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--bounces", type=int, default=8)
    ap.add_argument("--sublanes", type=int, default=None)
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
    sublanes = wf.SORT_SUBLANES if args.sublanes is None else args.sublanes
    tile_r = sublanes * mk.LANES
    n_total = W * H
    n_rays = -(-n_total // tile_r) * tile_r
    rows = n_rays // mk.LANES
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
    kern_kw = dict(
        max_depth=50, n_sph=n_sph, n_quad=n_quad, n_med=n_med,
        n_mat=n_mat, n_tex=n_tex, n_box=n_box,
        has_checker=int(feats.get("has_checker", 1)),
        has_noise=bool(feats.get("has_noise", False)),
        sublanes=sublanes, k_bounces=1,
    )
    n_samples = float(spp)

    @jax.jit
    def sort_fn(state):
        keys = wf.sort_keys(state, n_samples, bb_lo, bb_hi, "pos")
        perm = jnp.argsort(keys)
        pk = jnp.stack([state[k] for k in wf._STATE_KEYS], axis=1)[perm]
        return {k: pk[:, i] for i, k in enumerate(wf._STATE_KEYS)}

    step = wf.build_step(
        offsets, n_camv, n_rays=n_rays, sublanes=sublanes,
        with_ntab=ntab is not None, interpret=False, kern_kw=kern_kw)
    ntab_ops = () if ntab is None else (ntab,)

    @jax.jit
    def run(state):
        outs = step(packed, seedi, *ntab_ops,
                    *(state[k].reshape(rows, mk.LANES)
                      for k in wf._STATE_KEYS))
        return {k: v.reshape(n_rays)
                for k, v in zip(wf._STATE_KEYS, outs)}

    os.makedirs(args.out, exist_ok=True)
    state = wf.init_wavefront_state(n_rays, camv)
    for it in range(args.bounces):
        srt = sort_fn(state)
        np.savez_compressed(
            os.path.join(args.out, f"state_{it:02d}.npz"),
            **{k: np.asarray(v) for k, v in srt.items()})
        state = run(srt)
        print("dumped bounce", it, "alive", int((np.asarray(srt["al"]) > 0).sum()),
              flush=True)


if __name__ == "__main__":
    main()
