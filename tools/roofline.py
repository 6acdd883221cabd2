"""Roofline accounting for the two hot kernels (VERDICT r4 weak #5).

The path-tracing kernels are VPU-bound (elementwise f32 on [s,128] vregs;
no matmuls on the forward path), so the meaningful ceiling is the chip's
vector-unit throughput, not the MXU TFLOPs headline. This tool grounds
every term in measurement:

  1. MEASURED ceilings — two Pallas microkernels on the attached chip:
     * vpu_peak: a register-resident fma chain (the best case any
       elementwise kernel can hit)
     * hbm_bw:   a streaming copy (bytes in + out per second)
  2. COUNTED work — jax.make_jaxpr over the kernel's own body functions
     (sphere/quad/box/medium intersection, shade+scatter, camera/regen),
     classifying each primitive as flops / transcendentals; multiplied by
     per-bounce visit counts (full sweep for Cornell-class scenes; the
     measured per-tile body counts from tools/analyze_sweep.py for the
     sorted-wavefront big scenes).
  3. MEASURED throughput — Mpaths/s and mean path length from BASELINE.md
     runs (passed on the command line).

Output: flops/bounce/lane, achieved Gflop/s, % of the measured VPU
ceiling, HBM traffic per wave vs bandwidth — i.e. whether each kernel is
compute-, bandwidth-, or overhead-bound. Results land in
docs/ROOFLINE.md (see --emit).

Usage (on the TPU host):
  python tools/roofline.py --mode ceilings          # microbench the chip
  python tools/roofline.py --mode count SCENE.json  # op-count the bodies
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Elementwise primitives counted as 1 flop per output element.
_FLOP1 = {
    "add", "sub", "mul", "div", "max", "min", "neg", "abs", "floor",
    "sign", "select_n", "and", "or", "not", "xor", "eq", "ne", "lt", "le",
    "gt", "ge", "shift_right_logical", "shift_left", "rem",
    "convert_element_type", "integer_pow",
}
# Transcendentals (multi-cycle on the VPU; counted separately and also as
# TRANS_FLOPS flops each for the roofline sum).
_TRANS = {"sin", "cos", "exp", "log", "sqrt", "rsqrt", "tan", "atan2",
          "logistic", "pow"}
TRANS_FLOPS = 8


def count_jaxpr(jaxpr, mult=1.0):
    """(flops, transcendentals) weighted by output element counts."""
    flops = trans = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        sub = [v for k, v in eqn.params.items()
               if k in ("jaxpr", "call_jaxpr", "cond_jaxpr", "body_jaxpr")]
        if prim == "scan":
            f, t = count_jaxpr(eqn.params["jaxpr"].jaxpr,
                               mult * eqn.params["length"])
            flops += f
            trans += t
            continue
        if prim == "while":
            # Trip counts are data-dependent; caller accounts for sweeps
            # explicitly, so a bare while here is counted once (lower
            # bound) — flagged for the caller.
            f, t = count_jaxpr(eqn.params["body_jaxpr"].jaxpr, mult)
            flops += f
            trans += t
            continue
        if prim == "cond":
            branches = eqn.params["branches"]
            fs = [count_jaxpr(b.jaxpr, mult) for b in branches]
            f, t = max(fs)
            flops += f
            trans += t
            continue
        if sub:
            for s in sub:
                f, t = count_jaxpr(s.jaxpr if hasattr(s, "jaxpr") else s,
                                   mult)
                flops += f
                trans += t
            continue
        nelem = max((int(np.prod(v.aval.shape)) for v in eqn.outvars
                     if hasattr(v.aval, "shape")), default=1)
        if prim in _TRANS:
            trans += mult * nelem
            flops += mult * nelem * TRANS_FLOPS
        elif prim in _FLOP1:
            flops += mult * nelem
    return flops, trans


def ceilings():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SUB, LAN, CHAIN = 256, 128, 512

    def fma_kernel(x_ref, y_ref, o_ref):
        # Two mutually-dependent accumulators: the chain cannot be
        # constant-folded or reassociated (x*a+b with literal a,b WAS
        # folded by Mosaic to ~2 flops, reading 1.7 Pflop/s).
        x = x_ref[...]
        y = y_ref[...]
        for _ in range(CHAIN):
            x = x * y + jnp.float32(1e-7)
            y = y * x + jnp.float32(1e-7)
        o_ref[...] = x + y

    @jax.jit
    def fma(x, y):
        return pl.pallas_call(
            fma_kernel,
            out_shape=jax.ShapeDtypeStruct((SUB, LAN), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            grid=(256,),
        )(x, y)

    # Forced scalar readback after the rep queue: block_until_ready can
    # return early through the network-attached (axon) runtime; reading a
    # VALUE of the last output forces the in-order device stream to drain.
    def timed(fn, reps=10):
        # Device-side scalar readback: drains the in-order stream without
        # pulling the full array through the tunnel (np.asarray of a
        # 256 MB output measured 140 ms of pure transfer).
        float(fn().ravel()[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        float(out.ravel()[0])
        return (time.perf_counter() - t0) / reps

    x = jnp.full((SUB, LAN), 0.99, jnp.float32)
    y = jnp.full((SUB, LAN), 1.01, jnp.float32)
    dt = timed(lambda: fma(x, y))
    vpu = 256 * SUB * LAN * CHAIN * 2 * 2 / dt  # 2 fma = 4 flops/iter

    # HBM: SLOPE of k chained big-array shuffles (each gather forces a
    # full read+write; k=2 vs k=6 cancels the per-dispatch overhead that
    # swamped a single-pass copy through the tunnel).
    N = 32 * 1024 * 1024

    def chain(k):
        @jax.jit
        def f(x):
            for i in range(k):
                # roll + add: streaming r+w per step; the interleaved adds
                # keep the rolls from composing into one.
                x = jnp.roll(x, 12345 + i) + 1.0
            return x
        return f

    big = jnp.ones((N,), jnp.float32)
    f2, f6 = chain(2), chain(6)
    dt = timed(lambda: f6(big)) - timed(lambda: f2(big))
    hbm = 4 * 2 * N * 4 / dt  # 4 extra passes, r+w each
    return {"vpu_peak_gflops": round(vpu / 1e9, 1),
            "hbm_gbps": round(hbm / 1e9, 1),
            "chain": CHAIN, "note": "dependent fma chain on [256,128] "
            "vregs x 256 grid steps; hbm = slope of 2-vs-6 chained "
            "128 MB shuffle passes (dispatch overhead cancels)"}


def count_bodies(scene_path):
    import jax
    import jax.numpy as jnp
    from raytrace2_tpu.scene import loader, schema
    from raytrace2_tpu.ops.pallas import megakernel as mk

    scene_host, _ = loader.load_scene(scene_path)
    scene = schema.to_device(scene_host)
    feats = scene_host.features()
    sizes = tuple(feats["mega_sizes"])
    n_sph, n_quad, n_mat, n_tex, n_med, n_box = sizes
    tables = jax.tree_util.tree_map(np.asarray, mk.pack_tables(scene, sizes))
    sph, qd, boxes, med, mats, texs = [
        {k: jnp.asarray(v) for k, v in t.items()} for t in tables]
    shape = (8, mk.LANES)
    z = jnp.zeros(shape)
    key = jnp.zeros(shape, jnp.uint32)

    def mk_bodies():
        return mk.make_family_bodies(
            sph, qd, boxes, med,
            draw=lambda c: z + 0.5, tm=z, ox=z, oy=z, oz=z,
            dx=z + 1.0, dy=z, dz=z, a=z + 1.0, inv_a=z + 1.0, bn=z,
            n_med=n_med)

    out = {"scene": os.path.basename(scene_path), "sizes": sizes}
    names = ("sphere", "quad", "box", "medium")
    per_lane = {}
    for name, body in zip(names, mk_bodies()):
        jx = jax.make_jaxpr(lambda rec, b=body: b(0, rec))(
            mk.init_rec(shape))
        f, t = count_jaxpr(jx.jaxpr)
        per_lane[name] = (f / (shape[0] * mk.LANES),
                          t / (shape[0] * mk.LANES))
    out["per_record_flops"] = {k: round(v[0], 1)
                               for k, v in per_lane.items()}
    out["per_record_trans"] = {k: round(v[1], 2)
                               for k, v in per_lane.items()}

    # Shade + scatter tail, material resolve by masked sweep (small
    # tables) — counted via a bounce with the sweeps compiled out.
    orig_h, orig_b = mk._hier_sweep, mk._bvh_sweep
    try:
        mk._hier_sweep = lambda tbl, body_fn, rec, *a, **kw: rec
        mk._bvh_sweep = mk._hier_sweep
        bounce = mk._make_bounce(
            sph, qd, boxes, med, mats, texs, jnp.zeros(3),
            max_depth=50, n_sph=0, n_quad=0, n_med=0, n_mat=n_mat,
            n_tex=n_tex, n_box=0,
            has_checker=int(feats.get("has_checker", 1)),
            has_noise=bool(feats.get("has_noise", False)), shape=shape)
        carry = (z, z + 1.0, z, z, z, z + 0.1, z + 0.1, z + 1.0,
                 z + 1.0, z + 1.0, z + 1.0, z, z, z)
        jx = jax.make_jaxpr(lambda c: bounce(key, z, c))(carry)
        f, t = count_jaxpr(jx.jaxpr)
        out["shade_resolve_flops_per_lane"] = round(f / (shape[0] * mk.LANES), 1)
        out["shade_resolve_trans_per_lane"] = round(t / (shape[0] * mk.LANES), 2)
    finally:
        mk._hier_sweep, mk._bvh_sweep = orig_h, orig_b

    # Camera ray + regen arithmetic.
    camv = jnp.zeros((mk._CAMV_LEN,), jnp.float32)
    jx = jax.make_jaxpr(
        lambda c: mk.camera_ray(c, z, z, jnp.float32(4), jnp.float32(0),
                                key))(camv)
    f, t = count_jaxpr(jx.jaxpr)
    out["camera_flops_per_lane"] = round(f / (shape[0] * mk.LANES), 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("ceilings", "count"), required=True)
    ap.add_argument("scene", nargs="?")
    args = ap.parse_args()
    if args.mode == "ceilings":
        print(json.dumps(ceilings()))
    else:
        print(json.dumps(count_bodies(args.scene)))


if __name__ == "__main__":
    main()
