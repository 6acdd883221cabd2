"""Offline sweep-structure analysis over dumped wavefront states.

For each dumped (post-sort) state and each [sublanes,128] tile, simulates
the per-tile pruning of both sweep structures in numpy:

  * hier — two-level fixed fan-out (L2 supercluster / L1 cluster skips)
  * bvh  — threaded binary cluster BVH walk

and reports nodes visited / conds executed / cluster bodies swept, which
localizes on-chip slowdowns (branch overhead vs sweep work) without
kernel instrumentation. Pruning uses the true shrinking best_t: records
are intersected in visit order exactly like the kernel.

Usage: python tools/analyze_sweep.py /tmp/wfstates SCENE.json
(CPU-only; run with PYTHONPATH=. JAX_PLATFORMS=cpu)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slab(lo, hi, o, inv):
    # lo/hi [3], o/inv [L,3] -> t0,t1 [L]
    ta = (lo[None, :] - o) * inv
    tb = (hi[None, :] - o) * inv
    t0 = np.minimum(ta, tb).max(1)
    t1 = np.maximum(ta, tb).min(1)
    return t0, t1


def sphere_ts(c, r, o, d):
    # c [P,3], r [P]; o/d [L,3] -> t [L,P] (closest valid root, inf if none)
    oc = c[None, :, :] - o[:, None, :]
    a = (d * d).sum(1)[:, None]
    h = (d[:, None, :] * oc).sum(2)
    cc = (oc * oc).sum(2) - r[None, :] ** 2
    disc = h * h - a * cc
    ok = disc >= 0
    sq = np.sqrt(np.where(ok, disc, 0.0))
    r0 = (h - sq) / a
    r1 = (h + sq) / a
    tmin = 1e-3
    t = np.where(r0 > tmin, r0, r1)
    return np.where(ok & (t > tmin), t, np.inf)


def box_ts(b0, b1, o, d):
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    ta = (b0[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tb = (b1[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t0 = np.minimum(ta, tb).max(2)
    t1 = np.maximum(ta, tb).min(2)
    tmin = 1e-3
    t = np.where(t0 >= tmin, t0, t1)
    ok = (t1 > t0) & (t > tmin) & (t1 > tmin)
    return np.where(ok, t, np.inf)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("states_dir")
    ap.add_argument("scene")
    ap.add_argument("--sublanes", type=int, default=24)
    ap.add_argument("--max-tiles", type=int, default=40)
    args = ap.parse_args()

    from raytrace2_tpu.scene import loader, schema
    from raytrace2_tpu.ops.pallas import megakernel as mk

    scene_host, _ = loader.load_scene(args.scene)
    scene = schema.to_device(scene_host)
    feats = scene_host.features()
    sizes = tuple(feats["mega_sizes"])
    n_sph, n_quad, n_mat, n_tex, n_med, n_box = sizes
    tables = mk.pack_tables(scene, sizes)
    fams = []
    for fam, (tbl, n_recs, cluster, super_) in (
            ("sph", (tables[0], n_sph, mk.SPH_CLUSTER, mk.SPH_SUPER)),
            ("box", (tables[2], n_box, mk.BOX_CLUSTER, mk.BOX_SUPER))):
        if n_recs < 2 * cluster:
            continue
        t = {k: np.asarray(v) for k, v in tbl.items()}
        n_pad = -(-n_recs // super_) * super_
        n_cl = n_pad // cluster
        m = 2 * n_cl - 1
        if fam == "sph":
            c = np.stack([t["c0x"], t["c0y"], t["c0z"]], 1)
            prim_t = lambda o, d, t=t, c=c: sphere_ts(c, t["rad"] * (t["act"] > 0), o, d)
        else:
            b0 = np.stack([t["x0"], t["y0"], t["z0"]], 1)
            b1 = np.stack([t["x1"], t["y1"], t["z1"]], 1)
            act = t["act"] > 0
            b0 = np.where(act[:, None], b0, np.inf)
            b1 = np.where(act[:, None], b1, -np.inf)
            prim_t = lambda o, d, b0=b0, b1=b1: box_ts(b0, b1, o, d)
        fams.append(dict(
            name=fam, tbl=t, n_cl=n_cl, m=m, cluster=cluster,
            ratio=super_ // cluster, n_l2=n_pad // super_, prim_t=prim_t))

    files = sorted(glob.glob(os.path.join(args.states_dir, "state_*.npz")))
    sub = args.sublanes
    tile_r = sub * 128
    for f in files:
        st = {k: v for k, v in np.load(f).items()}
        n = st["al"].shape[0]
        n_tiles = n // tile_r
        alive_tot = int((st["al"] > 0).sum())
        agg = {fam["name"]: dict(nodes=0, conds=0, bodies=0, tiles=0,
                                 h_conds=0, h_bodies=0) for fam in fams}
        step = max(1, n_tiles // args.max_tiles)
        for ti in range(0, n_tiles, step):
            sl = slice(ti * tile_r, (ti + 1) * tile_r)
            alive = st["al"][sl] > 0
            if not alive.any():
                continue
            o = np.stack([st["ox"][sl], st["oy"][sl], st["oz"][sl]], 1)
            d = np.stack([st["dx"][sl], st["dy"][sl], st["dz"][sl]], 1)
            inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
            sx = d[alive].sum(0)
            dax = np.argmax(np.abs(sx))
            dirx = dax * 2 + (0 if sx[dax] >= 0 else 1)
            for fam in fams:
                t = fam["tbl"]
                m = fam["m"]
                # per-lane all-cluster record ts, lazily per cluster
                ts_all = fam["prim_t"](o, d)  # [L, P]
                blo = np.stack([t["bvx0"], t["bvy0"], t["bvz0"]], 1)
                bhi = np.stack([t["bvx1"], t["bvy1"], t["bvz1"]], 1)

                def sweep_cluster(g, best):
                    lo_i = g * fam["cluster"]
                    tc = ts_all[:, lo_i:lo_i + fam["cluster"]]
                    return np.minimum(best, np.where(
                        alive, np.minimum.reduce(tc, axis=1), np.inf))

                # --- threaded BVH walk ---
                best = np.full(tile_r, np.inf)
                best[~alive] = np.inf
                node, nodes, conds, bodies = 0, 0, 0, 0
                bhit = t["bhit"]
                bmiss = t["bmiss"]
                bleaf = t["bleaf"]
                while node >= 0:
                    nodes += 1
                    t0, t1 = slab(blo[node], bhi[node], o, inv)
                    hit = alive & (t1 > np.maximum(t0, 1e-3)) & (t0 < best)
                    anyhit = hit.any()
                    conds += 1
                    g = int(bleaf[node])
                    if anyhit and g >= 0:
                        bodies += fam["cluster"]
                        best = sweep_cluster(g, best)
                    node = int(bhit[dirx * m + node] if anyhit
                               else bmiss[dirx * m + node])
                agg[fam["name"]]["nodes"] += nodes
                agg[fam["name"]]["conds"] += conds
                agg[fam["name"]]["bodies"] += bodies
                agg[fam["name"]]["tiles"] += 1

                # --- two-level hier ---
                best = np.full(tile_r, np.inf)
                h_conds, h_bodies = 0, 0
                n_l2, ratio, n_cl = fam["n_l2"], fam["ratio"], fam["n_cl"]
                ordv = t["ord"]
                lordv = t["lord"]
                sblo = np.stack([t["sbx0"], t["sby0"], t["sbz0"]], 1)
                sbhi = np.stack([t["sbx1"], t["sby1"], t["sbz1"]], 1)
                cblo = np.stack([t["cbx0"], t["cby0"], t["cbz0"]], 1)
                cbhi = np.stack([t["cbx1"], t["cby1"], t["cbz1"]], 1)
                for i in range(n_l2):
                    c2 = int(ordv[dirx * n_l2 + i])
                    t0, t1 = slab(sblo[c2], sbhi[c2], o, inv)
                    h_conds += 1
                    if not (alive & (t1 > np.maximum(t0, 1e-3))
                            & (t0 < best)).any():
                        continue
                    for j in range(ratio):
                        c1 = int(lordv[dirx * n_cl + c2 * ratio + j])
                        t0, t1 = slab(cblo[c1], cbhi[c1], o, inv)
                        h_conds += 1
                        if not (alive & (t1 > np.maximum(t0, 1e-3))
                                & (t0 < best)).any():
                            continue
                        h_bodies += fam["cluster"]
                        best = sweep_cluster(c1, best)
                agg[fam["name"]]["h_conds"] += h_conds
                agg[fam["name"]]["h_bodies"] += h_bodies
        out = {"file": os.path.basename(f), "alive": alive_tot}
        for name, a in agg.items():
            if not a["tiles"]:
                continue
            k = a["tiles"]
            out[name] = {
                "bvh_nodes/tile": round(a["nodes"] / k, 1),
                "bvh_bodies/tile": round(a["bodies"] / k, 1),
                "hier_conds/tile": round(a["h_conds"] / k, 1),
                "hier_bodies/tile": round(a["h_bodies"] / k, 1),
            }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
