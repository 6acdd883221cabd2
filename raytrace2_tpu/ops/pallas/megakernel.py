"""Wavefront MEGAKERNEL: the entire bounce loop in one Pallas kernel.

Motivation (measured on v5e): the XLA bounce loop reaches ~23 M
ray-segments/s while its components benched standalone run at 260–650 M —
the integrated loop is dominated by HBM round-trips between the fused
sub-steps (state arrays re-read/re-written every bounce). This kernel keeps
a 1024-ray tile's ENTIRE path state in VMEM/registers for all bounces: the
only HBM I/O is the initial ray load and the final radiance store.

Mosaic-idiomatic structure (v2 — v1 used [8,128,P] broadcasts whose
relayouts made it ~1000x too slow on real hardware):

* Ray state is 2-D [8,128] vregs. Primitive/material/texture tables live in
  SMEM; the closest-hit sweep loops over primitives reading SCALAR params
  (free broadcast against vregs) — no 3-D intermediates, no cross-lane
  reductions, no relayouts.
* The winning record (center/radius or normal, material) is CARRIED through
  the sweep under the `closer` mask — no argmin, no gather, no second pass.
* Materials/textures resolve the same way: a scalar loop over the (tiny)
  tables with equality masks.
* RNG: murmur3 counter hash keyed by (seed, global ray slot, draw counter) —
  portable (interpret mode works), data-independent, pure function of ray
  identity (statistically equivalent to the XLA path's threefry, not
  bitwise).
* Per-tile early exit: `while any(alive) and bounce < max_depth`.

Scope: spheres, quads, axis-aligned boxes (slab tests), constant media,
all six material types, solid/checker textures and hash-gradient Perlin
noise — every reference corpus scene. Tables live in SMEM (gate:
MAX_SMEM_RECORDS); sweeps are fully unrolled and cluster-skipped
(Morton-sorted spheres/boxes). Reference semantics:
src/cpu_raytrace/Sphere.cpp:7-26, Quad.cpp:19-43, ConstantMedium.cpp,
Material.cpp, Texture.cpp.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytrace2_tpu import defs

BIG = 3.0e38
LANES = 128
SUBLANES = 32  # 32x128 ray tiles measured fastest (fewer grid steps)
TILE_R = SUBLANES * LANES

# SMEM budget gate: primitive records beyond this fall back to the XLA path.
# (book2: 3.4k records x ~21 f32 params ≈ 160 KB of SMEM tables - fits.)
MAX_SMEM_RECORDS = 4096

# Cluster acceleration over the kd-ordered primitives (loader._kd_order):
# 16-record L1 clusters, each with a precomputed AABB in SMEM. Two sweep
# structures are built over them (SWEEP_MODE picks at trace time):
#
# * "bvh" (default): a THREADED binary BVH whose leaves are the L1
#   clusters — the reference's own build algorithm (median split on the
#   span bounds' longest axis, src/cpu_raytrace/BVH.cpp:10-48) emitted as
#   SMEM arrays, walked per tile with stackless hit/miss links
#   (6 precomputed near-child-first threadings, one per dominant ray
#   direction). This is the in-kernel form of the reference's per-ray
#   shrinking-interval walk (BVH.cpp:50-55): descend/skip decisions are
#   taken per tile (scalar `any` branch over the [s,128] ray block), and
#   the per-lane `t0 < best_t` test prunes adaptively at every tree level
#   instead of at two fixed fan-outs.
# * "hier": the earlier fixed two-level fan-out (16-record L1 clusters
#   grouped 8-up into 128-record L2 superclusters with 6 direction-sorted
#   visit orders) — kept for A/B measurement.
_BVH_KEYS = ("bvx0", "bvy0", "bvz0", "bvx1", "bvy1", "bvz1",
             "bleaf", "bhit", "bmiss")
# Default "hier": the r5 offline replay of real sorted tiles
# (tools/analyze_sweep.py over tools/dump_wavefront_states.py dumps)
# showed the binary walk prunes NO additional cluster bodies over the
# two-level fan-out (sph 621 vs 612 bodies/tile, box 330 vs 326 — the
# 3072-ray tile union genuinely reaches ~half the clusters) while paying
# ~1.6x the branch/reduction count; on-chip it measured ~9% slower at
# equal operand size. Kept selectable for measurement.
SWEEP_MODE = os.environ.get("RT2_SWEEP_MODE", "hier")
# The BVH node/link tables ride the packed operand ONLY in bvh mode: the
# wavefront kernel re-copies every SMEM operand per grid step, and the
# extra ~16 KB of keys measured a 3x wavefront slowdown on book2 (5.66 ->
# 1.92 Mpaths/s) with the walk never even taken — SMEM operand size is a
# hard perf cliff (see docs/ROOFLINE.md); keep the default operand
# byte-identical to the r4 layout.
_CLUSTER_AABB_KEYS = ("cbx0", "cby0", "cbz0", "cbx1", "cby1", "cbz1",
                      "sbx0", "sby0", "sbz0", "sbx1", "sby1", "sbz1",
                      "ord", "lord") + (
                          _BVH_KEYS if SWEEP_MODE == "bvh" else ())
_SPH_KEYS = ("c0x", "c0y", "c0z", "dpx", "dpy", "dpz", "rad", "mat", "act",
             ) + _CLUSTER_AABB_KEYS
SPH_CLUSTER = 16   # spheres per L1 cluster
SPH_SUPER = 128    # spheres per L2 supercluster (8 L1 clusters)
_QUAD_KEYS = ("nx", "ny", "nz", "d", "aax", "aay", "aaz", "abx", "aby",
              "abz", "qaa", "qab", "mat")
_BOX_KEYS = ("x0", "y0", "z0", "x1", "y1", "z1", "mat", "act",
             ) + _CLUSTER_AABB_KEYS
BOX_CLUSTER = 16
BOX_SUPER = 128
_MED_KEYS = ("btype", "p0x", "p0y", "p0z", "p1x", "p1y", "p1z",
             "dspx", "dspy", "dspz",
             "i00", "i01", "i02", "i03", "i10", "i11", "i12", "i13",
             "i20", "i21", "i22", "i23", "nid", "mat")
_MAT_KEYS = ("mtype", "alr", "alg", "alb", "param", "tex")
_TEX_KEYS = ("ttype", "alr", "alg", "alb", "inv_scale", "even", "odd",
             "scale", "ntype", "nslot")
NOISE_TABLE_N = 256  # entries per Perlin perm/grad table (PerlinNoiseGen.cpp)


def _cluster_tables(tbl, lo, hi, act_mask, cluster, super_):
    """Fill ``tbl`` with the two-level cluster AABBs and visit orders.

    lo/hi: [P,3] per-record AABBs (P a multiple of ``super_``); inactive
    (padding) records get ±BIG bounds so empty clusters fail every slab test.
    Emits cb* (L1, per-``cluster``), sb* (L2, per-``super_``), and ``ord``:
    a [6 * n_l2] table of supercluster ids, ascending centroid along
    +x,-x,+y,-y,+z,-z — the kernel picks the row matching its tile's
    dominant ray direction so best_t shrinks front-to-back."""
    lo = jnp.where(act_mask[:, None], lo, BIG)
    hi = jnp.where(act_mask[:, None], hi, -BIG)
    n_cl = lo.shape[0] // cluster
    n_l2 = lo.shape[0] // super_
    cl_lo_raw = lo.reshape(n_cl, cluster, 3).min(axis=1)
    cl_hi_raw = hi.reshape(n_cl, cluster, 3).max(axis=1)
    cl_lo, cl_hi = cl_lo_raw, cl_hi_raw
    sb_lo = lo.reshape(n_l2, super_, 3).min(axis=1)
    sb_hi = hi.reshape(n_l2, super_, 3).max(axis=1)

    def _degenerate_empty(b_lo, b_hi):
        # Fully-padded clusters come out INVERTED (lo=+BIG, hi=-BIG), and an
        # inverted box does NOT fail the slab test: could_hit min/maxes the
        # two plane distances per axis, so the interval becomes (-inf, inf)
        # and the empty cluster is descended every bounce. Collapse them to
        # a degenerate point (lo == hi == BIG): t0 == t1 exactly, and the
        # strict `t1 > max(t0, t_min)` fails — empty clusters really skip.
        empty = b_hi[:, :1] < b_lo[:, :1]
        return jnp.where(empty, BIG, b_lo), jnp.where(empty, BIG, b_hi)

    cl_lo, cl_hi = _degenerate_empty(cl_lo, cl_hi)
    sb_lo, sb_hi = _degenerate_empty(sb_lo, sb_hi)
    for axis, name in enumerate("xyz"):
        tbl["cb" + name + "0"] = cl_lo[:, axis]
        tbl["cb" + name + "1"] = cl_hi[:, axis]
        tbl["sb" + name + "0"] = sb_lo[:, axis]
        tbl["sb" + name + "1"] = sb_hi[:, axis]
    cen = (sb_lo + sb_hi) * 0.5  # [n_l2, 3]; empty superclusters -> 0
    orders = []
    for axis in range(3):
        asc = jnp.argsort(cen[:, axis])
        orders.append(asc)
        orders.append(asc[::-1])
    tbl["ord"] = jnp.concatenate(orders).astype(jnp.float32)
    # lord: front-to-back L1 visit order WITHIN each supercluster, same six
    # directions — entry [dir*n_cl + s*ratio + j] is the GLOBAL cluster id
    # visited j-th inside super s, ascending/descending centroid per axis.
    # best_t then tightens in visit order inside a super too, so later
    # cluster `t0 < best` skips fire sooner. (Empty padded clusters have
    # centroid BIG: they sort to an end, and their degenerate AABB fails
    # the slab test wherever they land.)
    ccen = (cl_lo + cl_hi) * 0.5  # [n_cl, 3]
    ratio = super_ // cluster
    base = (jnp.arange(n_l2) * ratio)[:, None]
    lorders = []
    for axis in range(3):
        asc_local = jnp.argsort(ccen[:, axis].reshape(n_l2, ratio), axis=1)
        lorders.append((base + asc_local).reshape(-1))
        lorders.append((base + asc_local[:, ::-1]).reshape(-1))
    tbl["lord"] = jnp.concatenate(lorders).astype(jnp.float32)
    if SWEEP_MODE == "bvh":
        # Threaded BVH over the raw (inverted-convention) cluster AABBs —
        # the inverted padding boxes vanish from unions; leaves collapse
        # inside _build_threaded_bvh.
        _build_threaded_bvh(tbl, cl_lo_raw, cl_hi_raw)


def _build_threaded_bvh(tbl, cl_lo, cl_hi):
    """Threaded (stackless) BVH over the L1 cluster AABBs, jnp-traceable.

    Build: the reference's own algorithm (src/cpu_raytrace/BVH.cpp:10-48) —
    recurse over spans of the cluster list, sorting each span by AABB min
    along the span bounds' longest axis and splitting at the median. The
    TOPOLOGY (node ids and span sizes) depends only on the static cluster
    count: ids are assigned pre-order (a node over c clusters occupies ids
    [id, id+2c-1); left child = id+1, right = id+2·mid), so the recursion
    unrolls at trace time while the permutation, AABBs, and links stay
    traced values — the build lives inside the same jit as the render and
    recomputes when scene geometry changes (e.g. under optimization).

    Traversal (``_bvh_sweep``) needs no stack: for each of the 6 dominant
    ray directions the DFS is threaded into hit/miss links — hit at an
    internal node goes to its NEAR child (smaller centroid along the
    direction axis first), hit at a leaf and every miss go to the node's
    escape. Near-first plus the per-lane ``t0 < best_t`` interval shrink is
    the wavefront form of the reference's per-ray ordered walk
    (BVH.cpp:50-55).

    Padding clusters arrive with inverted bounds (lo=+BIG, hi=-BIG) so
    min/max unions ignore them; their sort keys (+BIG) push them to span
    ends, and fully-empty nodes collapse to a degenerate point (lo == hi ==
    BIG) whose slab test always fails.
    """
    n_cl = cl_lo.shape[0]
    m = 2 * n_cl - 1
    node_lo = [None] * m
    node_hi = [None] * m
    node_leaf = [None] * m
    kids = [None] * m

    def build(start, end, node, order):
        span = order[start:end]
        lo = jnp.take(cl_lo, span, axis=0)
        hi = jnp.take(cl_hi, span, axis=0)
        mn = lo.min(0)
        mx = hi.max(0)
        node_lo[node] = mn
        node_hi[node] = mx
        if end - start == 1:
            node_leaf[node] = span[0].astype(jnp.float32)
            return order
        node_leaf[node] = jnp.float32(-1.0)
        ext = mx - mn
        ax_x = (ext[0] >= ext[1]) & (ext[0] >= ext[2])
        ax_y = (~ax_x) & (ext[1] >= ext[2])
        keys = jnp.where(ax_x, lo[:, 0], jnp.where(ax_y, lo[:, 1], lo[:, 2]))
        order = order.at[start:end].set(span[jnp.argsort(keys, stable=True)])
        mid = (end - start) // 2
        left, right = node + 1, node + 2 * mid
        kids[node] = (left, right)
        order = build(start, start + mid, left, order)
        return build(start + mid, end, right, order)

    build(0, n_cl, 0, jnp.arange(n_cl, dtype=jnp.int32))

    hit_links = [[None] * m for _ in range(6)]
    miss_links = [[None] * m for _ in range(6)]
    for d in range(6):
        axis, asc = d // 2, d % 2 == 0

        def thread(node, escape, axis=axis, asc=asc, d=d):
            if kids[node] is None:
                hit_links[d][node] = escape
                miss_links[d][node] = escape
                return
            left, right = kids[node]
            c_l = node_lo[left][axis] + node_hi[left][axis]
            c_r = node_lo[right][axis] + node_hi[right][axis]
            near_left = (c_l <= c_r) if asc else (c_l >= c_r)
            f_l, f_r = jnp.float32(left), jnp.float32(right)
            hit_links[d][node] = jnp.where(near_left, f_l, f_r)
            miss_links[d][node] = escape
            thread(left, jnp.where(near_left, f_r, escape))
            thread(right, jnp.where(near_left, escape, f_l))

        thread(0, jnp.float32(-1.0))

    lo_arr = jnp.stack(node_lo)  # [m, 3]
    hi_arr = jnp.stack(node_hi)
    empty = hi_arr[:, :1] < lo_arr[:, :1]
    lo_arr = jnp.where(empty, BIG, lo_arr)
    hi_arr = jnp.where(empty, BIG, hi_arr)
    for axis, name in enumerate("xyz"):
        tbl["bv" + name + "0"] = lo_arr[:, axis]
        tbl["bv" + name + "1"] = hi_arr[:, axis]
    tbl["bleaf"] = jnp.stack(node_leaf)
    tbl["bhit"] = jnp.stack([x for d in range(6) for x in hit_links[d]])
    tbl["bmiss"] = jnp.stack([x for d in range(6) for x in miss_links[d]])


def pack_tables(scene, sizes):
    """Pack ACTIVE records into dense f32 SMEM rows (trace-time).

    The loader packs active records as a prefix (padding after), so the
    static counts in ``sizes`` select them with plain slices — no dynamic
    masking, works under jit.
    """
    n_sph, n_quad, _, _, n_med, n_box = sizes
    s_idx = slice(0, max(n_sph, 1))
    q_idx = slice(0, max(n_quad, 1))
    m_idx = slice(0, max(n_med, 1))
    b_idx = slice(0, max(n_box, 1))

    def f32(x):
        return x.astype(jnp.float32)

    sp = scene.spheres

    def sph_pad(x):
        # Pad sphere rows to a supercluster multiple; padded rows get act=0.
        pad = -max(n_sph, 1) % SPH_SUPER
        return jnp.pad(f32(x), (0, pad))

    act = jnp.zeros(max(n_sph, 1), jnp.float32).at[:].set(1.0) if n_sph else jnp.zeros(1, jnp.float32)
    sph = dict(
        c0x=sph_pad(sp.center0[s_idx, 0]), c0y=sph_pad(sp.center0[s_idx, 1]),
        c0z=sph_pad(sp.center0[s_idx, 2]),
        dpx=sph_pad(sp.displacement[s_idx, 0]), dpy=sph_pad(sp.displacement[s_idx, 1]),
        dpz=sph_pad(sp.displacement[s_idx, 2]),
        rad=sph_pad(sp.radius[s_idx]), mat=sph_pad(sp.material[s_idx]),
        act=sph_pad(act),
    )
    # Per-cluster (L1, 16) and per-supercluster (L2, 128) AABBs over the
    # kd-ordered spheres, motion-inclusive: bounds cover center0 and
    # center0+displacement, each ± radius. Plus the 6 direction-sorted
    # supercluster visit orders.
    n_cl = sph["c0x"].shape[0] // SPH_CLUSTER
    lo_sph = jnp.minimum(
        jnp.stack([sph["c0x"], sph["c0y"], sph["c0z"]], -1),
        jnp.stack([sph["c0x"] + sph["dpx"], sph["c0y"] + sph["dpy"],
                   sph["c0z"] + sph["dpz"]], -1),
    ) - sph["rad"][:, None]
    hi_sph = jnp.maximum(
        jnp.stack([sph["c0x"], sph["c0y"], sph["c0z"]], -1),
        jnp.stack([sph["c0x"] + sph["dpx"], sph["c0y"] + sph["dpy"],
                   sph["c0z"] + sph["dpz"]], -1),
    ) + sph["rad"][:, None]
    _cluster_tables(sph, lo_sph, hi_sph, sph["act"] > 0, SPH_CLUSTER, SPH_SUPER)
    q = scene.quads
    a_alpha = jnp.cross(q.v, q.w)
    a_beta = jnp.cross(q.w, q.u)
    qd = dict(
        nx=f32(q.normal[q_idx, 0]), ny=f32(q.normal[q_idx, 1]), nz=f32(q.normal[q_idx, 2]),
        d=f32(q.d[q_idx]),
        aax=f32(a_alpha[q_idx, 0]), aay=f32(a_alpha[q_idx, 1]), aaz=f32(a_alpha[q_idx, 2]),
        abx=f32(a_beta[q_idx, 0]), aby=f32(a_beta[q_idx, 1]), abz=f32(a_beta[q_idx, 2]),
        qaa=f32(jnp.sum(q.q * a_alpha, -1)[q_idx]), qab=f32(jnp.sum(q.q * a_beta, -1)[q_idx]),
        mat=f32(q.material[q_idx]),
    )
    bx = scene.boxes

    def box_pad(x):
        pad = -max(n_box, 1) % BOX_SUPER
        return jnp.pad(f32(x), (0, pad))

    bact = jnp.ones(max(n_box, 1), jnp.float32) if n_box else jnp.zeros(1, jnp.float32)
    boxes = dict(
        x0=box_pad(bx.bmin[b_idx, 0]), y0=box_pad(bx.bmin[b_idx, 1]),
        z0=box_pad(bx.bmin[b_idx, 2]),
        x1=box_pad(bx.bmax[b_idx, 0]), y1=box_pad(bx.bmax[b_idx, 1]),
        z1=box_pad(bx.bmax[b_idx, 2]),
        mat=box_pad(bx.material[b_idx]), act=box_pad(bact),
    )
    lo_box = jnp.stack([boxes["x0"], boxes["y0"], boxes["z0"]], -1)
    hi_box = jnp.stack([boxes["x1"], boxes["y1"], boxes["z1"]], -1)
    _cluster_tables(boxes, lo_box, hi_box, boxes["act"] > 0, BOX_CLUSTER, BOX_SUPER)
    md = scene.media
    med = dict(
        btype=f32(md.btype[m_idx]),
        p0x=f32(md.p0[m_idx, 0]), p0y=f32(md.p0[m_idx, 1]), p0z=f32(md.p0[m_idx, 2]),
        p1x=f32(md.p1[m_idx, 0]), p1y=f32(md.p1[m_idx, 1]), p1z=f32(md.p1[m_idx, 2]),
        dspx=f32(md.displacement[m_idx, 0]), dspy=f32(md.displacement[m_idx, 1]),
        dspz=f32(md.displacement[m_idx, 2]),
        i00=f32(md.inv_model[m_idx, 0, 0]), i01=f32(md.inv_model[m_idx, 0, 1]),
        i02=f32(md.inv_model[m_idx, 0, 2]), i03=f32(md.inv_model[m_idx, 0, 3]),
        i10=f32(md.inv_model[m_idx, 1, 0]), i11=f32(md.inv_model[m_idx, 1, 1]),
        i12=f32(md.inv_model[m_idx, 1, 2]), i13=f32(md.inv_model[m_idx, 1, 3]),
        i20=f32(md.inv_model[m_idx, 2, 0]), i21=f32(md.inv_model[m_idx, 2, 1]),
        i22=f32(md.inv_model[m_idx, 2, 2]), i23=f32(md.inv_model[m_idx, 2, 3]),
        nid=f32(md.neg_inv_density[m_idx]), mat=f32(md.material[m_idx]),
    )
    m = scene.materials
    mats = dict(
        mtype=f32(m.mtype), alr=f32(m.albedo[:, 0]), alg=f32(m.albedo[:, 1]),
        alb=f32(m.albedo[:, 2]), param=f32(m.param), tex=f32(m.tex),
    )
    t = scene.textures
    # nslot: position of each noise row among the noise rows (its table slot
    # in the pack_noise_tables operand); 0 for non-noise rows (never read).
    is_noise = (t.ttype == defs.TEX_NOISE).astype(jnp.int32)
    nslot = jnp.cumsum(is_noise) - is_noise
    texs = dict(
        ttype=f32(t.ttype), alr=f32(t.albedo[:, 0]), alg=f32(t.albedo[:, 1]),
        alb=f32(t.albedo[:, 2]), inv_scale=f32(t.inv_scale),
        even=f32(t.even), odd=f32(t.odd),
        scale=f32(t.scale), ntype=f32(t.noise_type), nslot=f32(nslot),
    )
    return sph, qd, boxes, med, mats, texs


def pack_noise_tables(scene, noise_rows):
    """Pack the noise textures' Perlin tables for the kernel's table-Perlin
    mode (features noise_impl="table"): [8, T*256] f32 — rows 0-2 the three
    permutation tables (integer-valued), rows 3-5 the gradient xyz, rows 6-7
    sublane padding. Texture with nslot s occupies columns s*256..s*256+255,
    so a per-lane flat gather index is nslot*256 + (lattice & 255).
    Reference tables: src/cpu_raytrace/PerlinNoiseGen.cpp:40-50 via
    scene/perlin.py (deterministic seeding)."""
    t = scene.textures
    rows = list(noise_rows)
    perm = jnp.stack([t.perm[r] for r in rows], 1).reshape(3, -1)  # [3, T*256]
    grad = jnp.stack([t.grad[r] for r in rows], 0)                 # [T,256,3]
    gxyz = jnp.moveaxis(grad, -1, 0).reshape(3, -1)                # [3, T*256]
    out = jnp.concatenate([perm.astype(jnp.float32), gxyz], axis=0)
    return jnp.concatenate(
        [out, jnp.zeros((2, out.shape[1]), jnp.float32)], axis=0)


def _mix(x):
    """murmur3 fmix32 — full-avalanche 32-bit mixer."""
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _uniform_from_bits(bits):
    """uint32 → U[0,1) via the top 24 bits (int32 bitcast: Mosaic has no
    uint32→f32 cast)."""
    i = jax.lax.bitcast_convert_type(bits >> jnp.uint32(8), jnp.int32)
    return i.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def v4_sample_key(seed, slot, sample):
    """Exact per-(pixel, sample) key for the v4 kernel — uint32 arithmetic
    throughout, mirroring rng.murmur_uniforms' construction. (An earlier
    form derived ``seed*1000003 + sample`` in f32, which loses integer
    precision above 2^24: for seed >= 17 distinct samples collapsed onto
    identical keys, silently cutting effective spp.) Shared by the kernel
    and tests; seeds 0..16 produce the same keys as the old derivation."""
    seed_u = jnp.asarray(seed).astype(jnp.int32).astype(jnp.uint32)
    slot_u = jnp.asarray(slot).astype(jnp.uint32)
    s_u = jnp.asarray(sample).astype(jnp.int32).astype(jnp.uint32)
    mega = seed_u * jnp.uint32(1000003) + s_u
    return _mix(slot_u * jnp.uint32(0x9E3779B9) ^ _mix(mega))


def _safe_inv(c):
    """1/c with the sign-preserving epsilon clamp used by all slab tests."""
    return 1.0 / jnp.where(jnp.abs(c) < 1e-12,
                           jnp.where(c < 0, -1e-12, 1e-12), c)


def _hier_sweep(tbl, body_fn, rec, alive, ox, oy, oz, invx, invy, invz,
                t_min, n_recs, cluster, super_, dir_idx):
    """Two-level cluster-skip sweep over one primitive family.

    Walks the kd-ordered records through their L2 superclusters (in the
    tile's dominant-direction front-to-back order) and L1 clusters; a
    whole supercluster/cluster is skipped when no live ray's interval can
    intersect its AABB (`t1 > max(t0, t_min)` and `t0 < best_t`). The
    descend/skip decision is a per-tile scalar branch (`jnp.any`) — the
    TPU-shaped form of the reference's per-ray BVH walk
    (src/cpu_raytrace/BVH.cpp:50-55)."""
    n_pad = -(-max(n_recs, 1) // super_) * super_
    n_cl = n_pad // cluster
    n_l2 = n_pad // super_
    ratio = super_ // cluster

    def could_hit(pre, c, best):
        tax = (tbl[pre + "x0"][c] - ox) * invx
        tbx = (tbl[pre + "x1"][c] - ox) * invx
        tay = (tbl[pre + "y0"][c] - oy) * invy
        tby = (tbl[pre + "y1"][c] - oy) * invy
        taz = (tbl[pre + "z0"][c] - oz) * invz
        tbz = (tbl[pre + "z1"][c] - oz) * invz
        t0 = jnp.maximum(jnp.minimum(tax, tbx),
                         jnp.maximum(jnp.minimum(tay, tby),
                                     jnp.minimum(taz, tbz)))
        t1 = jnp.minimum(jnp.maximum(tax, tbx),
                         jnp.minimum(jnp.maximum(tay, tby),
                                     jnp.maximum(taz, tbz)))
        return alive & (t1 > jnp.maximum(t0, t_min)) & (t0 < best)

    def sweep_cluster(c1, rec):
        def inner(k, rec):
            return body_fn(c1 * cluster + k, rec)
        return jax.lax.fori_loop(0, cluster, inner, rec, unroll=cluster)

    def l1_body(c1, rec):
        return jax.lax.cond(
            jnp.any(could_hit("cb", c1, rec[0])),
            lambda r: sweep_cluster(c1, r), lambda r: r, rec,
        )

    if n_l2 < 2:
        return jax.lax.fori_loop(0, n_cl, l1_body, rec)

    def super_body(i, rec):
        c2 = tbl["ord"][dir_idx * n_l2 + i].astype(jnp.int32)

        def descend(rec):
            def l1_in_super(j, rec):
                c1 = tbl["lord"][dir_idx * n_cl + c2 * ratio + j
                                 ].astype(jnp.int32)
                return l1_body(c1, rec)
            return jax.lax.fori_loop(0, ratio, l1_in_super, rec)

        return jax.lax.cond(
            jnp.any(could_hit("sb", c2, rec[0])), descend, lambda r: r, rec,
        )

    return jax.lax.fori_loop(0, n_l2, super_body, rec)


def _bvh_sweep(tbl, body_fn, rec, alive, ox, oy, oz, invx, invy, invz,
               t_min, n_recs, cluster, super_, dir_idx):
    """Threaded-BVH sweep over one primitive family (SWEEP_MODE="bvh").

    Per-tile stackless walk of the cluster BVH built by
    ``_build_threaded_bvh``: a scalar node cursor follows the hit/miss
    links of the tile's dominant-direction threading; node AABBs are read
    as scalars at the (dynamic) cursor and slab-tested against every lane,
    a leaf whose AABB any live lane's shrinking interval can still reach
    sweeps its 16-record cluster, and everything else is skipped whole.
    Matches the reference's per-ray ordered BVH walk
    (src/cpu_raytrace/BVH.cpp:50-55) at tile granularity; pruning only
    drops records that provably cannot beat the running best_t, so the
    winning record — and the rendered image — is identical to the linear
    sweep's (up to exact t ties)."""
    n_pad = -(-max(n_recs, 1) // super_) * super_
    n_cl = n_pad // cluster
    m = 2 * n_cl - 1
    base = dir_idx * m

    def sweep_cluster(c1, rec):
        def inner(k, rec):
            return body_fn(c1 * cluster + k, rec)
        return jax.lax.fori_loop(0, cluster, inner, rec, unroll=cluster)

    def bodyw(carry):
        node, rec = carry
        tax = (tbl["bvx0"][node] - ox) * invx
        tbx = (tbl["bvx1"][node] - ox) * invx
        tay = (tbl["bvy0"][node] - oy) * invy
        tby = (tbl["bvy1"][node] - oy) * invy
        taz = (tbl["bvz0"][node] - oz) * invz
        tbz = (tbl["bvz1"][node] - oz) * invz
        t0 = jnp.maximum(jnp.minimum(tax, tbx),
                         jnp.maximum(jnp.minimum(tay, tby),
                                     jnp.minimum(taz, tbz)))
        t1 = jnp.minimum(jnp.maximum(tax, tbx),
                         jnp.minimum(jnp.maximum(tay, tby),
                                     jnp.maximum(taz, tbz)))
        anyhit = jnp.any(alive & (t1 > jnp.maximum(t0, t_min))
                         & (t0 < rec[0]))
        leaf = tbl["bleaf"][node]
        rec = jax.lax.cond(
            anyhit & (leaf >= 0.0),
            lambda r: sweep_cluster(jnp.maximum(leaf, 0.0).astype(jnp.int32),
                                    r),
            lambda r: r, rec,
        )
        nxt = jnp.where(anyhit, tbl["bhit"][base + node],
                        tbl["bmiss"][base + node])
        return nxt.astype(jnp.int32), rec

    _, rec = jax.lax.while_loop(
        lambda c: c[0] >= 0, bodyw, (jnp.int32(0), rec))
    return rec


def _kf(k):
    """Loop index as f32 — works for traced i32 (fori_loop) and Python int
    (unrolled differentiable replay)."""
    return k.astype(jnp.float32) if hasattr(k, "astype") else jnp.float32(k)


def _ntab_gather(ntab, row, idx):
    """Per-lane gather ``ntab[row, idx]`` for idx [s, LANES] int32 in
    [0, T*256). Mosaic supports exactly one dynamic-gather form — 2-D
    ``take_along_axis`` where operand, indices, and output share a shape
    (tpu.dynamic_gather; a 1-D ``jnp.take`` fails to lower with "Only 2D
    gather is supported") — so the flat table row is walked in LANES-wide
    segments: broadcast each segment across the sublanes, lane-gather by
    the low 7 index bits, select by segment id. 2T segments per lookup
    (T = number of noise textures), all vectorized."""
    col = jnp.bitwise_and(idx, LANES - 1)
    seg = jnp.right_shift(idx, 7)
    out = jnp.zeros(idx.shape, jnp.float32)
    for r in range(ntab.shape[1] // LANES):
        rowv = jnp.broadcast_to(
            ntab[row:row + 1, r * LANES:(r + 1) * LANES], idx.shape)
        g = jnp.take_along_axis(rowv, col, axis=1)
        out = jnp.where(seg == r, g, out)
    return out


def _table_perlin(px, py, pz, base_i, ntab):
    """One octave of TABLE Perlin (the XLA path's exact function,
    ops/textures.perlin_noise / PerlinNoiseGen.cpp:66-88): per-lane gathers
    from the packed [8, T*256] perm/grad operand via ``_ntab_gather``
    (rows 0-2 perm, 3-5 grad xyz). ``base_i`` = nslot*256 selects the
    lane's texture's table block; lattice coords are masked &255 like the
    reference."""
    fx = jnp.floor(px)
    fy = jnp.floor(py)
    fz = jnp.floor(pz)
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)
    iz = fz.astype(jnp.int32)
    u = px - fx
    v = py - fy
    w = pz - fz
    uu = u * u * (3.0 - 2.0 * u)
    vv = v * v * (3.0 - 2.0 * v)
    ww = w * w * (3.0 - 2.0 * w)
    pxv = [_ntab_gather(ntab, 0, base_i + ((ix + di) & 255)).astype(jnp.int32)
           for di in (0, 1)]
    pyv = [_ntab_gather(ntab, 1, base_i + ((iy + dj) & 255)).astype(jnp.int32)
           for dj in (0, 1)]
    pzv = [_ntab_gather(ntab, 2, base_i + ((iz + dk) & 255)).astype(jnp.int32)
           for dk in (0, 1)]
    accum = jnp.zeros_like(px)
    for di in (0, 1):
        wi = di * uu + (1 - di) * (1.0 - uu)
        for dj in (0, 1):
            wj = dj * vv + (1 - dj) * (1.0 - vv)
            for dk in (0, 1):
                wk = dk * ww + (1 - dk) * (1.0 - ww)
                gi = base_i + (pxv[di] ^ pyv[dj] ^ pzv[dk])
                dot = (_ntab_gather(ntab, 3, gi) * (u - di)
                       + _ntab_gather(ntab, 4, gi) * (v - dj)
                       + _ntab_gather(ntab, 5, gi) * (w - dk))
                accum = accum + wi * wj * wk * dot
    return accum


def _table_turbulence(px, py, pz, base_i, ntab, depth=7):
    """|sum 0.5^k table_noise(2^k p)| (PerlinNoiseGen.cpp:52-64)."""
    accum = jnp.zeros_like(px)
    weight = 1.0
    sx, sy, sz = px, py, pz
    for _ in range(depth):
        accum = accum + weight * _table_perlin(sx, sy, sz, base_i, ntab)
        weight *= 0.5
        sx, sy, sz = sx * 2.0, sy * 2.0, sz * 2.0
    return jnp.abs(accum)


def make_family_bodies(sph, qd, boxes, med, *, draw, tm, ox, oy, oz,
                       dx, dy, dz, a, inv_a, bn, n_med, track_index=False):
    """Per-family closest-hit body builders over SoA tables (the heart of
    the sweep; reference intersections: Sphere.cpp:7-26, Quad.cpp:19-43,
    AABB slab form, ConstantMedium.cpp:14-58).

    ``rec`` = (best_t, fam, mat, p0, p1, p2, aux[, idx, famid]): fam is
    0 sphere / 1 quad|box / 2 medium; p0..p2 carry the winner's
    center|normal; aux the sphere radius. ``track_index=True`` appends the
    winning record's family-local index and a 4-way family id (0 sphere /
    1 quad / 2 box / 3 medium — fam can't disambiguate quad vs box): the
    gradient replay resolves the winner's params differentiably from them
    (megakernel_grad.py). Tables may be SMEM refs, packed-operand views, or
    any mapping whose values index by the loop counter — including
    per-lane gathered arrays via a constant accessor.
    """
    t_min = jnp.float32(float(defs.T_MIN))
    quad_eps = jnp.float32(float(defs.QUAD_EPS))
    draws_pb = 3 + n_med

    def upd(rec, closer, vals, code=0.0):
        out = tuple(jnp.where(closer, v, r) for v, r in zip(vals[:7], rec[:7]))
        if track_index:
            p, idx, famid = vals[7], rec[7], rec[8]
            out = out + (jnp.where(closer, _kf(p), idx),
                         jnp.where(closer, code, famid))
        return out

    def sph_body(p, rec):
        best_t, fam, mat, r0_, r1_, r2_, aux = rec[:7]
        cx = sph["c0x"][p] + tm * sph["dpx"][p]
        cy = sph["c0y"][p] + tm * sph["dpy"][p]
        cz = sph["c0z"][p] + tm * sph["dpz"][p]
        ocx = cx - ox
        ocy = cy - oy
        ocz = cz - oz
        h = dx * ocx + dy * ocy + dz * ocz
        rad = sph["rad"][p]
        cc = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
        disc = h * h - a * cc
        has = disc >= 0.0
        # Double-where: sqrt'(0)=inf would turn masked-out lanes'
        # zero cotangents into NaN under the replay vjp.
        sq = jnp.where(has, jnp.sqrt(jnp.where(has, disc, 1.0)), 0.0)
        root0 = (h - sq) * inv_a
        root1 = (h + sq) * inv_a
        ok0 = (root0 > t_min) & (root0 < best_t)
        ok1 = (root1 > t_min) & (root1 < best_t)
        root = jnp.where(ok0, root0, root1)
        closer = has & (ok0 | ok1) & (sph["act"][p] > 0)
        return upd(rec, closer, (root, 0.0, sph["mat"][p], cx, cy, cz, rad, p), 0.0)

    def quad_body(p, rec):
        best_t, fam, mat, r0_, r1_, r2_, aux = rec[:7]
        nx = qd["nx"][p]
        ny = qd["ny"][p]
        nz = qd["nz"][p]
        nd = dx * nx + dy * ny + dz * nz
        no = ox * nx + oy * ny + oz * nz
        not_par = jnp.abs(nd) >= quad_eps
        t = (qd["d"][p] - no) / jnp.where(not_par, nd, 1.0)
        o_aa = ox * qd["aax"][p] + oy * qd["aay"][p] + oz * qd["aaz"][p]
        d_aa = dx * qd["aax"][p] + dy * qd["aay"][p] + dz * qd["aaz"][p]
        o_ab = ox * qd["abx"][p] + oy * qd["aby"][p] + oz * qd["abz"][p]
        d_ab = dx * qd["abx"][p] + dy * qd["aby"][p] + dz * qd["abz"][p]
        alpha = o_aa + t * d_aa - qd["qaa"][p]
        beta = o_ab + t * d_ab - qd["qab"][p]
        closer = (
            not_par & (t >= t_min) & (t <= best_t)
            & (alpha >= 0.0) & (alpha <= 1.0)
            & (beta >= 0.0) & (beta <= 1.0)
        )
        return upd(rec, closer, (t, 1.0, qd["mat"][p], nx, ny, nz, rec[6], p), 1.0)

    # Axis-aligned boxes: slab test, ~5x cheaper than the 6-quad
    # expansion (which still exists for the XLA path). Entry hit at t0
    # with the entering face's outward normal, exit hit at t1 for rays
    # starting inside — identical surfaces/records to the quad form.
    inv_dx = _safe_inv(dx)
    inv_dy = _safe_inv(dy)
    inv_dz = _safe_inv(dz)

    def box_body(b, rec):
        best_t, fam, mat, r0_, r1_, r2_, aux = rec[:7]
        tax = (boxes["x0"][b] - ox) * inv_dx
        tbx = (boxes["x1"][b] - ox) * inv_dx
        tay = (boxes["y0"][b] - oy) * inv_dy
        tby = (boxes["y1"][b] - oy) * inv_dy
        taz = (boxes["z0"][b] - oz) * inv_dz
        tbz = (boxes["z1"][b] - oz) * inv_dz
        lox = jnp.minimum(tax, tbx)
        hix = jnp.maximum(tax, tbx)
        loy = jnp.minimum(tay, tby)
        hiy = jnp.maximum(tay, tby)
        loz = jnp.minimum(taz, tbz)
        hiz = jnp.maximum(taz, tbz)
        t0 = jnp.maximum(lox, jnp.maximum(loy, loz))
        t1 = jnp.minimum(hix, jnp.minimum(hiy, hiz))
        enter = t0 >= t_min
        t = jnp.where(enter, t0, t1)
        closer = (t1 > t0) & (t > t_min) & (t < best_t) & (t1 > t_min)
        # Face axis: which slab produced the chosen t. (No select
        # between i1 vectors — Mosaic can't lower it.)
        ax_x = (enter & (t0 == lox)) | (~enter & (t1 == hix))
        ax_y = ((enter & (t0 == loy)) | (~enter & (t1 == hiy))) & ~ax_x
        ax_z = ~ax_x & ~ax_y
        sgn = jnp.where(enter, -1.0, 1.0)
        nxb = jnp.where(ax_x, sgn * jnp.sign(dx), 0.0)
        nyb = jnp.where(ax_y, sgn * jnp.sign(dy), 0.0)
        nzb = jnp.where(ax_z, sgn * jnp.sign(dz), 0.0)
        closer = closer & (boxes["act"][b] > 0)
        return upd(rec, closer,
                   (t, 1.0, boxes["mat"][b], nxb, nyb, nzb, rec[6], b), 2.0)

    # Constant media: analytic boundary entry/exit in model space +
    # exponential free path (ConstantMedium.cpp:14-58; semantics match
    # ops/intersect._media_ts).
    def med_body(m, rec):
        best_t, fam, mat, r0_, r1_, r2_, aux = rec[:7]
        omx = med["i00"][m] * ox + med["i01"][m] * oy + med["i02"][m] * oz + med["i03"][m]
        omy = med["i10"][m] * ox + med["i11"][m] * oy + med["i12"][m] * oz + med["i13"][m]
        omz = med["i20"][m] * ox + med["i21"][m] * oy + med["i22"][m] * oz + med["i23"][m]
        dmx_r = med["i00"][m] * dx + med["i01"][m] * dy + med["i02"][m] * dz
        dmy_r = med["i10"][m] * dx + med["i11"][m] * dy + med["i12"][m] * dz
        dmz_r = med["i20"][m] * dx + med["i21"][m] * dy + med["i22"][m] * dz
        dm_len = jnp.sqrt(jnp.maximum(dmx_r * dmx_r + dmy_r * dmy_r + dmz_r * dmz_r, 1e-24))
        dmx = dmx_r / dm_len
        dmy = dmy_r / dm_len
        dmz = dmz_r / dm_len

        # Sphere boundary (moving center).
        cx = med["p0x"][m] + tm * med["dspx"][m]
        cy = med["p0y"][m] + tm * med["dspy"][m]
        cz = med["p0z"][m] + tm * med["dspz"][m]
        ocx = cx - omx
        ocy = cy - omy
        ocz = cz - omz
        h = dmx * ocx + dmy * ocy + dmz * ocz
        r = med["p1x"][m]
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = h * h - cc
        s_valid = disc > 0.0
        sq = jnp.where(s_valid, jnp.sqrt(jnp.where(s_valid, disc, 1.0)), 0.0)
        s_t0 = h - sq
        s_t1 = h + sq

        # Box boundary (slabs, safe reciprocal).
        def slab(dmc, omc, lo, hi):
            d_safe = jnp.where(jnp.abs(dmc) < 1e-12,
                               jnp.where(dmc < 0, -1e-12, 1e-12), dmc)
            inv = 1.0 / d_safe
            ta = (lo - omc) * inv
            tb = (hi - omc) * inv
            return jnp.minimum(ta, tb), jnp.maximum(ta, tb)

        bx0, bx1 = slab(dmx, omx, med["p0x"][m], med["p1x"][m])
        by0, by1 = slab(dmy, omy, med["p0y"][m], med["p1y"][m])
        bz0, bz1 = slab(dmz, omz, med["p0z"][m], med["p1z"][m])
        b_t0 = jnp.maximum(bx0, jnp.maximum(by0, bz0))
        b_t1 = jnp.minimum(bx1, jnp.minimum(by1, bz1))
        b_valid = b_t0 < b_t1

        is_box = med["btype"][m] == float(defs.MEDIUM_BOX)
        t0_ = jnp.where(is_box, b_t0, s_t0)
        t1_ = jnp.where(is_box, b_t1, s_t1)
        # Mosaic cannot select between i1 vectors; combine logically.
        v = (is_box & b_valid) | (~is_box & s_valid)
        v = v & (t1_ > t0_ + jnp.float32(float(defs.MEDIUM_EPS)))

        d_len = jnp.sqrt(jnp.maximum(a, 1e-24))
        scale = dm_len / d_len                       # model units per world t
        e0 = jnp.maximum(jnp.maximum(t0_, t_min * scale), 0.0)
        e1 = jnp.minimum(t1_, best_t * scale)
        v = v & (e0 < e1)
        u_m = draw(bn.astype(jnp.int32) * draws_pb + 3 + m)
        hit_dist = med["nid"][m] * jnp.log(jnp.maximum(u_m, 1e-12))
        v = v & (hit_dist <= (e1 - e0))
        t_world = (e0 + hit_dist) / scale
        return upd(rec, v,
                   (t_world, 2.0, med["mat"][m], 1.0, 0.0, 0.0, rec[6], m), 3.0)

    return sph_body, quad_body, box_body, med_body


def init_rec(shape, track_index=False):
    """Fresh closest-hit record: no winner (fam -1, t BIG)."""
    rec = (
        jnp.full(shape, BIG), jnp.full(shape, -1.0), jnp.zeros(shape),
        jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape),
        jnp.ones(shape),
    )
    if track_index:
        rec = rec + (jnp.full(shape, -1.0), jnp.full(shape, -1.0))
    return rec


def _closest_hit(bodies, sph, boxes, *, alive, ox, oy, oz, dx, dy, dz,
                 n_sph, n_quad, n_med, n_box, shape, loop, unroll_py,
                 track_index=False):
    """Full closest-hit: sweep every family (cluster-skip hierarchy for
    spheres/boxes where built), returning the winning record."""
    t_min = jnp.float32(float(defs.T_MIN))
    sph_body, quad_body, box_body, med_body = bodies
    rec = init_rec(shape, track_index)
    # Dominant live-ray direction of this tile → which of the 6
    # precomputed front-to-back supercluster orders to walk.
    hier_sph = n_sph >= 2 * SPH_CLUSTER and not unroll_py
    hier_box = n_box >= 2 * BOX_CLUSTER and not unroll_py
    if hier_sph or hier_box:
        sxa = jnp.sum(jnp.where(alive, dx, 0.0))
        sya = jnp.sum(jnp.where(alive, dy, 0.0))
        sza = jnp.sum(jnp.where(alive, dz, 0.0))
        axa, aya, aza = jnp.abs(sxa), jnp.abs(sya), jnp.abs(sza)
        is_x = (axa >= aya) & (axa >= aza)
        is_y = (~is_x) & (aya >= aza)
        dir_idx = jnp.where(
            is_x, jnp.where(sxa >= 0, 0, 1),
            jnp.where(is_y, jnp.where(sya >= 0, 2, 3),
                      jnp.where(sza >= 0, 4, 5)),
        ).astype(jnp.int32)
    else:
        dir_idx = jnp.int32(0)

    sweep = _bvh_sweep if SWEEP_MODE == "bvh" else _hier_sweep
    if n_sph and not hier_sph:
        rec = loop(n_sph, sph_body, rec, unroll=n_sph)
    elif n_sph:
        rec = sweep(
            sph, sph_body, rec, alive, ox, oy, oz,
            _safe_inv(dx), _safe_inv(dy), _safe_inv(dz),
            t_min, n_sph, SPH_CLUSTER, SPH_SUPER, dir_idx,
        )

    rec = loop(n_quad, quad_body, rec,
               unroll=n_quad if n_quad <= 64 else 1) if n_quad else rec

    if n_box:
        if not hier_box:
            rec = jax.lax.fori_loop(0, n_box, box_body, rec, unroll=n_box)
        else:
            rec = sweep(
                boxes, box_body, rec, alive, ox, oy, oz,
                _safe_inv(dx), _safe_inv(dy), _safe_inv(dz),
                t_min, n_box, BOX_CLUSTER, BOX_SUPER, dir_idx,
            )

    rec = loop(n_med, med_body, rec) if n_med else rec
    return rec


def gather_table(tblv, idx_f, n_keys, segs):
    """Per-lane gather of all ``n_keys`` columns of a packed
    [n_keys*segs, LANES] table at f32 indices ``idx_f`` — Mosaic's 2-D
    same-shape ``take_along_axis`` walked over 128-wide segments. Returns
    a tuple of per-lane arrays in key order. Values are exact copies of
    the table entries, so a gather-based resolve is bitwise-identical to
    the masked-sweep resolve; cost is O(segs) instead of O(rows)."""
    idx = idx_f.astype(jnp.int32)
    col = jnp.bitwise_and(idx, LANES - 1)
    seg = jnp.right_shift(idx, 7)
    outs = []
    for k in range(n_keys):
        acc = jnp.zeros(idx.shape, jnp.float32)
        for s in range(segs):
            row = tblv[k * segs + s:k * segs + s + 1, :]
            g = jnp.take_along_axis(
                jnp.broadcast_to(row, idx.shape), col, axis=1)
            acc = jnp.where(seg == s, g, acc)
        outs.append(acc)
    return tuple(outs)


# Material/texture tables switch from masked-sweep resolve (O(rows) per
# bounce) to VMEM per-lane gathers (O(rows/128)) above this row count —
# book1 carries 484 materials and measured +30% from it.
MAT_GATHER_MIN = 64


def resolve_segs(n_mat, n_tex):
    """(s_mat, s_tex) segment counts of the packed resolve operand."""
    return (-(-max(n_mat, 1) // LANES), -(-max(n_tex, 1) // LANES))


def pack_resolve_tables(mats, texs, n_mat, n_tex):
    """Pack the material+texture columns into ONE [6*s_mat + 10*s_tex,
    LANES] f32 VMEM operand for gather-based resolve (key order =
    _MAT_KEYS then _TEX_KEYS)."""
    s_mat, s_tex = resolve_segs(n_mat, n_tex)
    rows = []
    for tbl, keys, segs in ((mats, _MAT_KEYS, s_mat), (texs, _TEX_KEYS, s_tex)):
        length = jnp.asarray(tbl[keys[0]]).shape[0]
        for k in keys:
            a = jnp.asarray(tbl[k], jnp.float32)
            a = jnp.pad(a, (0, segs * LANES - length))
            rows.append(a.reshape(segs, LANES))
    return jnp.concatenate(rows, axis=0)


def _make_bounce(sph, qd, boxes, med, mats, texs, bg_r, *, max_depth, n_sph,
                 n_quad, n_med, n_mat, n_tex, n_box, has_checker, has_noise,
                 shape, unroll_py=False, ntab=None, mtab=None):
    """Build the per-bounce transition shared by the v3 (state-passing)
    and v4 (path-regeneration) kernels. ``key`` is the per-lane RNG key
    for the CURRENT (pixel, sample); ``tm`` the per-lane shutter time.

    ``unroll_py``: replace every lax loop with a Python loop and skip the
    cluster hierarchy — the reverse-differentiable replay used by the
    gradient kernel (megakernel_grad.py). lax.fori_loop/while_loop have no
    transpose rule; a Python unroll of the same bodies is the identical
    computation in trace order, so jax.vjp applies. Tables may then be
    dicts of Python lists of traced scalars (vjp inputs) instead of SMEM
    refs — the bodies only ever index them with the loop counter."""
    max_depth_f = jnp.float32(max_depth)

    def loop(n, body, init, unroll=1):
        if unroll_py:
            acc = init
            for i in range(n):
                acc = body(i, acc)
            return acc
        return jax.lax.fori_loop(0, n, body, init, unroll=unroll)

    def bounce(key, tm, carry):
        def draw(ctr):
            c = jnp.asarray(ctr).astype(jnp.uint32)
            bits = _mix(key ^ _mix(c * jnp.uint32(0x9E3779B9) + jnp.uint32(1)))
            return _uniform_from_bits(bits)

        (bn, alive_f, ox, oy, oz, dx, dy, dz,
         tpr, tpg, tpb, rr, rg, rb) = carry
        # alive_f already encodes the depth cap (folded in at update time).
        alive = alive_f > 0.0

        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a

        bodies = make_family_bodies(
            sph, qd, boxes, med, draw=draw, tm=tm, ox=ox, oy=oy, oz=oz,
            dx=dx, dy=dy, dz=dz, a=a, inv_a=inv_a, bn=bn, n_med=n_med,
        )
        rec = _closest_hit(
            bodies, sph, boxes, alive=alive, ox=ox, oy=oy, oz=oz,
            dx=dx, dy=dy, dz=dz, n_sph=n_sph, n_quad=n_quad, n_med=n_med,
            n_box=n_box, shape=shape, loop=loop, unroll_py=unroll_py,
        )
        matf = rec[2]

        if mtab is not None:
            # Gather-based resolve (large tables; bitwise-identical to the
            # sweeps — values are exact table copies either way).
            s_mat, s_tex = resolve_segs(n_mat, n_tex)
            mat_v = mtab[0:6 * s_mat]
            tex_v = mtab[6 * s_mat:6 * s_mat + 10 * s_tex]
            (mtype, alr, alg, alb, mparam, mtex) = gather_table(
                mat_v, matf, 6, s_mat)

            def tex_sweep(idx_f):
                return gather_table(tex_v, idx_f, 10, s_tex)
        else:
            # ---- material resolve: scalar sweep over the material table --
            def mat_body(k, acc):
                mtype, alr, alg, alb, mparam, mtex = acc
                sel = matf == _kf(k)
                return (
                    jnp.where(sel, mats["mtype"][k], mtype),
                    jnp.where(sel, mats["alr"][k], alr),
                    jnp.where(sel, mats["alg"][k], alg),
                    jnp.where(sel, mats["alb"][k], alb),
                    jnp.where(sel, mats["param"][k], mparam),
                    jnp.where(sel, mats["tex"][k], mtex),
                )

            mtype, alr, alg, alb, mparam, mtex = loop(
                n_mat, mat_body,
                (jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape),
                 jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape)),
            )

            # ---- texture resolve (solid / checker / hash-Perlin noise) ---
            def tex_sweep(idx_f):
                def tex_body(k, acc):
                    (ttype, talr, talg, talb, tinv, tev, tod, tsc, tnt,
                     tns) = acc
                    sel = idx_f == _kf(k)
                    return (
                        jnp.where(sel, texs["ttype"][k], ttype),
                        jnp.where(sel, texs["alr"][k], talr),
                        jnp.where(sel, texs["alg"][k], talg),
                        jnp.where(sel, texs["alb"][k], talb),
                        jnp.where(sel, texs["inv_scale"][k], tinv),
                        jnp.where(sel, texs["even"][k], tev),
                        jnp.where(sel, texs["odd"][k], tod),
                        jnp.where(sel, texs["scale"][k], tsc),
                        jnp.where(sel, texs["ntype"][k], tnt),
                        jnp.where(sel, texs["nslot"][k], tns),
                    )

                return loop(
                    n_tex, tex_body,
                    tuple(jnp.zeros(shape) for _ in range(10)),
                )

        return _shade_advance(
            draw, carry, rec, (mtype, alr, alg, alb, mparam, mtex),
            tex_sweep, bg_r, has_checker=has_checker, has_noise=has_noise,
            ntab=ntab, unroll_py=unroll_py, shape=shape,
            max_depth_f=max_depth_f, n_med=n_med,
        )

    return bounce


def _shade_advance(draw, carry, rec, mat6, tex_resolve, bg_r, *,
                   has_checker, has_noise, ntab, unroll_py, shape,
                   max_depth_f, n_med):
    """Shared shade + state-advance: hit record + resolved material →
    emission/attenuation/scatter and the next carry (Material.cpp /
    Texture.cpp semantics; the tail of the per-bounce transition).

    ``tex_resolve(idx_f)`` maps a per-lane texture index to the 10 texture
    columns — a masked sweep in the fast kernels, per-lane VMEM gathers in
    the gradient replay (megakernel_grad.py)."""
    (bn, alive_f, ox, oy, oz, dx, dy, dz,
     tpr, tpg, tpb, rr, rg, rb) = carry
    alive = alive_f > 0.0
    a = dx * dx + dy * dy + dz * dz
    best_t, fam, matf, p0, p1, p2, aux = rec[:7]
    mtype, alr, alg, alb, mparam, mtex = mat6
    valid = fam >= 0.0
    is_sph = fam == 0.0
    is_med = fam == 2.0

    px = ox + best_t * dx
    py = oy + best_t * dy
    pz = oz + best_t * dz
    rad_safe = jnp.where(aux != 0.0, aux, 1.0)
    onx = jnp.where(is_sph, (px - p0) / rad_safe, p0)
    ony = jnp.where(is_sph, (py - p1) / rad_safe, p1)
    onz = jnp.where(is_sph, (pz - p2) / rad_safe, p2)
    front_geom = (dx * onx + dy * ony + dz * onz) < 0.0
    # Medium scatter: arbitrary fixed normal, always front-face
    # (ConstantMedium.cpp:50-55).
    front = front_geom | is_med
    sgn = jnp.where(is_med, 1.0, jnp.where(front_geom, 1.0, -1.0))
    nx_, ny_, nz_ = sgn * onx, sgn * ony, sgn * onz

    leaf = mtex
    (ttype, t_alr, t_alg, t_alb, t_inv, t_even, t_odd,
     t_scale, t_ntype, t_nslot) = tex_resolve(leaf)
    # ``has_checker`` carries the scene's checker NESTING depth (int;
    # reference checkers recurse arbitrarily, Texture.cpp:7-11) — one
    # parity + child re-resolve per level.
    for _ in range(int(has_checker)):
        fx = jnp.floor(t_inv * px)
        fy = jnp.floor(t_inv * py)
        fz = jnp.floor(t_inv * pz)
        parity = fx + fy + fz - 2.0 * jnp.floor((fx + fy + fz) * 0.5)
        child = jnp.where(parity == 0.0, t_even, t_odd)
        leaf = jnp.where(ttype == float(defs.TEX_CHECKER), child, leaf)
        (ttype, t_alr, t_alg, t_alb, t_inv, t_even, t_odd, t_scale,
         t_ntype, t_nslot) = tex_resolve(leaf)
    if has_noise:
        # Texture.cpp:13-22 with hash-derived gradients (see
        # _hash_gradient); pattern keyed by texture index only, so it is
        # fixed across samples/bounces like a real static texture.
        # Miss lanes carry best_t=BIG, so px ~ 1e38 overflows to inf in
        # the turbulence octave doubling; the inf/NaN forward values are
        # masked out of the image but poison reverse-mode (vjp products
        # multiply by primal values), so evaluate noise at a clamped
        # point on those lanes.
        npx = jnp.where(valid, px, 0.0)
        npy = jnp.where(valid, py, 0.0)
        npz = jnp.where(valid, pz, 0.0)
        nseed = _mix(leaf.astype(jnp.int32).astype(jnp.uint32)
                     ^ jnp.uint32(0x5EEDBA5E))
        is_noise = ttype == float(defs.TEX_NOISE)
        sel_n = is_noise & valid

        if ntab is not None:
            # TABLE mode (features noise_impl="table"): the XLA path's
            # exact 256-entry perm/grad tables, gathered per lane from
            # the packed VMEM operand — cross-backend noise goldens
            # compare the same function. ntab is the [8, T*256] jnp
            # array (callers materialize the ref before _make_bounce).
            base_i = t_nslot.astype(jnp.int32) * NOISE_TABLE_N

            def _noise_factor():
                marble = 0.5 * (1.0 + jnp.sin(
                    t_scale * npz + 10.0 * _table_turbulence(
                        npx, npy, npz, base_i, ntab)
                ))
                perl = 0.5 * (1.0 + _table_perlin(
                    t_scale * npx, t_scale * npy, t_scale * npz,
                    base_i, ntab
                ))
                return jnp.where(
                    t_ntype == float(defs.NOISE_MARBLE), marble, perl
                )
        else:
            def _noise_factor():
                marble = 0.5 * (1.0 + jnp.sin(
                    t_scale * npz + 10.0 * _turbulence(npx, npy, npz, nseed)
                ))
                perl = 0.5 * (1.0 + _perlin_noise(
                    t_scale * npx, t_scale * npy, t_scale * npz, nseed
                ))
                return jnp.where(
                    t_ntype == float(defs.NOISE_MARBLE), marble, perl
                )

        if unroll_py:
            # The replay must stay cond-free (lax.cond has no
            # transpose). Both noise modes reroute through a
            # recompute-in-backward wrapper: the 7-octave chain's
            # intermediates otherwise all land in the vjp residual
            # set — ~2000 arrays PER BOUNCE, which at depth 50 blew
            # the 128 MB physical VMEM (book2 measured 261 MB).
            if ntab is None:
                nfac = _noise_factor_remat(
                    npx, npy, npz, t_scale, t_ntype, nseed)
            else:
                nfac = _noise_factor_remat_table(
                    npx, npy, npz, t_scale, t_ntype, base_i, ntab)
        else:
            # The ~2000-op turbulence/perlin evaluation runs only when
            # some lane actually shades a noise texture this bounce — a
            # per-tile scalar branch, like the cluster skips. sel_n is
            # unchanged by it, so the image is bitwise identical.
            nfac = jax.lax.cond(
                jnp.any(sel_n), _noise_factor, lambda: jnp.ones(shape)
            )
        t_alr = jnp.where(sel_n, t_alr * nfac, t_alr)
        t_alg = jnp.where(sel_n, t_alg * nfac, t_alg)
        t_alb = jnp.where(sel_n, t_alb * nfac, t_alb)

    # ---- RNG: per-ray counters from the per-ray bounce index ----------
    bctr = bn.astype(jnp.int32) * (3 + n_med)
    u1 = draw(bctr)
    u2 = draw(bctr + 1)
    u3 = draw(bctr + 2)
    z = 1.0 - 2.0 * u1
    phi = jnp.float32(2.0 * 3.14159265358979) * u2
    rxy = jnp.sqrt(jnp.maximum(1.0 - z * z, 1e-12))
    uvx = rxy * jnp.cos(phi)
    uvy = rxy * jnp.sin(phi)
    uvz = z

    # ---- scatter (Material.cpp semantics) -----------------------------
    is_lamb = (mtype == float(defs.MAT_LAMBERTIAN)) | (mtype == float(defs.MAT_TEXTURE))
    is_metal = mtype == float(defs.MAT_METAL)
    is_diel = mtype == float(defs.MAT_DIELECTRIC)
    is_iso = mtype == float(defs.MAT_ISOTROPIC)
    is_light = mtype == float(defs.MAT_DIFFUSE_LIGHT)
    uses_tex = (mtype == float(defs.MAT_TEXTURE)) | is_iso

    ldx, ldy, ldz = nx_ + uvx, ny_ + uvy, nz_ + uvz
    eps = jnp.float32(float(defs.NEAR_ZERO_EPS))
    degen = (jnp.abs(ldx) < eps) & (jnp.abs(ldy) < eps) & (jnp.abs(ldz) < eps)
    ldx = jnp.where(degen, nx_, ldx)
    ldy = jnp.where(degen, ny_, ldy)
    ldz = jnp.where(degen, nz_, ldz)

    dn = dx * nx_ + dy * ny_ + dz * nz_
    rfx = dx - 2.0 * dn * nx_
    rfy = dy - 2.0 * dn * ny_
    rfz = dz - 2.0 * dn * nz_
    rlen = jnp.sqrt(jnp.maximum(rfx * rfx + rfy * rfy + rfz * rfz, 1e-24))
    mdx = rfx / rlen + mparam * uvx
    mdy = rfy / rlen + mparam * uvy
    mdz = rfz / rlen + mparam * uvz

    param_safe = jnp.where(mparam > 0.0, mparam, 1.0)
    ri = jnp.where(front, 1.0 / param_safe, param_safe)
    dlen = jnp.sqrt(jnp.maximum(a, 1e-24))
    udx, udy, udz = dx / dlen, dy / dlen, dz / dlen
    cos_t = jnp.minimum(-(udx * nx_ + udy * ny_ + udz * nz_), 1.0)
    # 1e-12 floor: cos_t is clamped to exactly 1.0, where sqrt'(0)=inf
    # would NaN the backward (0 cotangent x inf).
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-12))
    cannot = ri * sin_t > 1.0
    r0s = (1.0 - ri) / (1.0 + ri)
    r0s = r0s * r0s
    schl = r0s + (1.0 - r0s) * (1.0 - cos_t) ** 5
    refl_choice = cannot | (schl > u3)
    udn = udx * nx_ + udy * ny_ + udz * nz_
    rfux = udx - 2.0 * udn * nx_
    rfuy = udy - 2.0 * udn * ny_
    rfuz = udz - 2.0 * udn * nz_
    rpx = ri * (udx + cos_t * nx_)
    rpy = ri * (udy + cos_t * ny_)
    rpz = ri * (udz + cos_t * nz_)
    k = 1.0 - (rpx * rpx + rpy * rpy + rpz * rpz)
    spar = -jnp.sqrt(jnp.maximum(jnp.abs(k), 1e-20))
    rrx = rpx + spar * nx_
    rry = rpy + spar * ny_
    rrz = rpz + spar * nz_
    ddx = jnp.where(refl_choice, rfux, rrx)
    ddy = jnp.where(refl_choice, rfuy, rry)
    ddz = jnp.where(refl_choice, rfuz, rrz)

    ndx = jnp.where(is_lamb, ldx, jnp.where(is_metal, mdx, jnp.where(is_diel, ddx, uvx)))
    ndy = jnp.where(is_lamb, ldy, jnp.where(is_metal, mdy, jnp.where(is_diel, ddy, uvy)))
    ndz = jnp.where(is_lamb, ldz, jnp.where(is_metal, mdz, jnp.where(is_diel, ddz, uvz)))

    atr = jnp.where(is_diel, 1.0, jnp.where(uses_tex, t_alr, alr))
    atg = jnp.where(is_diel, 1.0, jnp.where(uses_tex, t_alg, alg))
    atb = jnp.where(is_diel, 1.0, jnp.where(uses_tex, t_alb, alb))
    emr = jnp.where(is_light, t_alr, 0.0)
    emg = jnp.where(is_light, t_alg, 0.0)
    emb = jnp.where(is_light, t_alb, 0.0)

    miss = alive & ~valid
    hit_live = alive & valid
    scatter_live = hit_live & ~is_light

    rr = rr + jnp.where(miss, tpr * bg_r[0], 0.0) + jnp.where(hit_live, tpr * emr, 0.0)
    rg = rg + jnp.where(miss, tpg * bg_r[1], 0.0) + jnp.where(hit_live, tpg * emg, 0.0)
    rb = rb + jnp.where(miss, tpb * bg_r[2], 0.0) + jnp.where(hit_live, tpb * emb, 0.0)
    tpr = jnp.where(scatter_live, tpr * atr, tpr)
    tpg = jnp.where(scatter_live, tpg * atg, tpg)
    tpb = jnp.where(scatter_live, tpb * atb, tpb)
    ox = jnp.where(scatter_live, px, ox)
    oy = jnp.where(scatter_live, py, oy)
    oz = jnp.where(scatter_live, pz, oz)
    dx = jnp.where(scatter_live, ndx, dx)
    dy = jnp.where(scatter_live, ndy, dy)
    dz = jnp.where(scatter_live, ndz, dz)
    bn = bn + jnp.where(alive, 1.0, 0.0)
    next_alive = scatter_live & (bn < max_depth_f)
    return (bn, next_alive.astype(jnp.float32), ox, oy, oz,
            dx, dy, dz, tpr, tpg, tpb, rr, rg, rb)


def _noise_factor_impl(npx, npy, npz, t_scale, t_ntype, nseed):
    """Hash-noise factor (marble|perlin select) — the remat wrapper's
    shared body (identical math to the fast kernels' cond branch)."""
    marble = 0.5 * (1.0 + jnp.sin(
        t_scale * npz + 10.0 * _turbulence(npx, npy, npz, nseed)))
    perl = 0.5 * (1.0 + _perlin_noise(
        t_scale * npx, t_scale * npy, t_scale * npz, nseed))
    return jnp.where(t_ntype == float(defs.NOISE_MARBLE), marble, perl)


@jax.custom_vjp
def _noise_factor_remat(npx, npy, npz, t_scale, t_ntype, nseed):
    """Recompute-in-backward noise factor for the gradient replay: the
    forward saves only the 6 inputs; the backward re-runs the whole
    7-octave evaluation under a local jax.vjp. Mosaic cannot lower
    jax.checkpoint's remat2 primitive, so this is the manual equivalent,
    scoped to exactly the computation whose residuals don't fit."""
    return _noise_factor_impl(npx, npy, npz, t_scale, t_ntype, nseed)


def _nfr_fwd(npx, npy, npz, t_scale, t_ntype, nseed):
    out = _noise_factor_impl(npx, npy, npz, t_scale, t_ntype, nseed)
    return out, (npx, npy, npz, t_scale, t_ntype, nseed)


def _nfr_bwd(res, ct):
    npx, npy, npz, t_scale, t_ntype, nseed = res
    _, vjp_fn = jax.vjp(
        lambda a, b, c, d: _noise_factor_impl(a, b, c, d, t_ntype, nseed),
        npx, npy, npz, t_scale)
    d_px, d_py, d_pz, d_sc = vjp_fn(ct)
    import numpy as _np
    return (d_px, d_py, d_pz, d_sc, jnp.zeros_like(t_ntype),
            _np.zeros(nseed.shape, jax.dtypes.float0))


_noise_factor_remat.defvjp(_nfr_fwd, _nfr_bwd)


def _noise_factor_impl_table(npx, npy, npz, t_scale, t_ntype, base_i, ntab):
    """TABLE-noise factor (marble|perlin select) — the exact 256-entry
    perm/grad evaluation (PerlinNoiseGen.cpp:66-103) used by the
    differentiable replay. The table gathers are indexed by detached
    lattice coordinates (floor — a discrete event under the estimator);
    gradients flow through the Hermite weights and (u - di) dot terms, so
    d/d(p) and d/d(scale) are the true derivatives of the reference's own
    noise with the tables held fixed. ntab carries no cotangent (the
    perm/grad tables are not differentiable leaves)."""
    marble = 0.5 * (1.0 + jnp.sin(
        t_scale * npz + 10.0 * _table_turbulence(npx, npy, npz, base_i,
                                                 ntab)))
    perl = 0.5 * (1.0 + _table_perlin(
        t_scale * npx, t_scale * npy, t_scale * npz, base_i, ntab))
    return jnp.where(t_ntype == float(defs.NOISE_MARBLE), marble, perl)


@jax.custom_vjp
def _noise_factor_remat_table(npx, npy, npz, t_scale, t_ntype, base_i, ntab):
    """Recompute-in-backward table-noise factor (the table-mode analog of
    ``_noise_factor_remat``): forward saves only the inputs + the (small)
    packed table; backward re-runs the 7-octave evaluation under a local
    jax.vjp. Keeps the replay's per-bounce residual set flat."""
    return _noise_factor_impl_table(npx, npy, npz, t_scale, t_ntype,
                                    base_i, ntab)


def _nfrt_fwd(npx, npy, npz, t_scale, t_ntype, base_i, ntab):
    out = _noise_factor_impl_table(npx, npy, npz, t_scale, t_ntype,
                                   base_i, ntab)
    return out, (npx, npy, npz, t_scale, t_ntype, base_i, ntab)


def _nfrt_bwd(res, ct):
    npx, npy, npz, t_scale, t_ntype, base_i, ntab = res
    _, vjp_fn = jax.vjp(
        lambda a, b, c, d: _noise_factor_impl_table(
            a, b, c, d, t_ntype, base_i, ntab),
        npx, npy, npz, t_scale)
    d_px, d_py, d_pz, d_sc = vjp_fn(ct)
    import numpy as _np
    return (d_px, d_py, d_pz, d_sc, jnp.zeros_like(t_ntype),
            _np.zeros(base_i.shape, jax.dtypes.float0),
            jnp.zeros_like(ntab))


_noise_factor_remat_table.defvjp(_nfrt_fwd, _nfrt_bwd)


def _lattice_hash(ix, iy, iz, seed_u):
    """32-bit lattice hash for gradient noise."""
    h = ix.astype(jnp.uint32) * jnp.uint32(0x8DA6B343)
    h = h ^ (iy.astype(jnp.uint32) * jnp.uint32(0xD8163841))
    h = h ^ (iz.astype(jnp.uint32) * jnp.uint32(0xCB1AB31F))
    return _mix(h ^ seed_u)


def _hash_gradient(ix, iy, iz, seed_u):
    """Unit gradient vector per lattice corner from two hashed uniforms
    (the (z, phi) sphere map). Replaces the reference's 256-entry shuffled
    tables (PerlinNoiseGen.cpp:40-50): those are seeded from random_device —
    a fresh random gradient set every reference run — so a deterministic
    hash-derived set is the same class of noise."""
    h1 = _lattice_hash(ix, iy, iz, seed_u)
    h2 = _mix(h1 ^ jnp.uint32(0x68E31DA4))
    u1 = _uniform_from_bits(h1)
    u2 = _uniform_from_bits(h2)
    z = 1.0 - 2.0 * u1
    phi = jnp.float32(2.0 * 3.14159265358979) * u2
    # 1e-12 floor: z=+-1 (hash bits all-zero high word) would make
    # sqrt'(0)=inf NaN the replay backward.
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 1e-12))
    return r * jnp.cos(phi), r * jnp.sin(phi), z


def _perlin_noise(px, py, pz, seed_u):
    """One octave of gradient noise in [-1, 1] with Hermite-smoothed
    interpolation (PerlinInterp semantics, PerlinNoiseGen.cpp:10-26)."""
    fx = jnp.floor(px)
    fy = jnp.floor(py)
    fz = jnp.floor(pz)
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)
    iz = fz.astype(jnp.int32)
    u = px - fx
    v = py - fy
    w = pz - fz
    uu = u * u * (3.0 - 2.0 * u)
    vv = v * v * (3.0 - 2.0 * v)
    ww = w * w * (3.0 - 2.0 * w)
    accum = jnp.zeros_like(px)
    for di in (0, 1):
        wi = uu if di else (1.0 - uu)
        for dj in (0, 1):
            wj = vv if dj else (1.0 - vv)
            for dk in (0, 1):
                wk = ww if dk else (1.0 - ww)
                gx, gy, gz = _hash_gradient(ix + di, iy + dj, iz + dk, seed_u)
                dot = gx * (u - di) + gy * (v - dj) + gz * (w - dk)
                accum = accum + wi * wj * wk * dot
    return accum


def _turbulence(px, py, pz, seed_u, depth=7):
    """|sum 0.5^k noise(2^k p)| (PerlinNoiseGen.cpp:52-64)."""
    accum = jnp.zeros_like(px)
    weight = 1.0
    sx, sy, sz = px, py, pz
    for _ in range(depth):
        accum = accum + weight * _perlin_noise(sx, sy, sz, seed_u)
        weight *= 0.5
        sx, sy, sz = sx * 2.0, sy * 2.0, sz * 2.0
    return jnp.abs(accum)


def _render_kernel(refs_in, refs_out, *, max_depth, n_sph, n_quad, n_med,
                   n_mat, n_tex, n_box, has_checker, has_noise):
    (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tm_r, rid_r, bn_r, al_r,
     tpr_r, tpg_r, tpb_r, seed_r, bg_r, ma_r,
     sph, qd, boxes, med, mats, texs) = refs_in
    bg = (bg_r[0], bg_r[1], bg_r[2])
    (out_rr, out_rg, out_rb, out_ox, out_oy, out_oz, out_dx, out_dy,
     out_dz, out_tpr, out_tpg, out_tpb, out_bn, out_al) = refs_out

    ox0, oy0, oz0 = ox_r[:], oy_r[:], oz_r[:]
    dx0, dy0, dz0 = dx_r[:], dy_r[:], dz_r[:]
    tm = tm_r[:]
    shape = ox0.shape
    min_alive = ma_r[0].astype(jnp.float32)

    # Stable per-ray id (original pixel-order slot) — carried through
    # compaction so each ray's RNG stream is a pure function of its identity
    # regardless of which tile it currently occupies.
    slot = jax.lax.bitcast_convert_type(rid_r[:], jnp.uint32)
    ray_key = _mix(slot * jnp.uint32(0x9E3779B9) ^ _mix(seed_r[0].astype(jnp.uint32)))




    bounce = _make_bounce(
        sph, qd, boxes, med, mats, texs, bg_r,
        max_depth=max_depth, n_sph=n_sph, n_quad=n_quad, n_med=n_med,
        n_mat=n_mat, n_tex=n_tex, n_box=n_box, has_checker=has_checker,
        has_noise=has_noise, shape=shape,
    )

    def body(carry):
        return bounce(ray_key, tm, carry)

    def cond(carry):
        alive_f = carry[1]
        # Stop once the tile's live count drops to min_alive (0 = run dry):
        # the host then compacts survivors across tiles and re-enters.
        return jnp.sum(alive_f) > min_alive

    init = (
        bn_r[:], al_r[:], ox0, oy0, oz0, dx0, dy0, dz0,
        tpr_r[:], tpg_r[:], tpb_r[:],
        jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape),
    )
    final = jax.lax.while_loop(cond, body, init)
    (bn_f, al_f, ox_f, oy_f, oz_f, dx_f, dy_f, dz_f,
     tpr_f, tpg_f, tpb_f, rr_f, rg_f, rb_f) = final
    out_rr[:] = rr_f
    out_rg[:] = rg_f
    out_rb[:] = rb_f
    out_ox[:] = ox_f
    out_oy[:] = oy_f
    out_oz[:] = oz_f
    out_dx[:] = dx_f
    out_dy[:] = dy_f
    out_dz[:] = dz_f
    out_tpr[:] = tpr_f
    out_tpg[:] = tpg_f
    out_tpb[:] = tpb_f
    out_bn[:] = bn_f
    out_al[:] = al_f


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "has_checker", "has_noise", "sizes",
                     "interpret"),
)
def megakernel_pass(state, seed_lane, min_alive, tables, background, *,
                    max_depth, has_checker, has_noise=False, sizes=None,
                    interpret=False):
    """One kernel pass over a ray-state dict; each tile runs its bounce loop
    until its live count drops to ``min_alive`` (0 = run dry).

    ``state`` holds [N]-shaped leaves: ox..dz (o/d components), tm, rid
    (stable ray id driving the RNG stream), bounce, alive, tpr/tpg/tpb.
    Returns (radiance [N,3] contributed THIS pass, new state dict).
    """
    n = state["ox"].shape[0]
    assert n % TILE_R == 0
    rows = n // LANES
    sph, qd, boxes, med, mats, texs = tables
    n_sph, n_quad, n_mat, n_tex, n_med, n_box = sizes

    def shape2(x):
        return x.reshape(rows, LANES)

    ray_args = tuple(
        shape2(state[k]) for k in
        ("ox", "oy", "oz", "dx", "dy", "dz", "tm", "rid", "bounce", "alive",
         "tpr", "tpg", "tpb")
    )
    grid = n // TILE_R
    ray_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    kw = dict(
        max_depth=max_depth,
        n_sph=n_sph, n_quad=n_quad, n_med=n_med, n_mat=n_mat, n_tex=n_tex,
        n_box=n_box, has_checker=has_checker, has_noise=has_noise,
    )

    def kern(*refs):
        ray_refs = refs[:13]
        seed_ref = refs[13]
        bg_ref = refs[14]
        ma_ref = refs[15]
        pos = 16
        sph_r = dict(zip(_SPH_KEYS, refs[pos:pos + len(_SPH_KEYS)]))
        pos += len(_SPH_KEYS)
        qd_r = dict(zip(_QUAD_KEYS, refs[pos:pos + len(_QUAD_KEYS)]))
        pos += len(_QUAD_KEYS)
        box_r = dict(zip(_BOX_KEYS, refs[pos:pos + len(_BOX_KEYS)]))
        pos += len(_BOX_KEYS)
        med_r = dict(zip(_MED_KEYS, refs[pos:pos + len(_MED_KEYS)]))
        pos += len(_MED_KEYS)
        mat_r = dict(zip(_MAT_KEYS, refs[pos:pos + len(_MAT_KEYS)]))
        pos += len(_MAT_KEYS)
        tex_r = dict(zip(_TEX_KEYS, refs[pos:pos + len(_TEX_KEYS)]))
        pos += len(_TEX_KEYS)
        outs = refs[pos:pos + 14]
        # Kernel reads o/d/tm then rid/bounce/alive/throughput.
        (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tm_r, rid_r, bn_r, al_r,
         tpr_r, tpg_r, tpb_r) = ray_refs
        _render_kernel(
            (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tm_r, rid_r, bn_r, al_r,
             tpr_r, tpg_r, tpb_r, seed_ref, bg_ref, ma_ref,
             sph_r, qd_r, box_r, med_r, mat_r, tex_r),
            outs, **kw,
        )

    n_tables = (len(_SPH_KEYS) + len(_QUAD_KEYS) + len(_BOX_KEYS)
                + len(_MED_KEYS) + len(_MAT_KEYS) + len(_TEX_KEYS))
    outs = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[ray_spec] * 13 + [smem_spec] * (3 + n_tables),
        out_specs=tuple(ray_spec for _ in range(14)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32) for _ in range(14)
        ),
        interpret=interpret,
        # The scalar-sweep intermediates exceed the default 16 MiB scoped
        # VMEM budget at wide tiles; v5e has far more physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        *ray_args,
        jnp.asarray(seed_lane, jnp.int32).reshape(1),
        jnp.asarray(background, jnp.float32),
        jnp.asarray(min_alive, jnp.int32).reshape(1),
        *(sph[k] for k in _SPH_KEYS),
        *(qd[k] for k in _QUAD_KEYS),
        *(boxes[k] for k in _BOX_KEYS),
        *(med[k] for k in _MED_KEYS),
        *(mats[k] for k in _MAT_KEYS),
        *(texs[k] for k in _TEX_KEYS),
    )
    flat = [x.reshape(n) for x in outs]
    radiance = jnp.stack(flat[0:3], axis=-1)
    new_state = dict(
        state,
        ox=flat[3], oy=flat[4], oz=flat[5],
        dx=flat[6], dy=flat[7], dz=flat[8],
        tpr=flat[9], tpg=flat[10], tpb=flat[11],
        bounce=flat[12], alive=flat[13],
    )
    return radiance, new_state


def init_state(o, d, time):
    """Fresh ray state for N camera rays (N multiple of TILE_R)."""
    n = o.shape[0]
    rid = jnp.arange(n, dtype=jnp.int32)
    zeros = jnp.zeros(n, jnp.float32)
    ones = jnp.ones(n, jnp.float32)
    return dict(
        ox=o[:, 0], oy=o[:, 1], oz=o[:, 2],
        dx=d[:, 0], dy=d[:, 1], dz=d[:, 2],
        tm=time,
        rid=jax.lax.bitcast_convert_type(rid, jnp.float32),
        bounce=zeros, alive=ones, tpr=ones, tpg=ones, tpb=ones,
    )


def trace_megakernel(o, d, time, seed_lane, tables, background, *,
                     max_depth, has_checker, has_noise=False, sizes=None,
                     interpret=False, phases=3, compaction_ratio=8):
    """Trace N rays to completion with cross-tile compaction between kernel
    passes: each pass stops a tile once its live count falls to 1/ratio of
    the tile, the host gathers survivors (per-ray bounce counters and rid
    keep RNG streams exact), and re-enters on an 8x smaller buffer.
    Returns radiance [N,3].
    """
    n = o.shape[0]
    assert n % TILE_R == 0
    state = init_state(o, d, time)
    radiance_full = jnp.zeros((n, 3), jnp.float32)
    idx_map = jnp.arange(n, dtype=jnp.int32)
    kw = dict(max_depth=max_depth, has_checker=has_checker,
              has_noise=has_noise, sizes=sizes, interpret=interpret)

    width = n
    for phase in range(phases):
        # True survivor bound: each tile exits with <= TILE_R//ratio live
        # rays, so the next buffer must hold n_tiles * (TILE_R//ratio)
        # rounded UP to a tile multiple — rounding down would silently drop
        # live rays (and their remaining bounces) whenever the tile count
        # isn't a multiple of the ratio.
        survivors = (width // TILE_R) * (TILE_R // compaction_ratio)
        cap_next = ((survivors + TILE_R - 1) // TILE_R) * TILE_R
        last = phase == phases - 1 or cap_next >= width or cap_next < TILE_R
        min_alive = 0 if last else TILE_R // compaction_ratio
        radiance, state = megakernel_pass(
            state, seed_lane, min_alive, tables, background, **kw
        )
        radiance_full = radiance_full.at[idx_map].add(radiance)
        if last:
            break
        live = (state["alive"] > 0.0) & (state["bounce"] < max_depth)
        order = jnp.argsort(~live, stable=True)[:cap_next]
        idx_map = idx_map[order]
        state = {k: v[order] for k, v in state.items()}
        width = cap_next
    return radiance_full


# ---------------------------------------------------------------------------
# v4: PATH REGENERATION — samples loop inside the kernel
# ---------------------------------------------------------------------------
#
# v3 launches one kernel pass per progressive sample and pays the bounce
# tail (a tile runs until its LAST ray dies) plus per-sample XLA glue.
# v4 keeps every lane busy instead: each lane owns one pixel; when its ray
# terminates, the lane immediately regenerates the camera ray for its NEXT
# sample in-kernel (camera math + stratified jitter + defocus + shutter time
# from the same counter-hash streams the XLA path uses). Iterations per
# batch drop from n_samples x max_depth to ~n_samples x mean_path + drain.
# Radiance accumulates across a lane's samples, which is exactly the
# progressive-accumulator contribution.

# camv layout (f32 SMEM): 0:3 pixel00, 3:6 pixel_delta_u, 6:9 pixel_delta_v,
# 9:12 center, 12:15 defocus_disk_u, 15:18 defocus_disk_v, 18 defocus_angle,
# 19 width, 20 n_pix, 21 s0, 22 n_samples, 23 sqrt_spp, 24 seed (info only —
# the EXACT seed rides the separate i32 ``seedi`` input: f32 can't represent
# seed*1000003 above 2^24),
# 25 slot0 (global slot id of this shard's first lane — device tiles under
#          shard_map keep globally-correct pixel identities/RNG streams),
# 26 nbx (pixel-block grid width), 27 image height.
#
# Lane→pixel mapping is BLOCK-TILED: each TILE_R-lane kernel tile owns one
# BLOCK×BLOCK pixel block (row-major blocks, row-major pixels inside). A
# linear mapping would hand each tile a full-width strip ~7 rows tall whose
# rays span the whole scene horizontally; a square block's primary rays form
# a tight frustum, which is what makes the per-tile cluster skips in
# _hier_sweep actually fire. RNG keys are derived from the PIXEL id, so the
# rendered image is bitwise independent of the lane layout. Out-of-image
# lanes (edge blocks) idle — lanes are vector width, so they cost nothing.
SUBLANES_LARGE = 8  # fine tiles (32x32-pixel blocks) for cluster-heavy scenes
_CAMV_LEN = 28


def cam_draw(key, k):
    """Camera-draw counter stream (disjoint from bounce draws via the
    0x40000000 offset)."""
    c = jnp.uint32(0x40000000 + k)
    bits = _mix(key ^ _mix(c * jnp.uint32(0x9E3779B9) + jnp.uint32(1)))
    return _uniform_from_bits(bits)


def camera_ray(cv, xx, yy, sqrt_spp, s_global_f, key):
    """In-kernel Camera::GetRay (Camera.hpp:50-67). ``cv`` is anything
    indexable by camv entry id — the SMEM ref (fast kernels) or a list of
    traced scalars (the differentiable replay in megakernel_grad.py, where
    the camera-frame entries are vjp inputs). Returns (o, d, time)."""
    u0 = cam_draw(key, 0)
    u1 = cam_draw(key, 1)
    u2 = cam_draw(key, 2)
    u3 = cam_draw(key, 3)
    u4 = cam_draw(key, 4)
    k1 = jnp.floor(s_global_f / sqrt_spp)
    s_i = s_global_f - k1 * sqrt_spp
    s_j = k1 - jnp.floor(k1 / sqrt_spp) * sqrt_spp
    recip = 1.0 / sqrt_spp
    pxj = (s_i + u0) * recip - 0.5
    pyj = (s_j + u1) * recip - 0.5
    pcx = cv[0] + (xx + pxj) * cv[3] + (yy + pyj) * cv[6]
    pcy = cv[1] + (xx + pxj) * cv[4] + (yy + pyj) * cv[7]
    pcz = cv[2] + (xx + pxj) * cv[5] + (yy + pyj) * cv[8]
    # Defocus disk (polar map).
    r = jnp.sqrt(u2)
    th = jnp.float32(2.0 * 3.14159265358979) * u3
    dkx = r * jnp.cos(th)
    dky = r * jnp.sin(th)
    use_disk = cv[18] > 0.0
    ox_ = jnp.where(use_disk, cv[9] + dkx * cv[12] + dky * cv[15], cv[9])
    oy_ = jnp.where(use_disk, cv[10] + dkx * cv[13] + dky * cv[16], cv[10])
    oz_ = jnp.where(use_disk, cv[11] + dkx * cv[14] + dky * cv[17], cv[11])
    ddx = pcx - ox_
    ddy = pcy - oy_
    ddz = pcz - oz_
    inv_len = jax.lax.rsqrt(jnp.maximum(ddx * ddx + ddy * ddy + ddz * ddz, 1e-24))
    return (ox_, oy_, oz_, ddx * inv_len, ddy * inv_len, ddz * inv_len, u4)


def slot_to_pixel(slot_f, camv, *, tile_r, block, linear_slots):
    """Slot → (xx, yy, in_grid) under either lane layout (see the layout
    comment above; all values < 2^24 so f32 arithmetic is exact)."""
    width = camv[19]
    if linear_slots:
        yy = jnp.floor(slot_f / width)
        xx = slot_f - yy * width
        return xx, yy, slot_f < camv[20]
    nbx = camv[26]
    height = camv[27]
    tile_f = jnp.floor(slot_f * jnp.float32(1.0 / tile_r))
    within = slot_f - tile_f * tile_r
    by = jnp.floor(tile_f / nbx)
    bx = tile_f - by * nbx
    ly = jnp.floor(within * jnp.float32(1.0 / block))
    lx = within - ly * block
    xx = bx * block + lx
    yy = by * block + ly
    return xx, yy, (xx < width) & (yy < height)


def tile_block(sublanes: int, linear: bool = False):
    """(tile_r, block) for a given sublane count; block-tiled layouts need
    square pixel blocks (8x128 lanes -> 32x32 pixels, 32x128 -> 64x64).
    Linear layouts (slot == pixel id; the wavefront kernel) have no pixel
    block, so any sublane count is valid and block is returned as 1."""
    tile_r = sublanes * LANES
    block = int(tile_r ** 0.5)
    if linear:
        return tile_r, max(block, 1)
    assert block * block == tile_r, sublanes
    return tile_r, block


def pixel_slots(width: int, height: int, sublanes: int = SUBLANES,
                linear: bool = False):
    """(n_slots, slot_of_pixel [H,W]) for the lane mapping.

    ``linear`` (small scenes): slot == pixel id, zero padding waste beyond
    the final tile. Block-tiled (cluster scenes): square pixel blocks per
    tile; edge blocks carry idle out-of-image lanes (~10% on 600²), paid
    only where the coherence actually buys sweep skips."""
    tile_r, block = tile_block(sublanes, linear)
    if linear:
        n_pix = width * height
        n_slots = -(-n_pix // tile_r) * tile_r
        return n_slots, jnp.arange(n_pix, dtype=jnp.int32).reshape(height, width)
    nbx = -(-width // block)
    nby = -(-height // block)
    n_slots = nbx * nby * tile_r
    xs = jnp.arange(width, dtype=jnp.int32)
    ys = jnp.arange(height, dtype=jnp.int32)
    tile = (ys[:, None] // block) * nbx + xs[None, :] // block
    slot = tile * tile_r + (ys[:, None] % block) * block + xs[None, :] % block
    return n_slots, slot


def _render_kernel_v4(refs_in, refs_out, *, max_depth, n_sph, n_quad, n_med,
                      n_mat, n_tex, n_box, has_checker, has_noise,
                      sublanes=SUBLANES, wave_frac=1.0, linear_slots=False,
                      ntab_ref=None, mtab_ref=None):
    (camv, seedi, bg_r, sph, qd, boxes, med, mats, texs) = refs_in
    out_rr, out_rg, out_rb = refs_out
    shape = (sublanes, LANES)
    tile_r, block = tile_block(sublanes, linear_slots)

    slot_i = (
        pl.program_id(0) * tile_r
        + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    ) + camv[25].astype(jnp.int32)
    slot_f = slot_i.astype(jnp.float32)
    s0 = camv[21]
    n_samples = camv[22]
    sqrt_spp = camv[23]
    seed_i = seedi[0]
    # Slot → pixel: either mapping yields identical images — RNG is keyed by
    # pixel id — linear just avoids edge-block padding lanes.
    xx, yy, in_grid = slot_to_pixel(
        slot_f, camv, tile_r=tile_r, block=block, linear_slots=linear_slots
    )
    pid_u = (yy * camv[19] + xx).astype(jnp.int32).astype(jnp.uint32)

    def key_for(s_global_f):
        """Per-lane key = mix(pixel·G ^ mix(seed·1000003 + s)) — the same
        construction as rng.murmur_uniforms / the v3 seed plumbing, in exact
        uint32 arithmetic (see v4_sample_key). Keyed by PIXEL id, so the
        image doesn't depend on the block-tiled lane layout."""
        return v4_sample_key(seed_i, pid_u, s_global_f)

    def camera(s_global_f, key):
        return camera_ray(camv, xx, yy, sqrt_spp, s_global_f, key)

    bounce = _make_bounce(
        sph, qd, boxes, med, mats, texs, bg_r,
        max_depth=max_depth, n_sph=n_sph, n_quad=n_quad, n_med=n_med,
        n_mat=n_mat, n_tex=n_tex, n_box=n_box, has_checker=has_checker,
        has_noise=has_noise, shape=shape,
        ntab=None if ntab_ref is None else ntab_ref[...],
        mtab=None if mtab_ref is None else mtab_ref[...],
    )

    zero = jnp.zeros(shape)
    n_lanes_img = jnp.sum(jnp.where(in_grid, 1.0, 0.0))

    def body(carry):
        (s_lane, bn, al, ox, oy, oz, dx, dy, dz, tm,
         tpr, tpg, tpb, rr, rg, rb) = carry
        need = (al <= 0.0) & (s_lane < n_samples - 1.0) & in_grid
        if wave_frac < 1.0:
            # WAVE regeneration: hold dead lanes until tile occupancy drops
            # to wave_frac, then refill them all at once. Fresh rays then
            # enter bounce-ALIGNED (a coherent camera-frustum wave), which
            # is what lets _hier_sweep's per-tile cluster skips fire; the
            # instant-refill default keeps occupancy ~1 but mixes bounce
            # depths so incoherent deep lanes veto every skip. Pure
            # scheduling — per-lane math and RNG streams are unchanged, so
            # the image is bitwise identical for any wave_frac.
            wave = jnp.sum(al) <= wave_frac * n_lanes_img
            need = need & wave
        s_new = s_lane + jnp.where(need, 1.0, 0.0)
        key = key_for(s0 + s_new)
        cox, coy, coz, cdx, cdy, cdz, ctm = camera(s0 + s_new, key)
        ox = jnp.where(need, cox, ox)
        oy = jnp.where(need, coy, oy)
        oz = jnp.where(need, coz, oz)
        dx = jnp.where(need, cdx, dx)
        dy = jnp.where(need, cdy, dy)
        dz = jnp.where(need, cdz, dz)
        tm = jnp.where(need, ctm, tm)
        bn = jnp.where(need, 0.0, bn)
        al = jnp.where(need, 1.0, al)
        tpr = jnp.where(need, 1.0, tpr)
        tpg = jnp.where(need, 1.0, tpg)
        tpb = jnp.where(need, 1.0, tpb)
        (bn, al, ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, rr, rg, rb) = bounce(
            key, tm, (bn, al, ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, rr, rg, rb)
        )
        return (s_new, bn, al, ox, oy, oz, dx, dy, dz, tm,
                tpr, tpg, tpb, rr, rg, rb)

    def cond(carry):
        s_lane, bn, al = carry[0], carry[1], carry[2]
        runnable = jnp.where((al > 0.0) | ((s_lane < n_samples - 1.0) & in_grid), 1.0, 0.0)
        return jnp.sum(runnable) > 0.0

    init = (
        jnp.full(shape, -1.0), zero, zero,            # s_lane, bounce, alive
        zero, zero, zero, zero, zero, zero, zero,     # o, d, tm
        zero, zero, zero,                             # throughput
        zero, zero, zero,                             # radiance
    )
    final = jax.lax.while_loop(cond, body, init)
    out_rr[:] = final[13]
    out_rg[:] = final[14]
    out_rb[:] = final[15]


@functools.partial(
    jax.jit,
    static_argnames=("n_rays", "max_depth", "has_checker", "has_noise",
                     "sizes", "interpret", "sublanes", "wave_frac",
                     "linear_slots"),
)
def trace_megakernel_batch(camv, seedi, tables, background, *, n_rays,
                           max_depth, has_checker, has_noise=False,
                           sizes=None, interpret=False, sublanes=SUBLANES,
                           wave_frac=1.0, linear_slots=False, ntab=None,
                           mtab=None):
    """Sum of n_samples progressive samples for every pixel, one kernel
    launch. ``camv`` is the _CAMV_LEN f32 control vector (camera frame +
    batch params); ``seedi`` the exact i32 seed (f32 camv can't carry it);
    n_rays = padded slot count (multiple of sublanes*LANES; see
    pixel_slots). ``ntab``: optional packed Perlin tables
    (pack_noise_tables) switching the kernel to table-Perlin mode.
    Returns radiance-sum [n_rays, 3]."""
    tile_r, _ = tile_block(sublanes, linear_slots)
    assert n_rays % tile_r == 0
    rows = n_rays // LANES
    sph, qd, boxes, med, mats, texs = tables
    n_sph, n_quad, n_mat, n_tex, n_med, n_box = sizes

    grid = n_rays // tile_r
    ray_spec = pl.BlockSpec((sublanes, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kw = dict(
        max_depth=max_depth,
        n_sph=n_sph, n_quad=n_quad, n_med=n_med, n_mat=n_mat, n_tex=n_tex,
        n_box=n_box, has_checker=has_checker, has_noise=has_noise,
        sublanes=sublanes, wave_frac=wave_frac, linear_slots=linear_slots,
    )
    with_ntab = ntab is not None
    with_mtab = mtab is not None

    def kern(*refs):
        camv_r = refs[0]
        seedi_r = refs[1]
        bg_r = refs[2]
        pos = 3
        sph_r = dict(zip(_SPH_KEYS, refs[pos:pos + len(_SPH_KEYS)]))
        pos += len(_SPH_KEYS)
        qd_r = dict(zip(_QUAD_KEYS, refs[pos:pos + len(_QUAD_KEYS)]))
        pos += len(_QUAD_KEYS)
        box_r = dict(zip(_BOX_KEYS, refs[pos:pos + len(_BOX_KEYS)]))
        pos += len(_BOX_KEYS)
        med_r = dict(zip(_MED_KEYS, refs[pos:pos + len(_MED_KEYS)]))
        pos += len(_MED_KEYS)
        mat_r = dict(zip(_MAT_KEYS, refs[pos:pos + len(_MAT_KEYS)]))
        pos += len(_MAT_KEYS)
        tex_r = dict(zip(_TEX_KEYS, refs[pos:pos + len(_TEX_KEYS)]))
        pos += len(_TEX_KEYS)
        ntab_r = None
        if with_ntab:
            ntab_r = refs[pos]
            pos += 1
        mtab_r = None
        if with_mtab:
            mtab_r = refs[pos]
            pos += 1
        outs = refs[pos:pos + 3]
        _render_kernel_v4(
            (camv_r, seedi_r, bg_r, sph_r, qd_r, box_r, med_r, mat_r, tex_r),
            outs, ntab_ref=ntab_r, mtab_ref=mtab_r, **kw
        )

    n_tables = (len(_SPH_KEYS) + len(_QUAD_KEYS) + len(_BOX_KEYS)
                + len(_MED_KEYS) + len(_MAT_KEYS) + len(_TEX_KEYS))
    operands = [
        jnp.asarray(camv, jnp.float32),
        jnp.asarray(seedi, jnp.int32).reshape(1),
        jnp.asarray(background, jnp.float32),
        *(sph[k] for k in _SPH_KEYS),
        *(qd[k] for k in _QUAD_KEYS),
        *(boxes[k] for k in _BOX_KEYS),
        *(med[k] for k in _MED_KEYS),
        *(mats[k] for k in _MAT_KEYS),
        *(texs[k] for k in _TEX_KEYS),
    ]
    in_specs = [smem_spec] * (3 + n_tables)
    if with_ntab:
        operands.append(jnp.asarray(ntab, jnp.float32))
        in_specs.append(vmem_full)
    if with_mtab:
        operands.append(jnp.asarray(mtab, jnp.float32))
        in_specs.append(vmem_full)
    outs = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(ray_spec, ray_spec, ray_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32) for _ in range(3)
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*operands)
    return jnp.stack([x.reshape(n_rays) for x in outs], axis=-1)
