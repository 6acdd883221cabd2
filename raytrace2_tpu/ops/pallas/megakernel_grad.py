"""Custom VJP for the Pallas megakernel: forward AND backward at kernel speed.

The fast v4 forward (megakernel.trace_megakernel_batch) is wrapped in
``jax.custom_vjp``; the backward is a SECOND Pallas kernel that re-traces
every (pixel, sample) path — the counter-hash RNG makes the whole path a
pure function of (seed, pixel, sample), so NO residuals need to be stored
between forward and backward.

INDEXED REPLAY (v2 — the round-2 kernel Python-unrolled every record sweep
into the differentiable chain, which capped scenes at 64 records and the
chain at depth 16): each replayed bounce now splits closest-hit into

* a NON-differentiable winner search: the production sweep
  (megakernel._closest_hit — cluster-skip hierarchy included) runs on
  ``stop_gradient`` ray state over the SMEM tables, tracking only the
  winning record's (family, index). Zero tangents flow, so lax loops and
  conds inside it need no transpose rules and contribute no residuals.
* a differentiable RESOLVE of the winner only: the winner's parameters are
  gathered per lane from packed VMEM copies of the tables
  (``_make_gather`` — Mosaic's 2-D ``take_along_axis`` walked over
  128-wide segments) and the SAME family intersection body
  (megakernel.make_family_bodies) recomputes its t/normal from them — an
  O(1)-per-bounce differentiable chain regardless of scene size. The
  winner's root choice depends only on t_min, never on the running
  best-so-far, so the resolve reproduces the sweep's result exactly.
* materials/textures resolve by the same per-lane gather at the winner's
  (detached) indices, through the shared shade tail
  (megakernel._shade_advance).

The gather's transpose would be a scatter-add, which Mosaic cannot lower;
``_make_gather`` is a custom_vjp whose backward builds per-sublane one-hot
masks and contracts them against the cotangents on the MXU
(``lax.dot_general`` with the lane dim contracting) — K table keys ride
one matmul per (segment, sublane).

Estimator semantics match the XLA grad path (grad.py): discrete events
(which primitive wins, reflect/refract branch, checker cell, medium
scatter acceptance) carry no gradient, while the continuous chain
(camera ray → hit t → point → normal → scatter direction → next t → ...)
differentiates end to end THROUGH the intersection solves at fixed random
primal.

Differentiable leaves: the packed table rows listed in GRAD_*_KEYS
(chained through megakernel.pack_tables back to the FlatScene leaves),
camera control entries 0..18 (chained through camera_ops.camera_frame),
and the background color. Adjoint accumulation: SMEM scalars (camera,
background) and revisited VMEM blocks (tables) summed across sequential
grid steps and an in-kernel sample loop — one launch produces the whole
gradient.

Scope gate (``grad_supported``): total records within the forward
kernel's own SMEM bound and depth <= GRAD_MAX_DEPTH (the replay unrolls
the bounce chain at trace time). Reference parity: the reference has no
gradients at all — this is north-star surface (BASELINE.json "fwd and
fwd+bwd at speed-of-light").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytrace2_tpu.ops.pallas import megakernel as mk

# Differentiable keys per packed table (reported cotangents; the other
# body keys — integer ids, flags, medium boundary geometry — are traced
# as constants exactly like the round-2 kernel treated them).
GRAD_SPH_KEYS = ("c0x", "c0y", "c0z", "dpx", "dpy", "dpz", "rad")
GRAD_QUAD_KEYS = ("nx", "ny", "nz", "d", "aax", "aay", "aaz",
                  "abx", "aby", "abz", "qaa", "qab")
GRAD_BOX_KEYS = ("x0", "y0", "z0", "x1", "y1", "z1")
GRAD_MED_KEYS = ("nid",)
GRAD_MAT_KEYS = ("alr", "alg", "alb", "param")
GRAD_TEX_KEYS = ("alr", "alg", "alb", "scale")
N_CAMV_DIFF = 19  # camv entries 0..18 are camera geometry; the rest batch params

GRAD_MAX_DEPTH = 64     # replayed bounce chain is unrolled at trace time
GRAD_SUBLANES = 16      # smaller tiles bound the vjp residual VMEM footprint

# Keys each family's intersection body reads (cluster/visit-order keys are
# sweep-only and stay SMEM-resident).
_BODY_SPH = ("c0x", "c0y", "c0z", "dpx", "dpy", "dpz", "rad", "mat", "act")
_BODY_QUAD = mk._QUAD_KEYS
_BODY_BOX = ("x0", "y0", "z0", "x1", "y1", "z1", "mat", "act")
_BODY_MED = mk._MED_KEYS
_BODY_MAT = mk._MAT_KEYS
_BODY_TEX = mk._TEX_KEYS
_FAMS = (_BODY_SPH, _BODY_QUAD, _BODY_BOX, _BODY_MED, _BODY_MAT, _BODY_TEX)


def grad_supported(sizes, max_depth, has_noise) -> bool:
    """Any scene the forward megakernel can render, at any depth the
    forward supports — the round-4 GRAD_MAX_DEPTH_BIG=24 cap on
    >256-record scenes is gone: the pre-pass now runs as a fori loop
    stacking winners/segment-carries into fixed VMEM scratch (~2 MB at
    depth 64) instead of unrolling ~5 MB/bounce of live allocations.
    has_noise is allowed (hash-gradient noise is pure arithmetic — and is
    exactly what makes geometry/camera gradients continuous under the
    detached estimator)."""
    del has_noise
    n_sph, n_quad, n_mat, n_tex, n_med, n_box = sizes
    records = n_sph + n_quad + n_box + n_med
    return records <= mk.MAX_SMEM_RECORDS and max_depth <= GRAD_MAX_DEPTH


def pack_diff_tables(tables):
    """Pack each family's body keys into ONE [K*S, 128] f32 array (K keys,
    S = ceil(rows/128) segments per key): the VMEM side of the tables the
    replay gathers winner parameters from. Linear in the table leaves, so
    jax chains table cotangents straight through it."""
    out = []
    for tbl, keys in zip(tables, _FAMS):
        arr0 = jnp.asarray(tbl[keys[0]])
        length = int(arr0.shape[0])
        segs = -(-length // mk.LANES)
        rows = []
        for k in keys:
            a = jnp.asarray(tbl[k], jnp.float32)
            a = jnp.pad(a, (0, segs * mk.LANES - length))
            rows.append(a.reshape(segs, mk.LANES))
        out.append(jnp.concatenate(rows, axis=0))
    return tuple(out)


def _unpack_diff_cotangent(d_packed, tables):
    """Inverse of pack_diff_tables for the cotangent: [K*S,128] → per-key
    [rows] arrays (only the GRAD_*_KEYS are reported; everything else is
    zero, matching the round-2 kernel's reporting surface)."""
    grad_keys = (GRAD_SPH_KEYS, GRAD_QUAD_KEYS, GRAD_BOX_KEYS,
                 GRAD_MED_KEYS, GRAD_MAT_KEYS, GRAD_TEX_KEYS)
    outs = []
    for dp, tbl, keys, gkeys in zip(d_packed, tables, _FAMS, grad_keys):
        length = int(jnp.asarray(tbl[keys[0]]).shape[0])
        segs = -(-length // mk.LANES)
        d_tbl = {k: jnp.zeros_like(jnp.asarray(v, jnp.float32))
                 for k, v in tbl.items()}
        for i, k in enumerate(keys):
            if k not in gkeys:
                continue
            d_tbl[k] = dp[i * segs:(i + 1) * segs].reshape(-1)[:length]
        outs.append(d_tbl)
    return tuple(outs)


class _Const:
    """Accessor returning the same per-lane array for ANY index — lets the
    shared family bodies (megakernel.make_family_bodies) run once over
    already-gathered winner parameters."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __getitem__(self, _):
        return self.v


@functools.lru_cache(maxsize=64)
def _make_gather(n_keys, segs):
    """gather(tblv [n_keys*segs,128], idx_f [s,LANES] f32) → tuple of
    n_keys per-lane [s,LANES] arrays tblv[k, idx]. custom_vjp: the
    backward scatters cotangents into the table with per-sublane one-hot
    masks contracted on the MXU (Mosaic has no scatter)."""

    def fwd_impl(tblv, idx_f):
        return mk.gather_table(tblv, idx_f, n_keys, segs)

    @jax.custom_vjp
    def gather(tblv, idx_f):
        return fwd_impl(tblv, idx_f)

    def fwd(tblv, idx_f):
        return fwd_impl(tblv, idx_f), idx_f

    def bwd(idx_f, cots):
        idx = idx_f.astype(jnp.int32)
        sub = idx.shape[0]
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (mk.LANES, mk.LANES), 0)
        seg_acc = []
        for s in range(segs):
            acc = jnp.zeros((n_keys, mk.LANES), jnp.float32)
            for r in range(sub):
                idx_row = jnp.broadcast_to(
                    idx[r:r + 1, :], (mk.LANES, mk.LANES))
                mask = jnp.where(
                    iota_c == idx_row - s * mk.LANES, 1.0, 0.0)
                c_rows = jnp.concatenate(
                    [cots[k][r:r + 1, :] for k in range(n_keys)], axis=0)
                # contrib[k, c] = sum_lane c_rows[k, lane] * mask[c, lane]
                acc = acc + jax.lax.dot_general(
                    c_rows, mask, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            seg_acc.append(acc)
        rows = []
        for k in range(n_keys):
            for s in range(segs):
                rows.append(seg_acc[s][k:k + 1, :])
        return jnp.concatenate(rows, axis=0), jnp.zeros_like(idx_f)

    gather.defvjp(fwd, bwd)
    return gather


def _gather_fam(dv, keys, idx_f):
    segs = dv.shape[0] // len(keys)
    vals = _make_gather(len(keys), segs)(dv, idx_f)
    return dict(zip(keys, vals))


def _make_winner_search(sph, qd, boxes, med, *, n_sph, n_quad, n_med, n_box,
                        shape):
    """Production closest-hit (SMEM tables, cluster-skip hierarchy) with
    winner tracking. Runs ONLY in the primal pre-pass — never inside
    jax.vjp (SMEM ref reads inside lax.cond cannot be partial-evaled), so
    the expensive sweep is traced once per bounce and contributes nothing
    to the differentiated graph."""

    def lax_loop(n, body, init, unroll=1):
        return jax.lax.fori_loop(0, n, body, init, unroll=unroll)

    def search(key, tm, carry):
        def draw(ctr):
            # f32 counters ride the medium resolve (per-lane winner index);
            # Mosaic has no f32->u32 cast, so hop through i32 (values are
            # small non-negative ints, both routes are exact).
            c = jnp.asarray(ctr)
            if jnp.issubdtype(c.dtype, jnp.floating):
                c = c.astype(jnp.int32)
            c = c.astype(jnp.uint32)
            bits = _mix_u32(key, c)
            return mk._uniform_from_bits(bits)

        (bn, alive_f, ox, oy, oz, dx, dy, dz, *_rest) = carry
        alive = alive_f > 0.0
        a = dx * dx + dy * dy + dz * dz
        bodies = mk.make_family_bodies(
            sph, qd, boxes, med, draw=draw, tm=tm, ox=ox, oy=oy, oz=oz,
            dx=dx, dy=dy, dz=dz, a=a, inv_a=1.0 / a, bn=bn,
            n_med=n_med, track_index=True,
        )
        rec = mk._closest_hit(
            bodies, sph, boxes, alive=alive, ox=ox, oy=oy, oz=oz,
            dx=dx, dy=dy, dz=dz, n_sph=n_sph, n_quad=n_quad,
            n_med=n_med, n_box=n_box, shape=shape, loop=lax_loop,
            unroll_py=False, track_index=True,
        )
        # (matf, idx, famid) pin the winner for the differentiable resolve.
        return rec[2], rec[7], rec[8]

    return search


def _make_resolve_shade(*, n_sph, n_quad, n_med, n_mat, n_tex, n_box,
                        has_checker, has_noise, shape, max_depth,
                        ntab=None):
    """The differentiable per-bounce transition given a pinned winner
    (matf, idx, famid): gather the winner's parameters from the packed
    VMEM tables, rerun its family's intersection body once (the winner's
    root choice depends only on t_min, never the running best — so this
    reproduces the sweep's result exactly), then the shared shade tail.
    Pure arithmetic + custom-vjp gathers: no refs, no lax control flow —
    jax.vjp applies directly."""
    max_depth_f = jnp.float32(max_depth)
    sg = jax.lax.stop_gradient

    def bounce(key, tm, carry, w, dv, bg_d):
        matf_nd, idx_nd, famid_nd = w
        dv_sph, dv_quad, dv_box, dv_med, dv_mat, dv_tex = dv

        def draw(ctr):
            # f32 counters ride the medium resolve (per-lane winner index);
            # Mosaic has no f32->u32 cast, so hop through i32 (values are
            # small non-negative ints, both routes are exact).
            c = jnp.asarray(ctr)
            if jnp.issubdtype(c.dtype, jnp.floating):
                c = c.astype(jnp.int32)
            c = c.astype(jnp.uint32)
            bits = _mix_u32(key, c)
            return mk._uniform_from_bits(bits)

        (bn, alive_f, ox, oy, oz, dx, dy, dz, *_rest) = carry
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a

        def fam_idx(code):
            return jnp.where(famid_nd == code, idx_nd, 0.0)

        gs = _gather_fam(dv_sph, _BODY_SPH, fam_idx(0.0)) if n_sph else None
        gq = _gather_fam(dv_quad, _BODY_QUAD, fam_idx(1.0)) if n_quad else None
        gb = _gather_fam(dv_box, _BODY_BOX, fam_idx(2.0)) if n_box else None
        gm = _gather_fam(dv_med, _BODY_MED, fam_idx(3.0)) if n_med else None
        med_idx = fam_idx(3.0) if n_med else 0.0

        def const(d):
            return {k: _Const(v) for k, v in d.items()} if d else {}

        bodies_d = mk.make_family_bodies(
            const(gs), const(gq), const(gb), const(gm), draw=draw, tm=tm,
            ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz, a=a, inv_a=inv_a,
            bn=bn, n_med=n_med,
        )
        sph_body, quad_body, box_body, med_body = bodies_d

        rec = mk.init_rec(shape)

        def merge(rec, rec_f, code):
            sel = famid_nd == code
            return tuple(jnp.where(sel, f, r) for f, r in zip(rec_f, rec))

        if n_sph:
            rec = merge(rec, sph_body(0, mk.init_rec(shape)), 0.0)
        if n_quad:
            rec = merge(rec, quad_body(0, mk.init_rec(shape)), 1.0)
        if n_box:
            rec = merge(rec, box_body(0, mk.init_rec(shape)), 2.0)
        if n_med:
            rec = merge(rec, med_body(med_idx, mk.init_rec(shape)), 3.0)

        # ---- material/texture resolve by pinned-index gathers ------------
        gmat = _gather_fam(dv_mat, _BODY_MAT, matf_nd)
        mat6 = (gmat["mtype"], gmat["alr"], gmat["alg"], gmat["alb"],
                gmat["param"], gmat["tex"])

        def tex_resolve(idx_f):
            g = _gather_fam(dv_tex, _BODY_TEX, sg(idx_f))
            return (g["ttype"], g["alr"], g["alg"], g["alb"],
                    g["inv_scale"], g["even"], g["odd"], g["scale"],
                    g["ntype"], g["nslot"])

        return mk._shade_advance(
            draw, carry, rec, mat6, tex_resolve, bg_d,
            has_checker=has_checker, has_noise=has_noise, ntab=ntab,
            unroll_py=True, shape=shape, max_depth_f=max_depth_f,
            n_med=n_med,
        )

    return bounce


def _mix_u32(key, c):
    return mk._mix(key ^ mk._mix(c * jnp.uint32(0x9E3779B9) + jnp.uint32(1)))


def _grad_kernel(refs_in, refs_out, scratch, *, max_depth, n_sph, n_quad,
                 n_med, n_mat, n_tex, n_box, has_checker, has_noise,
                 sublanes, fwd_tile_r, fwd_block, linear_slots, n_samples,
                 phase="full"):
    (camv, seedi, bg_r, sph, qd, boxes, med, mats, texs,
     dv_refs, g_r, g_g, g_b) = refs_in[:13]
    ntab_ref = refs_in[13] if len(refs_in) > 13 else None
    (d_camv, d_bg, *d_dv) = refs_out
    w_scr, c_scr = scratch
    shape = (sublanes, mk.LANES)
    tile_r = sublanes * mk.LANES

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for i in range(N_CAMV_DIFF):
            d_camv[i] = 0.0
        for i in range(3):
            d_bg[i] = 0.0
        for ref in d_dv:
            ref[...] = jnp.zeros(ref.shape, jnp.float32)

    slot_i = (
        pl.program_id(0) * tile_r
        + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * mk.LANES
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    ) + camv[25].astype(jnp.int32)
    slot_f = slot_i.astype(jnp.float32)
    s0 = camv[21]
    sqrt_spp = camv[23]
    seed_i = seedi[0]
    # Pixel mapping must follow the FORWARD kernel's layout — the cotangent
    # arrives in forward slot order.
    xx, yy, in_grid = mk.slot_to_pixel(
        slot_f, camv, tile_r=fwd_tile_r, block=fwd_block,
        linear_slots=linear_slots,
    )
    pid_u = (yy * camv[19] + xx).astype(jnp.int32).astype(jnp.uint32)
    alive0 = jnp.where(in_grid, 1.0, 0.0)

    gr = g_r[...]
    gg = g_g[...]
    gb = g_b[...]

    camv_d = [camv[i] for i in range(N_CAMV_DIFF)]
    bg_d = [bg_r[0], bg_r[1], bg_r[2]]
    dv_vals = tuple(r[...] for r in dv_refs)
    diff0 = (camv_d, bg_d) + dv_vals

    kw = dict(n_sph=n_sph, n_quad=n_quad, n_med=n_med, n_box=n_box,
              shape=shape)
    search = _make_winner_search(sph, qd, boxes, med, **kw)
    bounce = _make_resolve_shade(
        n_mat=n_mat, n_tex=n_tex, has_checker=has_checker,
        has_noise=has_noise, max_depth=max_depth,
        ntab=None if ntab_ref is None else ntab_ref[...], **kw,
    )
    # Rematerialize each bounce when its residuals would blow VMEM: the
    # 7-octave hash-noise alone puts ~2000 intermediates per bounce into
    # the vjp's residual set (book2 at depth 50 measured 261 MB vs the
    # 128 MB physical VMEM). The resolve is ref-free pure arithmetic, so
    # jax.checkpoint applies; the cost is one extra resolve+shade per
    # bounce in the backward. Noise-free Cornell-class scenes measured
    # fine un-rematerialized — keep them at full speed.
    # Big scenes at full depth overflow VMEM with the replay's residuals
    # (book2 @ depth 50 measured 262 MB vs the 128 MB physical):
    # SEGMENTED backward below — the pre-pass stores each segment's input
    # carry, and the vjp runs segment-by-segment in reverse so only one
    # segment's residuals are ever live. jax.checkpoint (remat2) and a
    # custom_vjp bounce wrapper both fail to lower in Mosaic (the latter
    # because any jnp constant created inside becomes a rejected
    # custom_vjp const), so this is plain jax.vjp end to end.
    small_scene = (n_sph + n_quad + n_med + n_box) <= 256
    seg_len = max_depth if small_scene else 8

    def camera_rays(camvv, key, s_f):
        ox, oy, oz, dx, dy, dz, tm = mk.camera_ray(
            camvv, xx, yy, sqrt_spp, s_f, key)
        # Dead (out-of-grid) lanes get a dummy unit ray: their alive=0 mask
        # already zeroes contributions, but garbage o/d would put NaNs in
        # the vjp residuals (NaN * 0 cotangent = NaN).
        ox = jnp.where(in_grid, ox, 0.0)
        oy = jnp.where(in_grid, oy, 0.0)
        oz = jnp.where(in_grid, oz, 0.0)
        dx = jnp.where(in_grid, dx, 0.0)
        dy = jnp.where(in_grid, dy, 0.0)
        dz = jnp.where(in_grid, dz, 1.0)
        zero = jnp.zeros(shape)
        one = jnp.ones(shape)
        return (zero, alive0, ox, oy, oz, dx, dy, dz,
                one, one, one, zero, zero, zero), tm

    n_seg = -(-max_depth // seg_len)

    def primal_winners(key, s_f):
        """Pre-pass OUTSIDE the vjp: advance the primal path with the
        production sweep, pinning each bounce's winner and each remat
        SEGMENT's input carry. The state advance uses the SAME
        resolve+shade as the differentiable replay, so the replay's
        primal trajectory matches this one exactly.

        Two forms, same math:
        * small scenes (≤256 records): Python-unrolled — winners stay in
          registers/values; measured ~18% faster end-to-end than the fori
          form on Cornell d50 (the loop body can pipeline across bounces)
          and its live allocations fit comfortably.
        * big scenes: a lax.fori_loop stacking winners into the ``w_scr``
          VMEM scratch at the bounce index and segment carries into
          ``c_scr`` — fixed ~2 MB of scratch at depth 64 where the r4
          unrolled pre-pass kept ~5 MB/bounce of allocations live (the
          VMEM wall that capped >256-record scenes at depth 24). The
          backward reads them back at static indices."""
        carry0, tm = camera_rays(camv_d, key, s_f)

        if small_scene:
            carry = carry0
            winners, seg_carries = [], []
            for b in range(max_depth):
                if b % seg_len == 0:
                    seg_carries.append(carry)
                w = search(key, tm, carry)
                winners.append(w)
                carry = bounce(key, tm, carry, w, dv_vals, bg_d)
            return winners, seg_carries, tm

        def pre_body(b, carry):
            @pl.when(b % seg_len == 0)
            def _():
                seg = b // seg_len
                for i, v in enumerate(carry):
                    c_scr[seg, i] = v

            w0, w1, w2 = search(key, tm, carry)
            w_scr[0, b] = w0
            w_scr[1, b] = w1
            w_scr[2, b] = w2
            return bounce(key, tm, carry, (w0, w1, w2), dv_vals, bg_d)

        jax.lax.fori_loop(0, max_depth, pre_body, carry0)
        winners = [tuple(w_scr[j, b] for j in range(3))
                   for b in range(max_depth)]
        seg_carries = [tuple(c_scr[s, i] for i in range(14))
                       for s in range(n_seg)]
        return winners, seg_carries, tm

    def replay_whole(diff, key, s_f, winners):
        """Single-segment replay (small scenes): camera + all bounces in
        ONE vjp — the exact pre-segmentation structure, which also
        compiles dramatically faster in interpret mode."""
        camvv, bgv = diff[0], diff[1]
        dv = diff[2:]
        carry, tm = camera_rays(camvv, key, s_f)
        for w in winners:
            carry = bounce(key, tm, carry, w, dv, bgv)
        return carry[11], carry[12], carry[13]

    def sample_body(si, _):
        s_f = s0 + si.astype(jnp.float32)
        key = mk.v4_sample_key(seed_i, pid_u, s_f)
        winners, seg_carries, tm = primal_winners(key, s_f)

        if phase == "prepass":
            # Profiling mode (tools/profile_grad.py): pre-pass only —
            # keep its outputs observable so nothing is DCE'd.
            for i in range(min(N_CAMV_DIFF, 3)):
                d_camv[i] = d_camv[i] + jnp.sum(winners[-1][i])
            return 0

        if n_seg == 1:
            _, vjp_fn = jax.vjp(
                lambda d: replay_whole(d, key, s_f, winners), diff0)
            (d_acc,) = vjp_fn((gr, gg, gb))
            dcamv, dbg = d_acc[0], d_acc[1]
            for i in range(N_CAMV_DIFF):
                d_camv[i] = d_camv[i] + dcamv[i]
            for i in range(3):
                d_bg[i] = d_bg[i] + dbg[i]
            for ref, dval in zip(d_dv, d_acc[2:]):
                ref[...] = ref[...] + dval
            return 0

        # Backward, one remat segment at a time (reverse order): residuals
        # for only seg_len bounces are live at once. cot_carry starts as
        # the radiance cotangent and chains backward through each segment;
        # d(diff0) accumulates across segments.
        zero = jnp.zeros(shape)
        cot_carry = tuple(
            [zero] * 11 + [gr, gg, gb]
        )
        d_acc = None
        for seg in reversed(range(n_seg)):
            ws = winners[seg * seg_len:(seg + 1) * seg_len]

            def seg_fn(diff, c_in, ws=ws):
                camvv, bgv = diff[0], diff[1]
                dvv = diff[2:]
                cc = c_in
                for w in ws:
                    cc = bounce(key, tm, cc, w, dvv, bgv)
                return cc

            _, vjp_fn = jax.vjp(seg_fn, diff0, seg_carries[seg])
            d_diff, cot_carry = vjp_fn(cot_carry)
            if d_acc is None:
                d_acc = d_diff
            else:
                d_acc = jax.tree_util.tree_map(
                    lambda a, b: a + b, d_acc, d_diff)

        # Chain the remaining carry cotangent through the camera rays
        # back to the camv entries (o/d live in carry slots 2..7; the
        # other slots' cotangents die at constants).
        _, cam_vjp = jax.vjp(
            lambda cd: camera_rays(cd, key, s_f)[0], camv_d)
        (d_camv_cam,) = cam_vjp(cot_carry)

        dcamv, dbg = d_acc[0], d_acc[1]
        for i in range(N_CAMV_DIFF):
            d_camv[i] = d_camv[i] + dcamv[i] + d_camv_cam[i]
        for i in range(3):
            d_bg[i] = d_bg[i] + dbg[i]
        for ref, dval in zip(d_dv, d_acc[2:]):
            ref[...] = ref[...] + dval
        return 0

    jax.lax.fori_loop(0, n_samples, sample_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("n_rays", "max_depth", "has_checker", "has_noise",
                     "sizes", "interpret", "fwd_sublanes", "linear_slots",
                     "n_samples", "phase", "sublanes"),
)
def _grad_call(camv, seedi, tables, background, g, *, n_rays, max_depth,
               has_checker, has_noise, sizes, interpret, fwd_sublanes,
               linear_slots, n_samples, ntab=None, phase="full",
               sublanes=None):
    """Launch the backward kernel; returns cotangent arrays for
    (camv[:19], background, packed diff tables). ``phase``/``sublanes``
    are profiling knobs (tools/profile_grad.py); production uses the
    defaults."""
    sph, qd, boxes, med, mats, texs = tables
    n_sph, n_quad, n_mat, n_tex, n_med, n_box = sizes
    sublanes = GRAD_SUBLANES if sublanes is None else sublanes
    tile_r = sublanes * mk.LANES
    assert n_rays % tile_r == 0, (n_rays, tile_r)
    rows = n_rays // mk.LANES
    fwd_tile_r, fwd_block = mk.tile_block(fwd_sublanes, linear_slots)
    grid = n_rays // tile_r
    ray_spec = pl.BlockSpec((sublanes, mk.LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)

    dv = pack_diff_tables(tables)

    kw = dict(
        max_depth=max_depth, n_sph=n_sph, n_quad=n_quad, n_med=n_med,
        n_mat=n_mat, n_tex=n_tex, n_box=n_box, has_checker=has_checker,
        has_noise=has_noise, sublanes=sublanes, fwd_tile_r=fwd_tile_r,
        fwd_block=fwd_block, linear_slots=linear_slots, n_samples=n_samples,
        phase=phase,
    )

    def kern(*refs):
        camv_r, seedi_r, bg_r = refs[0], refs[1], refs[2]
        pos = 3
        tdicts = []
        for keys in (mk._SPH_KEYS, mk._QUAD_KEYS, mk._BOX_KEYS,
                     mk._MED_KEYS, mk._MAT_KEYS, mk._TEX_KEYS):
            tdicts.append(dict(zip(keys, refs[pos:pos + len(keys)])))
            pos += len(keys)
        dv_refs = refs[pos:pos + 6]
        pos += 6
        g_refs = refs[pos:pos + 3]
        pos += 3
        extra = ()
        if ntab is not None:
            extra = (refs[pos],)
            pos += 1
        outs = refs[pos:-2]
        scratch = refs[-2:]
        _grad_kernel(
            (camv_r, seedi_r, bg_r, *tdicts, dv_refs, *g_refs, *extra),
            outs, scratch, **kw,
        )

    n_tables = (len(mk._SPH_KEYS) + len(mk._QUAD_KEYS) + len(mk._BOX_KEYS)
                + len(mk._MED_KEYS) + len(mk._MAT_KEYS) + len(mk._TEX_KEYS))
    out_shapes = (
        jax.ShapeDtypeStruct((N_CAMV_DIFF,), jnp.float32),
        jax.ShapeDtypeStruct((3,), jnp.float32),
    ) + tuple(jax.ShapeDtypeStruct(x.shape, jnp.float32) for x in dv)
    out_specs = (smem_spec, smem_spec) + tuple(vmem_full for _ in dv)
    # Pre-pass scratch (see _grad_kernel.primal_winners): stacked winners
    # [3, depth, s, 128] + segment input carries [n_seg, 14, s, 128].
    small_scene = (n_sph + n_quad + n_med + n_box) <= 256
    seg_len = max_depth if small_scene else 8
    n_seg = -(-max_depth // seg_len)
    if small_scene:
        # Unrolled pre-pass (values, no scratch) — minimal allocations.
        scratch_shapes = [
            pltpu.VMEM((1, 1, 8, mk.LANES), jnp.float32),
            pltpu.VMEM((1, 1, 8, mk.LANES), jnp.float32),
        ]
    else:
        scratch_shapes = [
            pltpu.VMEM((3, max_depth, sublanes, mk.LANES), jnp.float32),
            pltpu.VMEM((n_seg, 14, sublanes, mk.LANES), jnp.float32),
        ]
    ntab_ops = () if ntab is None else (jnp.asarray(ntab, jnp.float32),)
    outs = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=([smem_spec] * (3 + n_tables) + [vmem_full] * 6
                  + [ray_spec] * 3 + [vmem_full] * len(ntab_ops)),
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # Nearly the full 128 MB physical VMEM: the segmented replay's
            # peak (one segment's residuals + pre-pass state) measured
            # 125.3 MB on book2 600^2 at depth 24.
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(
        jnp.asarray(camv, jnp.float32),
        jnp.asarray(seedi, jnp.int32).reshape(1),
        jnp.asarray(background, jnp.float32),
        *(sph[k] for k in mk._SPH_KEYS),
        *(qd[k] for k in mk._QUAD_KEYS),
        *(boxes[k] for k in mk._BOX_KEYS),
        *(med[k] for k in mk._MED_KEYS),
        *(mats[k] for k in mk._MAT_KEYS),
        *(texs[k] for k in mk._TEX_KEYS),
        *dv,
        g[:, 0].reshape(rows, mk.LANES),
        g[:, 1].reshape(rows, mk.LANES),
        g[:, 2].reshape(rows, mk.LANES),
        *ntab_ops,
    )
    return outs


@functools.lru_cache(maxsize=32)
def _make_diff_render(n_rays, max_depth, has_checker, has_noise, sizes,
                      interpret, fwd_sublanes, wave_frac, linear_slots,
                      n_samples, wavefront_kw=None, use_mtab=False):
    """custom_vjp-wrapped megakernel render for one static config.

    ``wavefront_kw`` (hashable dict items): route the FORWARD through the
    sorted-wavefront kernel instead of v4 — big scenes' fast primal. The
    two kernels render bitwise-identical images (tests/test_wavefront.py),
    so the backward's replay stays consistent with either forward; the
    wavefront requires (and implies) the linear slot layout."""
    n_mat_, n_tex_ = sizes[2], sizes[3]

    def fwd_mtab(tables):
        if not use_mtab:
            return None
        return mk.pack_resolve_tables(tables[4], tables[5], n_mat_, n_tex_)

    if wavefront_kw is not None:
        from raytrace2_tpu.ops.pallas import wavefront_sorted as wf

        assert linear_slots
        fwd_kw = dict(
            n_rays=n_rays, max_depth=max_depth, has_checker=has_checker,
            has_noise=has_noise, sizes=sizes, interpret=interpret,
            sublanes=fwd_sublanes, **dict(wavefront_kw),
        )

        def fwd_render(camv, seedi, tables, background, ntab):
            return wf.trace_wavefront_batch(
                camv, seedi, tables, background, ntab=ntab,
                mtab=fwd_mtab(tables), **fwd_kw)
    else:
        fwd_kw = dict(
            n_rays=n_rays, max_depth=max_depth, has_checker=has_checker,
            has_noise=has_noise, sizes=sizes, interpret=interpret,
            sublanes=fwd_sublanes, wave_frac=wave_frac,
            linear_slots=linear_slots,
        )

        def fwd_render(camv, seedi, tables, background, ntab):
            return mk.trace_megakernel_batch(
                camv, seedi, tables, background, ntab=ntab,
                mtab=fwd_mtab(tables), **fwd_kw)
    # The bwd kernel re-blocks the cotangent with its own (smaller) tiles;
    # n_rays must divide both.
    grad_pad = -n_rays % (GRAD_SUBLANES * mk.LANES)

    @jax.custom_vjp
    def diff_render(camv, seedi, tables, background, ntab):
        return fwd_render(camv, seedi, tables, background, ntab)

    def fwd(camv, seedi, tables, background, ntab):
        out = fwd_render(camv, seedi, tables, background, ntab)
        return out, (camv, seedi, tables, background, ntab)

    def bwd(res, g):
        camv, seedi, tables, background, ntab = res
        if grad_pad:
            g = jnp.concatenate(
                [g, jnp.zeros((grad_pad, 3), jnp.float32)], axis=0)
        outs = _grad_call(
            camv, seedi, tables, background, g,
            n_rays=n_rays + grad_pad, max_depth=max_depth,
            has_checker=has_checker, has_noise=has_noise, sizes=sizes,
            interpret=interpret, fwd_sublanes=fwd_sublanes,
            linear_slots=linear_slots, n_samples=n_samples, ntab=ntab,
        )
        dcamv, dbg = outs[0], outs[1]
        d_tables = _unpack_diff_cotangent(outs[2:], tables)
        d_camv = jnp.zeros((mk._CAMV_LEN,), jnp.float32).at[:N_CAMV_DIFF].set(dcamv)
        d_seedi = np.zeros((1,), dtype=jax.dtypes.float0)
        d_ntab = None if ntab is None else jnp.zeros_like(ntab)
        return d_camv, d_seedi, d_tables, dbg, d_ntab

    diff_render.defvjp(fwd, bwd)
    return diff_render


def trace_megakernel_batch_diff(camv, seedi, tables, background, *, n_rays,
                                max_depth, has_checker, has_noise=False,
                                sizes=None, interpret=False,
                                sublanes=mk.SUBLANES, wave_frac=1.0,
                                linear_slots=False, n_samples=1,
                                wavefront_kw=None, use_mtab=False,
                                ntab=None):
    """Differentiable drop-in for megakernel.trace_megakernel_batch.

    Forward: the fast v4 kernel (or the sorted-wavefront kernel when
    ``wavefront_kw`` is given — big scenes), untouched. Backward: the
    indexed-replay kernel (see module docstring). ``n_samples`` must be
    the STATIC sample count the camv batch encodes (the backward loops
    over it in-kernel). ``ntab`` (the packed exact Perlin perm/grad
    operand, noise_impl="table") routes BOTH directions through the
    reference's own 256-entry table noise (PerlinNoiseGen.cpp:66-103) —
    table values carry no cotangent; p/scale gradients are exact."""
    fn = _make_diff_render(
        n_rays, max_depth, has_checker, has_noise, tuple(sizes),
        interpret, sublanes, wave_frac, linear_slots, n_samples,
        None if wavefront_kw is None else tuple(sorted(wavefront_kw.items())),
        use_mtab,
    )
    return fn(camv, seedi, tables, background, ntab)
