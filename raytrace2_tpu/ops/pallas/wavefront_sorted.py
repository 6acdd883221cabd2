"""Sorted-wavefront renderer: bounce-synchronous megakernel for BIG scenes.

The v4 megakernel (megakernel.py) keeps a whole path's bounce loop inside
one kernel launch, which is optimal when the closest-hit sweep is cheap
(Cornell-class scenes: every record swept anyway). On cluster-heavy scenes
(book2: 1,405 sweep records) the sweep dominates and the only lever is the
per-tile cluster skip (_hier_sweep) — but a v4 tile mixes bounce depths and
isotropically-scattered directions, so almost no tile can prove a cluster
unreachable and nothing skips (measured: book2 2.7 Mpaths/s vs a
22 Mpaths/s everything-but-the-sweep ceiling).

This module decouples occupancy from coherence the TPU-shaped way:

* State lives in HBM between launches: one slot per (pixel) with its own
  progressive sample counter, exactly v4's regeneration semantics.
* Between launches, XLA sorts the slots by a coherence key — 7-bit-per-axis
  Morton code of the origin within the scene bounds (direction octant as
  tiebreak); dead slots awaiting regeneration group by pixel id (fresh
  camera waves), exhausted slots sort to the end where whole tiles
  early-exit. The permutation is applied as ONE row-gather of the packed
  [n, 17] state (a multi-array gather in a while_loop lowers to a slow
  serialized form).
* A Pallas K-BOUNCE kernel (regen + closest-hit + shade + scatter =
  megakernel._make_bounce, unchanged) then runs over the sorted tiles.
  Now each [8,128] tile holds rays that share an origin cell, so
  _hier_sweep's per-tile supercluster/cluster skips actually fire — the
  wavefront form of a BVH walk (BVH.cpp:50-55), with the sort playing the
  role of the per-ray traversal stack. K≈16 bounces per launch amortizes
  the launch + state round-trip + SMEM table copy against coherence decay
  (measured optimum on book2; see BASELINE.md).

Per-lane arithmetic (camera, RNG streams, bounce physics, radiance
accumulation) is IDENTICAL to v4 — each (pixel, sample) path computes the
same f32 sequence regardless of which tile the sort put it in, and each
pixel's slot accumulates its samples in the same order — so the rendered
image is bitwise equal to the v4 megakernel's (asserted in
tests/test_wavefront.py).

Reference: the scene/feature scope is megakernel.py's; routing between the
two kernels is integrator.mega_schedule's job (record-count threshold).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytrace2_tpu.ops.pallas import megakernel as mk

# State arrays, all [n_rays] f32 (pid stays < 2^24 so f32 is exact).
_STATE_KEYS = ("s_lane", "pid", "bn", "al", "ox", "oy", "oz",
               "dx", "dy", "dz", "tm", "tpr", "tpg", "tpb",
               "rr", "rg", "rb")
# [24,128] tiles (3,072 rays): the sort provides coherence, not pixel
# blocks. Taller tiles amortize the hierarchy sweep's per-tile scalar walk
# (L2/L1 loop + cond branches) over more lanes; measured on book2 @ 32 spp:
# 8→4.2-4.6, 16→5.6, 24→5.6-5.7, 32→5.0, 48→5.5 Mpaths/s. Override with
# features mega_sublanes (any multiple of 8; images are bitwise invariant).
SORT_SUBLANES = 24
# Two-phase schedule defaults (overridable via features mega_k_bounces /
# mega_tail_k / mega_tail_frac; see trace_wavefront_batch docstring).
# Swept on-chip (book2 600^2; r4 @32 spp, r5 @64 spp, docs/STATUS_R5.md):
# single-phase K=16 4.49 Mpaths/s; K=1 waves + K=16 tail 6.43/6.46;
# K=2 waves (sort per launch — sort+fixed cost amortized over two
# bounces while regeneration keeps waves camera-coherent) 6.54/6.62 —
# reproducibly best across reps. The straggler tail needs big launches.
K_BOUNCES = 2
TAIL_K = 16
TAIL_FRAC = 0.65
SORT_EVERY = 1  # with K=2 waves each launch re-sorts (coherence decays
#                 inside the 2-bounce launch; a further cadence halving
#                 measured worse)
SORT_IMPL = "gather"  # "gather": argsort + packed row-gather;
#                       "multi": one 18-operand lax.sort (A/B knob —
#                       features mega_sort_impl; images bitwise-identical:
#                       jnp.argsort and lax.sort are both stable);
#                       "gather_unstable": argsort without the index
#                       tiebreak — also bitwise-identical (any permutation
#                       is; see do_sort) and measured NEUTRAL on book2
#                       (6.41-6.54 vs 6.14-6.34 stable, inside run spread:
#                       XLA argsort carries the iota operand either way)
STATE_PACKED = False  # ship the 17 state columns as ONE [17, rows, 128]
#                       operand pair instead of 17+17 separate blocks
#                       (A/B knob — features mega_state_packed; bitwise-
#                       identical images, see build_step docstring).
#                       Measured NEUTRAL on book2 600^2 spp64 (interleaved
#                       reps: split 6.01-6.39, packed 5.94-6.54 Mpaths/s —
#                       inside the ±0.5 tunnel spread): Mosaic already
#                       overlaps the 34 block-DMA streams with compute, so
#                       the ~5.5 ms/launch nosweep floor is NOT DMA-start
#                       bound. Kept off; the knob documents the experiment.


class _View:
    """Static-offset window into the packed SMEM table (scalar reads only).

    One pallas_call per bounce means every SMEM operand is re-copied
    HBM->SMEM on every loop iteration; with ~90 separate small field arrays
    those copies dominated the profile (330 ms of copy-start latency per
    8-spp render at 320x320). Packing every field into ONE f32 array makes
    it one copy per launch; fields become fixed offsets."""

    __slots__ = ("ref", "off")

    def __init__(self, ref, off):
        self.ref = ref
        self.off = off

    def __getitem__(self, i):
        return self.ref[self.off + i]


def _bounce_step_kernel(refs_in, refs_out, *, max_depth, n_sph, n_quad,
                        n_med, n_mat, n_tex, n_box, has_checker, has_noise,
                        sublanes, k_bounces=1, ntab_ref=None, mtab_ref=None):
    (camv, seedi, bg_r, sph, qd, boxes, med, mats, texs) = refs_in[:9]
    state_in = refs_in[9:]
    shape = (sublanes, mk.LANES)
    width = camv[19]
    s0 = camv[21]
    n_samples = camv[22]
    sqrt_spp = camv[23]
    seed_i = seedi[0]

    bounce = mk._make_bounce(
        sph, qd, boxes, med, mats, texs, bg_r,
        max_depth=max_depth, n_sph=n_sph, n_quad=n_quad, n_med=n_med,
        n_mat=n_mat, n_tex=n_tex, n_box=n_box, has_checker=has_checker,
        has_noise=has_noise, shape=shape,
        ntab=None if ntab_ref is None else ntab_ref[...],
        mtab=None if mtab_ref is None else mtab_ref[...],
    )

    def step(st):
        """regen + one bounce over the 17-tuple state (v4 semantics)."""
        (s_lane, pid, bn, al, ox, oy, oz, dx, dy, dz, tm,
         tpr, tpg, tpb, rr, rg, rb) = st
        in_grid = pid >= 0.0
        need = (al <= 0.0) & (s_lane < n_samples - 1.0) & in_grid
        s_new = s_lane + jnp.where(need, 1.0, 0.0)
        pid_u = pid.astype(jnp.int32).astype(jnp.uint32)
        key = mk.v4_sample_key(seed_i, pid_u, s0 + s_new)
        alive_next = jnp.where(need, 1.0, al)
        yy = jnp.floor(pid / width)
        xx = pid - yy * width
        cox, coy, coz, cdx, cdy, cdz, ctm = mk.camera_ray(
            camv, xx, yy, sqrt_spp, s0 + s_new, key)
        ox_ = jnp.where(need, cox, ox)
        oy_ = jnp.where(need, coy, oy)
        oz_ = jnp.where(need, coz, oz)
        dx_ = jnp.where(need, cdx, dx)
        dy_ = jnp.where(need, cdy, dy)
        dz_ = jnp.where(need, cdz, dz)
        tm_ = jnp.where(need, ctm, tm)
        bn_ = jnp.where(need, 0.0, bn)
        tpr_ = jnp.where(need, 1.0, tpr)
        tpg_ = jnp.where(need, 1.0, tpg)
        tpb_ = jnp.where(need, 1.0, tpb)
        (bn2, al2, ox2, oy2, oz2, dx2, dy2, dz2,
         tpr2, tpg2, tpb2, rr2, rg2, rb2) = bounce(
            key, tm_, (bn_, alive_next, ox_, oy_, oz_, dx_, dy_, dz_,
                       tpr_, tpg_, tpb_, rr, rg, rb))
        return (s_new, pid, bn2, al2, ox2, oy2, oz2, dx2, dy2, dz2, tm_,
                tpr2, tpg2, tpb2, rr2, rg2, rb2)

    state0 = tuple(r[...] for r in state_in)

    def runnable(st):
        # alive, or dead with samples left (regen next step)
        return jnp.any((st[3] > 0.0) | ((st[0] < n_samples - 1.0)
                                        & (st[1] >= 0.0)))

    if k_bounces == 1:
        # Exhausted tiles (sorted to the end) pass through untouched:
        # the whole bounce (sweeps included) is skipped.
        @pl.when(runnable(state0))
        def _():
            for ref, val in zip(refs_out, step(state0)):
                ref[...] = val

        @pl.when(jnp.logical_not(runnable(state0)))
        def _():
            for ref, val in zip(refs_out, state0):
                ref[...] = val
    else:
        # K bounces per launch: amortizes launch + state HBM round-trip
        # over K bounces; the tile early-exits once nothing is runnable.
        def body(carry):
            i, st = carry
            return i + 1, step(st)

        def cond(carry):
            i, st = carry
            return (i < k_bounces) & runnable(st)

        _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), state0))
        for ref, val in zip(refs_out, st):
            ref[...] = val


def _interleave3(x):
    """Spread the low 10 bits of a uint32 so consecutive bits land 3 apart
    (standard 3-D Morton part1by2)."""
    x = x & jnp.uint32(0x3FF)
    x = (x | (x << jnp.uint32(16))) & jnp.uint32(0x030000FF)
    x = (x | (x << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
    x = (x | (x << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
    x = (x | (x << jnp.uint32(2))) & jnp.uint32(0x09249249)
    return x


def sort_keys(state, n_samples, bb_lo, bb_hi, key_mode="pos"):
    """Coherence key per slot (small = do first, similar = same tile):

    * alive rays (``key_mode``):
      - "pos": morton7(origin in scene bbox) << 3 | octant(d) — tiles end
        up sharing origin cell (direction octant as tiebreak), which is
        what makes the kernel's per-tile cluster AABB skips effective.
        Measured best on book2 (4.71 Mpaths/s vs 4.48 octant-major,
        4.02 direction-major).
      - "pos8": morton8(origin), no octant — finer cells, for sweeping
        whether spatial resolution beats the direction tiebreak.
      - "depth": bounce index major, morton7 minor — groups same-depth
        rays so a tile's regen/depth mix narrows.
      Every mode renders the IDENTICAL image (the sort is a permutation;
      per-lane math is keyed by pixel id).
    * dead, samples remaining: 2^28 + pid — regeneration groups by pixel
      adjacency, so fresh camera waves are frustum-coherent.
    * exhausted/padding: 2^30 — tail tiles hit the kernel's all-dead early
      exit and cost only the state round-trip.
    """
    alive = state["al"] > 0.0
    can_regen = (state["s_lane"] < n_samples - 1.0) & (state["pid"] >= 0.0)
    bits = 8 if key_mode == "pos8" else 7
    top = float((1 << bits) - 1)
    inv = top / jnp.maximum(bb_hi - bb_lo, 1e-20)
    qs = []
    for axis, (o_key) in enumerate(("ox", "oy", "oz")):
        q = jnp.clip((state[o_key] - bb_lo[axis]) * inv[axis], 0.0, top)
        qs.append(_interleave3(q.astype(jnp.uint32)))
    morton = qs[0] | (qs[1] << jnp.uint32(1)) | (qs[2] << jnp.uint32(2))
    if key_mode == "pos8":
        akey = morton  # 24 bits
    elif key_mode == "depth":
        akey = (state["bn"].astype(jnp.int32).astype(jnp.uint32)
                << jnp.uint32(21)) | morton  # 6+21 bits
    else:
        octant = ((state["dx"] < 0).astype(jnp.uint32) * jnp.uint32(4)
                  | (state["dy"] < 0).astype(jnp.uint32) * jnp.uint32(2)
                  | (state["dz"] < 0).astype(jnp.uint32))
        akey = (morton << jnp.uint32(3)) | octant  # 24 bits
    rkey = jnp.uint32(1 << 28) + state["pid"].astype(jnp.int32).astype(jnp.uint32)
    key = jnp.where(alive, akey, jnp.where(can_regen, rkey, jnp.uint32(1 << 30)))
    return key.astype(jnp.int32)  # lax.sort of i32 is cheapest


def scene_bounds(tables, sizes):
    """(bb_lo, bb_hi) for the Morton cells, from the packed tables (active
    records only; padded rows carry +-BIG cluster bounds, so use the record
    arrays themselves)."""
    sph, qd, boxes, med, mats, texs = tables
    n_sph, n_quad, n_mat, n_tex, n_med, n_box = sizes
    los, his = [], []
    if n_sph:
        for ax in "xyz":
            c = sph["c0" + ax][:n_sph]
            cd = c + sph["dp" + ax][:n_sph]
            r = sph["rad"][:n_sph]
            los.append(jnp.min(jnp.minimum(c, cd) - r))
            his.append(jnp.max(jnp.maximum(c, cd) + r))
    if n_box:
        for i, ax in enumerate("xyz"):
            los.append(jnp.min(boxes[ax + "0"][:n_box]))
            his.append(jnp.max(boxes[ax + "1"][:n_box]))
    if not los:
        los = [jnp.float32(-1.0)] * 3
        his = [jnp.float32(1.0)] * 3
    k = len(los) // 3
    bb_lo = jnp.stack([jnp.min(jnp.stack(los[i::3])) for i in range(3)] if k > 1
                      else los)
    bb_hi = jnp.stack([jnp.max(jnp.stack(his[i::3])) for i in range(3)] if k > 1
                      else his)
    return bb_lo, bb_hi


def pack_smem_operand(camv, background, tables):
    """Pack camv + background + every table field into ONE f32 SMEM operand
    (see _View). Returns (packed, offsets-per-family, len(camv)); offsets
    are compile-time constants."""
    sph, qd, boxes, med, mats, texs = tables
    fams = ((sph, mk._SPH_KEYS), (qd, mk._QUAD_KEYS), (boxes, mk._BOX_KEYS),
            (med, mk._MED_KEYS), (mats, mk._MAT_KEYS), (texs, mk._TEX_KEYS))
    pieces = [jnp.asarray(camv, jnp.float32).reshape(-1),
              jnp.asarray(background, jnp.float32).reshape(-1)]
    offsets = []  # per family: {key: offset}
    off = pieces[0].shape[0] + pieces[1].shape[0]
    for tbl, keys in fams:
        fam_off = {}
        for k in keys:
            arr = jnp.asarray(tbl[k], jnp.float32).reshape(-1)
            fam_off[k] = off
            off += arr.shape[0]
            pieces.append(arr)
        offsets.append(fam_off)
    return jnp.concatenate(pieces), offsets, pieces[0].shape[0]


class _PackedStateRef:
    """Field-indexed view over the packed [17, sublanes, LANES] state block:
    ``view[...]`` reads field ``idx`` (so _bounce_step_kernel's per-field
    ``r[...]`` unpacking works unchanged on the packed operand)."""

    __slots__ = ("ref", "idx")

    def __init__(self, ref, idx):
        self.ref = ref
        self.idx = idx

    def __getitem__(self, _):
        return self.ref[self.idx]

    def __setitem__(self, _, val):
        self.ref[self.idx] = val


def build_step(offsets, n_camv, *, n_rays, sublanes, with_ntab, interpret,
               kern_kw, with_mtab=False, state_packed=False):
    """The K-bounce pallas_call over the sorted state tiles.

    Call as ``step(packed, seedi, [ntab,] *state_2d)`` with each state leaf
    reshaped [rows, LANES]; returns the advanced 17-tuple. With
    ``state_packed`` the state travels as ONE [17, rows, LANES] array in
    and one out (``step(packed, seedi, [ntab,] state_3d)``): 2 block-DMA
    streams per grid step instead of 34 — the per-grid-step DMA-start
    latency of 17 tiny separate in/out blocks is most of the wavefront's
    measured ~5.5 ms/launch "nosweep" floor (docs/profile_book2_r4_ladder).
    Pure layout: lane arithmetic and images are bitwise identical."""
    tile_r = sublanes * mk.LANES
    grid = n_rays // tile_r
    rows = n_rays // mk.LANES
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    n_state = len(_STATE_KEYS)
    if state_packed:
        state_in_specs = [pl.BlockSpec((n_state, sublanes, mk.LANES),
                                       lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM)]
        state_out_specs = state_in_specs[0]
        out_shape = jax.ShapeDtypeStruct((n_state, rows, mk.LANES),
                                         jnp.float32)
    else:
        ray_spec = pl.BlockSpec((sublanes, mk.LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        state_in_specs = [ray_spec] * n_state
        state_out_specs = tuple(ray_spec for _ in _STATE_KEYS)
        out_shape = tuple(
            jax.ShapeDtypeStruct((rows, mk.LANES), jnp.float32)
            for _ in _STATE_KEYS)

    def kern(packed_ref, seedi_ref, *rest):
        camv_v = _View(packed_ref, 0)
        bg_v = _View(packed_ref, n_camv)
        tdicts = [
            {k: _View(packed_ref, o) for k, o in fam_off.items()}
            for fam_off in offsets
        ]
        ntab_r = None
        if with_ntab:
            ntab_r, rest = rest[0], rest[1:]
        mtab_r = None
        if with_mtab:
            mtab_r, rest = rest[0], rest[1:]
        if state_packed:
            st_in, st_out = rest
            refs_in = tuple(_PackedStateRef(st_in, k) for k in range(n_state))
            refs_out = tuple(_PackedStateRef(st_out, k) for k in range(n_state))
        else:
            refs_in = rest[:n_state]
            refs_out = rest[n_state:]
        _bounce_step_kernel(
            (camv_v, seedi_ref, bg_v, *tdicts, *refs_in),
            refs_out, ntab_ref=ntab_r, mtab_ref=mtab_r, **kern_kw)

    ntab_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] if with_ntab else [])
    if with_mtab:
        ntab_specs = ntab_specs + [pl.BlockSpec(memory_space=pltpu.VMEM)]
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[smem_spec] * 2 + ntab_specs + state_in_specs,
        out_specs=state_out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def init_wavefront_state(n_rays, camv):
    """Fresh slot state: slot i == pixel camv[25]+i, all lanes dead with
    s_lane=-1 so the first kernel step regenerates sample 0."""
    slot = jnp.arange(n_rays, dtype=jnp.float32) + camv[25]
    pid0 = jnp.where(slot < camv[20], slot, -1.0)
    zeros = jnp.zeros(n_rays, jnp.float32)
    return dict(
        s_lane=jnp.full(n_rays, -1.0, jnp.float32), pid=pid0,
        bn=zeros, al=zeros, ox=zeros, oy=zeros, oz=zeros,
        dx=zeros, dy=zeros, dz=zeros, tm=zeros,
        tpr=zeros, tpg=zeros, tpb=zeros, rr=zeros, rg=zeros, rb=zeros,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_rays", "max_depth", "has_checker", "has_noise",
                     "sizes", "interpret", "sublanes", "sort_every",
                     "k_bounces", "key_mode", "tail_k", "tail_frac",
                     "tail_compact", "sort_impl", "state_packed"),
)
def trace_wavefront_batch(camv, seedi, tables, background, *, n_rays,
                          max_depth, has_checker, has_noise=False,
                          sizes=None, interpret=False,
                          sublanes=SORT_SUBLANES, sort_every=1,
                          k_bounces=1, ntab=None, key_mode="pos",
                          tail_k=None, tail_frac=0.0,
                          tail_compact=False, mtab=None,
                          sort_impl="gather", state_packed=STATE_PACKED):
    """Drop-in for megakernel.trace_megakernel_batch (linear slot layout
    ONLY: slot i == pixel camv[25]+i). Returns radiance-sum [n_rays, 3].

    Two-phase schedule (``tail_k``/``tail_frac``): lanes process their
    progressive samples sequentially, so the wave population stays near
    n_rays for ~(n_samples x mean_path) waves and then collapses into a
    long straggler tail (lanes whose samples drew deep paths). Phase 1
    runs ``k_bounces`` per launch with a sort per launch — small K keeps
    every wave position-sorted AND regeneration bounce-aligned, which is
    when the per-tile cluster skips actually fire (measured on book2
    600^2: sweeps cost 4.4 ms/bounce sorted-every-bounce vs 8.1 ms/bounce
    buried inside K=16 launches). Once the runnable population drops below
    ``tail_frac * n_rays``, phase 2 switches to ``tail_k`` bounces per
    launch so stragglers stop paying sort + launch per bounce. Pure
    scheduling — the image is bitwise identical for any config."""
    tile_r = sublanes * mk.LANES
    assert n_rays % tile_r == 0, (n_rays, tile_r)
    sph, qd, boxes, med, mats, texs = tables
    n_sph, n_quad, n_mat, n_tex, n_med, n_box = sizes
    rows = n_rays // mk.LANES
    n_samples = camv[22]

    bb_lo, bb_hi = scene_bounds(tables, sizes)

    def make_kern_kw(k):
        return dict(
            max_depth=max_depth, n_sph=n_sph, n_quad=n_quad, n_med=n_med,
            n_mat=n_mat, n_tex=n_tex, n_box=n_box, has_checker=has_checker,
            has_noise=has_noise, sublanes=sublanes, k_bounces=k,
        )

    packed, offsets, n_camv = pack_smem_operand(camv, background, tables)
    with_ntab = ntab is not None
    with_mtab = mtab is not None

    def make_step(k):
        return build_step(offsets, n_camv, n_rays=n_rays, sublanes=sublanes,
                          with_ntab=with_ntab, interpret=interpret,
                          kern_kw=make_kern_kw(k), with_mtab=with_mtab,
                          state_packed=state_packed)

    camv = jnp.asarray(camv, jnp.float32)
    seedi = jnp.asarray(seedi, jnp.int32).reshape(1)
    state = init_wavefront_state(n_rays, camv)

    def runnable_count(state):
        runnable = (state["al"] > 0.0) | (
            (state["s_lane"] < n_samples - 1.0) & (state["pid"] >= 0.0))
        return jnp.sum(runnable.astype(jnp.int32))

    def do_sort(state):
        keys = sort_keys(state, n_samples, bb_lo, bb_hi, key_mode)
        if sort_impl == "multi":
            # One multi-operand lax.sort: key + all 17 state columns in a
            # single sort op, no materialized permutation.
            outs = jax.lax.sort(
                (keys,) + tuple(state[k] for k in _STATE_KEYS), num_keys=1)
            return dict(zip(_STATE_KEYS, outs[1:]))
        # Default: argsort + row-gather of ONE packed [n, 17] array (a
        # multi-array gather inside while_loop lowers to a slow serialized
        # form, ~60 ms/step measured; the packed row gather runs at HBM
        # bandwidth). Unstable sort ("gather_unstable"): any permutation
        # with equal keys grouped yields the bitwise-identical image
        # (per-lane math is keyed by pixel id, and each pixel owns exactly
        # one slot), so the comparator can drop the index tiebreak.
        perm = jnp.argsort(keys, stable=(sort_impl != "gather_unstable"))
        pk = jnp.stack([state[k] for k in _STATE_KEYS], axis=1)
        pk = pk[perm]
        return {k: pk[:, i] for i, k in enumerate(_STATE_KEYS)}

    def make_body(step, n=None):
        n = n_rays if n is None else n
        rows_n = n // mk.LANES

        def body(carry):
            state, i = carry
            if sort_every == 1:
                state = do_sort(state)
            else:
                state = jax.lax.cond(
                    i % sort_every == 0, do_sort, lambda s: s, state)
            ops = (jnp.asarray(ntab, jnp.float32),) if with_ntab else ()
            if with_mtab:
                ops = ops + (jnp.asarray(mtab, jnp.float32),)
            if state_packed:
                st3 = jnp.stack([state[k].reshape(rows_n, mk.LANES)
                                 for k in _STATE_KEYS])
                outs = step(packed, seedi, *ops, st3)
                state = {k: outs[i_].reshape(n)
                         for i_, k in enumerate(_STATE_KEYS)}
            else:
                outs = step(packed, seedi, *ops,
                            *(state[k].reshape(rows_n, mk.LANES)
                              for k in _STATE_KEYS))
                state = {k: v.reshape(n)
                         for k, v in zip(_STATE_KEYS, outs)}
            return state, i + 1
        return body

    two_phase = bool(tail_k) and tail_frac > 0.0
    if two_phase:
        pop_switch = int(tail_frac * n_rays)
        state, _ = jax.lax.while_loop(
            lambda c: runnable_count(c[0]) > jnp.int32(pop_switch),
            make_body(make_step(k_bounces)), (state, jnp.int32(0)))
        # Optional tail compaction: after a sort the runnable slots are a
        # strict prefix (exhausted/padding keys sort to 2^30), and the
        # phase-1 exit guarantees runnable <= pop_switch — so the tail
        # can run on a tail_frac-sized buffer (fewer tiles per launch; the
        # parked suffix holds only finished slots whose radiance rides
        # along untouched). Pure scheduling: bitwise-identical images
        # (tested). Measured neutral-to-slightly-negative on book2 (the
        # K=16 tail's all-dead tiles already early-exit for just the
        # state round-trip), so OFF by default; kept gated behind
        # features mega_tail_compact for bigger-buffer scenes.
        n_tail = -(-max(pop_switch, 1) // tile_r) * tile_r
        if tail_compact and n_tail < n_rays:
            state = do_sort(state)
            head = {k: v[:n_tail] for k, v in state.items()}
            rest = {k: v[n_tail:] for k, v in state.items()}
            step_t = build_step(
                offsets, n_camv, n_rays=n_tail, sublanes=sublanes,
                with_ntab=with_ntab, interpret=interpret,
                kern_kw=make_kern_kw(tail_k), with_mtab=with_mtab,
                state_packed=state_packed)

            head, _ = jax.lax.while_loop(
                lambda c: runnable_count(c[0]) > 0,
                make_body(step_t, n_tail), (head, jnp.int32(0)))
            state = {k: jnp.concatenate([head[k], rest[k]])
                     for k in _STATE_KEYS}
        else:
            state, _ = jax.lax.while_loop(
                lambda c: runnable_count(c[0]) > 0,
                make_body(make_step(tail_k)), (state, jnp.int32(0)))
    else:
        state, _ = jax.lax.while_loop(
            lambda c: runnable_count(c[0]) > 0,
            make_body(make_step(k_bounces)), (state, jnp.int32(0)))

    # Un-permute by pixel id: each pixel has exactly ONE slot, so a scatter
    # by pid is a bijection onto the image (padding slots pid<0 drop).
    tgt = jnp.where(state["pid"] >= 0.0,
                    state["pid"] - camv[25], jnp.float32(n_rays)
                    ).astype(jnp.int32)
    out = jnp.zeros((n_rays + 1, 3), jnp.float32)
    rad = jnp.stack([state["rr"], state["rg"], state["rb"]], axis=-1)
    out = out.at[tgt].add(rad, mode="drop")
    return out[:n_rays]
