"""Custom VJP for the Pallas megakernel: forward AND backward at kernel speed.

The fast v4 forward (megakernel.trace_megakernel_batch) is wrapped in
``jax.custom_vjp``; the backward is a SECOND Pallas kernel that re-traces
every (pixel, sample) path — the counter-hash RNG makes the whole path a
pure function of (seed, pixel, sample), so NO residuals need to be stored —
and runs ``jax.vjp`` over a Python-unrolled replay of the same bounce
physics (megakernel._make_bounce with ``unroll_py=True``).

Estimator semantics match the XLA grad path (grad.py): discrete events
(which primitive wins, reflect/refract branch, checker cell, medium
scatter) carry no gradient — they're boolean ``jnp.where`` conditions,
which JAX's AD detaches automatically — while the continuous chain
(camera ray → hit t → point → normal → scatter direction → next t → ...)
differentiates end to end, including THROUGH the intersection solves
(t of the selected primitive), at fixed random primal.

Differentiable leaves and how they chain:
* packed geometry/material/texture tables (megakernel.pack_tables output):
  the kernel emits per-record cotangents; jax AD chains them through
  ``pack_tables`` back to the FlatScene leaves (sphere center/displacement/
  radius, quad q/u/v via the derived normal/d/alpha/beta rows, box bounds,
  medium density, material albedo/fuzz/ior, texture albedos).
* the camera control vector ``camv`` entries 0..18: chained through
  ``camera_ops.camera_frame`` back to CameraParams (center, look_at, vup,
  vfov, defocus_angle, focus_dist) by jax AD outside the kernel.
* background color.

Adjoint accumulation: per-record/scalar cotangents are cross-lane
reductions (jnp.sum over the tile); they accumulate into SMEM outputs
revisited across grid steps (TPU grids are sequential on a core) and over
an in-kernel ``fori_loop`` across samples, so one kernel launch produces
the complete gradient.

Scope gate (fall back to the XLA scan path otherwise — grad.py handles
this): record counts small enough to Python-unroll (GRAD_MAX_RECORDS),
depth ≤ GRAD_MAX_DEPTH, no noise textures (the 7-octave turbulence unroll
would dominate compile time for zero test coverage). Reference parity:
the reference has no gradients at all — this is north-star surface
(BASELINE.json "fwd and fwd+bwd at speed-of-light").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytrace2_tpu.ops.pallas import megakernel as mk

# Differentiable keys per packed table (order = row index in the kernel's
# 2-D cotangent outputs).
GRAD_SPH_KEYS = ("c0x", "c0y", "c0z", "dpx", "dpy", "dpz", "rad")
GRAD_QUAD_KEYS = ("nx", "ny", "nz", "d", "aax", "aay", "aaz",
                  "abx", "aby", "abz", "qaa", "qab")
GRAD_BOX_KEYS = ("x0", "y0", "z0", "x1", "y1", "z1")
GRAD_MED_KEYS = ("nid",)
GRAD_MAT_KEYS = ("alr", "alg", "alb", "param")
GRAD_TEX_KEYS = ("alr", "alg", "alb", "scale")
N_CAMV_DIFF = 19  # camv entries 0..18 are camera geometry; the rest batch params

GRAD_MAX_RECORDS = 64   # python-unrolled sweeps: records bound
GRAD_MAX_DEPTH = 16     # unrolled bounce chain bound
GRAD_SUBLANES = 8       # smaller tiles bound the vjp residual VMEM footprint


def grad_supported(sizes, max_depth, has_noise) -> bool:
    """has_noise is allowed (noise textures are exactly what makes geometry
    and camera gradients continuous under the detached estimator) — it just
    costs compile time: the 7-octave turbulence unrolls per bounce."""
    del has_noise
    n_sph, n_quad, n_mat, n_tex, n_med, n_box = sizes
    return (
        n_sph + n_quad + n_box + n_med <= GRAD_MAX_RECORDS
        and n_mat <= GRAD_MAX_RECORDS
        and n_tex <= GRAD_MAX_RECORDS
        and max_depth <= GRAD_MAX_DEPTH
    )


def _read_scalars(ref, n):
    """Table column (SMEM ref or array) → list of n traced scalars."""
    return [ref[i] for i in range(n)]


def _grad_kernel(refs_in, refs_out, *, max_depth, n_sph, n_quad, n_med,
                 n_mat, n_tex, n_box, has_checker, has_noise, sublanes,
                 fwd_tile_r, fwd_block, linear_slots, n_samples):
    (camv, seedi, bg_r, sph, qd, boxes, med, mats, texs,
     g_r, g_g, g_b) = refs_in
    (d_camv, d_bg, d_sph, d_quad, d_box, d_med, d_mat, d_tex) = refs_out
    shape = (sublanes, mk.LANES)
    tile_r = sublanes * mk.LANES

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for ref in refs_out:
            if len(ref.shape) == 1:
                for i in range(ref.shape[0]):
                    ref[i] = 0.0
            else:
                for i in range(ref.shape[0]):
                    for j in range(ref.shape[1]):
                        ref[i, j] = 0.0

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

    # ---- vjp inputs: diff table columns as lists of traced scalars -------
    def cols(ref_dict, keys, n):
        return {k: _read_scalars(ref_dict[k], n) for k in keys}

    def nondiff_cols(ref_dict, all_keys, diff_keys, n):
        return {k: _read_scalars(ref_dict[k], n)
                for k in all_keys if k not in diff_keys}

    # Families with zero active records are never swept by _make_bounce, but
    # keep 1-entry lists so dict construction stays uniform.
    ns, nq, nb, nm = max(n_sph, 1), max(n_quad, 1), max(n_box, 1), max(n_med, 1)
    sph_d = cols(sph, GRAD_SPH_KEYS, ns) if n_sph else {}
    qd_d = cols(qd, GRAD_QUAD_KEYS, nq) if n_quad else {}
    box_d = cols(boxes, GRAD_BOX_KEYS, nb) if n_box else {}
    med_d = cols(med, GRAD_MED_KEYS, nm) if n_med else {}
    mat_d = cols(mats, GRAD_MAT_KEYS, n_mat)
    tex_d = cols(texs, GRAD_TEX_KEYS, n_tex)
    camv_d = [camv[i] for i in range(N_CAMV_DIFF)]
    bg_d = [bg_r[0], bg_r[1], bg_r[2]]

    sph_nd = nondiff_cols(sph, ("mat", "act"), (), ns)
    qd_nd = nondiff_cols(qd, ("mat",), (), nq)
    box_nd = nondiff_cols(boxes, ("mat", "act"), (), nb)
    med_nd = nondiff_cols(
        med, tuple(k for k in mk._MED_KEYS if k not in GRAD_MED_KEYS), (), nm)
    mat_nd = nondiff_cols(mats, ("mtype", "tex"), (), n_mat)
    tex_nd = nondiff_cols(
        texs, tuple(k for k in mk._TEX_KEYS if k not in GRAD_TEX_KEYS), (),
        n_tex)

    diff0 = (camv_d, bg_d, sph_d, qd_d, box_d, med_d, mat_d, tex_d)

    def replay(diff, key, s_f):
        """One sample's full path for every lane — the differentiable
        function. Identical math to the v4 kernel's trace (shared bodies,
        Python-unrolled)."""
        camvv, bgv, sphd, qdd, boxd, medd, matd, texd = diff
        sph_t = {**sph_nd, **sphd}
        qd_t = {**qd_nd, **qdd}
        box_t = {**box_nd, **boxd}
        med_t = {**med_nd, **medd}
        mat_t = {**mat_nd, **matd}
        tex_t = {**tex_nd, **texd}
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
        bounce = mk._make_bounce(
            sph_t, qd_t, box_t, med_t, mat_t, tex_t, bgv,
            max_depth=max_depth, n_sph=n_sph, n_quad=n_quad, n_med=n_med,
            n_mat=n_mat, n_tex=n_tex, n_box=n_box, has_checker=has_checker,
            has_noise=has_noise, shape=shape, unroll_py=True,
        )
        zero = jnp.zeros(shape)
        one = jnp.ones(shape)
        carry = (zero, alive0, ox, oy, oz, dx, dy, dz,
                 one, one, one, zero, zero, zero)
        for _ in range(max_depth):
            carry = bounce(key, tm, carry)
        return carry[11], carry[12], carry[13]

    def sample_body(si, _):
        s_f = s0 + si.astype(jnp.float32)
        key = mk.v4_sample_key(seed_i, pid_u, s_f)
        _, vjp_fn = jax.vjp(lambda d: replay(d, key, s_f), diff0)
        (d,) = vjp_fn((gr, gg, gb))
        dcamv, dbg, dsph, dqd, dbox, dmed, dmat, dtex = d
        for i in range(N_CAMV_DIFF):
            d_camv[i] = d_camv[i] + dcamv[i]
        for i in range(3):
            d_bg[i] = d_bg[i] + dbg[i]

        def acc(ref, dvals, keys, n):
            for r, k in enumerate(keys):
                for p in range(n):
                    ref[r, p] = ref[r, p] + dvals[k][p]

        if n_sph:
            acc(d_sph, dsph, GRAD_SPH_KEYS, n_sph)
        if n_quad:
            acc(d_quad, dqd, GRAD_QUAD_KEYS, n_quad)
        if n_box:
            acc(d_box, dbox, GRAD_BOX_KEYS, n_box)
        if n_med:
            acc(d_med, dmed, GRAD_MED_KEYS, n_med)
        acc(d_mat, dmat, GRAD_MAT_KEYS, n_mat)
        acc(d_tex, dtex, GRAD_TEX_KEYS, n_tex)
        return 0

    jax.lax.fori_loop(0, n_samples, sample_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("n_rays", "max_depth", "has_checker", "has_noise",
                     "sizes", "interpret", "fwd_sublanes", "linear_slots",
                     "n_samples"),
)
def _grad_call(camv, seedi, tables, background, g, *, n_rays, max_depth,
               has_checker, has_noise, sizes, interpret, fwd_sublanes,
               linear_slots, n_samples):
    """Launch the backward kernel; returns cotangent arrays keyed like the
    forward inputs (active-record prefix only — caller pads)."""
    sph, qd, boxes, med, mats, texs = tables
    n_sph, n_quad, n_mat, n_tex, n_med, n_box = sizes
    sublanes = GRAD_SUBLANES
    tile_r = sublanes * mk.LANES
    assert n_rays % tile_r == 0, (n_rays, tile_r)
    rows = n_rays // mk.LANES
    fwd_tile_r, fwd_block = mk.tile_block(fwd_sublanes)
    grid = n_rays // tile_r
    ray_spec = pl.BlockSpec((sublanes, mk.LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    kw = dict(
        max_depth=max_depth, n_sph=n_sph, n_quad=n_quad, n_med=n_med,
        n_mat=n_mat, n_tex=n_tex, n_box=n_box, has_checker=has_checker,
        has_noise=has_noise, sublanes=sublanes, fwd_tile_r=fwd_tile_r,
        fwd_block=fwd_block, linear_slots=linear_slots, n_samples=n_samples,
    )

    def kern(*refs):
        camv_r, seedi_r, bg_r = refs[0], refs[1], refs[2]
        pos = 3
        sph_r = dict(zip(mk._SPH_KEYS, refs[pos:pos + len(mk._SPH_KEYS)]))
        pos += len(mk._SPH_KEYS)
        qd_r = dict(zip(mk._QUAD_KEYS, refs[pos:pos + len(mk._QUAD_KEYS)]))
        pos += len(mk._QUAD_KEYS)
        box_r = dict(zip(mk._BOX_KEYS, refs[pos:pos + len(mk._BOX_KEYS)]))
        pos += len(mk._BOX_KEYS)
        med_r = dict(zip(mk._MED_KEYS, refs[pos:pos + len(mk._MED_KEYS)]))
        pos += len(mk._MED_KEYS)
        mat_r = dict(zip(mk._MAT_KEYS, refs[pos:pos + len(mk._MAT_KEYS)]))
        pos += len(mk._MAT_KEYS)
        tex_r = dict(zip(mk._TEX_KEYS, refs[pos:pos + len(mk._TEX_KEYS)]))
        pos += len(mk._TEX_KEYS)
        g_refs = refs[pos:pos + 3]
        outs = refs[pos + 3:]
        _grad_kernel(
            (camv_r, seedi_r, bg_r, sph_r, qd_r, box_r, med_r, mat_r, tex_r,
             *g_refs),
            outs, **kw,
        )

    n_tables = (len(mk._SPH_KEYS) + len(mk._QUAD_KEYS) + len(mk._BOX_KEYS)
                + len(mk._MED_KEYS) + len(mk._MAT_KEYS) + len(mk._TEX_KEYS))
    out_shapes = (
        jax.ShapeDtypeStruct((N_CAMV_DIFF,), jnp.float32),
        jax.ShapeDtypeStruct((3,), jnp.float32),
        jax.ShapeDtypeStruct((len(GRAD_SPH_KEYS), max(n_sph, 1)), jnp.float32),
        jax.ShapeDtypeStruct((len(GRAD_QUAD_KEYS), max(n_quad, 1)), jnp.float32),
        jax.ShapeDtypeStruct((len(GRAD_BOX_KEYS), max(n_box, 1)), jnp.float32),
        jax.ShapeDtypeStruct((len(GRAD_MED_KEYS), max(n_med, 1)), jnp.float32),
        jax.ShapeDtypeStruct((len(GRAD_MAT_KEYS), max(n_mat, 1)), jnp.float32),
        jax.ShapeDtypeStruct((len(GRAD_TEX_KEYS), max(n_tex, 1)), jnp.float32),
    )
    outs = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[smem_spec] * (3 + n_tables) + [ray_spec] * 3,
        out_specs=tuple(smem_spec for _ in out_shapes),
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
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
        g[:, 0].reshape(rows, mk.LANES),
        g[:, 1].reshape(rows, mk.LANES),
        g[:, 2].reshape(rows, mk.LANES),
    )
    return outs


@functools.lru_cache(maxsize=32)
def _make_diff_render(n_rays, max_depth, has_checker, has_noise, sizes,
                      interpret, fwd_sublanes, wave_frac, linear_slots,
                      n_samples):
    """custom_vjp-wrapped megakernel render for one static config."""
    n_sph, n_quad, n_mat, n_tex, n_med, n_box = sizes
    fwd_kw = dict(
        n_rays=n_rays, max_depth=max_depth, has_checker=has_checker,
        has_noise=has_noise, sizes=sizes, interpret=interpret,
        sublanes=fwd_sublanes, wave_frac=wave_frac,
        linear_slots=linear_slots,
    )
    # The bwd kernel re-blocks the cotangent with its own (smaller) tiles;
    # n_rays must divide both.
    grad_pad = -n_rays % (GRAD_SUBLANES * mk.LANES)

    @jax.custom_vjp
    def diff_render(camv, seedi, tables, background):
        return mk.trace_megakernel_batch(
            camv, seedi, tables, background, **fwd_kw)

    def fwd(camv, seedi, tables, background):
        out = mk.trace_megakernel_batch(
            camv, seedi, tables, background, **fwd_kw)
        return out, (camv, seedi, tables, background)

    def bwd(res, g):
        camv, seedi, tables, background = res
        if grad_pad:
            g = jnp.concatenate(
                [g, jnp.zeros((grad_pad, 3), jnp.float32)], axis=0)
        (dcamv, dbg, dsph, dqd, dbox, dmed, dmat, dtex) = _grad_call(
            camv, seedi, tables, background, g,
            n_rays=n_rays + grad_pad, max_depth=max_depth,
            has_checker=has_checker, has_noise=has_noise, sizes=sizes,
            interpret=interpret, fwd_sublanes=fwd_sublanes,
            linear_slots=linear_slots, n_samples=n_samples,
        )
        sph, qd, boxes, med, mats, texs = tables

        def expand(table, dvals, keys, n):
            out = {k: jnp.zeros_like(v) for k, v in table.items()}
            for r, k in enumerate(keys):
                out[k] = out[k].at[:n].set(dvals[r, :n]) if n else out[k]
            return out

        d_tables = (
            expand(sph, dsph, GRAD_SPH_KEYS, n_sph),
            expand(qd, dqd, GRAD_QUAD_KEYS, n_quad),
            expand(boxes, dbox, GRAD_BOX_KEYS, n_box),
            expand(med, dmed, GRAD_MED_KEYS, n_med),
            expand(mats, dmat, GRAD_MAT_KEYS, n_mat),
            expand(texs, dtex, GRAD_TEX_KEYS, n_tex),
        )
        d_camv = jnp.zeros((mk._CAMV_LEN,), jnp.float32).at[:N_CAMV_DIFF].set(dcamv)
        d_seedi = np.zeros((1,), dtype=jax.dtypes.float0)
        return d_camv, d_seedi, d_tables, dbg

    diff_render.defvjp(fwd, bwd)
    return diff_render


def trace_megakernel_batch_diff(camv, seedi, tables, background, *, n_rays,
                                max_depth, has_checker, has_noise=False,
                                sizes=None, interpret=False,
                                sublanes=mk.SUBLANES, wave_frac=1.0,
                                linear_slots=False, n_samples=1):
    """Differentiable drop-in for megakernel.trace_megakernel_batch.

    Forward: the fast v4 kernel, untouched. Backward: the replay-vjp kernel
    (see module docstring). ``n_samples`` must be the STATIC sample count
    the camv batch encodes (the backward loops over it in-kernel).
    """
    fn = _make_diff_render(
        n_rays, max_depth, has_checker, has_noise, tuple(sizes),
        interpret, sublanes, wave_frac, linear_slots, n_samples,
    )
    return fn(camv, seedi, tables, background)
