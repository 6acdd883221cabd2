"""Fused closest-hit Pallas kernel: spheres + quads in one VMEM-resident pass.

STATUS: superseded by ops/pallas/megakernel.py (which keeps the whole bounce
loop in-kernel and measured 6-60x faster end-to-end). Kept as the tested
intermediate step and for A/B comparison via Renderer(backend='pallas');
on-chip measurements showed XLA's fused dense form beats this kernel at
every corpus size, which motivated the megakernel redesign.

Why a kernel: the XLA formulation (ops/intersect.py) materializes several
[rays, prims] intermediates per family; XLA fuses most of the elementwise
work but the per-term HBM traffic scales with rays × prims. This kernel
streams primitive tiles through VMEM against a resident ray tile, keeping
every [TILE_R, TILE_P] intermediate on-chip and writing only the final
(best_t, best_code) per ray — HBM traffic drops from O(R·P) to O(R + P).

Layout: ray components arrive as [R/LANES, LANES] 2-D tiles (LANES=128, the
TPU lane width; sublane tiling (8,128) for f32). Primitive SoA params are
zero-padded to TILE_P multiples and live whole in VMEM (corpus scenes are
≤ a few thousand records ≈ hundreds of KB).

Math is identical to ops/intersect.py (reference: src/cpu_raytrace/
Sphere.cpp:7-26, Quad.cpp:19-43); equality is asserted by
tests/test_pallas_kernel.py on every platform via interpret mode and on TPU
by the integrator equivalence test.

Output encoding: best_code = family * 2^24 + prim_index (family 0 spheres,
1 quads), -1 for miss; best_t = BIG on miss. Record reconstruction
(point/normal/uv) stays in ops/intersect.py — it is O(R) and fuses fine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytrace2_tpu import defs

BIG = 3.0e38  # python float: jnp scalars would be captured consts inside the kernel
LANES = 128
SUBLANES = 8
TILE_R = SUBLANES * LANES   # rays per grid step (one [8,128] f32 tile)
TILE_P = 128                # primitives per inner loop step

FAM_SHIFT = 24
CODE_SPHERE = 0 << FAM_SHIFT
CODE_QUAD = 1 << FAM_SHIFT


def _sphere_pass(ox, oy, oz, dx, dy, dz, tm, t0, t1, sph, best_t, best_c):
    """Stream sphere tiles against the resident ray tile."""
    n_tiles = sph["c0x"].shape[-1] // TILE_P

    a = dx * dx + dy * dy + dz * dz            # [8,128] per-ray
    oo = ox * ox + oy * oy + oz * oz
    d_o = dx * ox + dy * oy + dz * oz

    def body(i, carry):
        best_t, best_c = carry
        off = i * TILE_P

        def ld(name):
            return sph[name][0, pl.ds(off, TILE_P)]   # [TILE_P] (ref slice)

        c0x, c0y, c0z = ld("c0x"), ld("c0y"), ld("c0z")
        dpx, dpy, dpz = ld("dpx"), ld("dpy"), ld("dpz")
        r2 = ld("r2")
        act = ld("act")

        # Broadcast [8,128,1] rays vs [1,1,TILE_P] prims.
        def bc_ray(v):
            return v[:, :, None]

        def bc_p(v):
            return v[None, None, :]

        cx = bc_p(c0x) + bc_ray(tm) * bc_p(dpx)
        cy = bc_p(c0y) + bc_ray(tm) * bc_p(dpy)
        cz = bc_p(c0z) + bc_ray(tm) * bc_p(dpz)
        ocx = cx - bc_ray(ox)
        ocy = cy - bc_ray(oy)
        ocz = cz - bc_ray(oz)
        h = bc_ray(dx) * ocx + bc_ray(dy) * ocy + bc_ray(dz) * ocz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - bc_p(r2)
        disc = h * h - bc_ray(a) * cc
        has = disc >= 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 0.0))
        inv_a = 1.0 / bc_ray(a)
        r0 = (h - sq) * inv_a
        r1 = (h + sq) * inv_a
        ok0 = (r0 > bc_ray(t0)) & (r0 < bc_ray(t1))
        ok1 = (r1 > bc_ray(t0)) & (r1 < bc_ray(t1))
        root = jnp.where(ok0, r0, r1)
        hit = has & (ok0 | ok1) & (bc_p(act) > 0)
        ts = jnp.where(hit, root, BIG)               # [8,128,TILE_P]

        tile_best = jnp.min(ts, axis=-1)             # [8,128]
        tile_arg = jnp.argmin(ts, axis=-1).astype(jnp.int32) + off
        closer = tile_best < best_t
        best_t = jnp.where(closer, tile_best, best_t)
        best_c = jnp.where(closer, CODE_SPHERE + tile_arg, best_c)
        return best_t, best_c

    return jax.lax.fori_loop(0, n_tiles, body, (best_t, best_c))


def _quad_pass(ox, oy, oz, dx, dy, dz, t0, t1, qd, best_t, best_c):
    n_tiles = qd["nx"].shape[-1] // TILE_P

    def body(i, carry):
        best_t, best_c = carry
        off = i * TILE_P

        def ld(name):
            return qd[name][0, pl.ds(off, TILE_P)][None, None, :]   # [1,1,P]

        def bc(v):
            return v[:, :, None]                                     # [8,128,1]

        nx, ny, nz = ld("nx"), ld("ny"), ld("nz")
        dplane = ld("d")
        aax, aay, aaz = ld("aax"), ld("aay"), ld("aaz")   # v×w
        abx, aby, abz = ld("abx"), ld("aby"), ld("abz")   # w×u
        qaa = ld("qaa")                                    # q·(v×w)
        qab = ld("qab")                                    # q·(w×u)
        act = ld("act")

        nd = bc(dx) * nx + bc(dy) * ny + bc(dz) * nz
        no = bc(ox) * nx + bc(oy) * ny + bc(oz) * nz
        not_par = jnp.abs(nd) >= defs.QUAD_EPS
        t = (dplane - no) / jnp.where(not_par, nd, 1.0)
        o_aa = bc(ox) * aax + bc(oy) * aay + bc(oz) * aaz
        d_aa = bc(dx) * aax + bc(dy) * aay + bc(dz) * aaz
        o_ab = bc(ox) * abx + bc(oy) * aby + bc(oz) * abz
        d_ab = bc(dx) * abx + bc(dy) * aby + bc(dz) * abz
        alpha = o_aa + t * d_aa - qaa
        beta = o_ab + t * d_ab - qab
        hit = (
            not_par
            & (t >= bc(t0)) & (t <= bc(t1))
            & (alpha >= 0.0) & (alpha <= 1.0)
            & (beta >= 0.0) & (beta <= 1.0)
            & (act > 0)
        )
        ts = jnp.where(hit, t, BIG)
        tile_best = jnp.min(ts, axis=-1)
        tile_arg = jnp.argmin(ts, axis=-1).astype(jnp.int32) + off
        closer = tile_best < best_t
        best_t = jnp.where(closer, tile_best, best_t)
        best_c = jnp.where(closer, CODE_QUAD + tile_arg, best_c)
        return best_t, best_c

    return jax.lax.fori_loop(0, n_tiles, body, (best_t, best_c))


def _kernel(ox, oy, oz, dx, dy, dz, tm, t0, t1, sph_refs, quad_refs,
            out_t, out_c, *, has_spheres, has_quads):
    rays = {k: r[:] for k, r in
            zip("ox oy oz dx dy dz tm t0 t1".split(),
                (ox, oy, oz, dx, dy, dz, tm, t0, t1))}
    best_t = jnp.full(rays["ox"].shape, BIG)
    best_c = jnp.full(rays["ox"].shape, -1, jnp.int32)
    if has_spheres:
        best_t, best_c = _sphere_pass(
            rays["ox"], rays["oy"], rays["oz"], rays["dx"], rays["dy"],
            rays["dz"], rays["tm"], rays["t0"], rays["t1"],
            sph_refs, best_t, best_c,
        )
    if has_quads:
        best_t, best_c = _quad_pass(
            rays["ox"], rays["oy"], rays["oz"], rays["dx"], rays["dy"],
            rays["dz"], rays["t0"], rays["t1"],
            quad_refs, best_t, best_c,
        )
    out_t[:] = best_t
    out_c[:] = best_c


def _pad_to(x, n):
    pad = n - x.shape[0]
    if pad:
        x = jnp.pad(x, (0, pad))
    return x


def pack_scene(spheres, quads):
    """Host/trace-time packing of primitive SoA into kernel layout:
    each param a [1, P_pad] f32 row (lane-aligned)."""
    def row(x):
        p = -x.shape[0] % TILE_P
        return jnp.pad(x.astype(jnp.float32), (0, p))[None, :]

    sph = {
        "c0x": row(spheres.center0[:, 0]),
        "c0y": row(spheres.center0[:, 1]),
        "c0z": row(spheres.center0[:, 2]),
        "dpx": row(spheres.displacement[:, 0]),
        "dpy": row(spheres.displacement[:, 1]),
        "dpz": row(spheres.displacement[:, 2]),
        "r2": row(spheres.radius * spheres.radius),
        "act": row(spheres.active.astype(jnp.float32)),
    }
    a_alpha = jnp.cross(quads.v, quads.w)
    a_beta = jnp.cross(quads.w, quads.u)
    qd = {
        "nx": row(quads.normal[:, 0]),
        "ny": row(quads.normal[:, 1]),
        "nz": row(quads.normal[:, 2]),
        "d": row(quads.d),
        "aax": row(a_alpha[:, 0]),
        "aay": row(a_alpha[:, 1]),
        "aaz": row(a_alpha[:, 2]),
        "abx": row(a_beta[:, 0]),
        "aby": row(a_beta[:, 1]),
        "abz": row(a_beta[:, 2]),
        "qaa": row(jnp.sum(quads.q * a_alpha, -1)),
        "qab": row(jnp.sum(quads.q * a_beta, -1)),
        "act": row(quads.active.astype(jnp.float32)),
    }
    return sph, qd


@functools.partial(jax.jit, static_argnames=("has_spheres", "has_quads", "interpret"))
def closest_hit_pallas(o, d, time, t_min, t_max, sph, qd, *,
                       has_spheres=True, has_quads=True, interpret=False):
    """Fused closest hit over spheres+quads.

    Args:
      o, d: [N,3]; time/t_min/t_max: [N]. N must be a multiple of TILE_R
      (1024) — the integrator's chunking guarantees it.
      sph, qd: pack_scene output.
    Returns (best_t [N], best_code [N]): code = family·2^24 + index, -1 miss.
    """
    n = o.shape[0]
    assert n % TILE_R == 0, f"ray count {n} not a multiple of {TILE_R}"
    rows = n // LANES

    def shape2(x):
        return x.reshape(rows, LANES)

    ray_args = (
        shape2(o[:, 0]), shape2(o[:, 1]), shape2(o[:, 2]),
        shape2(d[:, 0]), shape2(d[:, 1]), shape2(d[:, 2]),
        shape2(time), shape2(t_min), shape2(t_max),
    )

    grid = n // TILE_R
    ray_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    prim_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole array, replicated

    sph_keys = tuple(sorted(sph))
    qd_keys = tuple(sorted(qd))

    def kern(*refs):
        ray_refs = refs[:9]
        sph_refs = dict(zip(sph_keys, refs[9:9 + len(sph_keys)]))
        quad_refs = dict(zip(qd_keys, refs[9 + len(sph_keys):9 + len(sph_keys) + len(qd_keys)]))
        out_t, out_c = refs[-2:]
        _kernel(*ray_refs, sph_refs, quad_refs, out_t, out_c,
                has_spheres=has_spheres, has_quads=has_quads)

    out_t, out_c = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[ray_spec] * 9
        + [prim_spec] * (len(sph_keys) + len(qd_keys)),
        out_specs=(
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(*ray_args, *(sph[k] for k in sph_keys), *(qd[k] for k in qd_keys))

    return out_t.reshape(n), out_c.reshape(n)
