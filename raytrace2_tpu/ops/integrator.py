"""Wavefront path integrator: iterative bounce loop over SoA ray state.

Replaces the reference's recursive ``RayColor``
(src/cpu_raytrace/RayTracer.cpp:20-45) with the iterative
radiance/throughput form the reference author sketched for the GPU
(src/shaders/rtiow.fs.glsl:264-290), generalized with emission:

    radiance   += throughput * emitted
    throughput *= attenuation

advanced under ``lax.while_loop`` (early exit when every ray has terminated)
or ``lax.scan`` (differentiable; fixed trip count) over at most ``max_depth``
bounces. Semantics match the recursion exactly: a miss adds
``throughput * background`` (RayTracer.cpp:23-26); a ray that survives
``max_depth`` scatters contributes nothing further (depth cap,
RayTracer.cpp:21-22).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from raytrace2_tpu import defs
from raytrace2_tpu.ops import camera as camera_ops
from raytrace2_tpu.ops import intersect, materials, rng


# Per-bounce uniform layout: [0:2] unit-sphere dir, [2] fresnel choice,
# [3:3+M] media free-path draws — all from ONE threefry draw per ray
# (rng.bounce_uniforms); a pure function of (pixel, sample, bounce), never of
# batch position (SURVEY.md §7 RNG reproducibility).


def _make_step(scene, features, background, mega_seed=None):
    """Build the per-bounce transition for a (possibly compacted) ray set.

    The step closes over nothing ray-indexed: keys/time ride inside the
    state so compaction can gather them along with the rays.

    ``features["rng_impl"]=="murmur"`` (requires ``mega_seed``): draw from
    the v4 megakernel's exact counter-hash streams — ``st["keys"]`` then
    holds i32 PIXEL IDS instead of threefry keys. With identical streams
    the two backends compute the same paths, so cross-backend goldens
    measure f32 arithmetic divergence, not MC noise.
    """
    num_media = scene.media.btype.shape[0]
    has_media = features.get("has_media", True)
    use_murmur = features.get("rng_impl") == "murmur" and mega_seed is not None
    # The kernel's per-bounce counter stride: 3 scatter draws + one per
    # ACTIVE medium (megakernel.py draws_pb).
    n_med_active = (features.get("mega_sizes") or (0,) * 6)[4]

    def step(st):
        if use_murmur:
            draws_pb = 3 + (n_med_active if has_media else 0)
            pixel_ids = st["keys"]
            bctr = st["bounce"] * draws_pb
            ctrs = [bctr, bctr + 1, bctr + 2] + (
                [bctr + 3 + m for m in range(n_med_active)] if has_media else []
            )
            u = rng.murmur_uniforms_at(mega_seed, pixel_ids, ctrs)
            if has_media and num_media > n_med_active:
                # Padded (inactive) media rows still consume a lane in the
                # dense sweep; give them a dead draw.
                u = jnp.concatenate(
                    [u, jnp.full((u.shape[0], num_media - n_med_active), 0.5)],
                    axis=-1,
                )
        else:
            n_draws = 3 + (num_media if has_media else 0)
            u = rng.bounce_uniforms(st["keys"], st["bounce"], n_draws)
        u_media = u[:, 3:] if has_media else None
        hit = intersect.closest_hit(
            scene, st["o"], st["d"], st["time"], u_media, features=features
        )
        u_vec = rng.unit_vec3_from_uniforms(u[:, 0], u[:, 1])
        sc = materials.shade(scene, features, hit, st["d"], u_vec, u[:, 2])

        miss = st["alive"] & ~hit.valid
        hit_live = st["alive"] & hit.valid
        scatter_live = hit_live & sc.did_scatter

        radiance = st["radiance"]
        radiance = radiance + jnp.where(
            miss[:, None], st["throughput"] * background[None, :], 0.0
        )
        radiance = radiance + jnp.where(
            hit_live[:, None], st["throughput"] * sc.emitted, 0.0
        )
        throughput = jnp.where(
            scatter_live[:, None], st["throughput"] * sc.attenuation, st["throughput"]
        )
        o_new = jnp.where(scatter_live[:, None], hit.point, st["o"])
        d_new = jnp.where(scatter_live[:, None], sc.direction, st["d"])
        return dict(
            st,
            o=o_new,
            d=d_new,
            throughput=throughput,
            radiance=radiance,
            alive=scatter_live,
            bounce=st["bounce"] + 1,
        )

    return step


def _trace_megakernel(scene, features, o, d, time, seed_lane, max_depth):
    """Dispatch to the Pallas megakernel (gated: spheres/quads + solid/
    checker textures only; see ops/pallas/megakernel.py)."""
    from raytrace2_tpu.ops.pallas import megakernel as mk

    n = o.shape[0]
    pad = (-n) % mk.TILE_R
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        time = jnp.pad(time, (0, pad))
    sizes = tuple(features["mega_sizes"])
    tables = mk.pack_tables(scene, sizes)
    radiance = mk.trace_megakernel(
        o, d, time, seed_lane, tables, scene.background,
        max_depth=max_depth,
        has_checker=int(features.get("has_checker", 1)),
        has_noise=bool(features.get("has_noise", False)),
        sizes=sizes,
        interpret=bool(features.get("mega_interpret", False)),
        phases=int(features.get("mega_phases", 2)),
        compaction_ratio=int(features.get("mega_ratio", 16)),
    )
    return radiance[:n]


def trace_rays(scene, features, o, d, time, keys, max_depth: int,
               differentiable: bool = False, mega_seed=None):
    """Trace N rays to completion; returns radiance [N,3].

    Args:
      scene: FlatScene on device; features: static gate dict.
      o, d, time: ray SoA ([N,3], [N,3], [N]).
      keys: [N] per-(pixel,sample) base keys.
      max_depth: static bounce cap (AppSettings.max_depth, Settings.hpp:9).
      differentiable: use a scan (reverse-mode differentiable) instead of the
        compacting while-loop fast path.

    Fast path = **phased wavefront compaction**. The lockstep loop's cost is
    (iterations until the LAST ray dies) × full width, but Cornell's alive
    fraction decays fast (mean path ≈ 6.7 bounces vs a 50-bounce cap →
    ~13% lane efficiency). Each phase runs the masked loop only while the
    alive count exceeds the next phase's capacity, then gathers the
    survivors (with their keys — RNG streams are untouched, results are
    bitwise identical) into a buffer `compaction_ratio`× smaller and
    continues. Work drops from depth·N to ≈ Σ phase_len·phase_width.
    """
    if (
        not differentiable
        and mega_seed is not None
        and features.get("use_megakernel", False)
        and features.get("mega_sizes") is not None
    ):
        return _trace_megakernel(scene, features, o, d, time, mega_seed, max_depth)

    if differentiable:
        # The BVH walk (while_loop) is not reverse-differentiable; gradients
        # take the dense sweep. Discrete hit SELECTION is detached either way
        # (see grad.py), so the estimator is unchanged.
        features = dict(features)
        features.pop("use_bvh_spheres", None)

    n = o.shape[0]
    background = scene.background
    step = _make_step(scene, features, background, mega_seed=mega_seed)

    state = dict(
        o=o,
        d=d,
        time=time,
        keys=keys,
        throughput=jnp.ones((n, 3), o.dtype),
        radiance=jnp.zeros((n, 3), o.dtype),
        alive=jnp.ones((n,), bool),
        bounce=jnp.int32(0),
    )

    if differentiable:
        def scan_body(st, _):
            return step(st), None
        state, _ = jax.lax.scan(scan_body, state, None, length=max_depth)
        return state["radiance"]

    compaction_ratio = int(features.get("compaction_ratio", 8))
    num_phases = int(features.get("compaction_phases", 3))

    radiance_full = jnp.zeros((n, 3), o.dtype)
    idx_map = jnp.arange(n, dtype=jnp.int32)
    width = n
    for phase in range(num_phases):
        last = phase == num_phases - 1 or width // compaction_ratio < 256
        cap_next = 0 if last else width // compaction_ratio

        state = jax.lax.while_loop(
            lambda st, cap=cap_next: (st["bounce"] < max_depth)
            & (jnp.sum(st["alive"]) > cap),
            step,
            state,
        )
        radiance_full = radiance_full.at[idx_map].add(state["radiance"])
        if last:
            break
        # Compact: stable-partition alive rays to the front; dead slots that
        # ride along have alive=False and contribute nothing further.
        order = jnp.argsort(~state["alive"], stable=True)[:cap_next]
        idx_map = idx_map[order]
        state = dict(
            o=state["o"][order],
            d=state["d"][order],
            time=state["time"][order],
            keys=state["keys"][order],
            throughput=state["throughput"][order],
            radiance=jnp.zeros((cap_next, 3), o.dtype),
            alive=state["alive"][order],
            bounce=state["bounce"],
        )
        width = cap_next
    return radiance_full


def render_sample(scene, features, width: int, height: int, sample_idx, seed,
                  max_depth: int, sqrt_spp: int, chunk_size: int | None = None,
                  differentiable: bool = False):
    """One progressive stratified sample for every pixel → [H,W,3] radiance.

    The direct analog of RayTracer::Update (src/cpu_raytrace/
    RayTracer.cpp:55-70), minus accumulation (the caller owns the
    accumulator). Rays are processed in chunks under ``lax.map`` to bound the
    [chunk, P] intersection intermediates resident at once.
    """
    n = width * height
    pixel_ids = jnp.arange(n, dtype=jnp.int32)

    # Megakernel PRNG seed: a distinct scalar per (seed, sample).
    mega_seed = jnp.int32(seed) * jnp.int32(1000003) + jnp.asarray(sample_idx, jnp.int32)
    mega_active = (
        not differentiable
        and features.get("use_megakernel", False)
        and features.get("mega_sizes") is not None
    )
    if mega_active:
        # Camera uniforms from the kernel's counter-hash family — the whole
        # sample needs zero threefry work; keys are unused by the kernel.
        cam_u = rng.murmur_uniforms(
            mega_seed, pixel_ids,
            tuple(rng.CAMERA_CTR_BASE + k for k in range(5)),
        )
        keys = None
        o, d, time = camera_ops.generate_rays(
            scene.camera, width, height, sample_idx, sqrt_spp, None,
            uniforms=cam_u,
        )
        # The kernel is internally tiled and holds no [rays, prims]
        # intermediates — chunking would only duplicate PRNG streams.
        chunk_size = None
    elif features.get("rng_impl") == "murmur":
        # XLA bounce loop on the megakernel's exact RNG streams (matched-RNG
        # cross-backend goldens; see _make_step). Keys carry pixel ids.
        cam_u = rng.murmur_uniforms(
            mega_seed, pixel_ids,
            tuple(rng.CAMERA_CTR_BASE + k for k in range(5)),
        )
        keys = pixel_ids
        o, d, time = camera_ops.generate_rays(
            scene.camera, width, height, sample_idx, sqrt_spp, None,
            uniforms=cam_u,
        )
    else:
        keys = jax.vmap(lambda p: rng.pixel_sample_key(seed, p, sample_idx))(pixel_ids)
        o, d, time = camera_ops.generate_rays(
            scene.camera, width, height, sample_idx, sqrt_spp, keys
        )

    tracer = functools.partial(
        trace_rays, scene, features, max_depth=max_depth,
        differentiable=differentiable, mega_seed=mega_seed,
    )
    if chunk_size is None or chunk_size >= n:
        radiance = tracer(o, d, time, keys)
    else:
        if n % chunk_size:
            pad = chunk_size - n % chunk_size
            o = jnp.pad(o, ((0, pad), (0, 0)))
            d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
            time = jnp.pad(time, (0, pad))
            keys = jnp.concatenate([keys, keys[:pad]])
        chunks = o.shape[0] // chunk_size

        def chunked(args):
            return tracer(*args)

        radiance = jax.lax.map(
            chunked,
            (
                o.reshape(chunks, chunk_size, 3),
                d.reshape(chunks, chunk_size, 3),
                time.reshape(chunks, chunk_size),
                keys.reshape(chunks, chunk_size),
            ),
        ).reshape(-1, 3)[:n]
    return radiance.reshape(height, width, 3)


def mega_schedule(features):
    """(sublanes, wave_frac, linear) for the v4 kernel. Cluster-heavy scenes
    use fine 8x128 tiles mapped to 32x32-pixel blocks and wave regeneration
    at 0.5 occupancy so the per-tile cluster skips see coherent ray sets;
    small scenes (Cornell-class, where every record is swept anyway) keep
    wide tiles, instant regeneration, and the padding-free linear lane
    layout. All three knobs are pure scheduling — the image is bitwise
    identical — and can be overridden via the ``mega_sublanes`` /
    ``mega_wave_frac`` / ``mega_linear`` features for measurement."""
    from raytrace2_tpu.ops.pallas import megakernel as mk

    ms = features.get("mega_sizes") or (0,) * 6
    n_records = ms[0] + ms[1] + ms[4] + ms[5]
    big = n_records > 512
    # Cluster-heavy scenes route to the SORTED WAVEFRONT kernel
    # (ops/pallas/wavefront_sorted.py): between-bounce coherence sorting is
    # what makes the cluster skips fire; it requires the linear slot layout.
    # Threshold 256: book1 (490 records) measured 7.7 Mpaths/s on v4 vs
    # 10.0 on the two-phase wavefront; Cornell-class scenes (tens of
    # records, where every record is swept anyway) stay on v4 (175).
    wavefront = bool(features.get("mega_wavefront", n_records > 256))
    if wavefront:
        from raytrace2_tpu.ops.pallas import wavefront_sorted as wf

        return int(features.get("mega_sublanes", wf.SORT_SUBLANES)), 1.0, True, True
    sublanes = int(features.get(
        "mega_sublanes", mk.SUBLANES_LARGE if big else mk.SUBLANES))
    wave_frac = float(features.get("mega_wave_frac", 0.5 if big else 1.0))
    linear = bool(features.get("mega_linear", not big))
    return sublanes, wave_frac, linear, False


def _render_batch_megakernel(scene, features, width, height, sample0,
                             n_samples, seed, max_depth, sqrt_spp,
                             pix0=0, n_local=None, differentiable=False):
    """Batched v4 path-regeneration render: every lane owns a pixel and
    regenerates dead rays with its next sample in-kernel — one kernel launch
    per batch (see ops/pallas/megakernel.py v4). Returns the radiance SUM
    over the batch's samples, [H,W,3].

    ``differentiable=True`` routes through the custom-VJP wrapper
    (ops/pallas/megakernel_grad.py): identical forward, backward runs the
    replay-vjp kernel. Requires STATIC ``n_samples``."""
    from raytrace2_tpu.ops.pallas import megakernel as mk

    n_total = width * height
    sublanes, wave_frac, linear, wavefront = mega_schedule(features)
    tile_r, block = mk.tile_block(sublanes, linear)
    n_slots, slot_of_pixel = mk.pixel_slots(width, height, sublanes, linear)
    n = n_local if n_local is not None else n_slots  # lanes this shard runs
    n_pad = ((n + tile_r - 1) // tile_r) * tile_r
    frame = camera_ops.camera_frame(scene.camera, width, height)
    camv = jnp.concatenate([
        frame["pixel00"], frame["pixel_delta_u"], frame["pixel_delta_v"],
        frame["center"], frame["defocus_disk_u"], frame["defocus_disk_v"],
        jnp.stack([
            frame["defocus_angle"].astype(jnp.float32),
            jnp.float32(width), jnp.float32(n_total),
            jnp.asarray(sample0, jnp.float32),
            jnp.asarray(n_samples, jnp.float32),
            jnp.float32(sqrt_spp), jnp.float32(seed),
            jnp.asarray(pix0, jnp.float32),
            jnp.float32(-(-width // block)), jnp.float32(height),
        ]),
    ])
    sizes = tuple(features["mega_sizes"])
    tables = mk.pack_tables(scene, sizes)
    kernel_kw = dict(
        n_rays=n_pad, max_depth=max_depth,
        has_checker=int(features.get("has_checker", 1)),
        has_noise=bool(features.get("has_noise", False)),
        sizes=sizes,
        interpret=bool(features.get("mega_interpret", False)),
        sublanes=sublanes, wave_frac=wave_frac, linear_slots=linear,
    )
    # noise_impl="table": run the kernel on the XLA path's exact 256-entry
    # Perlin tables (VMEM per-lane gathers) instead of the default
    # hash-gradient noise — required for tight cross-backend noise goldens.
    ntab = None
    if (
        kernel_kw["has_noise"]
        and features.get("noise_impl", "hash") == "table"
    ):
        ntab = mk.pack_noise_tables(scene, tuple(features["noise_rows"]))
    # Gather-based material/texture resolve for big tables (book1: 484
    # materials swept per bounce otherwise; bitwise-identical values). The
    # differentiable branch packs its own operand inside the custom_vjp
    # (megakernel_grad fwd), so only the gate is shared.
    n_mat, n_tex = sizes[2], sizes[3]
    use_mtab = bool(features.get(
        "mega_mat_gather", max(n_mat, n_tex) > mk.MAT_GATHER_MIN))
    mtab = (mk.pack_resolve_tables(tables[4], tables[5], n_mat, n_tex)
            if use_mtab and not differentiable else None)
    if differentiable:
        from raytrace2_tpu.ops.pallas import megakernel_grad as mkg

        wavefront_kw = None
        if wavefront:
            from raytrace2_tpu.ops.pallas import wavefront_sorted as wf

            # Big scenes: the primal inside the custom_vjp runs the
            # sorted-wavefront kernel (bitwise-identical to v4, ~2x
            # faster on book2) with the same scheduling knobs as the
            # non-differentiable path (which requires the linear slot
            # layout; mega_schedule already selected it).
            kernel_kw.pop("wave_frac")
            assert kernel_kw["linear_slots"]
            wavefront_kw = dict(
                sort_every=int(features.get("mega_sort_every", wf.SORT_EVERY)),
                k_bounces=int(features.get("mega_k_bounces", wf.K_BOUNCES)),
                key_mode=str(features.get("mega_sort_key", "pos")),
                tail_k=int(features.get("mega_tail_k", wf.TAIL_K)),
                tail_frac=float(features.get("mega_tail_frac",
                                             wf.TAIL_FRAC)),
                tail_compact=bool(features.get("mega_tail_compact", False)),
                state_packed=bool(features.get("mega_state_packed",
                                               wf.STATE_PACKED)),
            )
        radiance = mkg.trace_megakernel_batch_diff(
            camv, jnp.asarray(seed, jnp.int32), tables, scene.background,
            n_samples=int(n_samples), wavefront_kw=wavefront_kw,
            use_mtab=use_mtab, ntab=ntab, **kernel_kw,
        )
    elif wavefront:
        from raytrace2_tpu.ops.pallas import wavefront_sorted as wf

        kernel_kw.pop("wave_frac")
        kernel_kw.pop("linear_slots")
        radiance = wf.trace_wavefront_batch(
            camv, jnp.asarray(seed, jnp.int32), tables, scene.background,
            sort_every=int(features.get("mega_sort_every", wf.SORT_EVERY)),
            k_bounces=int(features.get("mega_k_bounces", wf.K_BOUNCES)),
            key_mode=str(features.get("mega_sort_key", "pos")),
            tail_k=int(features.get("mega_tail_k", wf.TAIL_K)),
            tail_frac=float(features.get("mega_tail_frac", wf.TAIL_FRAC)),
            tail_compact=bool(features.get("mega_tail_compact", False)),
            sort_impl=str(features.get("mega_sort_impl", wf.SORT_IMPL)),
            state_packed=bool(features.get("mega_state_packed",
                                           wf.STATE_PACKED)),
            ntab=ntab, mtab=mtab, **kernel_kw,
        )
    else:
        radiance = mk.trace_megakernel_batch(
            camv, jnp.asarray(seed, jnp.int32), tables, scene.background,
            ntab=ntab, mtab=mtab, **kernel_kw,
        )
    if n_local is not None:
        return radiance[:n]          # sharded caller keeps the flat slot tile
    if linear:
        return radiance[:n_total].reshape(height, width, 3)
    # De-tile: gather each pixel's lane (block-tiled layout).
    return radiance[slot_of_pixel.reshape(-1)].reshape(height, width, 3)


def render_progressive(scene, features, width: int, height: int, sample0,
                       n_samples, seed, max_depth: int, sqrt_spp: int,
                       chunk_size: int | None = None,
                       differentiable: bool = False):
    """Accumulate ``n_samples`` consecutive progressive samples in ONE traced
    computation (single device dispatch).

    The reference dispatches one Update per sample from the host loop
    (App.cpp:244-247); on TPU that costs a host→device round-trip per sample
    — ruinous through a network-attached chip. Folding the sample loop into
    the program amortizes dispatch to zero. ``n_samples`` may be traced (the
    loop lowers to a while), so one compilation serves every batch size.
    """
    if (
        not differentiable
        and features.get("use_megakernel", False)
        and features.get("mega_sizes") is not None
    ):
        return _render_batch_megakernel(
            scene, features, width, height, sample0, n_samples, seed,
            max_depth, sqrt_spp,
        )

    def body(i, acc):
        return acc + render_sample(
            scene, features, width, height, sample0 + i, seed, max_depth,
            sqrt_spp, chunk_size, differentiable,
        )

    init = jnp.zeros((height, width, 3), defs.REAL)
    return jax.lax.fori_loop(0, n_samples, body, init)
