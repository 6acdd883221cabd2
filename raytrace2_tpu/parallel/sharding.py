"""Multi-device rendering: pixel-DP × sample-SP over a jax.sharding.Mesh.

The reference's only parallelism is shared-memory per-pixel fan-out within
one frame (``std::for_each(std::execution::par)``,
src/cpu_raytrace/RayTracer.cpp:69). The TPU-native equivalent (SURVEY.md
§2.12) is a 2-D device mesh:

* axis ``dp`` — pixel tiles: the ray batch's leading axis is sharded; each
  device traces its own pixels. Scene/BVH arrays are replicated.
* axis ``sp`` — sample batches: devices on this axis trace *different
  progressive sample indices* for the same pixels; their radiance is summed
  with ``psum`` over ICI — the collective that replaces the missing NCCL/MPI
  layer.

RNG keys are a pure function of (seed, pixel, sample) — never of device id —
so any mesh layout produces the same accumulated image in distribution
(bitwise identical given the same (pixel, sample) set; SURVEY.md §7).

Multi-host: the same code runs under ``jax.distributed.initialize`` (see
parallel/distributed.py); the mesh then spans all hosts' devices and the
psum rides ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from raytrace2_tpu.ops import camera as camera_ops
from raytrace2_tpu.ops import integrator, rng


def make_mesh(sp: int = 1, dp: int | None = None, devices=None) -> Mesh:
    """Build an ('sp', 'dp') mesh. Defaults: all devices on the dp axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    total = devices.size
    if dp is None:
        dp = total // sp
    if sp * dp != total:
        raise ValueError(f"sp*dp = {sp * dp} != device count {total}")
    return Mesh(devices.reshape(sp, dp), ("sp", "dp"))


def _trace_tile(scene, features, width, height, pixel_ids, sample_idx, seed,
                max_depth, sqrt_spp):
    """Trace one device's pixel tile at one sample index (local compute)."""
    keys = jax.vmap(lambda p: rng.pixel_sample_key(seed, p, sample_idx))(pixel_ids)
    o, d, time = camera_ops.generate_rays(
        scene.camera, width, height, sample_idx, sqrt_spp, keys, pixel_ids
    )
    return integrator.trace_rays(scene, features, o, d, time, keys, max_depth)


@functools.partial(
    jax.jit,
    static_argnames=("features", "width", "height", "max_depth", "sqrt_spp",
                     "samples_per_device", "mesh"),
)
def render_samples_sharded(scene, features, sample0, seed, *, width, height,
                           max_depth, sqrt_spp, samples_per_device, mesh):
    """Render ``samples_per_device * mesh.shape['sp']`` progressive samples,
    summed into one [H,W,3] radiance batch.

    Device (i, j) of the ('sp','dp') mesh traces samples
    ``sample0 + i*samples_per_device + [0..spd)`` for pixel tile j; the sp
    axis is reduced with psum. Output is dp-sharded by pixel rows (pixel
    count must divide evenly; the renderer pads the grid).
    """
    features = dict(features)
    n = width * height
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    pad = (-n) % dp
    pixel_ids = jnp.arange(n + pad, dtype=jnp.int32) % n  # pad wraps (discarded later)
    sp_ids = jnp.arange(sp, dtype=jnp.int32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("sp"), P("dp")),
        out_specs=P(None, "dp"),
        # The integrator's while_loop carry is initialized from constants
        # (unvarying) and becomes device-varying after the first bounce;
        # varying-manual-axes checking rejects that even though each device's
        # loop is independent and correct — disable it.
        check_vma=False,
    )
    def go(scene, my_sp, my_pixels):
        def body(s, acc):
            sample_idx = sample0 + my_sp[0] * samples_per_device + s
            return acc + _trace_tile(
                scene, features, width, height, my_pixels, sample_idx, seed,
                max_depth, sqrt_spp,
            )

        local = jax.lax.fori_loop(
            0, samples_per_device,
            body,
            jnp.zeros((my_pixels.shape[0], 3), jnp.float32),
        )
        return jax.lax.psum(local, "sp")[None]

    out = go(scene, sp_ids, pixel_ids)[0]
    return out[:n].reshape(height, width, 3)


def train_step_analog(scene, features, state, seed, *, width, height, max_depth,
                      sqrt_spp, samples_per_device, mesh):
    """One distributed accumulation step: the renderer's 'training step'.

    Adds sp·spd samples to the accumulator (the renderer's parameters-analog)
    and bumps frame_idx accordingly."""
    radiance = render_samples_sharded(
        scene, features, state.frame_idx, seed,
        width=width, height=height, max_depth=max_depth, sqrt_spp=sqrt_spp,
        samples_per_device=samples_per_device, mesh=mesh,
    )
    from raytrace2_tpu import render as render_mod

    total = samples_per_device * mesh.shape["sp"]
    return render_mod.RenderState(
        accum=state.accum + radiance,
        frame_idx=state.frame_idx + jnp.int32(total),
    )
