"""Benchmark harness: Cornell box progressive throughput on the current
default JAX backend (the real TPU chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference's implied headline config — Cornell box original at
600x600, max_depth 50, stratified progressive sampling
(data/cornell_original_10000_samples.json / BASELINE.md). Samples are
batched inside one jit dispatch (ops/integrator.render_progressive) so the
measurement is device throughput, not host/tunnel latency.

Baseline note (see BASELINE.md): the reference publishes no numbers. The
comparison constant is the reference's implied CPU throughput — per-pixel TBB
fan-out of a recursive tracer on a desktop CPU is ~10 M camera-paths/s on
Cornell-sized scenes; vs_baseline = measured_paths_per_sec / 10e6.
"""

from __future__ import annotations

import json
import sys
import time

_BASELINE_PATHS_PER_SEC = 10e6


def main() -> int:
    import jax
    import jax.numpy as jnp

    from raytrace2_tpu.ops import integrator
    from raytrace2_tpu.scene import loader, schema
    from raytrace2_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    scene_path = "/root/reference/data/cornell_box_original.json"
    scene_host, dims = loader.load_scene(scene_path)
    feat = scene_host.features()
    # Megakernel path (the measured-fastest backend for eligible scenes).
    feat["use_megakernel"] = jax.default_backend() != "cpu"
    features = tuple(sorted(feat.items()))
    scene = schema.to_device(scene_host)

    width, height = dims or (600, 600)
    max_depth = 50
    sqrt_spp = 10  # stratification grid for the implied 10k-sample workload

    @jax.jit
    def run(scene, sample0, n):
        return integrator.render_progressive(
            scene, dict(features), width, height, sample0, n, 0,
            max_depth, sqrt_spp,
        )

    # Keep single dispatches short: long device steps can wedge
    # network-attached runtimes. (128 samples ≈ 0.35 s device time with the
    # v4 path-regeneration kernel.)
    MAX_BATCH = 128

    def timed(s0, n):
        """Wall time with a forced scalar readback — block_until_ready can
        return early through the network-attached runtime."""
        t0 = time.perf_counter()
        done = 0
        while done < n:
            step = min(MAX_BATCH, n - done)
            val = float(run(scene, jnp.int32(s0 + done), jnp.int32(step)).mean())
            assert 0.0 < val < 100.0  # sanity: render actually happened
            done += step
        return time.perf_counter() - t0

    # Warmup / compile (cached persistently across runs).
    timed(0, 1)

    # Calibrate to a ~5-20 s measurement.
    iters = 4
    dt = timed(1, iters)
    if dt < 4.0:
        iters = min(max(int(iters * 8.0 / dt), 8), 512)
        dt = timed(1 + 4, iters)

    paths_per_sec = iters * width * height / dt
    print(
        json.dumps(
            {
                "metric": "cornell600_paths_per_sec",
                "value": round(paths_per_sec, 1),
                "unit": "paths/s",
                "vs_baseline": round(paths_per_sec / _BASELINE_PATHS_PER_SEC, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
