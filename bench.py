"""Benchmark harness: Cornell box progressive throughput on the current
default JAX backend (real TPU chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

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

    scene_path = "/root/reference/data/cornell_box_original.json"
    scene_host, dims = loader.load_scene(scene_path)
    features = tuple(sorted(scene_host.features().items()))
    scene = schema.to_device(scene_host)

    width, height = dims or (600, 600)
    max_depth = 50
    sqrt_spp = 10  # stratification grid for the implied 10k-sample workload
    chunk = 65536

    @jax.jit
    def step(scene, sample_idx):
        return integrator.render_sample(
            scene, dict(features), width, height, sample_idx, 0,
            max_depth, sqrt_spp, chunk_size=chunk,
        )

    # Warmup / compile.
    out = step(scene, jnp.int32(0))
    out.block_until_ready()

    iters = 8
    t0 = time.perf_counter()
    acc = None
    for i in range(iters):
        r = step(scene, jnp.int32(i + 1))
        acc = r if acc is None else acc + r
    acc.block_until_ready()
    dt = time.perf_counter() - t0

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
