"""Benchmark harness: Cornell box progressive throughput on the current
default JAX backend (the real TPU chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``--grad``: instead benchmark the DIFFERENTIABLE render — forward and
backward both as Pallas kernels (ops/pallas/megakernel_grad.py indexed
replay custom VJP) at the flagship depth 50 and print one JSON line with
metric "cornell600_fwdbwd_d50_paths_per_sec"; vs_baseline compares
against the reference's FORWARD-only measured number (depth-scaled when
--grad-depth overrides) — the reference has no backward at all.
--grad-samples N sets the per-dispatch sample batch (default 64).

Workload: the reference's implied headline config — Cornell box original at
600x600, max_depth 50, stratified progressive sampling
(data/cornell_original_10000_samples.json / BASELINE.md). Samples are
batched inside one jit dispatch (ops/integrator.render_progressive) so the
measurement is device throughput, not host/tunnel latency.

Baseline note (see BASELINE.md "Reference MEASURED on this host"): the
reference publishes no numbers, so it was built headless ON THIS HOST
(-O3 -march=native, TBB intact, GL/SDL stubbed) and measured on the same
workload: 1.17 M camera-paths/s on Cornell 600x600 depth 50 (4-core host).
vs_baseline = measured_paths_per_sec / 1.17e6.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_BASELINE_PATHS_PER_SEC = 1.17e6  # measured, BASELINE.md 2026-08-17
_REPO = os.path.dirname(os.path.abspath(__file__))


def _log(msg: str) -> None:
    """Heartbeat/diagnostics on STDERR (stdout carries only the JSON line);
    a driver timeout then still leaves a record of how far the run got."""
    print(f"# bench {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr,
          flush=True)


def _seed_cache() -> None:
    """Populate .jax_cache from the committed seed (jax_cache_seed/) so a
    cold start — fresh checkout, evicted cache — skips the multi-minute
    remote TPU compile. Stale/mismatched entries are simply cache misses."""
    seed = os.path.join(_REPO, "jax_cache_seed")
    live = os.path.join(_REPO, ".jax_cache")
    if not os.path.isdir(seed):
        return
    os.makedirs(live, exist_ok=True)
    copied = 0
    for name in os.listdir(seed):
        dst = os.path.join(live, name)
        if not os.path.exists(dst):
            shutil.copy(os.path.join(seed, name), dst)
            copied += 1
    if copied:
        _log(f"seeded compile cache: {copied} entries")


def main() -> int:
    _seed_cache()
    _log("importing jax")
    import jax
    import jax.numpy as jnp

    from raytrace2_tpu.ops import integrator
    from raytrace2_tpu.scene import loader, schema
    from raytrace2_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    _log(f"backend={jax.default_backend()} devices={jax.devices()}")

    scene_path = "/root/reference/data/cornell_box_original.json"
    scene_host, dims = loader.load_scene(scene_path)
    feat = scene_host.features()
    # Megakernel path (the measured-fastest backend for eligible scenes).
    feat["use_megakernel"] = jax.default_backend() != "cpu"
    features = tuple(sorted(feat.items()))
    scene = schema.to_device(scene_host)

    width, height = dims or (600, 600)

    if "--grad" in sys.argv[1:]:
        return _main_grad(scene, features, width, height)

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
    _log("warmup/compile start (cold ~60 s through the remote backend)")
    t_w = time.perf_counter()
    timed(0, 1)
    _log(f"warmup done in {time.perf_counter() - t_w:.1f} s; calibrating")

    # Calibrate to a ~5-20 s measurement.
    iters = 4
    dt = timed(1, iters)
    _log(f"prelim: {iters * width * height / dt / 1e6:.1f} Mpaths/s "
         f"({iters} spp in {dt:.2f} s)")
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


def _main_grad(scene, features, width, height) -> int:
    """fwd+bwd throughput: value_and_grad of a scalar loss through the
    render, both directions as Pallas kernels (megakernel_grad custom VJP —
    the indexed replay, so the FULL depth-50 flagship workload runs).
    ``--grad-depth N`` overrides (16 reproduces the round-2 comparison
    row)."""
    import jax
    import jax.numpy as jnp

    from raytrace2_tpu import grad as grad_mod

    max_depth = 50  # the reference's implied headline depth (BASELINE.md)
    if "--grad-depth" in sys.argv[1:]:
        max_depth = int(sys.argv[sys.argv.index("--grad-depth") + 1])
    sqrt_spp = 2
    # Samples per dispatch: the in-kernel sample loops amortize a ~55 ms
    # per-dispatch fixed cost (measured: depth-16 throughput 19 -> 43 -> 74
    # Mpaths/s at n=4/16/128); 64 keeps the longest (depth-50) dispatch
    # under ~1 s for the network-attached runtime.
    n_samples = 64
    if "--grad-samples" in sys.argv[1:]:
        n_samples = int(sys.argv[sys.argv.index("--grad-samples") + 1])

    def loss(img):
        return jnp.mean(img)

    @jax.jit
    def run(scene):
        return grad_mod.value_and_grad_scene(
            loss, scene, features, 0, width=width, height=height,
            n_samples=n_samples, max_depth=max_depth, sqrt_spp=sqrt_spp,
        )

    def timed(iters):
        t0 = time.perf_counter()
        for _ in range(iters):
            val, g = run(scene)
            assert 0.0 < float(val) < 100.0
            _ = float(jnp.sum(g.materials.albedo))  # force the bwd readback
        return time.perf_counter() - t0

    _log("grad warmup/compile start")
    t_w = time.perf_counter()
    timed(1)  # warmup/compile (persistently cached)
    _log(f"grad warmup done in {time.perf_counter() - t_w:.1f} s")
    iters = 2
    dt = timed(iters)
    _log(f"prelim: {iters * n_samples * width * height / dt / 1e6:.1f} "
         f"Mpaths/s fwd+bwd")
    if dt < 4.0:
        iters = min(max(int(iters * 8.0 / dt), 4), 256)
        dt = timed(iters)

    paths_per_sec = iters * n_samples * width * height / dt
    # Reference forward-only 1.17 Mpaths/s at depth 50 (it computes no
    # gradient at all); scaled linearly when comparing other depths.
    print(
        json.dumps(
            {
                "metric": f"cornell600_fwdbwd_d{max_depth}_paths_per_sec",
                "value": round(paths_per_sec, 1),
                "unit": "paths/s",
                "vs_baseline": round(
                    paths_per_sec
                    / (_BASELINE_PATHS_PER_SEC * 50 / max_depth), 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
