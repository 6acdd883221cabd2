"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (same code path
as real pods; see SURVEY.md §4 item 5)."""

import os

# Hard assign: the container env forces JAX_PLATFORMS=axon (real TPU via a
# tunnel); tests must run on the virtual CPU mesh regardless. NOTE: pytest's
# own startup imports jax (via a plugin) BEFORE this conftest runs, so the
# env var alone is read too late — jax.config captured it at import. Pin the
# platform through the config API too (allowed any time before first backend
# use), otherwise the whole suite silently runs on the tunneled TPU chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    f"tests must run on the virtual CPU mesh, got {jax.default_backend()}"
)
# Device-count check only when WE set the flag — a pre-existing
# xla_force_host_platform_device_count is deliberately respected above
# (sharding tests adapt to jax.device_count()).
if "xla_force_host_platform_device_count" not in flags:
    assert len(jax.devices()) == 8, (
        f"expected the 8-device virtual mesh, got x{len(jax.devices())}"
    )

# Persistent compilation cache: the suite's cost is dominated by jit
# compiles (9m+ cold); cached recompiles cut reruns to ~2 min. CPU-only
# (the TPU cache lives in .jax_cache/, managed by the CLI/bench).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REFERENCE_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def data_dir():
    return REFERENCE_DATA
