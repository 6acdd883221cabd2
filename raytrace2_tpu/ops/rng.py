"""Counter-based RNG and analytic samplers.

The reference uses a stateful ``thread_local std::minstd_rand`` seeded from
``random_device`` (src/cpu_raytrace/Math.hpp:9-13) and rejection-sampled unit
sphere/disk draws (Math.hpp:26-41). Neither shape works on TPU: state breaks
purity and rejection loops break static tracing. Here every random draw comes
from a threefry key that is a **pure function of (seed, pixel, sample,
bounce)** — never of device id — so an N-chip render equals a 1-chip render in
distribution regardless of sharding layout (SURVEY.md §7 "RNG
reproducibility"). Rejection loops are replaced by exact analytic samplers of
the same distributions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_sample_key(seed, pixel_flat, sample_idx):
    """Base key for one (pixel, sample) pair.

    ``pixel_flat`` / ``sample_idx`` may be traced arrays; the construction is
    a pure function of its inputs (replaces thread_local seeding,
    src/cpu_raytrace/Math.hpp:11).
    """
    key = jax.random.key(seed)
    key = jax.random.fold_in(key, sample_idx)
    return jax.random.fold_in(key, pixel_flat)


def bounce_key(base_key, bounce_idx):
    """Per-bounce subkey derivation."""
    return jax.random.fold_in(base_key, bounce_idx)


def uniform(key, shape=()):
    """U[0,1) — analog of math::RandReal (src/cpu_raytrace/Math.hpp:15-24)."""
    return jax.random.uniform(key, shape)


def unit_vec3(key, shape=()):
    """Uniform direction on the unit sphere.

    Replaces the rejection loop ``RandUnitVec3`` (src/cpu_raytrace/
    Math.hpp:43) with the exact gaussian-normalize construction.
    Returns shape ``shape + (3,)``.
    """
    g = jax.random.normal(key, shape + (3,))
    return g / jnp.linalg.norm(g, axis=-1, keepdims=True).clip(1e-12)


def in_unit_sphere(key, shape=()):
    """Uniform point inside the unit sphere (replaces the rejection loop
    ``RandInUnitSphere``, src/cpu_raytrace/Math.hpp:26-32): direction uniform
    on the sphere scaled by U^(1/3)."""
    k1, k2 = jax.random.split(key)
    d = unit_vec3(k1, shape)
    r = jax.random.uniform(k2, shape + (1,)) ** (1.0 / 3.0)
    return d * r


def in_unit_disk(key, shape=()):
    """Uniform point in the unit disk, z=0 (replaces ``RandInUnitDisk``,
    src/cpu_raytrace/Math.hpp:34-41) via the polar map r=sqrt(U)."""
    k1, k2 = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(k1, shape))
    theta = 2.0 * jnp.pi * jax.random.uniform(k2, shape)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), jnp.zeros_like(r)], axis=-1)


def unit_vec3_from_uniforms(u1, u2):
    """Exact uniform sphere direction from two uniforms: z = 1-2u,
    φ = 2πu — one threefry draw instead of three gaussians. Shapes broadcast;
    returns [..., 3]."""
    z = 1.0 - 2.0 * u1
    phi = (2.0 * jnp.pi) * u2
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def disk_from_uniforms(u1, u2):
    """Uniform unit-disk point (z=0) from two uniforms via the polar map."""
    r = jnp.sqrt(u1)
    theta = (2.0 * jnp.pi) * u2
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), jnp.zeros_like(r)], axis=-1)


def bounce_uniforms(keys, bounce_idx, n_draws: int):
    """One threefry draw per ray for a whole bounce: [N, n_draws] uniforms
    from fold_in(key, bounce). This is THE per-bounce RNG entry point — two
    hash invocations per ray per bounce (fold + draw) instead of one per
    consumed random number."""
    return jax.vmap(
        lambda k: jax.random.uniform(jax.random.fold_in(k, bounce_idx), (n_draws,))
    )(keys)


def on_hemisphere(key, normal):
    """Uniform direction on the hemisphere around ``normal``
    (src/cpu_raytrace/Math.hpp:45-51)."""
    d = unit_vec3(key, normal.shape[:-1])
    return jnp.where(jnp.sum(d * normal, -1, keepdims=True) > 0.0, d, -d)
