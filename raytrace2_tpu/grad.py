"""Differentiable rendering.

The scene is a pytree (schema.FlatScene), so ``jax.grad`` composes directly
with the integrator; this module provides the supported entry point and
documents the estimator's semantics.

What differentiates (SURVEY.md §7 "Differentiability"):
* geometry — sphere centers/radii/displacements, quad q/u/v (through the
  intersection *solve*: t, point, normal), camera parameters (through ray
  generation), material/texture parameters (albedos, fuzz, refraction index,
  emission, background).
* discrete events are detached: WHICH primitive is hit (argmin index), the
  dielectric reflect/refract branch, the checker cell choice, medium
  scatter-or-not — the VJP flows through the continuous quantities
  conditioned on those choices. This is the standard "detached sampling"
  path-gradient estimator: exact for continuous integrands in expectation,
  ignoring the motion of visibility discontinuities (no edge/silhouette
  term).
* random draws use fixed keys (pixel, sample, bounce): gradients are taken
  at fixed random primal — the estimator is deterministic given (seed, spp).

Russian roulette does not exist in the reference (fixed depth cap), which
keeps throughput weights differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from raytrace2_tpu.ops import integrator


@functools.partial(
    jax.jit,
    static_argnames=("features", "width", "height", "n_samples", "max_depth",
                     "sqrt_spp", "chunk_size"),
)
def render_image(scene, features, seed, *, width, height, n_samples,
                 max_depth, sqrt_spp, chunk_size=None):
    """Differentiable n-sample render → mean radiance [H,W,3].

    On the Pallas megakernel path (``use_megakernel`` set and the scene
    within the gradient-kernel gates), forward AND backward run as Pallas
    kernels via the custom VJP in ops/pallas/megakernel_grad.py — the
    "fwd+bwd at speed of light" path. Otherwise falls back to the
    scan-based XLA bounce loop (reverse-mode differentiable; the while-loop
    fast path is not) with a Python sample loop (static n_samples) so the
    whole computation is one reverse-differentiable graph. Both paths use
    the same detached-selection estimator (module docstring) — they differ
    only in RNG streams (threefry vs counter-hash), i.e. they are two
    fixed-primal draws of the same estimator.
    """
    features = dict(features)
    features.pop("use_pallas", None)  # the wavefront Pallas A/B path has no VJP
    if (
        features.get("use_megakernel", False)
        and features.get("mega_sizes") is not None
        # Both noise modes differentiate through the replay kernel:
        # hash-gradient (default) and noise_impl="table" (the reference's
        # exact 256-entry tables, PerlinNoiseGen.cpp:66-103 — gathers at
        # detached lattice indices, recompute-in-backward).
    ):
        from raytrace2_tpu.ops.pallas import megakernel_grad as mkg

        if mkg.grad_supported(
            tuple(features["mega_sizes"]), max_depth,
            bool(features.get("has_noise", False)),
        ):
            acc = integrator._render_batch_megakernel(
                scene, dict(features), width, height, jnp.int32(0),
                n_samples, seed, max_depth, sqrt_spp, differentiable=True,
            )
            return acc / n_samples
    acc = jnp.zeros((height, width, 3), jnp.float32)
    for s in range(n_samples):
        acc = acc + integrator.render_sample(
            scene, dict(features), width, height, jnp.int32(s), seed,
            max_depth, sqrt_spp, chunk_size, differentiable=True,
        )
    return acc / n_samples


def value_and_grad_scene(loss_fn, scene, features, seed, **render_kw):
    """(loss, d loss / d scene) for ``loss_fn(image) -> scalar``.

    The returned gradient is a FlatScene pytree; integer index/type leaves
    get zero cotangents.
    """

    def wrapped(s):
        return loss_fn(render_image(s, features, seed, **render_kw))

    # Integer leaves (material ids, texture types, ...) are non-differentiable;
    # jax.grad with allow_int returns float0 for them.
    return jax.value_and_grad(wrapped, allow_int=True)(scene)
