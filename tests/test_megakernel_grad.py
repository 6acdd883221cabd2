"""Megakernel custom-VJP correctness (ops/pallas/megakernel_grad.py):
AD ≡ central finite differences of the SAME megakernel forward, at fixed
RNG, in interpret mode on the CPU mesh (north star: "fwd and fwd+bwd at
speed-of-light" — the TPU-side throughput is benched in BASELINE.md).

The FD baseline differentiates the identical deterministic function (same
kernel, same murmur streams), so continuous parameters must match tightly;
geometry/camera gradients go through the noise texture (continuous
integrand) and tolerate the occasional discrete-branch flip inside ±eps.
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace2_tpu import grad as grad_mod
from raytrace2_tpu.scene import loader, schema


def _make(tmp_path, j, name):
    p = tmp_path / name
    p.write_text(json.dumps(j))
    scene_host, _ = loader.load_scene(str(p))
    feat = scene_host.features()
    feat["use_megakernel"] = True
    feat["mega_interpret"] = True
    return schema.to_device(scene_host), tuple(sorted(feat.items()))


SOLID_J = {
    "background_color": [0.55, 0.6, 0.7],
    "camera": {"fov": 50, "center": [0, 1.5, 4], "look_at": [0, 0.5, 0]},
    "materials": [
        {"type": "lambertian", "albedo": [0.7, 0.3, 0.3]},
        {"type": "metal", "albedo": [0.8, 0.8, 0.8], "fuzz": 0.2},
        {"type": "diffuse_light", "albedo": [3, 3, 3]},
    ],
    "primitives": [
        {"type": "sphere", "center": [0, 0.5, 0], "radius": 0.8, "material": 0},
        {"type": "sphere", "center": [1.3, 0.4, 0.5], "radius": 0.4, "material": 1},
        {"type": "quad", "q": [-20, 0, -20], "u": [40, 0, 0], "v": [0, 0, 40], "material": 0},
        {"type": "quad", "q": [-1, 3, -1], "u": [2, 0, 0], "v": [0, 0, 2], "material": 2},
    ],
}

NOISE_J = {
    "background_color": [0.7, 0.75, 0.8],
    "camera": {"fov": 42, "center": [0, 2, 5], "look_at": [0, 0.5, 0]},
    "textures": [{"type": "noise", "albedo": [0.85, 0.8, 0.75],
                  "scale": 0.6, "noise_type": 0}],
    "materials": [
        {"type": "texture", "tex_idx": 0},
        {"type": "metal", "albedo": [0.9, 0.9, 0.9], "fuzz": 0.0},
    ],
    "primitives": [
        {"type": "quad", "q": [-30, 0, -30], "u": [60, 0, 0], "v": [0, 0, 60],
         "material": 0},
        {"type": "sphere", "center": [0, 1.0, 0], "radius": 0.9, "material": 1},
    ],
}

KW = dict(width=8, height=6, n_samples=2, max_depth=3, sqrt_spp=1)
# Depth 3: sphere_z signal needs metal->floor->sky (radiance only lands on
# a miss/emission event, so depth 2 would make that gradient vacuously 0).
NOISE_KW = dict(width=6, height=4, n_samples=1, max_depth=3, sqrt_spp=1)


def test_diff_forward_equals_fast_forward(tmp_path):
    """The custom_vjp wrapper's primal IS the fast kernel — bitwise."""
    scene, features = _make(tmp_path, SOLID_J, "s.json")
    a = grad_mod.render_image(scene, features, 0, **KW)
    feat_nd = dict(features)
    from raytrace2_tpu.ops import integrator

    b = integrator.render_progressive(
        scene, feat_nd, KW["width"], KW["height"], jnp.int32(0),
        jnp.int32(KW["n_samples"]), 0, KW["max_depth"], KW["sqrt_spp"],
    ) / KW["n_samples"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize(
    "leaf,idx,eps,tol",
    [
        ("materials.albedo", (0, 0), 1e-3, 1e-2),
        ("materials.param", (1,), 1e-3, 5e-2),
        ("background", (1,), 1e-3, 1e-2),
        ("textures.albedo", (2, 0), 1e-3, 1e-2),  # light emission channel
    ],
)
def test_ad_matches_fd_continuous(tmp_path, leaf, idx, eps, tol):
    scene, features = _make(tmp_path, SOLID_J, "s.json")
    parts = leaf.split(".")

    def set_leaf(delta):
        if len(parts) == 1:
            return dataclasses.replace(
                scene, **{parts[0]: getattr(scene, parts[0]).at[idx].add(delta)})
        sub = getattr(scene, parts[0])
        return dataclasses.replace(
            scene, **{parts[0]: dataclasses.replace(
                sub, **{parts[1]: getattr(sub, parts[1]).at[idx].add(delta)})})

    @jax.jit
    def f(delta):
        return jnp.mean(grad_mod.render_image(set_leaf(delta), features, 0, **KW))

    got = float(jax.grad(f)(0.0))
    want = float((f(eps) - f(-eps)) / (2 * eps))
    assert np.isfinite(got)
    if abs(want) < 1e-5 and abs(got) < 1e-5:
        return
    assert got == pytest.approx(want, rel=tol, abs=1e-5), (
        f"{leaf}{idx}: ad={got} fd={want}")


@pytest.mark.slow  # NOISE-scene replay graphs compile 10-30 min each on CPU
@pytest.mark.parametrize(
    "which,eps",
    [
        ("sphere_z", 5e-3),
        ("cam_center_x", 5e-3),
        ("tex_scale", 5e-3),
    ],
)
def test_ad_matches_fd_geometry_noise(tmp_path, which, eps):
    """Geometry/camera/scale through the noise floor: continuous integrand,
    so AD tracks FD (band tolerant of discrete flips within ±eps)."""
    scene, features = _make(tmp_path, NOISE_J, "n.json")

    def move(delta):
        if which == "sphere_z":
            return dataclasses.replace(scene, spheres=dataclasses.replace(
                scene.spheres,
                center0=scene.spheres.center0.at[0, 2].add(delta)))
        if which == "cam_center_x":
            return dataclasses.replace(scene, camera=dataclasses.replace(
                scene.camera, center=scene.camera.center.at[0].add(delta)))
        return dataclasses.replace(scene, textures=dataclasses.replace(
            scene.textures, scale=scene.textures.scale.at[0].add(delta)))

    @jax.jit
    def f(delta):
        return jnp.mean(grad_mod.render_image(move(delta), features, 0,
                                              **NOISE_KW))

    got = float(jax.grad(f)(0.0))
    want = float((f(eps) - f(-eps)) / (2 * eps))
    assert np.isfinite(got), f"{which}: non-finite AD"
    if abs(want) < 5e-5 and abs(got) < 5e-5:
        return
    assert np.sign(got) == np.sign(want), f"{which}: ad={got} fd={want}"
    assert 0.5 < abs(got / want) < 2.0, f"{which}: ad={got} fd={want}"


def test_grads_finite_everywhere(tmp_path):
    scene, features = _make(tmp_path, SOLID_J, "s.json")

    def loss(img):
        return jnp.mean(img)

    _, g = grad_mod.value_and_grad_scene(
        loss, scene, features, 0, **KW)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert np.isfinite(np.asarray(leaf)).all(), f"non-finite at {path}"
