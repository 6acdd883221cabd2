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

pytestmark = pytest.mark.kernel  # interpret-mode Pallas: minutes each on CPU


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


@pytest.mark.slow  # table-noise replay interpret compile measured 60+ min
#                    on CPU; the quick gate is tools/check_table_grad.py
#                    on-chip (compiles in minutes there)
@pytest.mark.parametrize("which,eps", [("tex_scale", 5e-3)])
def test_ad_matches_fd_table_noise(tmp_path, which, eps):
    """noise_impl="table" through the kernel VJP (r5: the reference's
    exact 256-entry perm/grad tables differentiate in the replay —
    gathers at detached lattice indices, recompute-in-backward wrapper;
    previously table mode silently fell back to the XLA scan). Depth 2 /
    tiny res: table-mode interpret compiles are heavy."""
    scene, features = _make(tmp_path, NOISE_J, "nt.json")
    feat = dict(features)
    assert feat.get("has_noise")
    feat["noise_impl"] = "table"
    features = tuple(sorted(feat.items()))
    kw = dict(width=6, height=4, n_samples=1, max_depth=2, sqrt_spp=1)

    def move(delta):
        return dataclasses.replace(scene, textures=dataclasses.replace(
            scene.textures, scale=scene.textures.scale.at[0].add(delta)))

    @jax.jit
    def f(delta):
        return jnp.mean(grad_mod.render_image(move(delta), features, 0,
                                              **kw))

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


def _many_spheres_scene(tmp_path, n=80):
    """A scene past the round-2 64-record unroll gate: the indexed replay
    must handle it (winner search via the production hierarchy sweep +
    O(1) per-bounce resolve; megakernel_grad.py module docstring)."""
    rs = np.random.RandomState(7)
    prims = [{"type": "quad", "q": [-30, 0, -30], "u": [60, 0, 0],
              "v": [0, 0, 60], "material": 0}]
    for i in range(n):
        prims.append({
            "type": "sphere",
            "center": [float(rs.uniform(-6, 6)), float(rs.uniform(0.2, 1.0)),
                       float(rs.uniform(-6, 6))],
            "radius": float(rs.uniform(0.15, 0.45)),
            "material": int(rs.randint(0, 3)),
        })
    j = {
        "background_color": [0.6, 0.65, 0.75],
        "camera": {"fov": 55, "center": [0, 3, 9], "look_at": [0, 0.5, 0]},
        "materials": [
            {"type": "lambertian", "albedo": [0.5, 0.5, 0.5]},
            {"type": "metal", "albedo": [0.85, 0.85, 0.9], "fuzz": 0.1},
            {"type": "lambertian", "albedo": [0.7, 0.3, 0.2]},
        ],
        "primitives": prims,
    }
    return _make(tmp_path, j, "many.json")


def test_ad_matches_fd_hier_sweep(tmp_path):
    """40 records — past the cluster-hierarchy threshold (n_sph >= 32), so
    the winner search runs the production _hier_sweep while the resolve
    stays O(1): AD must track FD on a continuous leaf."""
    scene, features = _many_spheres_scene(tmp_path, n=40)
    kw = dict(width=8, height=6, n_samples=1, max_depth=4, sqrt_spp=1)

    from raytrace2_tpu.ops.pallas import megakernel_grad as mkg
    sizes = dict(features)["mega_sizes"]
    assert sizes[0] >= 32, sizes
    assert mkg.grad_supported(tuple(sizes), kw["max_depth"], False)

    def set_leaf(delta):
        return dataclasses.replace(scene, materials=dataclasses.replace(
            scene.materials,
            albedo=scene.materials.albedo.at[0, 1].add(delta)))

    @jax.jit
    def f(delta):
        return jnp.mean(grad_mod.render_image(set_leaf(delta), features, 0,
                                              **kw))

    got = float(jax.grad(f)(0.0))
    eps = 1e-3
    want = float((f(eps) - f(-eps)) / (2 * eps))
    assert np.isfinite(got)
    assert got == pytest.approx(want, rel=2e-2, abs=1e-5), (got, want)


@pytest.mark.slow  # ~20+ min interpret-mode compile (depth-17 replay graph)
def test_ad_matches_fd_beyond_old_gates(tmp_path):
    """>64 records AND depth>16 — the regime the round-2 kernel refused
    (GRAD_MAX_RECORDS/GRAD_MAX_DEPTH): AD must track FD on a continuous
    leaf, through the hierarchy-swept winner search. (Depth 50 is proven
    on the real chip by ``bench.py --grad``; see BASELINE.md.)"""
    scene, features = _many_spheres_scene(tmp_path)
    kw = dict(width=8, height=6, n_samples=1, max_depth=17, sqrt_spp=1)

    from raytrace2_tpu.ops.pallas import megakernel_grad as mkg
    sizes = dict(features)["mega_sizes"]
    assert not (sizes[0] + sizes[1] + sizes[5] + sizes[4] <= 64), sizes
    assert mkg.grad_supported(tuple(sizes), kw["max_depth"], False)

    def set_leaf(delta):
        return dataclasses.replace(scene, materials=dataclasses.replace(
            scene.materials,
            albedo=scene.materials.albedo.at[0, 1].add(delta)))

    @jax.jit
    def f(delta):
        return jnp.mean(grad_mod.render_image(set_leaf(delta), features, 0,
                                              **kw))

    got = float(jax.grad(f)(0.0))
    eps = 1e-3
    want = float((f(eps) - f(-eps)) / (2 * eps))
    assert np.isfinite(got)
    assert got == pytest.approx(want, rel=2e-2, abs=1e-5), (got, want)


def test_grad_media_scene_finite(tmp_path):
    """Medium + box + checker in one scene: every family's resolve path runs
    (sphere/quad/box/medium) and gradients stay finite; the medium's
    density leaf (neg_inv_density chain) gets a nonzero cotangent."""
    j = {
        "background_color": [0.4, 0.45, 0.55],
        "camera": {"fov": 50, "center": [0, 2, 6], "look_at": [0, 0.8, 0]},
        "textures": [
            {"type": "solid_color", "albedo": [0.9, 0.2, 0.2]},
            {"type": "solid_color", "albedo": [0.2, 0.9, 0.2]},
            {"type": "checker", "scale": 2.0, "even_tex_idx": 0,
             "odd_tex_idx": 1},
        ],
        "materials": [
            {"type": "texture", "tex_idx": 2},
            {"type": "lambertian", "albedo": [0.6, 0.6, 0.7]},
        ],
        "primitives": [
            {"type": "quad", "q": [-20, 0, -20], "u": [40, 0, 0],
             "v": [0, 0, 40], "material": 0},
            {"type": "box", "a": [-2.5, 0, -1], "b": [-1.0, 1.2, 0.2],
             "material": 1},
            {"type": "sphere", "center": [1.2, 0.9, 0], "radius": 0.9,
             "material": 0,
             "constant_medium": {"density": 0.8, "albedo": [0.3, 0.5, 0.9]}},
        ],
    }
    scene, features = _make(tmp_path, j, "media.json")
    kw = dict(width=8, height=6, n_samples=1, max_depth=4, sqrt_spp=1)

    def loss(img):
        return jnp.mean(img)

    _, g = grad_mod.value_and_grad_scene(loss, scene, features, 0, **kw)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert np.isfinite(np.asarray(leaf)).all(), f"non-finite at {path}"
    # Albedo gradients are the continuous signal on an all-solid scene
    # (radiance is piecewise-constant in geometry under the detached
    # estimator, so e.g. d/d neg_inv_density is exactly zero here — the
    # geometry-gradient FD checks live in the noise-scene tests).
    assert float(jnp.abs(jnp.asarray(g.materials.albedo)).max()) > 0.0
