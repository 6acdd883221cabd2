"""v4 path-regeneration batch kernel (interpret mode): exactness on
deterministic scenes and statistical agreement with the per-sample paths."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace2_tpu.scene import loader, schema
from raytrace2_tpu.ops import integrator

pytestmark = pytest.mark.kernel  # interpret-mode Pallas: minutes each on CPU


def _render_batch(scene, features, w, h, spp, depth, mega):
    feat = dict(features)
    feat["use_megakernel"] = mega
    if mega:
        feat["mega_interpret"] = True
    dev = schema.to_device(scene)

    @jax.jit
    def go(dev):
        return integrator.render_progressive(
            dev, feat, w, h, jnp.int32(0), jnp.int32(spp), 0, depth,
            max(int(np.sqrt(spp)), 1),
        ) / spp

    return np.asarray(go(dev))


def _scene(tmp_path, j):
    p = tmp_path / "v4.json"
    p.write_text(json.dumps(j))
    scene, _ = loader.load_scene(str(p))
    return scene, scene.features()


def test_emissive_enclosure_exact(tmp_path):
    scene, feat = _scene(tmp_path, {
        "background_color": [0, 0, 0],
        "camera": {"fov": 90, "center": [0, 0, 0], "look_at": [0, 0, -1]},
        "materials": [{"type": "diffuse_light", "albedo": [2.0, 3.0, 4.0]}],
        "primitives": [{"type": "sphere", "center": [0, 0, 0], "radius": 10.0, "material": 0}],
    })
    img = _render_batch(scene, feat, 8, 8, 3, 4, mega=True)
    np.testing.assert_allclose(img, np.broadcast_to([2, 3, 4], img.shape), rtol=1e-5)


def test_lambertian_plane_exact(tmp_path):
    scene, feat = _scene(tmp_path, {
        "background_color": [1.0, 0.8, 0.6],
        "camera": {"fov": 40, "center": [0, 5, 0], "look_at": [0, 0, -10]},
        "materials": [{"type": "lambertian", "albedo": [0.3, 0.5, 0.7]}],
        "primitives": [
            {"type": "quad", "q": [-1000, 0, -1000], "u": [2000, 0, 0],
             "v": [0, 0, 2000], "material": 0}
        ],
    })
    img = _render_batch(scene, feat, 8, 8, 3, 4, mega=True)
    np.testing.assert_allclose(
        img, np.broadcast_to(np.array([0.3, 0.5, 0.7]) * [1.0, 0.8, 0.6], img.shape),
        rtol=1e-4,
    )


@pytest.mark.slow
def test_cornell_statistical_agreement(data_dir):
    scene, _ = loader.load_scene(f"{data_dir}/cornell_box_original.json")
    feat = scene.features()
    a = _render_batch(scene, feat, 32, 32, 16, 12, mega=False)  # XLA path
    b = _render_batch(scene, feat, 32, 32, 16, 12, mega=True)   # v4
    from raytrace2_tpu.io import compare

    da = compare.downsample(a, 8)
    db = compare.downsample(b, 8)
    np.testing.assert_allclose(da.mean(), db.mean(), rtol=0.12)
    np.testing.assert_allclose(da, db, atol=0.25)


def test_aa_box_family_exact(tmp_path):
    """Axis-aligned boxes go through the kernel's slab sweep; emissive box
    interior must still be exact (every ray hits the box walls)."""
    scene, feat = _scene(tmp_path, {
        "background_color": [0, 0, 0],
        "camera": {"fov": 90, "center": [0, 0, 0], "look_at": [0, 0, -1]},
        "materials": [{"type": "diffuse_light", "albedo": [1.5, 2.5, 3.5]}],
        "primitives": [{"type": "box", "a": [-5, -5, -5], "b": [5, 5, 5], "material": 0}],
    })
    assert int(np.asarray(scene.boxes.active).sum()) == 1
    img = _render_batch(scene, feat, 8, 8, 2, 4, mega=True)
    np.testing.assert_allclose(img, np.broadcast_to([1.5, 2.5, 3.5], img.shape), rtol=1e-5)


@pytest.mark.slow
def test_aa_box_scene_statistical(tmp_path):
    """Boxes + light, kernel slab-sweep vs XLA quad expansion."""
    scene, feat = _scene(tmp_path, {
        "background_color": [0.2, 0.25, 0.35],
        "camera": {"fov": 50, "center": [0, 4, 10], "look_at": [0, 1, 0]},
        "materials": [
            {"type": "lambertian", "albedo": [0.5, 0.7, 0.5]},
            {"type": "metal", "albedo": [0.9, 0.9, 0.9], "fuzz": 0.05},
            {"type": "diffuse_light", "albedo": [6, 6, 6]},
        ],
        "primitives": [
            {"type": "box", "a": [-6, 0, -6], "b": [6, 0.4, 6], "material": 0},
            {"type": "box", "a": [-1.5, 0.4, -1.5], "b": [-0.2, 2.4, -0.3], "material": 0},
            {"type": "box", "a": [0.4, 0.4, -0.8], "b": [1.8, 1.6, 0.6], "material": 1},
            {"type": "quad", "q": [-1, 5, -1], "u": [2, 0, 0], "v": [0, 0, 2], "material": 2},
        ],
    })
    assert int(np.asarray(scene.boxes.active).sum()) == 3
    a = _render_batch(scene, feat, 24, 24, 12, 10, mega=False)
    b = _render_batch(scene, feat, 24, 24, 12, 10, mega=True)
    from raytrace2_tpu.io import compare

    da = compare.downsample(a, 6)
    db = compare.downsample(b, 6)
    np.testing.assert_allclose(da.mean(), db.mean(), rtol=0.1)
    np.testing.assert_allclose(da, db, atol=0.22)


@pytest.mark.slow
def test_sphere_cluster_sweep_statistical(tmp_path):
    """≥128 spheres trigger the Morton-clustered skip sweep; results must
    match the XLA path statistically."""
    rs = np.random.RandomState(5)
    prims = [
        {"type": "sphere",
         "center": [float(x) for x in rs.uniform(-6, 6, 3)],
         "radius": float(rs.uniform(0.2, 0.6)), "material": 0}
        for _ in range(150)
    ]
    prims.append({"type": "quad", "q": [-2, 8, -2], "u": [4, 0, 0],
                  "v": [0, 0, 4], "material": 1})
    scene, feat = _scene(tmp_path, {
        "background_color": [0.15, 0.18, 0.25],
        "camera": {"fov": 55, "center": [0, 2, 16], "look_at": [0, 0, 0]},
        "materials": [
            {"type": "lambertian", "albedo": [0.6, 0.5, 0.4]},
            {"type": "diffuse_light", "albedo": [5, 5, 5]},
        ],
        "primitives": prims,
    })
    assert int(np.asarray(scene.spheres.active).sum()) == 150
    a = _render_batch(scene, feat, 16, 16, 8, 8, mega=False)
    b = _render_batch(scene, feat, 16, 16, 8, 8, mega=True)
    from raytrace2_tpu.io import compare

    da = compare.downsample(a, 4)
    db = compare.downsample(b, 4)
    np.testing.assert_allclose(da.mean(), db.mean(), rtol=0.1)
    np.testing.assert_allclose(da, db, atol=0.25)


@pytest.mark.slow
def test_perlin_scene_statistical(data_dir):
    """In-kernel hash-gradient Perlin vs the XLA table-based Perlin: the
    gradient SETS differ (the reference reseeds its tables from
    random_device every run, so any gradient set is faithful) but the noise
    class and scale are the same — image statistics must agree."""
    scene, _ = loader.load_scene(f"{data_dir}/perlin_spheres.json")
    feat = scene.features()
    a = _render_batch(scene, feat, 32, 32, 8, 8, mega=False)
    b = _render_batch(scene, feat, 32, 32, 8, 8, mega=True)
    # Marble textures average to ~0.5·albedo over the surface; means and
    # coarse structure agree even though the marble veins differ.
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.15)
    from raytrace2_tpu.io import compare

    np.testing.assert_allclose(
        compare.downsample(a, 16).mean((0, 1)),
        compare.downsample(b, 16).mean((0, 1)),
        rtol=0.2,
    )


@pytest.mark.parametrize("seed", [0, 16, 17, 42, 123, 2**28 + 7])
def test_sample_keys_distinct_above_seed_16(seed):
    """Regression: the old f32 derivation of seed*1000003+s collapsed keys
    above 2^24 (seed >= 17), silently duplicating progressive samples. Every
    (seed, sample) pair must get its own key now."""
    from raytrace2_tpu.ops.pallas import megakernel as mk

    samples = jnp.arange(256)
    keys = np.asarray(jax.jit(jax.vmap(
        lambda s: mk.v4_sample_key(seed, jnp.uint32(12345), s)
    ))(samples))
    assert len(np.unique(keys)) == 256, f"seed {seed}: collapsed sample keys"
    # And distinct across seeds for the same sample.
    seeds = jnp.arange(64) + seed
    keys2 = np.asarray(jax.jit(jax.vmap(
        lambda sd: mk.v4_sample_key(sd, jnp.uint32(12345), 3)
    ))(seeds))
    assert len(np.unique(keys2)) == 64


def test_high_seed_samples_not_duplicated(tmp_path):
    """End-to-end form of the regression: at seed 123 the variance of the
    4-sample mean must be ~1/4 of the 1-sample variance (duplicated samples
    would keep it flat). Uses a scene where each sample's radiance is a
    fresh random draw (diffuse plane under a varying background)."""
    scene, feat = _scene(tmp_path, {
        "background_color": [1.0, 1.0, 1.0],
        "camera": {"fov": 60, "center": [0, 2, 4], "look_at": [0, 0, 0]},
        "materials": [{"type": "metal", "albedo": [0.9, 0.9, 0.9], "fuzz": 0.9}],
        "primitives": [
            {"type": "sphere", "center": [0, 0, 0], "radius": 1.5, "material": 0}
        ],
    })
    feat = dict(feat, use_megakernel=True, mega_interpret=True)
    dev = schema.to_device(scene)

    @jax.jit
    def go(dev, s0, n):
        return integrator.render_progressive(
            dev, feat, 8, 8, s0, n, 123, 6, 1
        )

    singles = np.stack([np.asarray(go(dev, jnp.int32(s), jnp.int32(1)))
                        for s in range(8)])
    assert not np.allclose(singles[0], singles[1]), "samples duplicated"
    # All 8 single-sample renders pairwise distinct.
    flat = singles.reshape(8, -1)
    for i in range(8):
        for j in range(i + 1, 8):
            assert not np.allclose(flat[i], flat[j]), (i, j)


def test_batch_split_invariance(data_dir):
    """Rendering samples [0,4) in one batch must equal two batches [0,2)+[2,4)
    (streams are pure functions of (pixel, sample))."""
    scene, _ = loader.load_scene(f"{data_dir}/cornell_box_original.json")
    feat = dict(scene.features(), use_megakernel=True, mega_interpret=True)
    dev = schema.to_device(scene)
    w = h = 16

    @jax.jit
    def go(dev, s0, n):
        return integrator.render_progressive(
            dev, feat, w, h, s0, n, 0, 6, 2
        )

    whole = np.asarray(go(dev, jnp.int32(0), jnp.int32(4)))
    split = np.asarray(go(dev, jnp.int32(0), jnp.int32(2))) + np.asarray(
        go(dev, jnp.int32(2), jnp.int32(2))
    )
    np.testing.assert_allclose(whole, split, rtol=1e-5, atol=1e-5)


def test_two_level_hierarchy_large_scene(tmp_path):
    """~520 spheres + ~320 AA boxes: exercises BOTH families' two-level
    supercluster walk (4+ superclusters each), the direction-ordered visit,
    and the block-tiled lane mapping, against the dense XLA sweep."""
    rs = np.random.RandomState(17)
    prims = []
    for _ in range(520):
        prims.append({"type": "sphere",
                      "center": [float(x) for x in rs.uniform(-10, 10, 3)],
                      "radius": float(rs.uniform(0.2, 0.5)), "material": 0})
    for _ in range(320):
        c = rs.uniform(-10, 10, 3)
        e = rs.uniform(0.2, 0.8, 3)
        prims.append({"type": "box",
                      "min_point": [float(x) for x in c - e],
                      "max_point": [float(x) for x in c + e], "material": 0})
    prims.append({"type": "quad", "q": [-3, 13, -3], "u": [6, 0, 0],
                  "v": [0, 0, 6], "material": 1})
    scene, feat = _scene(tmp_path, {
        "background_color": [0.1, 0.12, 0.2],
        "camera": {"fov": 60, "center": [0, 3, 26], "look_at": [0, 0, 0]},
        "materials": [
            {"type": "lambertian", "albedo": [0.6, 0.5, 0.4]},
            {"type": "diffuse_light", "albedo": [6, 6, 6]},
        ],
        "primitives": prims,
    })
    assert int(np.asarray(scene.spheres.active).sum()) == 520
    a = _render_batch(scene, feat, 16, 16, 8, 6, mega=False)
    b = _render_batch(scene, feat, 16, 16, 8, 6, mega=True)
    from raytrace2_tpu.io import compare

    da = compare.downsample(a, 4)
    db = compare.downsample(b, 4)
    np.testing.assert_allclose(da.mean(), db.mean(), rtol=0.1)
    np.testing.assert_allclose(da, db, atol=0.25)


def test_mat_gather_resolve_bitwise(data_dir, tmp_path):
    """Gather-based material/texture resolve (mtab; book1-class tables) is
    an exact-copy lookup — bitwise equal to the masked-sweep resolve, on
    both the v4 and wavefront kernels."""
    import json

    import numpy as np

    rs = np.random.RandomState(3)
    prims, mats = [], []
    for i in range(70):  # 70 materials > MAT_GATHER_MIN when forced on
        mats.append({"type": "lambertian",
                     "albedo": [float(x) for x in rs.uniform(0.2, 0.9, 3)]})
        prims.append({"type": "sphere",
                      "center": [float(rs.uniform(-4, 4)),
                                 float(rs.uniform(0.2, 1.0)),
                                 float(rs.uniform(-4, 4))],
                      "radius": 0.3, "material": i})
    j = {"background_color": [0.6, 0.7, 0.9],
         "camera": {"fov": 60, "center": [0, 2, 8], "look_at": [0, 0.5, 0]},
         "materials": mats, "primitives": prims}
    p = tmp_path / "many_mats.json"
    p.write_text(json.dumps(j))
    scene_host, _ = loader.load_scene(str(p))
    scene = schema.to_device(scene_host)

    def render(**kw):
        feat = dict(scene_host.features(), use_megakernel=True,
                    mega_interpret=True, **kw)
        r = integrator.render_progressive(
            scene, feat, 24, 16, jnp.int32(0), jnp.int32(2), 0, 4, 1)
        return np.asarray(r)

    for wf in (False, True):
        a = render(mega_mat_gather=False, mega_wavefront=wf)
        b = render(mega_mat_gather=True, mega_wavefront=wf)
        np.testing.assert_array_equal(a, b)


def test_nested_checker_cross_backend(tmp_path):
    """Depth-2 checker scene on matched murmur RNG streams: the kernel's
    per-level parity/re-resolve loop must agree with the XLA texture
    recursion (same paths, so only f32 rounding differs)."""
    j = {
        "background_color": [1, 1, 1],
        "camera": {"fov": 50, "center": [0, 6, 5], "look_at": [0, 0, 0]},
        "textures": [
            {"type": "solid_color", "albedo": [0.9, 0.1, 0.1]},
            {"type": "solid_color", "albedo": [0.1, 0.1, 0.9]},
            {"type": "checker", "scale": 0.7, "even_tex_idx": 0,
             "odd_tex_idx": 1},
            {"type": "checker", "scale": 2.9, "even_tex_idx": 2,
             "odd_tex_idx": 1},
        ],
        "materials": [{"type": "texture", "tex_idx": 3}],
        "primitives": [{"type": "quad", "q": [-20, 0.37, -20], "u": [40, 0, 0],
                        "v": [0, 0, 40], "material": 0}],
    }
    p = tmp_path / "nested.json"
    p.write_text(json.dumps(j))
    scene_host, _ = loader.load_scene(str(p))
    assert int(scene_host.features()["has_checker"]) == 2
    scene = schema.to_device(scene_host)

    def run(**kw):
        feat = dict(scene_host.features(), **kw)
        return np.asarray(integrator.render_progressive(
            scene, feat, 24, 16, jnp.int32(0), jnp.int32(2), 0, 4, 1)) / 2

    im_m = run(use_megakernel=True, mega_interpret=True)
    im_x = run(use_megakernel=False, rng_impl="murmur")
    assert abs(im_m.mean() - im_x.mean()) < 1e-3
    np.testing.assert_allclose(im_m, im_x, rtol=1e-3, atol=1e-3)


def test_mat_gather_with_table_noise_bitwise(tmp_path):
    """ntab AND mtab ride the same positional VMEM-operand tail — a scene
    with table-mode noise AND a gather-resolved material table must render
    identically to the sweep resolve, on both kernels."""
    rs = np.random.RandomState(5)
    mats = [{"type": "texture", "tex_idx": 0}]
    prims = [{"type": "sphere", "center": [0, 1.0, 0], "radius": 1.0,
              "material": 0}]
    for i in range(70):
        mats.append({"type": "lambertian",
                     "albedo": [float(x) for x in rs.uniform(0.2, 0.9, 3)]})
        prims.append({"type": "sphere",
                      "center": [float(rs.uniform(-4, 4)), 0.3,
                                 float(rs.uniform(-4, 4))],
                      "radius": 0.3, "material": i + 1})
    j = {"background_color": [0.7, 0.8, 0.9],
         "camera": {"fov": 60, "center": [0, 2, 8], "look_at": [0, 0.5, 0]},
         "textures": [{"type": "noise", "albedo": [0.8, 0.7, 0.6],
                       "scale": 1.5, "noise_type": 1}],
         "materials": mats, "primitives": prims}
    p = tmp_path / "noise_mats.json"
    p.write_text(json.dumps(j))
    scene_host, _ = loader.load_scene(str(p))
    scene = schema.to_device(scene_host)

    def render(**kw):
        feat = dict(scene_host.features(), use_megakernel=True,
                    mega_interpret=True, noise_impl="table", **kw)
        r = integrator.render_progressive(
            scene, feat, 24, 16, jnp.int32(0), jnp.int32(1), 0, 3, 1)
        return np.asarray(r)

    for wf in (False, True):
        a = render(mega_mat_gather=False, mega_wavefront=wf)
        b = render(mega_mat_gather=True, mega_wavefront=wf)
        np.testing.assert_array_equal(a, b)
