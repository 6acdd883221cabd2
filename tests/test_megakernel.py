"""Megakernel correctness (interpret mode on CPU): statistical agreement
with the XLA integrator. The kernel's hardware-PRNG stream differs from the
XLA path's threefry, so agreement is in expectation (means over many
samples), plus exact agreement of the deterministic furnace scenes."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace2_tpu.scene import loader, schema
from raytrace2_tpu.ops import integrator

pytestmark = pytest.mark.kernel  # interpret-mode Pallas: minutes each on CPU


def _render(scene, features, w, h, spp, depth, mega):
    feat = dict(features)
    feat["use_megakernel"] = mega
    if mega:
        feat["mega_interpret"] = True
    dev = schema.to_device(scene)

    @jax.jit
    def go(dev):
        acc = jnp.zeros((h, w, 3))
        for s in range(spp):
            acc = acc + integrator.render_sample(
                dev, feat, w, h, jnp.int32(s), 0, depth, max(int(np.sqrt(spp)), 1)
            )
        return acc / spp

    return np.asarray(go(dev))


def _scene(tmp_path, j, name="m.json"):
    p = tmp_path / name
    p.write_text(json.dumps(j))
    scene, _ = loader.load_scene(str(p))
    return scene, scene.features()


def test_emissive_enclosure_exact(tmp_path):
    """Deterministic furnace: identical for both backends regardless of RNG."""
    scene, feat = _scene(tmp_path, {
        "background_color": [0, 0, 0],
        "camera": {"fov": 90, "center": [0, 0, 0], "look_at": [0, 0, -1]},
        "materials": [{"type": "diffuse_light", "albedo": [2.0, 3.0, 4.0]}],
        "primitives": [{"type": "sphere", "center": [0, 0, 0], "radius": 10.0, "material": 0}],
    })
    img = _render(scene, feat, 8, 8, 2, 4, mega=True)
    np.testing.assert_allclose(img, np.broadcast_to([2, 3, 4], img.shape), rtol=1e-5)


def test_lambertian_plane_exact(tmp_path):
    """Floor-under-sky: albedo*bg exactly, any scatter direction."""
    scene, feat = _scene(tmp_path, {
        "background_color": [1.0, 0.8, 0.6],
        "camera": {"fov": 40, "center": [0, 5, 0], "look_at": [0, 0, -10]},
        "materials": [{"type": "lambertian", "albedo": [0.3, 0.5, 0.7]}],
        "primitives": [
            {"type": "quad", "q": [-1000, 0, -1000], "u": [2000, 0, 0],
             "v": [0, 0, 2000], "material": 0}
        ],
    })
    img = _render(scene, feat, 8, 8, 2, 4, mega=True)
    np.testing.assert_allclose(
        img, np.broadcast_to(np.array([0.3, 0.5, 0.7]) * [1.0, 0.8, 0.6], img.shape),
        rtol=1e-4,
    )


@pytest.mark.slow
def test_cornell_statistical_agreement(data_dir):
    scene, _ = loader.load_scene(f"{data_dir}/cornell_box_original.json")
    feat = scene.features()
    a = _render(scene, feat, 32, 32, 16, 12, mega=False)
    b = _render(scene, feat, 32, 32, 16, 12, mega=True)
    # Same expectation, independent RNG: compare 4x4-downsampled means.
    from raytrace2_tpu.io import compare

    da = compare.downsample(a, 8)
    db = compare.downsample(b, 8)
    np.testing.assert_allclose(da.mean(), db.mean(), rtol=0.12)
    np.testing.assert_allclose(da, db, atol=0.25)


@pytest.mark.parametrize("n_tiles,ratio", [(2, 4), (3, 2)])
def test_phased_equals_single_pass(data_dir, n_tiles, ratio):
    """Cross-tile compaction must not change results: per-ray RNG streams
    are keyed by stable ray ids, so phased == single-pass bitwise. The
    (2, 4) case compacts 2 tiles into 1; (3, 2) is the survivor-overflow
    regression — 3 tiles x 2048 survivors = 6144 needs a 2-tile next buffer
    (a floor-based cap sized it at 1 tile and silently dropped live rays)."""
    import jax.numpy as jnp
    from raytrace2_tpu.ops.pallas import megakernel as mk
    from raytrace2_tpu.ops import camera as cam_ops, rng

    scene, _ = loader.load_scene(f"{data_dir}/cornell_box_original.json")
    feat = scene.features()
    dev = schema.to_device(scene)
    n = n_tiles * mk.TILE_R
    w, h = 128, n // 128
    keys = jax.vmap(lambda p: rng.pixel_sample_key(0, p, 0))(
        jnp.arange(n, dtype=jnp.int32)
    )
    o, d, t = cam_ops.generate_rays(dev.camera, w, h, jnp.int32(0), 1, keys)
    sizes = tuple(feat["mega_sizes"])
    tables = mk.pack_tables(dev, sizes)
    kw = dict(max_depth=20, has_checker=False, sizes=sizes, interpret=True)

    single = mk.trace_megakernel(o, d, t, 7, tables, dev.background,
                                 phases=1, **kw)
    phased = mk.trace_megakernel(o, d, t, 7, tables, dev.background,
                                 phases=3, compaction_ratio=ratio, **kw)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(phased))


@pytest.mark.slow
def test_cornell_volume_media_statistical(data_dir):
    """Constant-media support in-kernel vs the XLA path (cornell volume)."""
    scene, _ = loader.load_scene(f"{data_dir}/cornell_box_volume.json")
    feat = scene.features()
    a = _render(scene, feat, 24, 24, 12, 10, mega=False)
    b = _render(scene, feat, 24, 24, 12, 10, mega=True)
    from raytrace2_tpu.io import compare

    da = compare.downsample(a, 6)
    db = compare.downsample(b, 6)
    np.testing.assert_allclose(da.mean(), db.mean(), rtol=0.1)
    np.testing.assert_allclose(da, db, atol=0.25)


@pytest.mark.slow
def test_mixed_materials_statistical(tmp_path):
    """Metal + dielectric + checker floor + light: exercise every kernel
    branch and compare means against the XLA path."""
    scene, feat = _scene(tmp_path, {
        "background_color": [0.6, 0.7, 0.9],
        "textures": [
            {"type": "solid_color", "albedo": [0.9, 0.9, 0.9]},
            {"type": "solid_color", "albedo": [0.2, 0.3, 0.1]},
            {"type": "checker", "scale": 2.0, "even_tex_idx": 0, "odd_tex_idx": 1},
        ],
        "materials": [
            {"type": "texture", "tex_idx": 2},
            {"type": "metal", "albedo": [0.8, 0.8, 0.9], "fuzz": 0.1},
            {"type": "dielectric", "refraction_index": 1.5},
            {"type": "diffuse_light", "albedo": [4, 4, 4]},
        ],
        "primitives": [
            {"type": "quad", "q": [-50, 0, -50], "u": [100, 0, 0], "v": [0, 0, 100], "material": 0},
            {"type": "sphere", "center": [-1.2, 1, 0], "radius": 1.0, "material": 1},
            {"type": "sphere", "center": [1.2, 1, 0], "radius": 1.0, "material": 2},
            {"type": "quad", "q": [-1, 4, -1], "u": [2, 0, 0], "v": [0, 0, 2], "material": 3},
        ],
        "camera": {"fov": 50, "center": [0, 2, 6], "look_at": [0, 1, 0]},
    })
    a = _render(scene, feat, 24, 24, 16, 10, mega=False)
    b = _render(scene, feat, 24, 24, 16, 10, mega=True)
    from raytrace2_tpu.io import compare

    da = compare.downsample(a, 6)
    db = compare.downsample(b, 6)
    np.testing.assert_allclose(da.mean(), db.mean(), rtol=0.1)
    np.testing.assert_allclose(da, db, atol=0.22)
