"""Sorted-wavefront kernel (ops/pallas/wavefront_sorted.py) — the big-scene
production path. Its contract: per-lane arithmetic identical to the v4
megakernel, so renders are BITWISE equal for any (sort_every, k_bounces);
only the tile membership (and therefore throughput) changes.

Reference semantics being preserved: the progressive accumulation loop of
RayTracer.cpp:55-70 with per-(pixel, sample) deterministic streams.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytrace2_tpu.ops import integrator
from raytrace2_tpu.scene import loader, schema

pytestmark = pytest.mark.kernel  # interpret-mode Pallas: minutes each on CPU


def _render(scene_host, scene, w, h, spp, depth, **kw):
    feat = dict(scene_host.features(), use_megakernel=True,
                mega_interpret=True, **kw)
    r = integrator.render_progressive(
        scene, feat, w, h, jnp.int32(0), jnp.int32(spp), 0, depth, 1)
    return np.asarray(r)


V4_KW = dict(mega_wavefront=False, mega_linear=True, mega_sublanes=8,
             mega_wave_frac=1.0)


@pytest.mark.parametrize("k_bounces,sort_every", [(1, 1), (4, 1), (16, 2)])
def test_wavefront_bitwise_equals_v4_cornell(data_dir, k_bounces, sort_every):
    scene_host, _ = loader.load_scene(f"{data_dir}/cornell_box_original.json")
    scene = schema.to_device(scene_host)
    a = _render(scene_host, scene, 24, 16, 2, 6, **V4_KW)
    b = _render(scene_host, scene, 24, 16, 2, 6, mega_wavefront=True,
                mega_k_bounces=k_bounces, mega_sort_every=sort_every)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("tail_k,tail_frac,compact",
                         [(4, 0.5, False), (16, 0.9, False),
                          (16, 0.5, True)])
def test_wavefront_two_phase_bitwise(data_dir, tail_k, tail_frac, compact):
    """The two-phase schedule (K=1 coherent waves, then tail_k straggler
    launches once the runnable population drops below tail_frac) is pure
    scheduling — bitwise equal to v4 for any switch point, with or
    without the gated tail-buffer compaction."""
    scene_host, _ = loader.load_scene(f"{data_dir}/cornell_box_original.json")
    scene = schema.to_device(scene_host)
    a = _render(scene_host, scene, 24, 16, 2, 6, **V4_KW)
    b = _render(scene_host, scene, 24, 16, 2, 6, mega_wavefront=True,
                mega_k_bounces=1, mega_tail_k=tail_k,
                mega_tail_frac=tail_frac, mega_tail_compact=compact)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("key_mode", ["pos8", "depth"])
def test_wavefront_key_modes_bitwise(data_dir, key_mode):
    """Every sort-key mode is a pure permutation — images stay bitwise
    equal to v4 (only throughput may differ on-chip)."""
    scene_host, _ = loader.load_scene(f"{data_dir}/cornell_box_original.json")
    scene = schema.to_device(scene_host)
    a = _render(scene_host, scene, 24, 16, 2, 6, **V4_KW)
    b = _render(scene_host, scene, 24, 16, 2, 6, mega_wavefront=True,
                mega_sort_key=key_mode)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("sublanes", [1, 2, 4])
def test_wavefront_sublanes_bitwise(data_dir, sublanes):
    """Tile height is pure scheduling: smaller tiles sharpen the per-tile
    cluster skip (fewer lanes must agree) but never change the image."""
    scene_host, _ = loader.load_scene(f"{data_dir}/cornell_box_original.json")
    scene = schema.to_device(scene_host)
    a = _render(scene_host, scene, 24, 16, 2, 6, **V4_KW)
    b = _render(scene_host, scene, 24, 16, 2, 6, mega_wavefront=True,
                mega_sublanes=sublanes)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("kw", [
    dict(mega_state_packed=True),
    dict(mega_state_packed=True, mega_k_bounces=1, mega_tail_k=16,
         mega_tail_frac=0.5, mega_tail_compact=True),
    dict(mega_sort_impl="gather_unstable"),
])
def test_wavefront_layout_knobs_bitwise(data_dir, kw):
    """The measured-neutral A/B knobs — packed [17, rows, 128] state
    operand (mega_state_packed) and tiebreak-free argsort
    (mega_sort_impl=gather_unstable) — are pure layout/permutation
    choices: bitwise equal to the production wavefront config."""
    scene_host, _ = loader.load_scene(f"{data_dir}/cornell_box_original.json")
    scene = schema.to_device(scene_host)
    a = _render(scene_host, scene, 24, 16, 2, 6, mega_wavefront=True)
    b = _render(scene_host, scene, 24, 16, 2, 6, mega_wavefront=True, **kw)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_wavefront_bitwise_equals_v4_book2(data_dir):
    """Full feature surface: boxes, media, noise, moving sphere, lights."""
    scene_host, _ = loader.load_scene(
        f"{data_dir}/book2_final_scene_10000_samples.json")
    scene = schema.to_device(scene_host)
    a = _render(scene_host, scene, 24, 16, 2, 6, **V4_KW)
    b = _render(scene_host, scene, 24, 16, 2, 6, mega_wavefront=True)
    np.testing.assert_array_equal(a, b)
