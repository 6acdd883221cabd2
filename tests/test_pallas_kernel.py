"""Pallas closest-hit kernel ≡ the XLA formulation (interpret mode on CPU;
the same assertion runs compiled on real TPU via bench/integration)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace2_tpu.scene import loader, schema
from raytrace2_tpu.ops import intersect
from raytrace2_tpu.ops.pallas import intersect_kernel as pk

pytestmark = pytest.mark.kernel  # interpret-mode Pallas: minutes each on CPU


def _rays(n, seed=0, lo=-30, hi=30):
    rs = np.random.RandomState(seed)
    o = rs.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    time = rs.uniform(0, 1, n).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(time)


def _compare(scene, o, d, time):
    n = o.shape[0]
    t_min = jnp.full((n,), 1e-3)
    t_max = jnp.full((n,), intersect.BIG)

    ts_s = intersect._sphere_ts(scene.spheres, o, d, time, t_min, t_max)
    ts_q = intersect._quad_ts(scene.quads, o, d, t_min, t_max)
    want_ts = jnp.concatenate([ts_s, ts_q], axis=1)
    want_t = jnp.min(want_ts, axis=1)
    want_i = jnp.argmin(want_ts, axis=1)
    S = ts_s.shape[1]
    want_code = jnp.where(
        want_t >= pk.BIG, -1,
        jnp.where(want_i < S, want_i, pk.CODE_QUAD + (want_i - S)),
    )

    sph, qd = pk.pack_scene(scene.spheres, scene.quads)
    got_t, got_c = pk.closest_hit_pallas(
        o, d, time, t_min, t_max, sph, qd, interpret=True
    )

    # The kernel computes oc = c - o directly; the XLA path expands the
    # quadratic into matmul-able terms (|c|², o·c, ...). Algebraically equal,
    # different rounding → small relative t differences are expected.
    got_t, want_t, got_c, want_code = map(
        np.asarray, (got_t, want_t, got_c, want_code)
    )
    np.testing.assert_allclose(got_t, want_t, rtol=2e-3, atol=1e-4)
    # Codes agree except where rounding reorders a near-tie between two
    # primitives; require that to be rare and t-consistent.
    mismatch = got_c != want_code
    assert mismatch.mean() < 0.01
    np.testing.assert_allclose(got_t[mismatch], want_t[mismatch], rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("scene_name,lo,hi", [
    ("cornell_box_original.json", 0, 555),
    ("final_render_book_1.json", -10, 10),
    ("checkered_spheres.json", -12, 12),
])
def test_pallas_matches_xla(scene_name, lo, hi, data_dir):
    scene, _ = loader.load_scene(f"{data_dir}/{scene_name}")
    scene = schema.to_device(scene)
    o, d, time = _rays(pk.TILE_R, seed=sum(map(ord, scene_name)) % 1000, lo=lo, hi=hi)
    _compare(scene, o, d, time)


def test_pallas_multi_tile_rays(data_dir):
    scene, _ = loader.load_scene(f"{data_dir}/cornell_box_original.json")
    scene = schema.to_device(scene)
    o, d, time = _rays(3 * pk.TILE_R, seed=7, lo=0, hi=555)
    _compare(scene, o, d, time)
