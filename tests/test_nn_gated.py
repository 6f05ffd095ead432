import numpy as np
import jax.numpy as jnp

from slam_sensor_fusion_tpu.ops import cloud as cl
from slam_sensor_fusion_tpu.ops.morton import sort_by_morton, morton_codes
from slam_sensor_fusion_tpu.ops.nn import nearest_neighbor
from slam_sensor_fusion_tpu.ops.nn_gated import gated_nn


def sorted_cloud(pts, capacity):
    return sort_by_morton(cl.from_numpy(pts, capacity))


def test_morton_sort_groups_near_points(rng):
    pts = rng.uniform(-10, 10, (1000, 3)).astype(np.float32)
    c = sorted_cloud(pts, 1024)
    got = cl.to_numpy(c)
    assert got.shape == (1000, 3)
    # same point set
    np.testing.assert_allclose(
        got[np.lexsort(got.T)], pts[np.lexsort(pts.T)], atol=0
    )
    # spatial coherence: mean distance between sorted neighbours far below
    # random-order baseline
    d_sorted = np.linalg.norm(np.diff(got, axis=0), axis=1).mean()
    d_rand = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
    assert d_sorted < d_rand * 0.4


def test_morton_invalid_points_sort_last(rng):
    pts = rng.uniform(0, 1, (10, 3)).astype(np.float32)
    c = cl.Cloud(jnp.asarray(pts), jnp.asarray([True, False] * 5))
    codes = morton_codes(c.points, c.mask, jnp.zeros(3), jnp.ones(3))
    assert (np.asarray(codes)[1::2] > (1 << 30)).all()


def _check_gated_vs_dense(rng, n_src, n_tgt, cap_src, cap_tgt, radius2, **kw):
    src = rng.uniform(-10, 10, (n_src, 3)).astype(np.float32)
    tgt = rng.uniform(-10, 10, (n_tgt, 3)).astype(np.float32)
    cs = sorted_cloud(src, cap_src)
    ct = sorted_cloud(tgt, cap_tgt)
    center = jnp.zeros(3)
    dense_d2, dense_idx = nearest_neighbor(
        cs.points, cs.mask, ct.points, ct.mask, center
    )
    res = gated_nn(
        cs.points, cs.mask, ct.points, ct.mask, center, radius2, **kw
    )
    assert not bool(res.visit_overflow)
    dense_d2 = np.asarray(dense_d2)
    in_gate = (dense_d2 < radius2) & np.asarray(cs.mask)
    # exactness inside the gate
    np.testing.assert_allclose(
        np.asarray(res.d2)[in_gate], dense_d2[in_gate], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(res.idx)[in_gate], np.asarray(dense_idx)[in_gate]
    )
    # no false admissions outside the gate
    out_gate = (dense_d2 >= radius2) & np.asarray(cs.mask)
    assert (np.asarray(res.d2)[out_gate] >= radius2 - 1e-5).all()


def test_gated_matches_dense_dense_cloud(rng):
    _check_gated_vs_dense(
        rng, 2000, 4000, 2048, 4096, 0.5, tile_src=256, tile_tgt=256, max_visits=32
    )


def test_gated_matches_dense_loose_radius(rng):
    _check_gated_vs_dense(
        rng, 1000, 2000, 1024, 2048, 5.0, tile_src=128, tile_tgt=256, max_visits=64
    )


def test_gated_handles_partial_masks(rng):
    src = rng.uniform(-5, 5, (700, 3)).astype(np.float32)
    tgt = rng.uniform(-5, 5, (1500, 3)).astype(np.float32)
    cs = sorted_cloud(src, 1024)
    ct = sorted_cloud(tgt, 2048)
    center = jnp.zeros(3)
    res = gated_nn(
        cs.points, cs.mask, ct.points, ct.mask, center, 0.5,
        tile_src=128, tile_tgt=256, max_visits=32,
    )
    dense_d2, dense_idx = nearest_neighbor(cs.points, cs.mask, ct.points, ct.mask, center)
    in_gate = (np.asarray(dense_d2) < 0.5) & np.asarray(cs.mask)
    np.testing.assert_array_equal(
        np.asarray(res.idx)[in_gate], np.asarray(dense_idx)[in_gate]
    )
    # matched neighbours are always valid target points
    assert np.asarray(ct.mask)[np.asarray(res.idx)[in_gate]].all()


def test_gated_empty_target(rng):
    src = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    cs = sorted_cloud(src, 128)
    ct = cl.Cloud(jnp.zeros((256, 3)), jnp.zeros((256,), bool))
    res = gated_nn(cs.points, cs.mask, ct.points, ct.mask, jnp.zeros(3), 0.5,
                   tile_src=128, tile_tgt=256, max_visits=8)
    assert (np.asarray(res.d2) > 1e30).all()


def test_visit_overflow_flag_fires_when_forced(rng):
    """Silent-truncation observability (ops/nn_gated.py build_visit_lists):
    a deliberately tiny max_visits on a wide gate MUST raise the flag —
    and exactness inside the gate is then no longer guaranteed."""
    src = rng.uniform(-10, 10, (2048, 3)).astype(np.float32)
    tgt = rng.uniform(-10, 10, (8192, 3)).astype(np.float32)
    cs = sorted_cloud(src, 2048)
    ct = sorted_cloud(tgt, 8192)
    # huge radius -> every source tile admits (almost) every target tile;
    # max_visits=1 cannot hold them
    res = gated_nn(
        cs.points, cs.mask, ct.points, ct.mask, jnp.zeros(3), 400.0,
        tile_src=256, tile_tgt=512, max_visits=1,
    )
    assert bool(res.visit_overflow)
    # ample budget on the same inputs -> flag clears
    res_ok = gated_nn(
        cs.points, cs.mask, ct.points, ct.mask, jnp.zeros(3), 400.0,
        tile_src=256, tile_tgt=512, max_visits=16,
    )
    assert not bool(res_ok.visit_overflow)
