import numpy as np
import jax.numpy as jnp

from slam_sensor_fusion_tpu.ops.nn import nearest_neighbor, min_dist_to_set
from oracles import nn_oracle


def padded(pts, capacity):
    buf = np.zeros((capacity, 3), np.float32)
    buf[: len(pts)] = pts
    mask = np.zeros(capacity, bool)
    mask[: len(pts)] = True
    return jnp.asarray(buf), jnp.asarray(mask)


def test_nn_matches_oracle(rng):
    src = rng.uniform(-10, 10, size=(333, 3)).astype(np.float32)
    tgt = rng.uniform(-10, 10, size=(777, 3)).astype(np.float32)
    s, sm = padded(src, 512)
    t, tm = padded(tgt, 1024)
    d2, idx = nearest_neighbor(s, sm, t, tm, chunk=256)
    d2_ref, idx_ref = nn_oracle(src, tgt)
    np.testing.assert_array_equal(np.asarray(idx)[:333], idx_ref)
    np.testing.assert_allclose(np.asarray(d2)[:333], d2_ref, rtol=1e-4, atol=1e-5)


def test_nn_ignores_masked_targets(rng):
    src = np.zeros((1, 3), np.float32)
    tgt = np.array([[0.1, 0, 0], [5, 0, 0]], np.float32)
    t, tm = padded(tgt, 8)
    s, sm = padded(src, 8)
    # mask out the close target; NN must pick the far one
    tm = tm.at[0].set(False)
    d2, idx = nearest_neighbor(s, sm, t, tm)
    assert int(idx[0]) == 1
    np.testing.assert_allclose(float(d2[0]), 25.0, rtol=1e-5)


def test_nn_all_targets_masked(rng):
    s, sm = padded(np.zeros((4, 3), np.float32), 8)
    t, tm = padded(np.zeros((4, 3), np.float32), 8)
    tm = jnp.zeros_like(tm)
    d2, _ = nearest_neighbor(s, sm, t, tm)
    assert np.all(np.asarray(d2) > 1e30)


def test_nn_rebase_improves_conditioning(rng):
    # large coordinates: without rebase f32 cancellation breaks ties
    base = np.array([10000.0, 20000.0, 30.0], np.float32)
    src = (rng.uniform(-5, 5, size=(64, 3)) + base).astype(np.float32)
    tgt = (rng.uniform(-5, 5, size=(256, 3)) + base).astype(np.float32)
    s, sm = padded(src, 64)
    t, tm = padded(tgt, 256)
    d2, idx = nearest_neighbor(s, sm, t, tm, center=jnp.asarray(base))
    d2_ref, idx_ref = nn_oracle(src.astype(np.float64), tgt.astype(np.float64))
    np.testing.assert_array_equal(np.asarray(idx), idx_ref)
    np.testing.assert_allclose(np.asarray(d2), d2_ref, rtol=1e-3, atol=1e-4)


def test_min_dist_matches_nn(rng):
    src = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    s, sm = padded(src, 128)
    t, tm = padded(tgt, 256)
    d2a, _ = nearest_neighbor(s, sm, t, tm)
    d2b = min_dist_to_set(s, sm, t, tm)
    np.testing.assert_allclose(np.asarray(d2a), np.asarray(d2b))


def test_nn_nonmultiple_chunk(rng):
    src = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, size=(130, 3)).astype(np.float32)
    s, sm = padded(src, 64)
    t, tm = padded(tgt, 130)  # capacity not a multiple of chunk
    d2, idx = nearest_neighbor(s, sm, t, tm, chunk=64)
    d2_ref, idx_ref = nn_oracle(src, tgt)
    np.testing.assert_array_equal(np.asarray(idx)[:50], idx_ref)
