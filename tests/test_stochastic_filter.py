import numpy as np
import jax.numpy as jnp

from slam_sensor_fusion_tpu.ops import stochastic_filter as sf
from slam_sensor_fusion_tpu.utils.config import StochasticFilterConfig
from oracles import StochasticFilterOracle


def pose(x, y, z, yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    T[:3, 3] = [x, y, z]
    return T


def test_filter_matches_oracle_sequence(rng):
    cfg = StochasticFilterConfig()
    state = sf.init_state(cfg)
    oracle = StochasticFilterOracle()

    # a smooth forward walk with one large outlier jump
    poses = [pose(0.1 * i, 0.02 * i, 0.0, 0.01 * i) for i in range(12)]
    poses[8] = pose(5.0, -3.0, 2.0)  # outlier
    posterior = pose(0, 0, 0)

    for i, p in enumerate(poses):
        state = sf.add_pose(state, jnp.asarray(p), cfg)
        oracle.add(p.astype(np.float64))
        got = np.asarray(sf.apply_gate(state, jnp.asarray(posterior), jnp.asarray(p), cfg))
        want = oracle.apply(posterior.astype(np.float64), p.astype(np.float64))
        np.testing.assert_allclose(got, want, atol=1e-4), i
        # posterior follows the (possibly gated) pose like the node does
        posterior = np.asarray(got, dtype=np.float32)


def test_z_score_zero_until_queue_full():
    cfg = StochasticFilterConfig()
    state = sf.init_state(cfg)
    prev = jnp.asarray(pose(0, 0, 0))
    for i in range(cfg.queue_size - 1):
        state = sf.add_pose(state, jnp.asarray(pose(100.0 * i, 0, 0)), cfg)
        z = sf.pose_z_score(state, prev, jnp.asarray(pose(999, 0, 0)), cfg)
        assert float(z) == 0.0


def test_outlier_is_replaced_inlier_passes(rng):
    cfg = StochasticFilterConfig()
    state = sf.init_state(cfg)
    for i in range(5):
        state = sf.add_pose(state, jnp.asarray(pose(0.1 * i, 0, 0)), cfg)
    prev = jnp.asarray(pose(0.4, 0, 0))

    inlier = jnp.asarray(pose(0.5, 0, 0))
    got = sf.apply_gate(state, prev, inlier, cfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(inlier))

    outlier = jnp.asarray(pose(3.0, 3.0, 3.0))
    got = np.asarray(sf.apply_gate(state, prev, outlier, cfg))
    assert not np.allclose(got, np.asarray(outlier))
    # replacement is near the prediction (~0.1 ahead of prev)
    assert np.linalg.norm(got[:3, 3] - np.array([0.5, 0, 0])) < 0.2


def test_weights_sum_to_one_and_increase():
    cfg = StochasticFilterConfig()
    w = np.asarray(sf._weights(cfg))
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    assert np.all(np.diff(w) > 0)  # newest (last) weighs most
