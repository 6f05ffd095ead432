import numpy as np
import jax
import jax.numpy as jnp

from slam_sensor_fusion_tpu.models import ekf
from slam_sensor_fusion_tpu.utils import synthetic as syn


def test_propagation_tracks_constant_velocity():
    cfg = ekf.EKFConfig()
    s = ekf.init_state(cfg, v0=jnp.array([1.0, 0.0, 0.0]))
    # stationary attitude, no rotation: accel must cancel gravity exactly
    gyro = jnp.zeros(3)
    accel = jnp.array([0.0, 0.0, ekf.GRAVITY])
    for _ in range(100):
        s = ekf.propagate(s, gyro, accel, jnp.float32(0.01), cfg)
    np.testing.assert_allclose(np.asarray(s.p), [1.0, 0.0, 0.0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(s.v), [1.0, 0.0, 0.0], atol=1e-3)
    # covariance must grow during dead reckoning
    assert float(s.P[0, 0]) > cfg.init_pos_std**2


def test_propagation_follows_synthetic_trajectory():
    poses = syn.make_trajectory(30, speed_per_frame=0.15)
    gyro, accel, dts = syn.make_imu(poses, gyro_noise=0.0, accel_noise=0.0)
    cfg = ekf.EKFConfig()
    v0 = (poses[1, :3, 3] - poses[0, :3, 3]) / 0.1
    s = ekf.init_state(cfg, p0=jnp.asarray(poses[0, :3, 3]),
                       R0=jnp.asarray(poses[0, :3, :3]), v0=jnp.asarray(v0))
    for k in range(len(poses) - 1):
        s = ekf.propagate_batch(
            s, jnp.asarray(gyro[k]), jnp.asarray(accel[k]), jnp.asarray(dts[k]), cfg
        )
    # pure integration over 3 s of clean IMU: sub-decimetre drift
    err = np.linalg.norm(np.asarray(s.p) - poses[-1, :3, 3])
    assert err < 0.2, err


def test_pose_update_corrects_drift():
    cfg = ekf.EKFConfig()
    s = ekf.init_state(cfg)
    s = s._replace(p=jnp.array([0.5, -0.3, 0.2]))  # drifted
    T_meas = jnp.eye(4)  # truth at origin
    for _ in range(5):
        s = ekf.update_pose(s, T_meas, 0.02, 0.01)
    assert np.linalg.norm(np.asarray(s.p)) < 0.02
    # covariance shrinks
    assert float(s.P[0, 0]) < cfg.init_pos_std**2


def test_gps_gate_rejects_outliers():
    cfg = ekf.EKFConfig()
    s = ekf.init_state(cfg)
    good, acc_good = ekf.update_gps(s, jnp.array([0.5, 0.0, 0.0]), jnp.float32(1.0), cfg)
    assert bool(acc_good)
    bad, acc_bad = ekf.update_gps(s, jnp.array([500.0, 0.0, 0.0]), jnp.float32(1.0), cfg)
    assert not bool(acc_bad)
    np.testing.assert_array_equal(np.asarray(bad.p), np.asarray(s.p))


def test_bias_estimation_converges():
    """With pose anchoring, gyro bias must be identified."""
    cfg = ekf.EKFConfig()
    poses = syn.make_trajectory(60, speed_per_frame=0.15)
    true_bg = np.array([0.01, -0.02, 0.015])
    gyro, accel, dts = syn.make_imu(
        poses, gyro_bias=true_bg, gyro_noise=0.0005, accel_noise=0.005
    )
    v0 = (poses[1, :3, 3] - poses[0, :3, 3]) / 0.1
    s = ekf.init_state(cfg, p0=jnp.asarray(poses[0, :3, 3]),
                       R0=jnp.asarray(poses[0, :3, :3]), v0=jnp.asarray(v0))
    for k in range(len(poses) - 1):
        s = ekf.propagate_batch(
            s, jnp.asarray(gyro[k]), jnp.asarray(accel[k]), jnp.asarray(dts[k]), cfg
        )
        s = ekf.update_pose(s, jnp.asarray(poses[k + 1]), 0.01, 0.005)
    est = np.asarray(s.bg)
    np.testing.assert_allclose(est, true_bg, atol=0.004)


def test_full_fusion_step_jits():
    cfg = ekf.EKFConfig()
    s = ekf.init_state(cfg)
    K = 10
    s2, acc = ekf.lio_fusion_step(
        s,
        jnp.zeros((K, 3)),
        jnp.tile(jnp.array([0.0, 0.0, ekf.GRAVITY]), (K, 1)),
        jnp.full((K,), 0.01),
        jnp.eye(4),
        jnp.float32(0.02),
        jnp.float32(0.01),
        jnp.zeros(3),
        jnp.float32(1.0),
        jnp.bool_(True),
        cfg,
    )
    jax.block_until_ready(s2)
    assert bool(acc)
    assert np.isfinite(np.asarray(s2.P)).all()
