import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyR

from slam_sensor_fusion_tpu.ops import geometry as geo
from oracles import kabsch_oracle


def random_T(rng):
    R = ScipyR.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    t = rng.normal(size=3)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T.astype(np.float32)


def test_rot_z_matches_scipy(rng):
    for yaw in rng.uniform(-np.pi, np.pi, size=5):
        expected = ScipyR.from_euler("z", yaw).as_matrix()
        np.testing.assert_allclose(geo.rot_z(yaw), expected, atol=1e-6)


def test_make_inv_roundtrip(rng):
    T = random_T(rng)
    I = np.asarray(geo.inv_T(jnp.asarray(T)) @ T)
    np.testing.assert_allclose(I, np.eye(4), atol=1e-5)


def test_transform_points(rng):
    T = random_T(rng)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    expected = pts @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(
        geo.transform_points(jnp.asarray(T), jnp.asarray(pts)), expected, atol=1e-5
    )


def test_quat_roundtrip(rng):
    for _ in range(10):
        r = ScipyR.random(random_state=int(rng.integers(1 << 30)))
        x, y, z, w = r.as_quat()
        q_wxyz = np.array([w, x, y, z], dtype=np.float32)
        R = geo.quat_to_R(jnp.asarray(q_wxyz))
        np.testing.assert_allclose(R, r.as_matrix(), atol=1e-5)
        q_back = np.asarray(geo.R_to_quat(R))
        # quaternions are sign-ambiguous
        assert min(
            np.abs(q_back - q_wxyz).max(), np.abs(q_back + q_wxyz).max()
        ) < 1e-4


def test_compass_conversion():
    # ArduPilot: 0 deg = North -> ENU yaw pi/2; 90 deg = East -> 0
    np.testing.assert_allclose(
        geo.compass_heading_to_yaw(0.0), np.pi / 2, atol=1e-6
    )
    np.testing.assert_allclose(geo.compass_heading_to_yaw(90.0), 0.0, atol=1e-6)
    # 270 deg = West -> wraps to -pi... actually (90-270) = -180 -> wraps to -pi
    assert abs(abs(float(geo.compass_heading_to_yaw(270.0))) - np.pi) < 1e-6


def test_kabsch_recovers_rigid_transform(rng):
    src = rng.normal(size=(200, 3)).astype(np.float32)
    T_true = random_T(rng)
    tgt = src @ T_true[:3, :3].T + T_true[:3, 3]
    T = np.asarray(
        geo.kabsch(jnp.asarray(src), jnp.asarray(tgt), jnp.ones(200, jnp.float32))
    )
    np.testing.assert_allclose(T, T_true, atol=1e-4)


def test_kabsch_matches_oracle_with_mask(rng):
    src = rng.normal(size=(64, 3)).astype(np.float32)
    tgt = rng.normal(size=(64, 3)).astype(np.float32) * 0.1 + src
    mask = rng.uniform(size=64) > 0.3
    T = np.asarray(
        geo.kabsch(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask, jnp.float32)
        )
    )
    T_ref = kabsch_oracle(src[mask].astype(np.float64), tgt[mask].astype(np.float64))
    np.testing.assert_allclose(T, T_ref, atol=1e-4)


def test_kabsch_reflection_case():
    # a degenerate planar configuration that triggers det < 0 without the fix
    src = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0]], dtype=np.float32
    )
    tgt = src.copy()
    tgt[:, 0] *= -1  # mirrored
    T = np.asarray(geo.kabsch(jnp.asarray(src), jnp.asarray(tgt), jnp.ones(4)))
    R = T[:3, :3]
    assert np.linalg.det(R) > 0.99  # proper rotation, not a reflection
