"""Error-state EKF for LiDAR-inertial-GPS fusion (native mode).

The reference fuses GPS and odometry by element-wise pose blending plus a
z-score gate (localization_node.cpp:329, stochastic_filter.cpp) — the
parity pipeline reproduces that. This module is the NORTH-STAR fusion
(BASELINE.json configs 3-4): a 15-state error-state EKF

    x = [p (3), v (3), theta (3), b_gyro (3), b_accel (3)]

with IMU strapdown propagation, SE(3) pose updates from scan registration,
and GPS position updates with chi-squared outlier gating. Everything is
fixed-shape jnp; the per-IMU-sample propagation runs under `lax.scan` so a
whole between-scan IMU packet is one fused device program.

Conventions: world-frame ENU position/velocity; R is body->world; the
accelerometer measures specific force f = R^T (a_w - g_w), g_w = (0,0,-g).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_sensor_fusion_tpu.ops import geometry

Array = jax.Array

GRAVITY = 9.80665


class EKFConfig(NamedTuple):
    """Continuous-time noise densities and priors (static)."""

    gyro_noise: float = 1.7e-3  # rad/s/sqrt(Hz)
    accel_noise: float = 2.0e-2  # m/s^2/sqrt(Hz)
    gyro_bias_walk: float = 1.0e-5  # rad/s^2/sqrt(Hz)
    accel_bias_walk: float = 1.0e-4  # m/s^3/sqrt(Hz)
    init_pos_std: float = 1.0
    init_vel_std: float = 0.5
    init_att_std: float = 0.1
    init_gyro_bias_std: float = 0.02
    init_accel_bias_std: float = 0.2
    #: chi^2 gate for the 3-dof GPS position update (99% quantile ~ 11.34)
    gps_chi2_gate: float = 11.34


class EKFState(NamedTuple):
    p: Array  # (3,) position, world
    v: Array  # (3,) velocity, world
    R: Array  # (3, 3) body->world
    bg: Array  # (3,) gyro bias
    ba: Array  # (3,) accel bias
    P: Array  # (15, 15) error covariance


def init_state(
    config: EKFConfig,
    p0: Array | None = None,
    R0: Array | None = None,
    v0: Array | None = None,
) -> EKFState:
    p0 = jnp.zeros(3) if p0 is None else p0
    R0 = jnp.eye(3) if R0 is None else R0
    v0 = jnp.zeros(3) if v0 is None else v0
    P = jnp.diag(
        jnp.concatenate(
            [
                jnp.full(3, config.init_pos_std**2),
                jnp.full(3, config.init_vel_std**2),
                jnp.full(3, config.init_att_std**2),
                jnp.full(3, config.init_gyro_bias_std**2),
                jnp.full(3, config.init_accel_bias_std**2),
            ]
        )
    ).astype(jnp.float32)
    return EKFState(
        p=p0.astype(jnp.float32),
        v=v0.astype(jnp.float32),
        R=R0.astype(jnp.float32),
        bg=jnp.zeros(3, jnp.float32),
        ba=jnp.zeros(3, jnp.float32),
        P=P,
    )


def propagate(
    state: EKFState, gyro: Array, accel: Array, dt: Array, config: EKFConfig
) -> EKFState:
    """One IMU strapdown step + covariance propagation."""
    g_w = jnp.array([0.0, 0.0, -GRAVITY], jnp.float32)
    w = gyro - state.bg
    f = accel - state.ba
    a_w = state.R @ f + g_w

    p_new = state.p + state.v * dt + 0.5 * a_w * dt * dt
    v_new = state.v + a_w * dt
    R_new = state.R @ geometry.so3_exp(w * dt)

    # discrete error-state transition (first order)
    eye3 = jnp.eye(3, dtype=jnp.float32)
    F = jnp.eye(15, dtype=jnp.float32)
    F = F.at[0:3, 3:6].set(eye3 * dt)
    F = F.at[3:6, 6:9].set(-state.R @ geometry.skew(f) * dt)
    F = F.at[3:6, 12:15].set(-state.R * dt)
    F = F.at[6:9, 6:9].set(geometry.so3_exp(-w * dt))
    F = F.at[6:9, 9:12].set(-eye3 * dt)

    q = jnp.concatenate(
        [
            jnp.zeros(3),
            jnp.full(3, (config.accel_noise**2) * dt),
            jnp.full(3, (config.gyro_noise**2) * dt),
            jnp.full(3, (config.gyro_bias_walk**2) * dt),
            jnp.full(3, (config.accel_bias_walk**2) * dt),
        ]
    ).astype(jnp.float32)
    P_new = F @ state.P @ F.T + jnp.diag(q)
    return EKFState(p_new, v_new, R_new, state.bg, state.ba, P_new)


def propagate_batch(
    state: EKFState, gyro: Array, accel: Array, dt: Array, config: EKFConfig
) -> EKFState:
    """lax.scan over an IMU packet: gyro/accel (K, 3), dt (K,).

    Samples with dt == 0 are no-ops (padding), so fixed-size packets work.
    """

    def step(s, sample):
        g, a, d = sample
        s_new = propagate(s, g, a, d, config)
        s_new = jax.tree.map(
            lambda new, old: jnp.where(d > 0, new, old), s_new, s
        )
        return s_new, None

    out, _ = jax.lax.scan(step, state, (gyro, accel, dt))
    return out


def _inject(state: EKFState, dx: Array) -> EKFState:
    """Apply an error-state correction."""
    return EKFState(
        p=state.p + dx[0:3],
        v=state.v + dx[3:6],
        R=state.R @ geometry.so3_exp(dx[6:9]),
        bg=state.bg + dx[9:12],
        ba=state.ba + dx[12:15],
        P=state.P,
    )


def _joseph(P: Array, K: Array, H: Array, Rm: Array) -> Array:
    eye = jnp.eye(15, dtype=jnp.float32)
    A = eye - K @ H
    return A @ P @ A.T + K @ Rm @ K.T


def update_pose_cov(state: EKFState, T_meas: Array, Rm: Array) -> EKFState:
    """Full-pose update with an explicit (6, 6) measurement covariance
    (e.g. the registration's own GN covariance, LIOConfig.icp_cov_mode
    "gn")."""
    r_p = T_meas[:3, 3] - state.p
    r_th = geometry.so3_log(state.R.T @ T_meas[:3, :3])
    r = jnp.concatenate([r_p, r_th])

    H = jnp.zeros((6, 15), jnp.float32)
    H = H.at[0:3, 0:3].set(jnp.eye(3))
    H = H.at[3:6, 6:9].set(jnp.eye(3))

    S = H @ state.P @ H.T + Rm
    K = state.P @ H.T @ jnp.linalg.inv(S)
    dx = K @ r
    new = _inject(state, dx)
    return new._replace(P=_joseph(state.P, K, H, Rm))


def update_pose(
    state: EKFState,
    T_meas: Array,
    pos_std: float | Array,
    rot_std: float | Array,
) -> EKFState:
    """Full-pose update from scan registration (6-dof measurement)."""
    Rm = jnp.diag(
        jnp.concatenate([jnp.full(3, pos_std**2), jnp.full(3, rot_std**2)])
    ).astype(jnp.float32)
    return update_pose_cov(state, T_meas, Rm)


def update_gps(
    state: EKFState,
    pos_meas: Array,
    pos_cov: Array,  # (3, 3) or scalar variance
    config: EKFConfig,
) -> tuple[EKFState, Array]:
    """GPS position update with chi^2 gating; returns (state, accepted)."""
    if jnp.ndim(pos_cov) == 0:
        Rm = jnp.eye(3, dtype=jnp.float32) * pos_cov
    else:
        Rm = pos_cov.astype(jnp.float32)
    r = pos_meas - state.p
    H = jnp.zeros((3, 15), jnp.float32).at[0:3, 0:3].set(jnp.eye(3))
    S = H @ state.P @ H.T + Rm
    S_inv = jnp.linalg.inv(S)
    chi2 = r @ S_inv @ r
    accept = chi2 <= config.gps_chi2_gate

    K = state.P @ H.T @ S_inv
    dx = K @ r
    updated = _inject(state, dx)._replace(P=_joseph(state.P, K, H, Rm))
    out = jax.tree.map(
        lambda a, b: jnp.where(accept, a, b), updated, state
    )
    return out, accept


@functools.partial(jax.jit, static_argnames=("config",))
def lio_fusion_step(
    state: EKFState,
    imu_gyro: Array,  # (K, 3) packet since the last scan
    imu_accel: Array,  # (K, 3)
    imu_dt: Array,  # (K,) zeros = padding
    T_icp: Array,  # (4, 4) registration pose measurement
    icp_pos_std: Array,
    icp_rot_std: Array,
    gps_pos: Array,  # (3,)
    gps_var: Array,  # () position variance
    gps_valid: Array,  # () bool
    config: EKFConfig = EKFConfig(),
) -> tuple[EKFState, Array]:
    """One fusion cycle: propagate IMU packet, ICP pose update, gated GPS
    update. Returns (state, gps_accepted)."""
    s = propagate_batch(state, imu_gyro, imu_accel, imu_dt, config)
    s = update_pose(s, T_icp, icp_pos_std, icp_rot_std)
    s_gps, accepted = update_gps(s, gps_pos, gps_var, config)
    s = jax.tree.map(lambda a, b: jnp.where(gps_valid, a, b), s_gps, s)
    return s, accepted & gps_valid


def pose_matrix(state: EKFState) -> Array:
    return geometry.make_T(state.R, state.p)
