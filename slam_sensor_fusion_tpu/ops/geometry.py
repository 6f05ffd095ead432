"""SE(3)/SO(3) primitives used across the engine.

Pure jnp, fixed shapes, differentiable where it matters. These replace the
Eigen transform utilities the reference leans on (Eigen::AngleAxisf,
Eigen::Quaternionf, Eigen::JacobiSVD in
localization/src/icp_point_to_point.cpp:112-159 and
localization/src/localization_node.cpp:89-128).

Conventions
-----------
* Poses are 4x4 homogeneous float32 matrices ("T" matrices) exactly like
  the reference — the parity pipeline even blends them element-wise
  because the reference does (localization_node.cpp:329).
* Quaternions are (w, x, y, z).
* Compass headings follow the ArduPilot convention conversion of
  localization_node.cpp:66-77: yaw = wrap((90 - hdg_deg) * pi / 180).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rot_z(yaw: Array) -> Array:
    """Rotation about +Z by ``yaw`` radians. Works on scalars or batches."""
    yaw = jnp.asarray(yaw)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], axis=-1),
            jnp.stack([s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def make_T(R: Array, t: Array) -> Array:
    """Assemble a homogeneous transform from rotation(s) and translation(s)."""
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def translation(T: Array) -> Array:
    return T[..., :3, 3]


def rotation(T: Array) -> Array:
    return T[..., :3, :3]


def inv_T(T: Array) -> Array:
    """Inverse of a rigid transform without a general 4x4 solve."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_T(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(T: Array, points: Array) -> Array:
    """Apply rigid transform(s) to (..., N, 3) points.

    Maps the per-point loop of icp_point_to_point.cpp:99-110 onto one
    matmul that XLA places on the MXU.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return (
        jnp.einsum("...ij,...nj->...ni", R, points, preferred_element_type=points.dtype)
        + t[..., None, :]
    )


def quat_to_R(q: Array) -> Array:
    """(w, x, y, z) quaternion(s) to rotation matrix, normalizing first.

    Same math Eigen::Quaternionf::toRotationMatrix performs for the
    odometry messages (localization_node.cpp:94-102).
    """
    q = jnp.asarray(q)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def R_to_quat(R: Array) -> Array:
    """Rotation matrix to (w, x, y, z) quaternion, branch-free.

    Uses the four-hypothesis construction (one per largest diagonal
    candidate) and selects the numerically safest, so it is jit/vmap
    friendly (no data-dependent control flow).
    """
    R = jnp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def mk(a, b, c, d):
        return jnp.stack([a, b, c, d], axis=-1)

    # hypothesis 0: trace dominant
    s0 = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2.0
    q0 = mk(0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0)
    # hypothesis 1: m00 dominant
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    q1 = mk((m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1)
    # hypothesis 2: m11 dominant
    s2 = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2.0
    q2 = mk((m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2)
    # hypothesis 3: m22 dominant
    s3 = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2.0
    q3 = mk((m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3)

    cands = jnp.stack([q0, q1, q2, q3], axis=-2)
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def wrap_pi(angle: Array) -> Array:
    """Wrap angle(s) to [-pi, pi)."""
    return jnp.mod(angle + jnp.pi, 2 * jnp.pi) - jnp.pi


def compass_heading_to_yaw(heading_deg: Array) -> Array:
    """ArduPilot compass heading (deg, CW positive) -> ENU yaw (rad).

    Mirrors localization_node.cpp:66-77 / map_data_save_node.cpp:38-50.
    """
    return wrap_pi(jnp.deg2rad(90.0 - jnp.asarray(heading_deg)))


def skew(v: Array) -> Array:
    """Skew-symmetric matrix [v]x of (..., 3) vectors."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: Array) -> Array:
    """Rodrigues: exp of (..., 3) rotation vectors, stable near 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    # series fallbacks keep gradients finite at theta -> 0
    a = jnp.where(theta2 > 1e-12, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(
        theta2 > 1e-12, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0
    )
    K = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(R: Array) -> Array:
    """Rotation vector of (..., 3, 3) rotations (principal branch)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    scale = jnp.where(
        theta > 1e-6, theta / (2.0 * jnp.sin(jnp.maximum(theta, 1e-12))), 0.5
    )
    return v * scale[..., None]


def se3_exp(xi: Array) -> Array:
    """exp of (..., 6) twists [rho, phi] -> (..., 4, 4) rigid transforms."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    K = skew(phi)
    b = jnp.where(
        theta2 > 1e-12, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0
    )
    c = jnp.where(
        theta2 > 1e-12,
        (theta - jnp.sin(theta)) / (theta2 * theta),
        1.0 / 6.0 - theta2 / 120.0,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + b[..., None, None] * K + c[..., None, None] * (K @ K)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return make_T(R, t)


def svd3x3(H: Array) -> tuple[Array, Array, Array]:
    """Full SVD of (...,3,3). Thin wrapper: XLA handles tiny SVDs fine."""
    U, S, Vh = jnp.linalg.svd(H, full_matrices=True)
    return U, S, Vh


def kabsch(
    src: Array,
    tgt: Array,
    weights: Array,
) -> Array:
    """Weighted Kabsch/Umeyama rigid step: best T with tgt ~= R @ src + t.

    The masked-reduction equivalent of
    ICPPointToPoint::calculateStepBestTransformation
    (icp_point_to_point.cpp:112-159): weighted centroids, cross-covariance
    H = src0^T diag(w) tgt0 (one MXU matmul), 3x3 SVD, reflection fix
    through flipping the last column of V, then t = c_tgt - R c_src.

    Args:
      src: (N, 3) source points.
      tgt: (N, 3) matched target points.
      weights: (N,) nonnegative weights; masked-out rows use weight 0.

    Returns:
      (4, 4) rigid transform.
    """
    w = weights.astype(src.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    c_src = jnp.sum(src * w[:, None], axis=0) / wsum
    c_tgt = jnp.sum(tgt * w[:, None], axis=0) / wsum
    src0 = (src - c_src) * w[:, None]
    tgt0 = tgt - c_tgt
    H = jnp.dot(src0.T, tgt0, preferred_element_type=jnp.float32)
    U, _, Vh = svd3x3(H)
    V = Vh.T
    R0 = jnp.dot(V, U.T, preferred_element_type=jnp.float32)
    det = jnp.linalg.det(R0)
    # reflection fix: flip V's last column when det < 0
    V_fixed = V.at[:, 2].multiply(jnp.where(det < 0, -1.0, 1.0))
    R = jnp.dot(V_fixed, U.T, preferred_element_type=jnp.float32)
    t = c_tgt - R @ c_src
    return make_T(R.astype(src.dtype), t.astype(src.dtype))
