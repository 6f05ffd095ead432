"""Scan deskewing (motion compensation) — native-mode preprocessing.

LiDAR points within one sweep are measured at different times while the
sensor moves; the north-star pipeline (BASELINE.json config 5: "deskewed
scans") corrects each point by the fraction of the frame twist elapsed at
its timestamp, under a constant-velocity model:

    p_i' = exp(tau_i * xi) p_i,   xi = log(T_prev^-1 T_curr)

Everything is batched Rodrigues math on the VPU — no per-point loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slam_sensor_fusion_tpu.ops import geometry

Array = jax.Array


def se3_log(T: Array) -> Array:
    """Twist [rho, phi] of a rigid transform (inverse of geometry.se3_exp)."""
    phi = geometry.so3_log(T[..., :3, :3])
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    K = geometry.skew(phi)
    # V^{-1} = I - K/2 + (1/theta^2)(1 - theta sin / (2(1-cos))) K^2
    a = jnp.where(
        theta2 > 1e-12,
        (1.0 - theta * jnp.sin(theta) / (2.0 * (1.0 - jnp.cos(theta)))) / theta2,
        1.0 / 12.0,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    V_inv = eye - 0.5 * K + a[..., None, None] * (K @ K)
    rho = jnp.einsum("...ij,...j->...i", V_inv, T[..., :3, 3])
    return jnp.concatenate([rho, phi], axis=-1)


def deskew(
    points: Array,  # (N, 3) body-frame points at their measurement times
    tau: Array,  # (N,) in [0, 1]: fraction of the sweep elapsed
    frame_twist: Array,  # (6,) = se3_log(T_prev^-1 @ T_curr)
) -> Array:
    """Correct all points to the END-of-sweep frame.

    A point measured at fraction tau sits in the frame exp((tau-1) * xi)
    relative to the sweep end; undo it.
    """
    xi = (tau[:, None] - 1.0) * frame_twist[None, :]  # (N, 6)
    T = geometry.se3_exp(xi)  # (N, 4, 4) batched Rodrigues
    return (
        jnp.einsum("nij,nj->ni", T[:, :3, :3], points) + T[:, :3, 3]
    )
