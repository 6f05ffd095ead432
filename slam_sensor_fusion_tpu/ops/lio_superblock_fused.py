"""Whole-superblock fused LIO kernel: K frames of the LIO loop per launch.

`models/lio.py`'s per-frame path pays one `pallas_call` launch (the fused
GN kernel, ops/p2p_fused.py) plus the inter-frame XLA glue — IMU
propagation scan, two Kalman updates with 15x15 matrix algebra, state
selects — PER FRAME. That fixed cost dominated the round-2 LIO budget
exactly as it did the localization pipeline before
ops/superblock_fused.py. This kernel absorbs the ENTIRE LIO frame loop
for a K-frame block into ONE launch:

  per frame k:
    1. error-state EKF IMU propagation over the frame's packet
       (models/ekf.py:89-121 semantics): the mean is scalar 3x3 register
       math; the 15-state covariance lives as a zero-padded (16, 16)
       VMEM value and each sample's P <- F P F^T + Q dt is two small
       MXU `dot_general`s (F assembled from 3x3 blocks via jnp.pad);
    2. scan-to-map point-to-plane GN against the block's anchor pages —
       the ops/p2p_fused.py loop (pair-list association with 6-row
       xyz+normal pages, stacked 29-plane moment reduction, unrolled
       Cholesky solve, Taylor SE(3) step), indexed by the frame's pair
       list; iterations unrolled so the final UNdamped JtJ moments fall
       out for the measurement covariance;
    3. EKF pose update: residual vs the propagated prior (small-angle
       series for so3_log — GN corrections after an IMU prior are
       ~1e-2 rad), Kalman gain via unrolled 6x6 Cholesky inverse,
       Joseph-form covariance update — all (16, 16) dots;
       `icp_cov_mode="gn"` replaces the constant measurement stds with
       the GN system's own covariance sigma^2 (JtJ)^-1, adjoint-mapped
       from the left-perturbation parameterization to the EKF's
       (position, body attitude) errors (VERDICT r2 next-step #5);
    4. chi^2-gated GPS position update (models/ekf.py:187-211), 3x3
       adjugate inverse in registers;
    5. predicated state update for invalid (tail-padding) frames.

The ring insert and the anchor refresh stay OUTSIDE the kernel: within a
block the anchor is frozen, so the driver (models/lio.run_lio_superblocks)
batches all K ring inserts after the launch — semantically identical to
the per-frame inserts of run_lio_blocks, which only ever become visible
at the next block-boundary refresh.

Equivalence with the per-frame path is asserted by
tests/test_lio_superblock.py in interpret mode. Reference semantics
being absorbed: the FAST-LIO-style odometry upstream of
/root/reference/localization/src/localization_node.cpp:80-82 (the
reference consumes /Odometry + /cloud_registered_body; BASELINE.json
configs 2/3/5 ask the rebuild to own that stack natively).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_sensor_fusion_tpu.models import ekf as ekf_mod
from slam_sensor_fusion_tpu.ops.icp_fused import (
    _adjugate_transpose_over_det,
    _mm3,
    _mv3,
)
from slam_sensor_fusion_tpu.ops.p2p_fused import (
    _chol6_solve,
    _polar_polish,
    _se3_exp_taylor,
)
from slam_sensor_fusion_tpu.ops.point_to_plane import PointToPlaneConfig

Array = jax.Array

_BIG = 3.0e38
_G = 9.80665  # matches models/ekf.py GRAVITY


def _eye(n: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (rows == cols).astype(jnp.float32)


def _place(block, r0: int, c0: int, n: int = 16):
    """Embed a (3, 3) block at (r0, c0) of an (n, n) zero matrix.

    jnp.pad lowers to concatenation with zeros — Mosaic-safe, unlike
    captured array constants or in-kernel scatter."""
    return jnp.pad(block, ((r0, n - 3 - r0), (c0, n - 3 - c0)))


def _skew3(v):
    z = v[0] * 0.0
    return jnp.array(
        [[z, -v[2], v[1]], [v[2], z, -v[0]], [-v[1], v[0], z]]
    )


def _t3(M):
    """Scalar 3x3 transpose."""
    return jnp.array(
        [
            [M[0, 0], M[1, 0], M[2, 0]],
            [M[0, 1], M[1, 1], M[2, 1]],
            [M[0, 2], M[1, 2], M[2, 2]],
        ]
    )


def _so3_exp(phi):
    """Rotation part of the Taylor-series SE(3) exp (scalar math)."""
    zero = jnp.stack([phi[0] * 0.0, phi[0] * 0.0, phi[0] * 0.0])
    R, _ = _se3_exp_taylor(zero, phi)
    return R


def _so3_log_small(R_err):
    """Small-angle so3_log via the asin series.

    theta = asin(|s|) with s = vee(R - R^T)/2; exact to ~2e-6 rad for
    |theta| < 0.3 — far beyond any GN-vs-prior correction. (The XLA path
    uses geometry.so3_log; tests compare trajectories, not bits.)"""
    s = 0.5 * jnp.stack(
        [
            R_err[2, 1] - R_err[1, 2],
            R_err[0, 2] - R_err[2, 0],
            R_err[1, 0] - R_err[0, 1],
        ]
    )
    m2 = s[0] * s[0] + s[1] * s[1] + s[2] * s[2]
    fac = 1.0 + m2 * (1.0 / 6.0 + m2 * (3.0 / 40.0 + m2 * (15.0 / 336.0)))
    return s * fac


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_bt(a, b):
    """a @ b^T."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_at(a, b):
    """a^T @ b."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _matvec(a, v):
    return jax.lax.dot_general(
        a, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _inv6_cholesky(S_rows):
    """(6, 6) SPD inverse from nested scalars via 6 Cholesky solves."""
    cols = [
        _chol6_solve(S_rows, [1.0 if i == e else 0.0 for i in range(6)])
        for e in range(6)
    ]
    return jnp.array(
        [[cols[j][i] for j in range(6)] for i in range(6)]
    )


class LIOSuperblockParams(NamedTuple):
    """Static kernel parameters (hashable jit key)."""

    p2p: PointToPlaneConfig
    ekf: ekf_mod.EKFConfig
    icp_pos_std: float = 0.3
    icp_rot_std: float = 0.01
    #: "constant" = diag(icp_pos_std, icp_rot_std); "gn" = adjoint-mapped
    #: sigma^2 (JtJ)^-1 from the final GN moments + std floors
    icp_cov_mode: str = "constant"
    gn_cov_scale: float = 1.0
    gn_pos_std_floor: float = 0.02
    gn_rot_std_floor: float = 0.005
    #: gn mode: add the block-start pose covariance (the anchor ring was
    #: PLACED with that uncertainty — registration against it can never
    #: be more absolutely accurate than the ring itself). Prevents the
    #: over-confidence collapse that otherwise demands a hand-swept std.
    gn_anchor_cov: bool = True
    #: slack-violation observability: per-frame budget on |realized prior
    #: - dead-reckoned prediction| is slack * k + slack_base (the pair
    #: lists were built at the prediction with that dilation)
    superstep_slack: float = 0.05
    slack_base: float = 0.05


def _make_lio_superblock_kernel(
    K: int, Ki: int, tile_src: int, tile_tgt: int, params: LIOSuperblockParams
):
    p2p = params.p2p
    gate = p2p.max_correspondence_dist_sq
    num_iterations = p2p.num_iterations
    delta = p2p.huber_delta
    damping = p2p.damping
    fixed_corr = p2p.fixed_correspondences
    e = params.ekf

    def kernel(
        # SMEM
        pair_start_ref,  # (K, nSt) i32 per-src-tile offsets into pair_tgt
        pair_cnt_ref,  # (K, nSt) i32 per-src-tile admitted-tile counts
        pair_tgt_ref,  # (K, max_pairs) i32 flat row-major target tiles
        valid_ref,  # (K,) i32
        gyro_ref,  # (K, Ki*3) f32
        accel_ref,  # (K, Ki*3) f32
        dt_ref,  # (K, Ki) f32
        gps_ref,  # (K, 3) f32
        gps_var_ref,  # (K,) f32
        gps_valid_ref,  # (K,) i32
        pred_t_ref,  # (K, 3) f32 dead-reckoned translations (slack check)
        vec0_ref,  # (9,) f32: v0, bg0, ba0
        center_ref,  # (3,) f32 anchor rebase point
        # VMEM
        pose0_ref,  # (4, 4)
        P0_ref,  # (16, 16) zero-padded 15-state covariance
        src_pages_ref,  # (K, nSt, 3, TM) body frame, invalid -> +FAR
        tgt_pages_ref,  # (nTt, 6, TN) anchor xyz (rebased) + normals
        # outputs
        poses_out_ref,  # (K, 4, 4)
        stats_out_ref,  # (K, 128)
        state_pose_ref,  # (4, 4)
        state_P_ref,  # (16, 16)
        state_vec_ref,  # (1, 128): v, bg, ba in lanes 0-8
        # scratch
        best_d2_ref,  # (nSt, 1, TM)
        best_qn_ref,  # (nSt, 6, TM)
    ):
        ones3 = jnp.ones((3, 1), jnp.float32)
        eye3 = _eye(3)
        eye16 = _eye(16)
        cx = jnp.stack([center_ref[0], center_ref[1], center_ref[2]])

        # continuous -> discrete noise diagonal (x dt at use time)
        r16 = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
        c16 = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
        diag16 = (r16 == c16).astype(jnp.float32)

        def band(lo, hi, val):
            return jnp.where((r16 >= lo) & (r16 < hi), val, 0.0) * diag16

        Q_base = (
            band(3, 6, e.accel_noise**2)
            + band(6, 9, e.gyro_noise**2)
            + band(9, 12, e.gyro_bias_walk**2)
            + band(12, 15, e.accel_bias_walk**2)
        )

        # (16, 6) selector for the 6-dof pose measurement rows [p, theta]
        r166 = jax.lax.broadcasted_iota(jnp.int32, (16, 6), 0)
        c166 = jax.lax.broadcasted_iota(jnp.int32, (16, 6), 1)
        E6 = (
            ((r166 == c166) & (c166 < 3)) | (r166 == c166 + 3) & (c166 >= 3)
        ).astype(jnp.float32)
        # (16, 3) selector for the GPS position rows
        r163 = jax.lax.broadcasted_iota(jnp.int32, (16, 3), 0)
        c163 = jax.lax.broadcasted_iota(jnp.int32, (16, 3), 1)
        E3 = (r163 == c163).astype(jnp.float32)

        # ---- GN association + moments (ops/p2p_fused.py structure):
        # tile-major, register-carried best, direct (tx-sx)^2 VPU
        # broadcast distances (see ops/icp_fused.py associate for the
        # cost analysis vs the per-pair K=3 f32 matmul) ----
        nSt_s = best_d2_ref.shape[0]

        U = max(int(p2p.assoc_unroll), 1)

        def associate(k, R, t):
            # `assoc_unroll` target tiles per sequential trip amortize
            # the ~4 us/trip scalar-loop overhead (ARCHITECTURE §6b);
            # tail lanes clamp to the run's last tile — a no-op under
            # the strict `<` winner, so results are bit-identical.
            def tile_body(i, _):
                sp = src_pages_ref[k, i]  # (3, TM)
                spx, spy, spz = sp[0:1], sp[1:2], sp[2:3]
                sx = R[0, 0] * spx + R[0, 1] * spy + R[0, 2] * spz + t[0]
                sy = R[1, 0] * spx + R[1, 1] * spy + R[1, 2] * spz + t[1]
                sz = R[2, 0] * spx + R[2, 1] * spy + R[2, 2] * spz + t[2]
                start = pair_start_ref[k, i]
                cnt = pair_cnt_ref[k, i]
                last = start + cnt - 1

                def inner(q, carry):
                    base = start + q * U
                    for u in range(U):
                        bmin, bqn = carry
                        j = pair_tgt_ref[k, jnp.minimum(base + u, last)]
                        tq = tgt_pages_ref[j]  # (6, TN)
                        txc = tq[0].reshape(tile_tgt, 1)
                        tyc = tq[1].reshape(tile_tgt, 1)
                        tzc = tq[2].reshape(tile_tgt, 1)
                        dx = txc - sx  # (TN, TM)
                        dy = tyc - sy
                        dz = tzc - sz
                        d2 = dx * dx + dy * dy + dz * dz
                        tile_min = jnp.min(d2, axis=0, keepdims=True)
                        arg = jnp.argmin(d2, axis=0).astype(jnp.int32)[None, :]
                        rows = jax.lax.broadcasted_iota(
                            jnp.int32, (tile_tgt, tile_src), 0
                        )
                        onehot = (rows == arg).astype(jnp.float32)
                        qn = jax.lax.dot_general(
                            tq, onehot, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (6, TM): matched point + its normal
                        better = tile_min < bmin
                        carry = (
                            jnp.where(better, tile_min, bmin),
                            jnp.where(better, qn, bqn),
                        )
                    return carry

                big = jnp.full((1, tile_src), _BIG)
                zero6 = jnp.zeros((6, tile_src), jnp.float32)
                trips = (cnt + U - 1) // U
                bmin, bqn = jax.lax.fori_loop(0, trips, inner, (big, zero6))
                best_d2_ref[i] = bmin
                best_qn_ref[i] = bqn
                return 0

            jax.lax.fori_loop(0, nSt_s, tile_body, 0)

        def gn_moments(k, R, t, reassociate):
            if reassociate:
                associate(k, R, t)
            s_all = src_pages_ref[k]  # (nSt, 3, TM)
            sx, sy, sz = s_all[:, 0, :], s_all[:, 1, :], s_all[:, 2, :]
            px = R[0, 0] * sx + R[0, 1] * sy + R[0, 2] * sz + t[0]
            py = R[1, 0] * sx + R[1, 1] * sy + R[1, 2] * sz + t[1]
            pz = R[2, 0] * sx + R[2, 1] * sy + R[2, 2] * sz + t[2]
            qn = best_qn_ref[...]
            qx, qy, qz = qn[:, 0, :], qn[:, 1, :], qn[:, 2, :]
            nx, ny, nz = qn[:, 3, :], qn[:, 4, :], qn[:, 5, :]
            d2 = best_d2_ref[...][:, 0, :]
            w_in = jnp.where(
                (d2 < gate) & (nx * nx + ny * ny + nz * nz > 0.5), 1.0, 0.0
            )
            r = nx * (px - qx) + ny * (py - qy) + nz * (pz - qz)
            absr = jnp.abs(r)
            w = w_in * jnp.minimum(1.0, delta / jnp.maximum(absr, 1e-12))
            J3 = py * nz - pz * ny
            J4 = pz * nx - px * nz
            J5 = px * ny - py * nx
            J = (nx, ny, nz, J3, J4, J5)
            wJ = [w * J[a] for a in range(6)]
            planes = (
                [wJ[a] * J[b] for a in range(6) for b in range(a + 1)]
                + [wJ[a] * r for a in range(6)]
                + [w_in, w_in * r * r]
            )
            stack = jnp.stack(planes)  # (29, nSt, TM)
            tot = jnp.sum(jnp.sum(stack, axis=2), axis=1)  # (29,)
            A_rows = [[None] * 6 for _ in range(6)]
            idx = 0
            for a in range(6):
                for b in range(a + 1):
                    A_rows[a][b] = tot[idx]
                    A_rows[b][a] = tot[idx]
                    idx += 1
            bvec = [tot[21 + a] for a in range(6)]
            W = tot[27]
            wr2 = tot[28]
            return A_rows, bvec, W, wr2

        def gn_register(k, R0, t0_reb):
            """Unrolled GN loop + trailing stats pass (ops/p2p_fused.py
            semantics). Returns (R, t_reb, A_rows, W, wr2, rmse)."""
            if fixed_corr:
                associate(k, R0, t0_reb)
            R, t = R0, t0_reb
            for it in range(num_iterations):
                A_rows, bvec, W, _ = gn_moments(
                    k, R, t, reassociate=not fixed_corr
                )
                Ad = [
                    [
                        A_rows[a][b] + (damping if a == b else 0.0)
                        for b in range(6)
                    ]
                    for a in range(6)
                ]
                x = _chol6_solve(Ad, bvec)
                ok = jnp.where(W >= 3.0, 1.0, 0.0)
                rho = jnp.stack([-x[0] * ok, -x[1] * ok, -x[2] * ok])
                phi = jnp.stack([-x[3] * ok, -x[4] * ok, -x[5] * ok])
                R_step, t_step = _se3_exp_taylor(rho, phi)
                R_step = _polar_polish(R_step)
                R, t = _mm3(R_step, R), _mv3(R_step, t) + t_step
            A_rows, _, W, wr2 = gn_moments(
                k, R, t, reassociate=not fixed_corr
            )
            rmse = jnp.sqrt(wr2 / jnp.maximum(W, 1.0))
            return R, t, A_rows, W, wr2, rmse

        # ---- initial state from scalar reads (Mosaic layout safety:
        # see ops/p2p_fused.py's carry-init comment) ----
        P0 = _dot(P0_ref[...], eye16)  # identity dot pins the MXU layout
        # the anchor was refreshed at block start: its world uncertainty
        # IS the block-start pose covariance (see LIOSuperblockParams)
        S_anchor = _dot_at(E6, _dot(P0, E6))  # (6, 6)
        T0 = pose0_ref[...]
        p0 = jnp.stack([T0[0, 3], T0[1, 3], T0[2, 3]])
        R0 = jnp.array(
            [
                [T0[0, 0], T0[0, 1], T0[0, 2]],
                [T0[1, 0], T0[1, 1], T0[1, 2]],
                [T0[2, 0], T0[2, 1], T0[2, 2]],
            ]
        )
        v0 = jnp.stack([vec0_ref[0], vec0_ref[1], vec0_ref[2]])
        bg0 = jnp.stack([vec0_ref[3], vec0_ref[4], vec0_ref[5]])
        ba0 = jnp.stack([vec0_ref[6], vec0_ref[7], vec0_ref[8]])

        def frame_body(k, carry):
            p_in, v_in, R_in, bg, ba, P_in = carry
            vld = valid_ref[k] != 0

            # ---- 1) IMU propagation (models/ekf.py:89-121) ----
            def imu_body(j, c):
                p, v, R, P = c
                d = dt_ref[k, j]
                w = (
                    jnp.stack(
                        [
                            gyro_ref[k, 3 * j],
                            gyro_ref[k, 3 * j + 1],
                            gyro_ref[k, 3 * j + 2],
                        ]
                    )
                    - bg
                )
                f = (
                    jnp.stack(
                        [
                            accel_ref[k, 3 * j],
                            accel_ref[k, 3 * j + 1],
                            accel_ref[k, 3 * j + 2],
                        ]
                    )
                    - ba
                )
                a_w = _mv3(R, f) + jnp.stack([d * 0.0, d * 0.0, d * 0.0 - _G])
                p_n = p + v * d + (0.5 * d * d) * a_w
                v_n = v + a_w * d
                R_n = _mm3(R, _so3_exp(w * d))
                F = (
                    eye16
                    + _place(eye3 * d, 0, 3)
                    + _place(_mm3(R, _skew3(f)) * (-d), 3, 6)
                    + _place(R * (-d), 3, 12)
                    + _place(_so3_exp(w * (-d)) - eye3, 6, 6)
                    + _place(eye3 * (-d), 6, 9)
                )
                P_n = _dot_bt(_dot(F, P), F) + Q_base * d
                return (p_n, v_n, R_n, P_n)

            p, v, R, P = jax.lax.fori_loop(
                0, Ki, imu_body, (p_in, v_in, R_in, P_in)
            )

            # slack-violation observability: the pair list was built at
            # the dead-reckoned prediction with slack*k + base dilation
            dp = p - jnp.stack(
                [pred_t_ref[k, 0], pred_t_ref[k, 1], pred_t_ref[k, 2]]
            )
            slack_dist = jnp.sqrt(dp[0] * dp[0] + dp[1] * dp[1] + dp[2] * dp[2])
            budget = params.superstep_slack * k + params.slack_base
            slack_viol = slack_dist > budget

            # ---- 2) GN registration in the anchor-rebased frame ----
            R_icp, t_reb, A_rows, W, wr2, rmse = gn_register(k, R, p - cx)
            t_icp = t_reb + cx
            enough = W >= 3.0
            R_meas = jnp.where(enough, R_icp, R)
            t_meas = jnp.where(enough, t_icp, p)
            t_meas_reb = jnp.where(enough, t_reb, p - cx)

            # ---- 3) EKF pose update (models/ekf.py:162-184) ----
            r_p = t_meas - p
            r_th = _so3_log_small(_mm3(_t3(R), R_meas))
            r6 = jnp.concatenate([r_p, r_th])

            if params.icp_cov_mode == "gn":
                # sigma^2 (JtJ)^-1, mapped from the left-perturbation
                # frame (T <- exp(dx) T, rebased) to (dp, dtheta_body):
                # dp = rho + phi x t, dtheta_body = R^T phi
                sigma2 = (
                    wr2 / jnp.maximum(W - 6.0, 1.0)
                ) * params.gn_cov_scale
                Ad = [
                    [
                        A_rows[a][b] + (1e-6 if a == b else 0.0)
                        for b in range(6)
                    ]
                    for a in range(6)
                ]
                JtJ_inv = _inv6_cholesky(Ad)
                Sg = sigma2 * JtJ_inv
                Ctop = jnp.concatenate(
                    [eye3, -_skew3(t_meas_reb)], axis=1
                )  # (3, 6)
                Cbot = jnp.concatenate(
                    [eye3 * 0.0, _t3(R_meas)], axis=1
                )
                C = jnp.concatenate([Ctop, Cbot], axis=0)  # (6, 6)
                Rm = _dot_bt(_dot(C, Sg), C)
                r66 = jax.lax.broadcasted_iota(jnp.int32, (6, 6), 0)
                c66 = jax.lax.broadcasted_iota(jnp.int32, (6, 6), 1)
                d66 = (r66 == c66).astype(jnp.float32)
                floor = jnp.where(
                    r66 < 3,
                    params.gn_pos_std_floor**2,
                    params.gn_rot_std_floor**2,
                ) * d66
                Rm = Rm + floor
                if params.gn_anchor_cov:
                    Rm = Rm + S_anchor
            else:
                r66 = jax.lax.broadcasted_iota(jnp.int32, (6, 6), 0)
                c66 = jax.lax.broadcasted_iota(jnp.int32, (6, 6), 1)
                d66 = (r66 == c66).astype(jnp.float32)
                Rm = (
                    jnp.where(
                        r66 < 3,
                        params.icp_pos_std**2,
                        params.icp_rot_std**2,
                    )
                    * d66
                )

            PE = _dot(P, E6)  # (16, 6)
            S66 = _dot_at(E6, PE) + Rm
            S_rows = [[S66[i, j] for j in range(6)] for i in range(6)]
            S_inv = _inv6_cholesky(S_rows)
            Kk = _dot(PE, S_inv)  # (16, 6)
            dx = _matvec(Kk, r6)  # (16,)
            p2 = p + jnp.stack([dx[0], dx[1], dx[2]])
            v2 = v + jnp.stack([dx[3], dx[4], dx[5]])
            R2 = _mm3(R, _so3_exp(jnp.stack([dx[6], dx[7], dx[8]])))
            bg2 = bg + jnp.stack([dx[9], dx[10], dx[11]])
            ba2 = ba + jnp.stack([dx[12], dx[13], dx[14]])
            A = eye16 - _dot_bt(Kk, E6)
            P2 = _dot_bt(_dot(A, P), A) + _dot_bt(_dot(Kk, Rm), Kk)

            # ---- 4) chi^2-gated GPS update (models/ekf.py:187-211) ----
            gv = gps_valid_ref[k] != 0
            z = jnp.stack([gps_ref[k, 0], gps_ref[k, 1], gps_ref[k, 2]])
            var = gps_var_ref[k]
            r3 = z - p2
            S3 = jnp.array(
                [
                    [P2[0, 0] + var, P2[0, 1], P2[0, 2]],
                    [P2[1, 0], P2[1, 1] + var, P2[1, 2]],
                    [P2[2, 0], P2[2, 1], P2[2, 2] + var],
                ]
            )
            S3_inv, _ = _adjugate_transpose_over_det(S3)  # symmetric
            q3 = _mv3(S3_inv, r3)
            chi2 = r3[0] * q3[0] + r3[1] * q3[1] + r3[2] * q3[2]
            accept = (chi2 <= e.gps_chi2_gate) & gv
            acc = jnp.where(accept, 1.0, 0.0)
            PE3 = _dot(P2, E3)  # (16, 3)
            K3 = _dot(PE3, S3_inv)
            dx3 = _matvec(K3, r3)  # (16,)
            p3 = p2 + acc * jnp.stack([dx3[0], dx3[1], dx3[2]])
            v3 = v2 + acc * jnp.stack([dx3[3], dx3[4], dx3[5]])
            R3 = _mm3(
                R2, _so3_exp(acc * jnp.stack([dx3[6], dx3[7], dx3[8]]))
            )
            bg3 = bg2 + acc * jnp.stack([dx3[9], dx3[10], dx3[11]])
            ba3 = ba2 + acc * jnp.stack([dx3[12], dx3[13], dx3[14]])
            A3 = eye16 - acc * _dot_bt(K3, E3)
            P3 = _dot_bt(_dot(A3, P2), A3) + (acc * var) * _dot_bt(K3, K3)

            # ---- 5) predicated state update + outputs ----
            p_out = jnp.where(vld, p3, p_in)
            v_out = jnp.where(vld, v3, v_in)
            R_out = jnp.where(vld, R3, R_in)
            bg_out = jnp.where(vld, bg3, bg)
            ba_out = jnp.where(vld, ba3, ba)
            P_out = jnp.where(vld, P3, P_in)

            vf = jnp.where(vld, 1.0, 0.0)
            top = jnp.concatenate([R_out, p_out[:, None]], axis=1)
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
            bottom = (cols == 3).astype(jnp.float32)
            poses_out_ref[k] = jnp.concatenate([top, bottom], axis=0)
            packed = jnp.stack(
                [
                    vf * rmse,
                    vf * W,
                    vf * acc * jnp.where(gv, 1.0, 0.0),
                    vf * chi2,
                    vf * jnp.where(slack_viol, 1.0, 0.0),
                    vf * slack_dist,
                    vf * jnp.sqrt(jnp.maximum(Rm[0, 0], 0.0)),
                    vf * jnp.sqrt(jnp.maximum(Rm[1, 1], 0.0)),
                    vf * jnp.sqrt(jnp.maximum(Rm[2, 2], 0.0)),
                ]
            )
            stats_out_ref[k] = jnp.concatenate(
                [packed, jnp.zeros(119, jnp.float32)]
            )
            return (p_out, v_out, R_out, bg_out, ba_out, P_out)

        p, v, R, bg, ba, P = jax.lax.fori_loop(
            0, K, frame_body, (p0, v0, R0, bg0, ba0, P0)
        )

        top = jnp.concatenate([R, p[:, None]], axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
        bottom = (cols == 3).astype(jnp.float32)
        state_pose_ref[...] = jnp.concatenate([top, bottom], axis=0)
        state_P_ref[...] = P
        state_vec_ref[...] = jnp.concatenate(
            [v, bg, ba, jnp.zeros(119, jnp.float32)]
        )[None, :]

    return kernel


def lio_superblock(
    pair_start: Array,  # (K, nSt) i32 per-src-tile offsets into pair_tgt
    pair_cnt: Array,  # (K, nSt) i32 per-src-tile admitted-tile counts
    pair_tgt: Array,  # (K, max_pairs) i32 flat row-major target tiles
    valid: Array,  # (K,) bool
    gyro: Array,  # (K, Ki, 3)
    accel: Array,  # (K, Ki, 3)
    dts: Array,  # (K, Ki)
    gps_pos: Array,  # (K, 3)
    gps_var: Array,  # (K,)
    gps_valid: Array,  # (K,) bool
    pred_t: Array,  # (K, 3) dead-reckoned translations
    pose0: Array,  # (4, 4)
    v0: Array,  # (3,)
    bg0: Array,
    ba0: Array,
    P0: Array,  # (15, 15)
    center: Array,  # (3,)
    src_pages: Array,  # (K, nSt, 3, TM)
    tgt_pages: Array,  # (nTt, 6, TN)
    params: LIOSuperblockParams,
    interpret: bool = False,
):
    """One launch for a whole K-frame LIO block.

    Returns (poses (K, 4, 4), stats (K, 128), pose (4, 4), v, bg, ba,
    P (15, 15)); stats lanes: [rmse, n_corr, gps_accepted, gps_chi2,
    slack_violation, slack_dist, x_std_used, y_std_used, z_std_used]
    (the *_std_used lanes are sqrt of the measurement covariance diagonal
    actually fed to the pose update — degenerate-geometry observability)."""
    K, nSt, _, TM = src_pages.shape
    TN = tgt_pages.shape[2]
    Ki = gyro.shape[1]
    kern = _make_lio_superblock_kernel(K, Ki, TM, TN, params)
    P0_pad = jnp.pad(P0.astype(jnp.float32), ((0, 1), (0, 1)))
    vec0 = jnp.concatenate(
        [v0.astype(jnp.float32), bg0.astype(jnp.float32), ba0.astype(jnp.float32)]
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=(),
        in_specs=[smem] * 13 + [vmem] * 4,
        out_specs=[vmem] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((K, 4, 4), jnp.float32),
            jax.ShapeDtypeStruct((K, 128), jnp.float32),
            jax.ShapeDtypeStruct((4, 4), jnp.float32),
            jax.ShapeDtypeStruct((16, 16), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nSt, 1, TM), jnp.float32),
            pltpu.VMEM((nSt, 6, TM), jnp.float32),
        ],
        interpret=interpret,
    )(
        pair_start,
        pair_cnt,
        pair_tgt,
        valid.astype(jnp.int32),
        gyro.reshape(K, Ki * 3),
        accel.reshape(K, Ki * 3),
        dts,
        gps_pos,
        gps_var,
        gps_valid.astype(jnp.int32),
        pred_t,
        vec0,
        center,
        pose0,
        P0_pad,
        src_pages,
        tgt_pages,
    )
    poses, stats, pose_n, P_n, vec_n = outs
    return (
        poses,
        stats,
        pose_n,
        vec_n[0, 0:3],
        vec_n[0, 3:6],
        vec_n[0, 6:9],
        P_n[:15, :15],
    )
