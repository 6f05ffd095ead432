"""Whole-superblock fused kernel: K frames of the fine loop per launch.

The fast pipeline (models/pipeline_fast.py) already amortizes re-crops
and pair-list building per K-frame superblock, but still pays one
`pallas_call` launch plus the inter-frame XLA glue (odometry prediction,
covariance blend, stochastic gate, state selects) PER FRAME — measured
~0.37 ms/frame of fixed cost on v5e against a ~0.4 ms kernel. This
kernel absorbs the ENTIRE fine loop for a superblock into ONE launch:

  per frame k (scalar/4x4 register math unless noted):
    1. odometry prediction pose @ (odom_prev^-1 @ odom_k)
       (localization_node.cpp:89-110, rigid-transpose inverse like
       geometry.inv_T);
    2. covariance-weighted ELEMENT-WISE 4x4 blend with the GPS pose
       (localization_node.cpp:151-179,329);
    3. stochastic filter: transition queue push + z-score gate with the
       reference's quirks — exp(i-Q) weights, per-axis weighted MAD
       clamped to [min, max/3], prediction previous@transition but
       replacement mean transition@previous (stochastic_filter.cpp:72
       vs :106) — unrolled over the Q=4 queue;
    4. the fused fresh-correspondence ICP loop of ops/icp_fused.py
       (associate over the frame's pair list, moment reduction, Newton-
       polar Kabsch step, early exit) — the only vector/MXU part;
    5. predicated state update for invalid frames
       (localization_node.cpp:269-276).

Pose state lives in the ORIGINAL map frame inside the kernel — the
element-wise blend commutes with the rebase but the filter's :106-order
mean pose does NOT, so only the ICP association shifts translations by
the crop center (the target pages' rebase point).

Equivalence with the per-frame path (`_superstep`'s fine scan) is
asserted by tests/test_superblock_kernel.py in interpret mode.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_sensor_fusion_tpu.ops.icp_fused import (
    _mm3,
    _mv3,
    _newton_polar,
    _sum_all,
)
from slam_sensor_fusion_tpu.utils.config import (
    ICPConfig,
    LocalizationConfig,
    StochasticFilterConfig,
)

Array = jax.Array

_BIG = 3.0e38


def _read33(T, r0=0, c0=0):
    """(3,3) block of a loaded (4,4)/(Q,4,4)-slice value, rebuilt from
    scalar reads (direct slices into fori_loop carries trip Mosaic's
    layout inference — see ops/p2p_fused.py)."""
    return jnp.array(
        [
            [T[r0 + 0, c0 + 0], T[r0 + 0, c0 + 1], T[r0 + 0, c0 + 2]],
            [T[r0 + 1, c0 + 0], T[r0 + 1, c0 + 1], T[r0 + 1, c0 + 2]],
            [T[r0 + 2, c0 + 0], T[r0 + 2, c0 + 1], T[r0 + 2, c0 + 2]],
        ]
    )


def _read3(T, col=3):
    return jnp.stack([T[0, col], T[1, col], T[2, col]])


def _pack44(R, t):
    """(R, t) -> (4, 4) without captured constants."""
    top = jnp.concatenate([R, t[:, None]], axis=1)  # (3, 4)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
    bottom = (cols == 3).astype(jnp.float32)
    return jnp.concatenate([top, bottom], axis=0)


def _inv_rigid(R, t):
    """Rigid-transpose inverse (geometry.inv_T semantics — applied even
    to blended priors, matching the device pipeline)."""
    Rt = jnp.array(
        [
            [R[0, 0], R[1, 0], R[2, 0]],
            [R[0, 1], R[1, 1], R[2, 1]],
            [R[0, 2], R[1, 2], R[2, 2]],
        ]
    )
    return Rt, -_mv3(Rt, t)


def _compose(Ra, ta, Rb, tb):
    """(Ra, ta) @ (Rb, tb)."""
    return _mm3(Ra, Rb), _mv3(Ra, tb) + ta


def _make_superblock_kernel(
    K: int,
    tile_src: int,
    tile_tgt: int,
    icp_cfg: ICPConfig,
    filt_cfg: StochasticFilterConfig,
    fixed_gains: bool,
    lazy: bool,
):
    gate = icp_cfg.max_correspondence_dist_sq
    num_iterations = icp_cfg.num_iterations
    eps = icp_cfg.transformation_epsilon
    acc = icp_cfg.acceptable_mean_error
    min_corr = icp_cfg.min_correspondences
    Q = filt_cfg.queue_size
    # exp(i - Q) weights, normalized — python floats, no tracing
    wq = [math.exp(i - Q) for i in range(Q)]
    s = sum(wq)
    wq = [w / s for w in wq]
    mad_lo = filt_cfg.min_distance_per_scan
    mad_hi = filt_cfg.max_distance_per_scan / 3.0
    z_thr = filt_cfg.z_score_threshold

    def kernel(
        # SMEM
        pair_start_ref,  # (K, nSt) i32 per-src-tile offsets into pair_tgt
        pair_cnt_ref,  # (K, nSt) i32 per-src-tile admitted-tile counts
        pair_tgt_ref,  # (K, max_pairs) i32 flat row-major target tiles
        valid_ref,  # (K,) i32
        odom_tr_ref,  # (K,) f32
        gps_tr_ref,  # (K,) f32
        count_ref,  # (1,) i32 filter queue fill
        center_ref,  # (3,) f32 crop rebase point
        # VMEM
        odom_ref,  # (K, 4, 4)
        gps_ref,  # (K, 4, 4)
        pose0_ref,  # (4, 4)
        odom_prev0_ref,  # (4, 4)
        filt_trans0_ref,  # (Q, 4, 4)
        filt_prev0_ref,  # (4, 4)
        src_pages_ref,  # (K, nSt, 3, TM)
        tgt_pages_ref,  # (nTt, 3, TN)
        # outputs (VMEM)
        poses_out_ref,  # (K, 4, 4)
        priors_out_ref,  # (K, 4, 4)
        odom_pred_out_ref,  # (K, 4, 4)
        stats_out_ref,  # (K, 128)
        state_out_ref,  # (Q + 3, 4, 4): pose, odom_prev, filt_prev, queue
        count_out_ref,  # (1, 128) f32 (row 0 col 0 = new count)
        # scratch
        best_d2_ref,  # (nSt, 1, TM)
        best_xyz_ref,  # (nSt, 3, TM)
        alive_ref,  # (nSt, 1, TM) f32 (lazy mode's shrinking set)
    ):
        cx = jnp.stack([center_ref[0], center_ref[1], center_ref[2]])
        nSt_s = best_d2_ref.shape[0]

        U = max(int(icp_cfg.assoc_unroll), 1)

        def associate(k, R, t):
            """icp_fused's tile-major association for frame k's list:
            outer loop over src tiles, inner loop over each tile's
            admitted target run, running best in registers, direct
            (tx-sx)^2 VPU broadcast distances (see ops/icp_fused.py
            associate for the cost analysis vs the per-pair K=3 matmul).
            `assoc_unroll` target tiles per trip amortize the ~4 us
            scalar-loop overhead per sequential trip (§6b's ceiling);
            tail lanes clamp to the run's last tile, which the strict
            `<` winner makes a no-op — bit-identical for any unroll.
            """

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
                        bmin, bx, by, bz = carry
                        j = pair_tgt_ref[k, jnp.minimum(base + u, last)]
                        tt = tgt_pages_ref[j]  # (3, TN)
                        txc = tt[0].reshape(tile_tgt, 1)
                        tyc = tt[1].reshape(tile_tgt, 1)
                        tzc = tt[2].reshape(tile_tgt, 1)
                        dx = txc - sx  # (TN, TM)
                        dy = tyc - sy
                        dz = tzc - sz
                        d2 = dx * dx + dy * dy + dz * dz
                        tile_min = jnp.min(d2, axis=0, keepdims=True)
                        # winner extraction via the min-equality mask: one
                        # (TN,TM) compare + ONE MXU dot yields coords AND
                        # the tie count (tt extended by a ones row) —
                        # replaces argmin + iota + onehot (two extra
                        # full-panel materializations and a reduction).
                        # Exact within-tile d2 ties average their coords
                        # instead of taking the first row; everywhere
                        # else bit-identical (strict-< winner unchanged).
                        sel = (d2 == tile_min).astype(jnp.float32)
                        tt4 = jnp.concatenate(
                            [tt, jnp.ones((1, tile_tgt), jnp.float32)], axis=0
                        )
                        coords = jax.lax.dot_general(
                            tt4, sel, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        inv = 1.0 / jnp.maximum(coords[3:4], 1.0)
                        better = tile_min < bmin
                        carry = (
                            jnp.where(better, tile_min, bmin),
                            jnp.where(better, coords[0:1] * inv, bx),
                            jnp.where(better, coords[1:2] * inv, by),
                            jnp.where(better, coords[2:3] * inv, bz),
                        )
                    return carry

                big = jnp.full((1, tile_src), _BIG)
                zero = jnp.zeros((1, tile_src), jnp.float32)
                trips = (cnt + U - 1) // U
                bmin, bx, by, bz = jax.lax.fori_loop(
                    0, trips, inner, (big, zero, zero, zero)
                )
                best_d2_ref[i] = bmin
                best_xyz_ref[i] = jnp.concatenate([bx, by, bz], axis=0)
                return 0

            jax.lax.fori_loop(0, nSt_s, tile_body, 0)

        def reduce_moments(k, R, t, w):
            s_all = src_pages_ref[k]  # (nSt, 3, TM)
            sx, sy, sz = s_all[:, 0, :], s_all[:, 1, :], s_all[:, 2, :]
            spx = R[0, 0] * sx + R[0, 1] * sy + R[0, 2] * sz + t[0]
            spy = R[1, 0] * sx + R[1, 1] * sy + R[1, 2] * sz + t[1]
            spz = R[2, 0] * sx + R[2, 1] * sy + R[2, 2] * sz + t[2]
            tb = best_xyz_ref[...]
            tx, ty, tz = tb[:, 0, :], tb[:, 1, :], tb[:, 2, :]
            W = _sum_all(w)
            Ss = jnp.stack(
                [_sum_all(spx * w), _sum_all(spy * w), _sum_all(spz * w)]
            )
            St = jnp.stack(
                [_sum_all(tx * w), _sum_all(ty * w), _sum_all(tz * w)]
            )
            Mst = jnp.stack(
                [
                    jnp.stack(
                        [
                            _sum_all(spx * w * tx),
                            _sum_all(spx * w * ty),
                            _sum_all(spx * w * tz),
                        ]
                    ),
                    jnp.stack(
                        [
                            _sum_all(spy * w * tx),
                            _sum_all(spy * w * ty),
                            _sum_all(spy * w * tz),
                        ]
                    ),
                    jnp.stack(
                        [
                            _sum_all(spz * w * tx),
                            _sum_all(spz * w * ty),
                            _sum_all(spz * w * tz),
                        ]
                    ),
                ]
            )
            dx, dy, dz = spx - tx, spy - ty, spz - tz
            Eabs = _sum_all(w * jnp.sqrt(dx * dx + dy * dy + dz * dz))
            return W, Ss, St, Mst, Eabs

        def solve_step(W, Ss, St, Mst):
            from slam_sensor_fusion_tpu.ops.icp_fused import (
                _adjugate_transpose_over_det,
            )

            Wc = jnp.maximum(W, 1.0)
            c_s = Ss / Wc
            c_t = St / Wc
            Hm = Mst - W * jnp.outer(c_s, c_t)
            R_step, polar_ok = _newton_polar(Hm.T)
            _, detH = _adjugate_transpose_over_det(Hm)
            t_step = c_t - _mv3(R_step, c_s)
            return R_step, t_step, polar_ok, detH

        def icp_fresh(k, R0, t0):
            """icp_fused's fresh-correspondence loop on frame k, in the
            REBASED frame (t0 already has the center subtracted)."""

            def iter_body(it, carry):
                R, t, err_prev, n_corr, iters, live, det_min = carry

                def do(R=R, t=t):
                    associate(k, R, t)
                    d2 = best_d2_ref[...][:, 0, :]
                    w = (d2 < gate).astype(jnp.float32)
                    W, Ss, St, Mst, Eabs = reduce_moments(k, R, t, w)
                    Wc = jnp.maximum(W, 1.0)
                    err = jnp.where(
                        W >= min_corr, Eabs / Wc, jnp.float32(_BIG)
                    )
                    R_step, t_step, polar_ok, detH = solve_step(W, Ss, St, Mst)
                    stop = (
                        (err < acc)
                        | (jnp.abs(err_prev - err) < eps)
                        | ~polar_ok
                    )
                    R_new = jnp.where(stop, R, _mm3(R_step, R))
                    t_new = jnp.where(stop, t, _mv3(R_step, t) + t_step)
                    return (
                        R_new,
                        t_new,
                        err,
                        W.astype(jnp.int32),
                        jnp.where(stop, iters, iters + 1),
                        ~stop,
                        jnp.minimum(det_min, detH),
                    )

                def skip():
                    return (R, t, err_prev, n_corr, iters, live, det_min)

                return jax.lax.cond(live, do, skip)

            carry0 = (
                R0,
                t0,
                jnp.float32(_BIG),
                jnp.int32(0),
                jnp.int32(0),
                jnp.bool_(True),
                jnp.float32(_BIG),
            )
            return jax.lax.fori_loop(0, num_iterations, iter_body, carry0)

        def icp_lazy(k, R0, t0):
            """The reference's EXACT lazy control flow for frame k
            (icp_point_to_point.cpp:185-254, same semantics as
            ops/icp_fused.py lazy=True): correspondences found once at
            the prior then FIXED; plateau-triggered re-association; the
            alive set only shrinks; n_corr reports the INITIAL count."""
            associate(k, R0, t0)
            d2_0 = best_d2_ref[...][:, 0, :]
            alive0 = (d2_0 < gate).astype(jnp.float32)
            alive_ref[...] = alive0[:, None, :]
            n_corr0 = _sum_all(alive0).astype(jnp.int32)

            def iter_body(it, carry):
                R, t, err_prev, n_corr, iters, live, det_min = carry

                def do(R=R, t=t):
                    alive = alive_ref[...][:, 0, :]
                    W, Ss, St, Mst, Eabs = reduce_moments(k, R, t, alive)
                    err = Eabs / jnp.maximum(W, 1.0)
                    hit = err < acc
                    plateau = jnp.abs(err_prev - err) < eps
                    need = (~hit) & plateau

                    def reassoc():
                        associate(k, R, t)
                        d2 = best_d2_ref[...][:, 0, :]
                        new_alive = alive * (d2 < gate).astype(jnp.float32)
                        alive_ref[...] = new_alive[:, None, :]
                        return reduce_moments(k, R, t, new_alive)

                    W2, Ss2, St2, Mst2, _ = jax.lax.cond(
                        need, reassoc, lambda: (W, Ss, St, Mst, Eabs)
                    )
                    R_step, t_step, polar_ok, detH = solve_step(
                        W2, Ss2, St2, Mst2
                    )
                    stop = hit | ~polar_ok
                    R_new = jnp.where(stop, R, _mm3(R_step, R))
                    t_new = jnp.where(stop, t, _mv3(R_step, t) + t_step)
                    return (
                        R_new,
                        t_new,
                        err,
                        n_corr,
                        jnp.where(stop, iters, iters + 1),
                        ~stop,
                        jnp.minimum(det_min, detH),
                    )

                def skip():
                    return (R, t, err_prev, n_corr, iters, live, det_min)

                return jax.lax.cond(live, do, skip)

            carry0 = (
                R0,
                t0,
                jnp.float32(_BIG),
                n_corr0,
                jnp.int32(0),
                n_corr0 >= min_corr,
                jnp.float32(_BIG),
            )
            return jax.lax.fori_loop(0, num_iterations, iter_body, carry0)

        icp_run = icp_lazy if lazy else icp_fresh

        # ---- initial state from scalar reads ----
        P0 = pose0_ref[...]
        O0 = odom_prev0_ref[...]
        F0 = filt_prev0_ref[...]
        Rp, tp = _read33(P0), _read3(P0)
        Ro, to = _read33(O0), _read3(O0)
        Rf, tf = _read33(F0), _read3(F0)
        Tq0 = filt_trans0_ref[...]
        trans0 = jnp.stack(
            [
                _pack44(_read33(Tq0[q]), _read3(Tq0[q]))
                for q in range(Q)
            ]
        )
        count0 = count_ref[0]

        def frame_body(k, carry):
            Rp, tp, Ro, to, Rf, tf, trans, count = carry
            v = valid_ref[k] != 0

            Ok = odom_ref[k]
            Gk = gps_ref[k]
            Rok, tok = _read33(Ok), _read3(Ok)
            Rgk, tgk = _read33(Gk), _read3(Gk)

            # 1) odometry prediction
            Roi, toi = _inv_rigid(Ro, to)
            Rd, td = _compose(Roi, toi, Rok, tok)
            Rpred, tpred = _compose(Rp, tp, Rd, td)

            # 2) element-wise covariance blend
            if fixed_gains:
                og = jnp.float32(0.95)
                gg = jnp.float32(0.05)
            else:
                tot = odom_tr_ref[k] + gps_tr_ref[k]
                og = gps_tr_ref[k] / tot
                gg = odom_tr_ref[k] / tot
            Rpr = og * Rpred + gg * Rgk
            tpr = og * tpred + gg * tgk

            # 3) stochastic filter: push transition, z-score gate
            Rfi, tfi = _inv_rigid(Rf, tf)
            Rtr, ttr = _compose(Rfi, tfi, Rpr, tpr)
            T_tr = _pack44(Rtr, ttr)
            not_full = count < Q
            new_trans = []
            for q in range(Q):
                shifted = trans[q + 1] if q < Q - 1 else T_tr
                filling = jnp.where(
                    count == q, 1.0, 0.0
                )  # slot select while filling
                keep_or_write = filling * T_tr + (1.0 - filling) * trans[q]
                new_trans.append(
                    jnp.where(not_full, keep_or_write, shifted)
                )
            new_trans = jnp.stack(new_trans)
            new_count = jnp.minimum(count + 1, Q)

            # z-score vs the queue's prediction, rooted at the POSTERIOR
            # pose (pipeline passes map_T_sensor as origin_previous)
            mean_x = jnp.float32(0.0)
            mean_y = jnp.float32(0.0)
            mean_z = jnp.float32(0.0)
            pxs = []
            for q in range(Q):
                ttq = jnp.stack(
                    [new_trans[q, 0, 3], new_trans[q, 1, 3], new_trans[q, 2, 3]]
                )
                px = _mv3(Rp, ttq) + tp
                pxs.append(px)
                mean_x = mean_x + wq[q] * px[0]
                mean_y = mean_y + wq[q] * px[1]
                mean_z = mean_z + wq[q] * px[2]
            mad_x = jnp.float32(0.0)
            mad_y = jnp.float32(0.0)
            mad_z = jnp.float32(0.0)
            for q in range(Q):
                mad_x = mad_x + wq[q] * jnp.abs(pxs[q][0] - mean_x)
                mad_y = mad_y + wq[q] * jnp.abs(pxs[q][1] - mean_y)
                mad_z = mad_z + wq[q] * jnp.abs(pxs[q][2] - mean_z)
            mad_x = jnp.clip(mad_x, mad_lo, mad_hi)
            mad_y = jnp.clip(mad_y, mad_lo, mad_hi)
            mad_z = jnp.clip(mad_z, mad_lo, mad_hi)
            z = jnp.maximum(
                jnp.abs(tpr[0] - mean_x) / mad_x,
                jnp.maximum(
                    jnp.abs(tpr[1] - mean_y) / mad_y,
                    jnp.abs(tpr[2] - mean_z) / mad_z,
                ),
            )
            z = jnp.where(new_count < Q, 0.0, z)

            # replacement mean pose: sum_q w_q (transition_q @ pose)
            # (the reference's :106 operand order)
            mean_pose = jnp.zeros((4, 4), jnp.float32)
            for q in range(Q):
                Rq = _read33(new_trans[q])
                tq = _read3(new_trans[q])
                Rc, tc_ = _compose(Rq, tq, Rp, tp)
                mean_pose = mean_pose + wq[q] * _pack44(Rc, tc_)
            gated = z > z_thr
            Rg = jnp.where(gated, _read33(mean_pose), Rpr)
            tg = jnp.where(gated, _read3(mean_pose), tpr)

            # 4) fused ICP in the rebased frame
            Ricp, ticp, err, n_corr, iters, live, det_min = icp_run(
                k, Rg, tg - cx
            )
            ticp = ticp + cx
            enough = n_corr >= min_corr
            Rfin = jnp.where(enough, Ricp, Rg)
            tfin = jnp.where(enough, ticp, tg)
            err_out = jnp.where(enough, err, jnp.float32(1e6))
            conv = enough & (err < acc)

            # 5) predicated state update + outputs
            Rp_new = jnp.where(v, Rfin, Rp)
            tp_new = jnp.where(v, tfin, tp)
            Ro_new = jnp.where(v, Rok, Ro)
            to_new = jnp.where(v, tok, to)
            Rf_new = jnp.where(v, Rpr, Rf)
            tf_new = jnp.where(v, tpr, tf)
            trans_new = jnp.where(v, new_trans, trans)
            count_new = jnp.where(v, new_count, count)

            vf = v.astype(jnp.float32)
            poses_out_ref[k] = _pack44(Rp_new, tp_new)
            priors_out_ref[k] = vf * _pack44(Rg, tg)
            odom_pred_out_ref[k] = vf * _pack44(Rpred, tpred)
            packed = jnp.stack(
                [
                    vf * jnp.where(enough, err_out, jnp.float32(1e6)),
                    vf * jnp.where(enough, iters, 0).astype(jnp.float32),
                    vf * n_corr.astype(jnp.float32),
                    vf * jnp.where(v & conv, 1.0, 0.0),
                    vf * det_min,
                ]
            )
            stats_out_ref[k] = jnp.concatenate(
                [packed, jnp.zeros(123, jnp.float32)]
            )
            return (
                Rp_new, tp_new, Ro_new, to_new, Rf_new, tf_new,
                trans_new, count_new,
            )

        Rp, tp, Ro, to, Rf, tf, trans, count = jax.lax.fori_loop(
            0, K, frame_body, (Rp, tp, Ro, to, Rf, tf, trans0, count0)
        )

        state_out_ref[0] = _pack44(Rp, tp)
        state_out_ref[1] = _pack44(Ro, to)
        state_out_ref[2] = _pack44(Rf, tf)
        for q in range(Q):
            state_out_ref[3 + q] = _pack44(_read33(trans[q]), _read3(trans[q]))
        count_out_ref[...] = jnp.concatenate(
            [count.astype(jnp.float32)[None], jnp.zeros(127, jnp.float32)]
        )[None, :]

    return kernel


def superblock_fine(
    src_pages: Array,  # (K, nSt, 3, TM)
    pair_start: Array,  # (K, nSt) per-src-tile offsets into pair_tgt
    pair_cnt: Array,  # (K, nSt) per-src-tile admitted-tile counts
    pair_tgt: Array,  # (K, max_pairs) flat row-major target tiles
    valid: Array,  # (K,) bool
    odom_T: Array,  # (K, 4, 4)
    gps_T: Array,  # (K, 4, 4)
    odom_tr: Array,  # (K,)
    gps_tr: Array,  # (K,)
    pose: Array,  # (4, 4)
    odom_prev: Array,  # (4, 4)
    filt_trans: Array,  # (Q, 4, 4)
    filt_count: Array,  # () i32
    filt_prev: Array,  # (4, 4)
    center: Array,  # (3,)
    tgt_pages: Array,  # (nTt, 3, TN)
    config: LocalizationConfig,
    interpret: bool = False,
):
    """One launch for a whole superblock's fine loop. Returns
    (poses (K,4,4), priors, odom_preds, stats (K,128), new_pose,
    new_odom_prev, new_filt_trans, new_filt_count, new_filt_prev)."""
    K, nSt, _, TM = src_pages.shape
    TN = tgt_pages.shape[2]
    Q = config.filter.queue_size
    kern = _make_superblock_kernel(
        K, TM, TN, config.icp, config.filter, config.fixed_gains,
        lazy=config.icp.mode == "parity",
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=(),
        in_specs=[smem] * 8 + [vmem] * 8,
        out_specs=[vmem] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((K, 4, 4), jnp.float32),
            jax.ShapeDtypeStruct((K, 4, 4), jnp.float32),
            jax.ShapeDtypeStruct((K, 4, 4), jnp.float32),
            jax.ShapeDtypeStruct((K, 128), jnp.float32),
            jax.ShapeDtypeStruct((Q + 3, 4, 4), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nSt, 1, TM), jnp.float32),
            pltpu.VMEM((nSt, 3, TM), jnp.float32),
            pltpu.VMEM((nSt, 1, TM), jnp.float32),
        ],
        interpret=interpret,
    )(
        pair_start,
        pair_cnt,
        pair_tgt,
        valid.astype(jnp.int32),
        odom_tr,
        gps_tr,
        filt_count[None].astype(jnp.int32),
        center,
        odom_T,
        gps_T,
        pose,
        odom_prev,
        filt_trans,
        filt_prev,
        src_pages,
        tgt_pages,
    )
    poses, priors, odom_preds, stats, state_out, count_out = outs
    return (
        poses,
        priors,
        odom_preds,
        stats,
        state_out[0],
        state_out[1],
        state_out[3 : 3 + Q],
        count_out[0, 0].astype(jnp.int32),
        state_out[2],
    )
