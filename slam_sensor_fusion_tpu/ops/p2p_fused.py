"""Whole-GN fused point-to-plane kernel — the native LIO fast path.

`ops/point_to_plane.py` runs each Gauss-Newton iteration as a separate
pallas NN launch plus XLA glue (gathers, einsum, 6x6 solve, se3_exp): at
LIO shapes that is ~5 kernel launches and a few hundred XLA ops per
frame, dominated by dispatch rather than compute. This kernel runs the
ENTIRE registration in ONE `pallas_call`, the same treatment
`ops/icp_fused.py` gives the reference's point-to-point ICP
(icp_point_to_point.cpp:185-254 is the analogous loop upstream of the
reference's assumed FAST-LIO, which this native mode absorbs):

  per GN iteration (all inside VMEM):
    1. associate: loop the culled tile-pair list; target pages carry SIX
       rows (xyz + normal), so the one-hot argmin contraction fetches the
       matched point AND its normal in a single (6, TN) x (TN, TM) MXU
       pass;
    2. reduce: residuals r = n.(p'-q), Huber weights, Jacobian rows
       J = [n, p' x n], and the 21+6 unique JtJ/Jtr moments as full-width
       VPU reductions;
    3. solve: 6x6 Cholesky, fully unrolled in scalar registers;
    4. update: T <- exp(dx) T with a Taylor-series SE(3) exponential
       (|dx| after an IMU prior is ~1e-2 rad — the 4-term series is
       exact to ~1e-9 there) followed by one Newton-polar step to pin
       orthogonality.

Iteration count is FIXED (no early exit) to match the XLA path
(`point_to_plane_align`) bit-for-bit in structure — the two paths are
cross-checked by tests/test_p2p_fused.py. Invalid normals are encoded as
ZERO vectors in the pages: they contribute nothing to the moments and
are excluded from the correspondence count by the |n|^2 > 0.5 test.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_sensor_fusion_tpu.ops import geometry
from slam_sensor_fusion_tpu.ops.icp_fused import (
    _adjugate_transpose_over_det,
    _mm3,
    _mv3,
    _sum_all,
)
from slam_sensor_fusion_tpu.ops.morton import tile_bboxes
from slam_sensor_fusion_tpu.ops.nn_gated import pair_tiles
from slam_sensor_fusion_tpu.ops.nn_pallas import _build_tile_pair_list, make_pages
from slam_sensor_fusion_tpu.ops.point_to_plane import (
    PointToPlaneConfig,
    PointToPlaneResult,
    pose_covariance_from_jtj,
)

Array = jax.Array

_BIG = 3.0e38


def _chol6_solve(A_rows, b):
    """Solve (6x6 SPD) A x = b by fully unrolled scalar Cholesky.

    `A_rows` is a 6x6 nested tuple/list of scalars, `b` a list of 6
    scalars; returns a list of 6 scalars. All ops are scalar jnp — Mosaic
    keeps them in registers (same style as icp_fused's 3x3 adjugate).
    """
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = A_rows[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L y = b
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _se3_exp_taylor(rho, phi):
    """exp([phi]x, rho) -> (R, t) via 4-term Taylor series (scalar math).

    A = sin(th)/th, B = (1-cos th)/th^2, C = (1-A)/th^2 expanded to th^6:
    relative truncation error < 1e-6 for |th| < 0.5 rad — far beyond any
    sane GN step. No transcendentals (Mosaic scalar core friendly).
    """
    t2 = phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2]
    A = 1.0 - t2 / 6.0 * (1.0 - t2 / 20.0 * (1.0 - t2 / 42.0))
    B = 0.5 * (1.0 - t2 / 12.0 * (1.0 - t2 / 30.0 * (1.0 - t2 / 56.0)))
    C = (1.0 / 6.0) * (1.0 - t2 / 20.0 * (1.0 - t2 / 42.0 * (1.0 - t2 / 72.0)))
    wx, wy, wz = phi[0], phi[1], phi[2]
    # K = [phi]x, K2 = K @ K written out
    K = jnp.array([[0.0 * wx, -wz, wy], [wz, 0.0 * wx, -wx], [-wy, wx, 0.0 * wx]])
    K2 = _mm3(K, K)
    # identity without a captured constant (pallas rejects those)
    rows = jax.lax.broadcasted_iota(jnp.int32, (3, 3), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (3, 3), 1)
    eye = (rows == cols).astype(jnp.float32)
    R = eye + A * K + B * K2
    V = eye + B * K + C * K2
    t = _mv3(V, rho)
    return R, t


def _polar_polish(R):
    """One Newton-polar step X <- (X + X^-T)/2: restores orthogonality of
    a nearly-orthogonal matrix to ~machine precision."""
    R_invT, _ = _adjugate_transpose_over_det(R)
    return 0.5 * (R + R_invT)


def _build_associate(
    tile_src: int,
    tile_tgt: int,
    pair_start_ref,
    pair_cnt_ref,
    pair_tgt_ref,
    src_pages_ref,
    tgt_pages_ref,
    best_d2_ref,
    best_qn_ref,
    unroll: int = 1,
):
    """Return `associate(R, t)` writing per-point winners into the best
    refs (scratch in the fused kernel, outputs in the assoc-only kernel).

    Tile-major association with register-carried best and direct
    (tx-sx)^2 VPU broadcast distances — see ops/icp_fused.py associate
    for the cost analysis vs the per-pair K=3 f32 matmul formulation."""
    nSt_s = best_d2_ref.shape[0]

    U = max(int(unroll), 1)

    def associate(R, t):
        # `unroll` target tiles per sequential trip amortize the
        # ~4 us/trip scalar-loop overhead (ARCHITECTURE §6b); tail
        # lanes clamp to the run's last tile — a no-op under the
        # strict `<` winner, so results are bit-identical for any U.
        def tile_body(i, _):
            sp = src_pages_ref[i]  # (3, TM)
            spx, spy, spz = sp[0:1], sp[1:2], sp[2:3]
            sx = R[0, 0] * spx + R[0, 1] * spy + R[0, 2] * spz + t[0]
            sy = R[1, 0] * spx + R[1, 1] * spy + R[1, 2] * spz + t[1]
            sz = R[2, 0] * spx + R[2, 1] * spy + R[2, 2] * spz + t[2]
            start = pair_start_ref[i]
            cnt = pair_cnt_ref[i]
            last = start + cnt - 1

            def inner(q, carry):
                base = start + q * U
                for u in range(U):
                    bmin, bqn = carry
                    j = pair_tgt_ref[jnp.minimum(base + u, last)]
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

    return associate


def _make_p2p_kernel(tile_src: int, tile_tgt: int, config: PointToPlaneConfig):
    fixed_corr = config.fixed_correspondences

    def kernel(
        pair_start_ref,  # (nSt,) SMEM: per-src-tile offset into pair_tgt
        pair_cnt_ref,  # (nSt,) SMEM: per-src-tile admitted-tile count
        pair_tgt_ref,  # (max_pairs,) SMEM: flat row-major target tiles
        T0_ref,  # (4, 4) VMEM — rebased initial transform
        src_pages_ref,  # (nSt, 3, TM) rebased, invalid -> +FAR
        tgt_pages_ref,  # (nTt, 6, TN): rows 0-2 xyz (-FAR invalid), 3-5 normal (0 invalid)
        T_out_ref,  # (4, 4) VMEM
        stats_ref,  # (1, 128) VMEM: [rmse, n_corr, iters, 0...]
        best_d2_ref,  # scratch (nSt, 1, TM)
        best_qn_ref,  # scratch (nSt, 6, TM)
    ):
        associate = _build_associate(
            tile_src, tile_tgt, pair_start_ref, pair_cnt_ref, pair_tgt_ref,
            src_pages_ref, tgt_pages_ref, best_d2_ref, best_qn_ref,
            unroll=config.assoc_unroll,
        )
        gn_moments = _build_gn_moments(
            config, src_pages_ref, best_d2_ref, best_qn_ref, associate
        )
        _gn_drive(
            config, T0_ref, T_out_ref, stats_ref, gn_moments,
            associate_at_prior=associate if fixed_corr else None,
            reassociate=not fixed_corr,
        )

    return kernel


def _build_gn_moments(
    config: PointToPlaneConfig, src_pages_ref, best_d2_ref, best_qn_ref,
    associate,
):
    """Return `gn_moments(R, t, reassociate)` — association (unless held
    fixed) + full JtJ/Jtr reduction; yields (A_rows 6x6 scalars, b 6
    scalars, W, sum w r^2). Shared between the whole-GN fused kernel and
    the correspondence-input kernel (associate=None)."""
    gate = config.max_correspondence_dist_sq
    delta = config.huber_delta
    damping = config.damping

    def gn_moments(R, t, reassociate=True):
        if reassociate:
            associate(R, t)
        s_all = src_pages_ref[...]  # (nSt, 3, TM)
        sx, sy, sz = s_all[:, 0, :], s_all[:, 1, :], s_all[:, 2, :]
        px = R[0, 0] * sx + R[0, 1] * sy + R[0, 2] * sz + t[0]
        py = R[1, 0] * sx + R[1, 1] * sy + R[1, 2] * sz + t[1]
        pz = R[2, 0] * sx + R[2, 1] * sy + R[2, 2] * sz + t[2]
        qn = best_qn_ref[...]
        qx, qy, qz = qn[:, 0, :], qn[:, 1, :], qn[:, 2, :]
        nx, ny, nz = qn[:, 3, :], qn[:, 4, :], qn[:, 5, :]
        d2 = best_d2_ref[...][:, 0, :]

        # invalid normals are stored as 0-vectors -> |n|^2 < 0.5
        w_in = jnp.where(
            (d2 < gate) & (nx * nx + ny * ny + nz * nz > 0.5), 1.0, 0.0
        )
        r = nx * (px - qx) + ny * (py - qy) + nz * (pz - qz)
        absr = jnp.abs(r)
        w = w_in * jnp.minimum(1.0, delta / jnp.maximum(absr, 1e-12))

        # J = [n, p' x n]
        J3 = py * nz - pz * ny
        J4 = pz * nx - px * nz
        J5 = px * ny - py * nx
        J = (nx, ny, nz, J3, J4, J5)
        # ONE stacked (29, nSt, TM) reduction instead of 29 separate
        # full-plane reductions — per-op issue overhead of the many
        # small VPU reductions dominates the GN iteration otherwise
        wJ = [w * J[a] for a in range(6)]
        planes = (
            [wJ[a] * J[b] for a in range(6) for b in range(a + 1)]
            + [wJ[a] * r for a in range(6)]
            + [w_in, w_in * r * r]
        )
        stack = jnp.stack(planes)  # (29, nSt, TM)
        tot = jnp.sum(jnp.sum(stack, axis=2), axis=1)  # (29,)
        A_rows = [[None] * 6 for _ in range(6)]
        k = 0
        for a in range(6):
            for b in range(a + 1):
                A_rows[a][b] = tot[k]
                A_rows[b][a] = tot[k]
                k += 1
        for a in range(6):
            A_rows[a][a] = A_rows[a][a] + damping
        bvec = [tot[21 + a] for a in range(6)]
        W = tot[27]
        wr2 = tot[28]
        return A_rows, bvec, W, wr2

    return gn_moments


def _read_T0_scalars(T0_ref):
    """(4,4) ref -> (R0 (3,3), t0 (3,)) rebuilt from scalar reads:
    feeding the strided (3,)/(3,3) ref slices straight into a fori_loop
    carry trips Mosaic's layout inference (layout.h:320 check, bisected
    on v5e); scalar-built vectors carry the plain rank-1 layout."""
    T0 = T0_ref[...]
    t0 = jnp.stack([T0[0, 3], T0[1, 3], T0[2, 3]])
    R0 = jnp.array(
        [
            [T0[0, 0], T0[0, 1], T0[0, 2]],
            [T0[1, 0], T0[1, 1], T0[1, 2]],
            [T0[2, 0], T0[2, 1], T0[2, 2]],
        ]
    )
    return R0, t0


def _gn_drive(
    config: PointToPlaneConfig, T0_ref, T_out_ref, stats_ref, gn_moments,
    associate_at_prior, reassociate: bool,
):
    """The unrolled GN iteration loop + trailing stats pass + output
    packing (num_iterations is small + static): num_iterations stepped
    passes, then one STATS-ONLY pass — moments at the final transform, no
    step — the same contract as point_to_plane_align's trailing stats
    association; unrolling leaves the final pass's JtJ moments in hand
    for the covariance export.

    `associate_at_prior` (fixed-correspondence mode): one association at
    the prior; iterations and the stats pass reuse the matched set
    (residuals still re-evaluate at the CURRENT transform every
    iteration)."""
    num_iterations = config.num_iterations
    R0, t0 = _read_T0_scalars(T0_ref)
    if associate_at_prior is not None:
        associate_at_prior(R0, t0)

    R, t = R0, t0
    for _ in range(num_iterations):
        A_rows, bvec, W, wr2 = gn_moments(R, t, reassociate=reassociate)
        x = _chol6_solve(A_rows, bvec)
        # a starved frame must not step (mirrors point_to_plane_align's
        # damped-solve of a near-empty system degenerating to ~0)
        ok = jnp.where(W >= 3.0, 1.0, 0.0).astype(jnp.float32)
        rho = jnp.stack([-x[0] * ok, -x[1] * ok, -x[2] * ok])
        phi = jnp.stack([-x[3] * ok, -x[4] * ok, -x[5] * ok])
        R_step, t_step = _se3_exp_taylor(rho, phi)
        R_step = _polar_polish(R_step)
        R = _mm3(R_step, R)
        t = _mv3(R_step, t) + t_step
    A_rows, bvec, W, wr2 = gn_moments(R, t, reassociate=reassociate)
    rmse = jnp.sqrt(wr2 / jnp.maximum(W, 1.0))

    top = jnp.concatenate([R, t[:, None]], axis=1)  # (3, 4)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
    bottom = (cols == 3).astype(jnp.float32)
    T_out_ref[...] = jnp.concatenate([top, bottom], axis=0)
    # lanes 3-23: the 21 unique (damped) JtJ entries of the final
    # stats pass, row-major lower triangle; lane 24: wr2
    packed = jnp.stack(
        [rmse, W, jnp.float32(num_iterations)]
        + [A_rows[a][b] for a in range(6) for b in range(a + 1)]
        + [wr2]
    )
    stats_ref[...] = jnp.concatenate(
        [packed, jnp.zeros(103, jnp.float32)]
    )[None, :]


class CachedP2PTarget(NamedTuple):
    """Target-side structures reused across frames until the anchor
    refreshes (the LIO ring's Morton re-sort + normal re-estimation)."""

    pages: Array  # (nTt, 6, TN) xyz rebased by `center` + normals
    lo: Array  # (nTt, 3) tile bbox minima (original frame)
    hi: Array
    center: Array  # (3,)
    #: optional FINE gating sub-boxes (nTt * qt, 3), row-major per tile —
    #: see ops/nn_gated.subtile_pair_dist2 (ragged-Morton-tile cull)
    sub_lo: Array | None = None
    sub_hi: Array | None = None


def build_cached_p2p_target(
    target: Array,
    target_mask: Array,
    normals: Array,
    normals_valid: Array,
    center: Array,
    tile_tgt: int,
    gate_sub: int | None = None,
) -> CachedP2PTarget:
    """Pack xyz+normal 6-row pages and per-tile bboxes once per anchor.

    `gate_sub` (points per gating sub-box, divides tile_tgt) additionally
    stores fine sub-boxes for sub-tile pair culling."""
    xyz_pages = make_pages(target, target_mask, center, tile_tgt, sentinel=-1.0e7)
    n_safe = jnp.where(
        (target_mask & normals_valid)[:, None], normals.astype(jnp.float32), 0.0
    )
    n = target.shape[0]
    nrm_pages = jnp.swapaxes(n_safe.reshape(n // tile_tgt, tile_tgt, 3), 1, 2)
    pages = jnp.concatenate([xyz_pages, nrm_pages], axis=1)  # (nTt, 6, TN)
    lo, hi, _ = tile_bboxes(target, target_mask, tile_tgt)
    sub_lo = sub_hi = None
    if gate_sub is not None:
        sub_lo, sub_hi, _ = tile_bboxes(target, target_mask, gate_sub)
    return CachedP2PTarget(
        pages=pages, lo=lo, hi=hi, center=center, sub_lo=sub_lo, sub_hi=sub_hi
    )


def point_to_plane_align_fused(
    source: Array,
    source_mask: Array,
    cached: CachedP2PTarget,
    initial_T: Array,
    config: PointToPlaneConfig = PointToPlaneConfig(),
    interpret: bool = False,
) -> PointToPlaneResult:
    """Whole-GN point-to-plane registration in one pallas_call.

    Semantics match `point_to_plane_align` (fresh correspondences per
    iteration, fixed iteration count, Huber weights, damped 6x6 solve,
    trailing stats pass) — cross-checked by tests/test_p2p_fused.py.
    The pair list is built ONCE at the prior with `reassoc_margin`
    dilation; with an IMU prior the GN correction stays well inside it.
    """
    M = source.shape[0]
    TM, TN = config.tile_src, config.tile_tgt
    nSt = M // TM
    center = cached.center
    gate = config.max_correspondence_dist_sq
    search_r2 = (math.sqrt(gate) + config.reassoc_margin) ** 2

    pts0 = geometry.transform_points(initial_T, source)
    lo_s, hi_s, cnt_s = tile_bboxes(pts0, source_mask, TM)
    visits, counts, v_overflow = pair_tiles(
        lo_s, hi_s, cnt_s, cached.lo, cached.hi, search_r2, config.max_visits
    )
    max_pairs = nSt * config.max_pairs_factor
    pair_start, pair_cnt, pair_tgt = _build_tile_pair_list(
        visits, counts, max_pairs
    )
    del v_overflow  # LIO surfaces overflow through rmse/count divergence

    src_pages = make_pages(source, source_mask, center * 0, TM, sentinel=1.0e7)
    eye3 = jnp.eye(3, dtype=jnp.float32)
    shift = geometry.make_T(eye3, center)
    unshift = geometry.make_T(eye3, -center)

    T_out, stats = pl.pallas_call(
        _make_p2p_kernel(TM, TN, config),
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, 4), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nSt, 1, TM), jnp.float32),
            pltpu.VMEM((nSt, 6, TM), jnp.float32),
        ],
        interpret=interpret,
    )(pair_start, pair_cnt, pair_tgt, unshift @ initial_T, src_pages, cached.pages)

    return _result_from_kernel_outputs(T_out, stats, shift)


def _result_from_kernel_outputs(
    T_out: Array, stats: Array, shift: Array
) -> PointToPlaneResult:
    """Rebuild the (damped) JtJ of the final stats pass from the 21
    packed lower-triangle lanes; the GN ran in the REBASED frame, so
    the covariance mapping uses the PRE-shift transform."""
    tri = stats[0, 3:24]
    JtJ = jnp.zeros((6, 6), jnp.float32)
    k = 0
    for a in range(6):
        for b in range(a + 1):
            JtJ = JtJ.at[a, b].set(tri[k]).at[b, a].set(tri[k])
            k += 1
    return PointToPlaneResult(
        transformation=shift @ T_out,
        rmse=stats[0, 0],
        n_correspondences=stats[0, 1].astype(jnp.int32),
        cov_pose=pose_covariance_from_jtj(JtJ, T_out),
        wr2=stats[0, 24],
    )


def _make_assoc_kernel(tile_src: int, tile_tgt: int, unroll: int = 1):
    """Association-only kernel: ONE pass at the prior, winners written to
    the output refs. The map-sharded (`sp`) registration path runs this
    per device over its local map shard (parallel/map_shard.py)."""

    def kernel(
        pair_start_ref,  # (nSt,) SMEM
        pair_cnt_ref,  # (nSt,) SMEM
        pair_tgt_ref,  # (max_pairs,) SMEM
        T0_ref,  # (4, 4) VMEM — rebased prior
        src_pages_ref,  # (nSt, 3, TM)
        tgt_pages_ref,  # (nTt, 6, TN)
        d2_out_ref,  # (nSt, 1, TM) VMEM out
        qn_out_ref,  # (nSt, 6, TM) VMEM out
    ):
        associate = _build_associate(
            tile_src, tile_tgt, pair_start_ref, pair_cnt_ref, pair_tgt_ref,
            src_pages_ref, tgt_pages_ref, d2_out_ref, qn_out_ref,
            unroll=unroll,
        )
        R0, t0 = _read_T0_scalars(T0_ref)
        associate(R0, t0)

    return kernel


def _make_gn_corr_kernel(config: PointToPlaneConfig):
    """Fixed-correspondence GN with the matched set provided as INPUTS
    (the sp path's combined winners) instead of computed in-kernel."""

    def kernel(
        T0_ref,  # (4, 4) VMEM — rebased prior
        src_pages_ref,  # (nSt, 3, TM)
        d2_in_ref,  # (nSt, 1, TM)
        qn_in_ref,  # (nSt, 6, TM)
        T_out_ref,  # (4, 4) VMEM
        stats_ref,  # (1, 128) VMEM
    ):
        gn_moments = _build_gn_moments(
            config, src_pages_ref, d2_in_ref, qn_in_ref, associate=None
        )
        _gn_drive(
            config, T0_ref, T_out_ref, stats_ref, gn_moments,
            associate_at_prior=None, reassociate=False,
        )

    return kernel


def associate_p2p_fused(
    source: Array,
    source_mask: Array,
    cached: CachedP2PTarget,
    initial_T: Array,
    config: PointToPlaneConfig = PointToPlaneConfig(),
    interpret: bool = False,
) -> tuple[Array, Array]:
    """One association pass at `initial_T` against the cached target.

    Returns (best_d2 (nSt, 1, TM), best_qn (nSt, 6, TM)) — squared
    distances and matched point+normal pages in the frame REBASED by
    `cached.center`. Same prologue (bbox cull, pair list) and in-kernel
    association as `point_to_plane_align_fused`; winners from disjoint
    targets can be min-combined elementwise (sp map sharding)."""
    M = source.shape[0]
    TM, TN = config.tile_src, config.tile_tgt
    nSt = M // TM
    gate = config.max_correspondence_dist_sq
    search_r2 = (math.sqrt(gate) + config.reassoc_margin) ** 2

    pts0 = geometry.transform_points(initial_T, source)
    lo_s, hi_s, cnt_s = tile_bboxes(pts0, source_mask, TM)
    visits, counts, _ = pair_tiles(
        lo_s, hi_s, cnt_s, cached.lo, cached.hi, search_r2, config.max_visits
    )
    max_pairs = nSt * config.max_pairs_factor
    pair_start, pair_cnt, pair_tgt = _build_tile_pair_list(
        visits, counts, max_pairs
    )
    src_pages = make_pages(
        source, source_mask, cached.center * 0, TM, sentinel=1.0e7
    )
    eye3 = jnp.eye(3, dtype=jnp.float32)
    unshift = geometry.make_T(eye3, -cached.center)

    d2, qn = pl.pallas_call(
        _make_assoc_kernel(TM, TN, unroll=config.assoc_unroll),
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nSt, 1, TM), jnp.float32),
            jax.ShapeDtypeStruct((nSt, 6, TM), jnp.float32),
        ],
        interpret=interpret,
    )(pair_start, pair_cnt, pair_tgt, unshift @ initial_T, src_pages, cached.pages)
    return d2, qn


def p2p_gn_from_correspondences(
    source: Array,
    source_mask: Array,
    best_d2: Array,
    best_qn: Array,
    initial_T: Array,
    center: Array,
    config: PointToPlaneConfig = PointToPlaneConfig(),
    interpret: bool = False,
) -> PointToPlaneResult:
    """Fixed-correspondence GN on a precomputed matched set.

    `best_d2`/`best_qn` are association winners in the frame rebased by
    `center` (from `associate_p2p_fused`, possibly min-combined across
    map shards). Semantics equal `point_to_plane_align_fused` with
    `fixed_correspondences=True` whose association produced the same
    winners — cross-checked by tests/test_parallel.py's sp-p2p test."""
    TM = config.tile_src
    src_pages = make_pages(source, source_mask, center * 0, TM, sentinel=1.0e7)
    eye3 = jnp.eye(3, dtype=jnp.float32)
    shift = geometry.make_T(eye3, center)
    unshift = geometry.make_T(eye3, -center)

    T_out, stats = pl.pallas_call(
        _make_gn_corr_kernel(config),
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, 4), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        interpret=interpret,
    )(unshift @ initial_T, src_pages, best_d2, best_qn)
    return _result_from_kernel_outputs(T_out, stats, shift)
