"""LiDAR-inertial odometry with a rolling local map (native mode).

The reference ASSUMES an external FAST-LIO-style odometry upstream (its
`/Odometry` + `/cloud_registered_body` inputs); the north star absorbs it
(BASELINE.json configs 2-3): deskewed scans register against a local map
by point-to-plane Gauss-Newton, fused with IMU propagation through the
error-state EKF (models/ekf.py).

TPU-first structure (everything fixed-shape, one jitted step per frame):

* the local map is a RING of the last `window` keyframes' downsampled
  scans (window x slot_points). Insertion is one dynamic_update_slice —
  no voxel-hash mutation, no sort. Density naturally concentrates around
  the trajectory, which is exactly what registration wants;
* target normals are refreshed by voxel-PCA (ops/point_to_plane.
  estimate_normals) only when the anchor refreshes — every
  `refresh_every` frames — mirroring the reference's amortized re-crop
  cadence (localization_node.cpp:299-305), under `lax.cond`;
* per frame: EKF-propagated prior -> point-to-plane GN against the
  anchored map -> EKF pose update (+ optional GPS update) -> scan
  inserted into the ring.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_sensor_fusion_tpu.models import ekf
from slam_sensor_fusion_tpu.ops import cloud as cl
from slam_sensor_fusion_tpu.ops import geometry
from slam_sensor_fusion_tpu.ops.morton import sort_by_morton
from slam_sensor_fusion_tpu.ops.p2p_fused import (
    CachedP2PTarget,
    build_cached_p2p_target,
    point_to_plane_align_fused,
)
from slam_sensor_fusion_tpu.ops.point_to_plane import (
    PointToPlaneConfig,
    estimate_normals,
    estimate_normals_cells,
    estimate_normals_tiled,
    point_to_plane_align,
)

Array = jax.Array


class LIOConfig(NamedTuple):
    scan_capacity: int = 16384
    #: ring slots and points per slot: local map = window * slot_points
    window: int = 16
    slot_points: int = 4096
    #: refresh the registration anchor (Morton sort + normals) every N frames
    refresh_every: int = 8
    p2p: PointToPlaneConfig = PointToPlaneConfig()
    ekf: ekf.EKFConfig = ekf.EKFConfig()
    icp_pos_std: float = 0.03
    icp_rot_std: float = 0.01
    #: "constant" = fixed stds above; "gn" = the registration's own
    #: sigma^2 (JtJ)^-1 covariance (adjoint-mapped to (dp, dtheta_body)),
    #: floored below — no per-world std sweep needed
    icp_cov_mode: str = "constant"
    gn_cov_scale: float = 1.0
    gn_pos_std_floor: float = 0.02
    gn_rot_std_floor: float = 0.005
    #: gn mode: add the anchor-refresh-time pose covariance to the
    #: measurement covariance — the ring was PLACED with that
    #: uncertainty, so registration against it is never more absolutely
    #: accurate than the ring itself (replaces the hand-swept std)
    gn_anchor_cov: bool = True
    #: run_lio_superblocks: whole-block fused kernel
    #: (ops/lio_superblock_fused.py) instead of per-frame launches
    block_kernel: bool = False
    #: per-frame dilation of the block pair-search radius covering the
    #: realized-prior vs dead-reckoned-prediction drift, plus its base
    superstep_slack: float = 0.05
    slack_base: float = 0.05
    #: pair-list capacity = (scan tiles) * this factor; at factor >= the
    #: target tile count the list is complete BY CONSTRUCTION (a source
    #: tile can admit at most every target tile) and overflow cannot
    #: fire. Capacity costs SMEM only — the kernel loops over the REAL
    #: pair count, so headroom is free at runtime.
    max_pairs_factor: int = 64
    #: register on every k-th point of the (Morton-pre-sorted) scan —
    #: spatially uniform, the reference's applyUniformSubsample semantics
    #: (localization_node.cpp:207) — while deskew + ring insert keep the
    #: full scan. The dominant cost (pair association) scales with this.
    reg_subsample: int = 1
    #: build the registration target pages from every k-th anchor point
    #: (normals stay full-quality: estimated on the full ring, then
    #: subsampled alongside). Halves association work at k=2.
    anchor_subsample: int = 1
    #: points per FINE gating sub-box (ops/nn_gated.subtile_pair_dist2):
    #: fixed-count Morton tiles go ragged at curve discontinuities and
    #: their coarse bboxes admit every target tile; sub-box min-distance
    #: gating recovers the cluster structure (measured: ~3x fewer pairs)
    gate_sub_src: int = 16
    gate_sub_tgt: int = 32
    normal_voxel: float = 0.75
    #: "voxel" = voxel-cell PCA (argsort + scatter — exact cells, ~61 ms
    #: per 65k refresh on v5e); "cells" = the same cell semantics on
    #: truncated-Morton runs, scatter/eigh-free (estimate_normals_cells);
    #: "tiled" = fixed Morton-chunk PCA (cheapest, noisier)
    normal_est: str = "voxel"
    normal_chunk: int = 32
    #: "cells" only: drop crease cells (lam_min >= ratio * lam_mid);
    #: None keeps every populated cell like the voxel estimator
    normal_planarity: float | None = None
    #: scan masks are PACKED prefixes (the loader contract — every
    #: staging path pads at the tail). Lets run_lio_superblocks sample
    #: the ring insert by index arithmetic instead of compact()'s
    #: full-capacity nonzero+gather, which was ~45% of block device
    #: time at cap 32768 (ARCHITECTURE §6c). Set False for arbitrary
    #: masks; selection semantics are identical either way.
    packed_scans: bool = True


class LIOState(NamedTuple):
    ekf_state: ekf.EKFState
    ring: Array  # (window * slot_points, 3) world-frame map points
    ring_mask: Array  # (window * slot_points,)
    slot: Array  # () next ring slot
    frame: Array  # () frame counter
    anchor_points: Array  # Morton-sorted snapshot used as GN target
    anchor_mask: Array
    anchor_normals: Array
    anchor_normals_valid: Array
    #: fused-kernel target cache (6-row xyz+normal pages + tile bboxes),
    #: rebuilt with the anchor; unused by the XLA/pallas backends
    anchor_cache: CachedP2PTarget
    #: (6, 6) pose block of the EKF covariance AT anchor refresh — the
    #: ring's own world uncertainty (used by icp_cov_mode="gn")
    anchor_P6: Array


_POSE6_IDX = np.array([0, 1, 2, 6, 7, 8])


def _pose_cov6(P: Array) -> Array:
    """(position, attitude) block of the 15-state covariance."""
    return P[_POSE6_IDX][:, _POSE6_IDX]


class LIOOutput(NamedTuple):
    world_T_body: Array
    rmse: Array
    n_correspondences: Array
    refreshed: Array
    gps_accepted: Array
    #: superblock-only observability (None on the per-frame drivers):
    #: realized prior drifted beyond the pair-list dilation budget
    slack_violation: Array | None = None
    slack_dist: Array | None = None
    #: pair list truncated (max_pairs / max_visits) — assert zero in bench
    pair_overflow: Array | None = None
    #: total admissible (src, tgt) tile pairs BEFORE capacity clipping —
    #: the realized association load (sizes max_pairs; drift shows up
    #: here before it becomes an overflow)
    pair_demand: Array | None = None
    #: sqrt of the pose-measurement covariance diagonal actually used
    #: (x, y, z) — shows gn-mode inflation along degenerate axes
    icp_std_xyz: Array | None = None


def _refresh_anchor(
    ring: Array, ring_mask: Array, center: Array, config: LIOConfig
):
    """Morton sort + normal estimation + fused-kernel cache for the
    current ring contents. Returns the four anchor arrays + the cache."""
    # isotropic box: the "cells" estimator's truncated-Morton cells must
    # be metrically cubic AND contiguous in this sort order
    anchor = sort_by_morton(
        cl.Cloud(ring, ring_mask), isotropic=config.normal_est == "cells"
    )
    if config.normal_est == "cells":
        normals, nvalid = estimate_normals_cells(
            anchor.points, anchor.mask, config.normal_voxel,
            max_planarity=config.normal_planarity,
        )
    elif config.normal_est == "tiled":
        normals, nvalid = estimate_normals_tiled(
            anchor.points, anchor.mask, config.normal_chunk
        )
    else:
        normals, nvalid = estimate_normals(
            anchor.points, anchor.mask, config.normal_voxel
        )
    # registration pages from every k-th anchor point (Morton-sorted =>
    # spatially uniform), with full-quality normals riding along
    asub = config.anchor_subsample
    cache = build_cached_p2p_target(
        anchor.points[::asub], anchor.mask[::asub], normals[::asub],
        nvalid[::asub], center, config.p2p.tile_tgt,
        gate_sub=config.gate_sub_tgt,
    )
    return anchor.points, anchor.mask, normals, nvalid, cache


def init_state(
    config: LIOConfig,
    first_scan: Array,
    first_scan_mask: Array,
    world_T_body0: Array,
) -> LIOState:
    """Seed the map ring and anchor with the first scan."""
    n = config.window * config.slot_points
    pts0 = geometry.transform_points(world_T_body0, first_scan)
    seeded = cl.sample_to_capacity(
        cl.Cloud(pts0, first_scan_mask), config.slot_points
    )
    ring = jnp.zeros((n, 3), jnp.float32)
    ring_mask = jnp.zeros((n,), bool)
    ring = jax.lax.dynamic_update_slice(ring, seeded.points, (0, 0))
    ring_mask = jax.lax.dynamic_update_slice(ring_mask, seeded.mask, (0,))

    a_pts, a_msk, normals, nvalid, cache = _refresh_anchor(
        ring, ring_mask, world_T_body0[:3, 3], config
    )
    e0 = ekf.init_state(
        config.ekf, p0=world_T_body0[:3, 3], R0=world_T_body0[:3, :3]
    )
    return LIOState(
        ekf_state=e0,
        ring=ring,
        ring_mask=ring_mask,
        slot=jnp.int32(1),
        frame=jnp.int32(1),
        anchor_points=a_pts,
        anchor_mask=a_msk,
        anchor_normals=normals,
        anchor_normals_valid=nvalid,
        anchor_cache=cache,
        anchor_P6=_pose_cov6(e0.P),
    )


def _frame_step(
    state: LIOState,
    scan_points: Array,
    scan_mask: Array,
    imu_gyro: Array,
    imu_accel: Array,
    imu_dt: Array,
    gps_pos: Array,
    gps_var: Array,
    gps_valid: Array,
    config: LIOConfig,
    scan_tau: Array | None = None,
) -> tuple[LIOState, LIOOutput, Array]:
    """Propagate + register + fuse + ring insert — everything EXCEPT the
    anchor refresh (the drivers decide when to refresh)."""
    # 1) IMU propagation gives the registration prior
    e = ekf.propagate_batch(
        state.ekf_state, imu_gyro, imu_accel, imu_dt, config.ekf
    )
    prior_T = ekf.pose_matrix(e)

    # 1b) deskew: per-point motion compensation with the IMU-propagated
    # between-frame twist (BASELINE config 5's "deskewed scans"; the
    # relative twist is pure IMU integration, independent of posterior
    # corrections to first order). scan_tau = fraction of the sweep
    # elapsed at each point's measurement time.
    if scan_tau is not None:
        from slam_sensor_fusion_tpu.ops.deskew import deskew, se3_log

        prev_T = ekf.pose_matrix(state.ekf_state)
        xi = se3_log(geometry.inv_T(prev_T) @ prior_T)
        scan_points = deskew(scan_points, scan_tau, xi)

    # 2) scan-to-map point-to-plane GN
    if config.p2p.nn_backend == "fused":
        reg = point_to_plane_align_fused(
            scan_points,
            scan_mask,
            state.anchor_cache,
            prior_T,
            config.p2p,
            interpret=config.p2p.pallas_interpret,
        )
    else:
        reg = point_to_plane_align(
            scan_points,
            scan_mask,
            state.anchor_points,
            state.anchor_mask,
            state.anchor_normals,
            state.anchor_normals_valid,
            prior_T,
            config.p2p,
        )

    # 3) EKF fusion: registration pose update + gated GPS
    if config.icp_cov_mode == "gn" and reg.cov_pose is not None:
        # measurement covariance from the GN system itself: residual
        # variance x (JtJ)^-1 mapped to (dp, dtheta_body), floored
        sigma2 = (
            reg.wr2
            / jnp.maximum(reg.n_correspondences.astype(jnp.float32) - 6.0, 1.0)
        ) * config.gn_cov_scale
        floor = jnp.diag(
            jnp.concatenate(
                [
                    jnp.full(3, config.gn_pos_std_floor**2),
                    jnp.full(3, config.gn_rot_std_floor**2),
                ]
            )
        ).astype(jnp.float32)
        Rm = sigma2 * reg.cov_pose + floor
        if config.gn_anchor_cov:
            Rm = Rm + state.anchor_P6
        e = ekf.update_pose_cov(e, reg.transformation, Rm)
    else:
        e = ekf.update_pose(
            e, reg.transformation, config.icp_pos_std, config.icp_rot_std
        )
    e_gps, accepted = ekf.update_gps(e, gps_pos, gps_var, config.ekf)
    e = jax.tree.map(lambda a, b: jnp.where(gps_valid, a, b), e_gps, e)
    world_T_body = ekf.pose_matrix(e)

    # 4) insert the registered scan into the ring
    pts_world = geometry.transform_points(world_T_body, scan_points)
    slot_cloud = cl.sample_to_capacity(
        cl.Cloud(pts_world, scan_mask), config.slot_points
    )
    offset = (state.slot % config.window) * config.slot_points
    ring = jax.lax.dynamic_update_slice(state.ring, slot_cloud.points, (offset, 0))
    ring_mask = jax.lax.dynamic_update_slice(state.ring_mask, slot_cloud.mask, (offset,))

    new_state = state._replace(
        ekf_state=e,
        ring=ring,
        ring_mask=ring_mask,
        slot=state.slot + 1,
        frame=state.frame + 1,
    )
    out = LIOOutput(
        world_T_body=world_T_body,
        rmse=reg.rmse,
        n_correspondences=reg.n_correspondences,
        refreshed=jnp.bool_(False),
        gps_accepted=accepted & gps_valid,
    )
    return new_state, out, world_T_body


@functools.partial(jax.jit, static_argnames=("config",))
def lio_step(
    state: LIOState,
    scan_points: Array,  # (scan_capacity, 3) deskewed body-frame points
    scan_mask: Array,
    imu_gyro: Array,  # (K, 3)
    imu_accel: Array,  # (K, 3)
    imu_dt: Array,  # (K,)
    gps_pos: Array,  # (3,) world position (rebased), used when gps_valid
    gps_var: Array,
    gps_valid: Array,
    config: LIOConfig = LIOConfig(),
    scan_tau: Array | None = None,  # (scan_capacity,) sweep fractions
) -> tuple[LIOState, LIOOutput]:
    """One LIO frame: propagate, register, fuse, map-update, and the
    amortized anchor refresh under `lax.cond` (the reference's re-crop
    cadence, localization_node.cpp:299-305). `run_lio_blocks` is the
    throughput driver — it hoists the refresh out of the frame loop."""
    new_state, out, world_T_body = _frame_step(
        state, scan_points, scan_mask, imu_gyro, imu_accel, imu_dt,
        gps_pos, gps_var, gps_valid, config, scan_tau,
    )

    # 5) anchor refresh (amortized): Morton sort + normals + fused cache
    refresh = (state.frame % config.refresh_every) == 0

    def do_refresh():
        return _refresh_anchor(
            new_state.ring, new_state.ring_mask, world_T_body[:3, 3], config
        ) + (_pose_cov6(new_state.ekf_state.P),)

    def keep():
        return (
            state.anchor_points,
            state.anchor_mask,
            state.anchor_normals,
            state.anchor_normals_valid,
            state.anchor_cache,
            state.anchor_P6,
        )

    a_pts, a_msk, a_nrm, a_nvl, a_cache, a_P6 = jax.lax.cond(
        refresh, do_refresh, keep
    )
    new_state = new_state._replace(
        anchor_points=a_pts,
        anchor_mask=a_msk,
        anchor_normals=a_nrm,
        anchor_normals_valid=a_nvl,
        anchor_cache=a_cache,
        anchor_P6=a_P6,
    )
    return new_state, out._replace(refreshed=refresh)


@functools.partial(jax.jit, static_argnames=("config",))
def run_lio_chunk(
    state: LIOState,
    scan_points: Array,  # (T, S, 3)
    scan_mask: Array,  # (T, S)
    imu_gyro: Array,  # (T, K, 3)
    imu_accel: Array,  # (T, K, 3)
    imu_dt: Array,  # (T, K)
    gps_pos: Array,  # (T, 3)
    gps_var: Array,  # (T,)
    gps_valid: Array,  # (T,)
    config: LIOConfig = LIOConfig(),
    scan_tau: Array | None = None,  # (T, S)
) -> tuple[LIOState, LIOOutput]:
    """lax.scan of lio_step over a chunk of frames."""

    if scan_tau is None:

        def body(carry, frame):
            sp, sm, g, a, d, gp, gv, gok = frame
            return lio_step(carry, sp, sm, g, a, d, gp, gv, gok, config)

        xs = (
            scan_points, scan_mask, imu_gyro, imu_accel, imu_dt,
            gps_pos, gps_var, gps_valid,
        )
    else:

        def body(carry, frame):
            sp, sm, g, a, d, gp, gv, gok, tau = frame
            return lio_step(
                carry, sp, sm, g, a, d, gp, gv, gok, config, tau
            )

        xs = (
            scan_points, scan_mask, imu_gyro, imu_accel, imu_dt,
            gps_pos, gps_var, gps_valid, scan_tau,
        )

    return jax.lax.scan(body, state, xs)


@functools.partial(jax.jit, static_argnames=("config",))
def run_lio_blocks(
    state: LIOState,
    scan_points: Array,  # (T, S, 3)
    scan_mask: Array,  # (T, S)
    imu_gyro: Array,  # (T, K, 3)
    imu_accel: Array,  # (T, K, 3)
    imu_dt: Array,  # (T, K)
    gps_pos: Array,  # (T, 3)
    gps_var: Array,  # (T,)
    gps_valid: Array,  # (T,)
    config: LIOConfig = LIOConfig(),
    scan_tau: Array | None = None,  # (T, S)
) -> tuple[LIOState, LIOOutput]:
    """Throughput driver: frames in blocks of `refresh_every`, with the
    anchor refresh hoisted to the BLOCK boundary instead of a per-frame
    `lax.cond` (whose identity branch copies the multi-MB anchor + cache
    every frame — the same cond-copy tax the localization pipeline's
    superblock driver eliminates, ARCHITECTURE.md §6).

    Cadence equivalence with `run_lio_chunk`: the anchor is refreshed
    every `refresh_every` frames either way; here the refresh sees the
    ring one frame earlier (block start vs post-insert), which shifts the
    target map by one scan out of `window` — trajectories agree to well
    under the registration noise floor (tests/test_lio.py).
    """
    T = scan_points.shape[0]
    R = config.refresh_every
    n_blocks, tail = divmod(T, R)

    if scan_tau is None:

        def frame_body(carry, frame):
            sp, sm, g, a, d, gp, gv, gok = frame
            new_state, out, _ = _frame_step(
                carry, sp, sm, g, a, d, gp, gv, gok, config
            )
            return new_state, out

    else:

        def frame_body(carry, frame):
            sp, sm, g, a, d, gp, gv, gok, tau = frame
            new_state, out, _ = _frame_step(
                carry, sp, sm, g, a, d, gp, gv, gok, config, tau
            )
            return new_state, out

    def run_span(state, lo, length):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, lo, length, axis=0)
        a_pts, a_msk, a_nrm, a_nvl, cache = _refresh_anchor(
            state.ring, state.ring_mask, state.ekf_state.p, config
        )
        state = state._replace(
            anchor_points=a_pts,
            anchor_mask=a_msk,
            anchor_normals=a_nrm,
            anchor_normals_valid=a_nvl,
            anchor_cache=cache,
            anchor_P6=_pose_cov6(state.ekf_state.P),
        )
        xs = (
            sl(scan_points), sl(scan_mask), sl(imu_gyro), sl(imu_accel),
            sl(imu_dt), sl(gps_pos), sl(gps_var), sl(gps_valid),
        )
        if scan_tau is not None:
            xs = xs + (sl(scan_tau),)
        return jax.lax.scan(frame_body, state, xs)

    def block_body(carry, b):
        state = carry
        state, outs = run_span(state, b * R, R)
        return state, outs

    outs_main = None
    if n_blocks:
        state, outs_main = jax.lax.scan(
            block_body, state, jnp.arange(n_blocks, dtype=jnp.int32)
        )
        outs_main = jax.tree.map(
            lambda x: x.reshape((n_blocks * R,) + x.shape[2:]), outs_main
        )
    if tail:
        state, outs_tail = run_span(state, n_blocks * R, tail)
        if outs_main is None:
            return state, outs_tail
        outs_main = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), outs_main, outs_tail
        )
    return state, outs_main


def _dead_reckon(
    e0: ekf.EKFState, gyro: Array, accel: Array, dts: Array
) -> tuple[Array, Array]:
    """Mean-only IMU integration over a block's packets: (R (K,3,3),
    t (K,3)) poses at each frame boundary, biases frozen at block start.

    The superblock pair prologue builds its lists at these predictions;
    the in-kernel propagation starts from each frame's POSTERIOR, so the
    realized prior differs by the accumulated GN/GPS corrections — the
    per-frame `superstep_slack` dilation budgets exactly that gap."""
    g_w = jnp.array([0.0, 0.0, -ekf.GRAVITY], jnp.float32)

    def frame(carry, pkt):
        p, v, R = carry
        g, a, d = pkt

        def samp(c, s):
            p, v, R = c
            gg, aa, dd = s
            w = gg - e0.bg
            f = aa - e0.ba
            a_w = R @ f + g_w
            return (
                p + v * dd + 0.5 * a_w * dd * dd,
                v + a_w * dd,
                R @ geometry.so3_exp(w * dd),
            ), None

        (p, v, R), _ = jax.lax.scan(samp, (p, v, R), (g, a, d))
        return (p, v, R), (R, p)

    (_, _, _), (Rs, ts) = jax.lax.scan(frame, (e0.p, e0.v, e0.R), (gyro, accel, dts))
    return Rs, ts


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def run_lio_superblocks(
    state: LIOState,
    scan_points: Array,  # (T, S, 3)
    scan_mask: Array,  # (T, S)
    imu_gyro: Array,  # (T, K, 3)
    imu_accel: Array,  # (T, K, 3)
    imu_dt: Array,  # (T, K)
    gps_pos: Array,  # (T, 3)
    gps_var: Array,  # (T,)
    gps_valid: Array,  # (T,)
    config: LIOConfig = LIOConfig(),
    scan_tau: Array | None = None,  # (T, S) sweep fractions for deskew
    valid: Array | None = None,  # (T,) tail-padding no-op frames
    interpret: bool = False,
) -> tuple[LIOState, LIOOutput]:
    """Whole-block fused driver: ONE pallas launch per `refresh_every`
    frames (ops/lio_superblock_fused.py — EKF propagate, point-to-plane
    GN, pose + GPS Kalman updates all in-kernel), with the anchor
    refresh, deskew, pair prologue and ring inserts batched per block.

    Per-block structure:
      1. anchor refresh from the ring (as run_lio_blocks);
      2. mean-only IMU dead-reckoning -> predicted per-frame poses;
      3. optional vectorized deskew with the dead-reckoned twists;
      4. vectorized pair prologue (predicted-pose tile boxes vs anchor
         tile boxes, radius dilated by `superstep_slack` * k);
      5. the superblock kernel;
      6. batched ring inserts of the K registered scans (within a block
         the anchor is frozen, so deferring inserts to the block
         epilogue is exactly equivalent to run_lio_blocks' per-frame
         inserts — they only become visible at the next refresh).

    Invalid frames must be TRAILING (tail padding): the ring slot
    sequence assumes valid frames are contiguous from the block start.

    Scans should arrive Morton-PRE-SORTED from the loader
    (ops/morton.sort_order_numpy(isotropic=True), deskew taus riding the
    same permutation) — the loader contract the localization pipeline
    already uses. Tile locality survives every rigid transform, every-kth
    `reg_subsample` becomes spatially uniform, and the gating boxes stay
    tight. Unsorted scans remain CORRECT but inflate the pair lists; the
    `pair_overflow` output flags it observably.
    """
    import math as _math

    from slam_sensor_fusion_tpu.models.pipeline_fast import (
        _transformed_tile_boxes,
    )
    from slam_sensor_fusion_tpu.ops.deskew import deskew, se3_log
    from slam_sensor_fusion_tpu.ops.lio_superblock_fused import (
        LIOSuperblockParams,
        lio_superblock,
    )
    from slam_sensor_fusion_tpu.ops.morton import tile_bboxes
    from slam_sensor_fusion_tpu.ops.nn_gated import (
        pair_tiles_from_d2,
        subtile_pair_dist2,
    )
    from slam_sensor_fusion_tpu.ops.nn_pallas import _build_tile_pair_list, make_pages

    R = config.refresh_every
    T = scan_points.shape[0]
    if valid is None:
        valid = jnp.ones((T,), bool)
    pad = (-T) % R
    if pad:
        ext = lambda x: jnp.concatenate(
            [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0
        )
        scan_points, scan_mask = ext(scan_points), ext(scan_mask)
        imu_gyro, imu_accel = ext(imu_gyro), ext(imu_accel)
        imu_dt = ext(imu_dt)
        gps_pos, gps_var = ext(gps_pos), ext(gps_var)
        gps_valid = jnp.concatenate([gps_valid, jnp.zeros(pad, bool)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
        if scan_tau is not None:
            scan_tau = ext(scan_tau)
    Tp = T + pad
    nB = Tp // R

    TM = config.p2p.tile_src
    rsub = config.reg_subsample
    nSt = (scan_points.shape[1] // rsub) // TM
    max_pairs = nSt * config.max_pairs_factor
    base_r = (
        _math.sqrt(config.p2p.max_correspondence_dist_sq)
        + config.p2p.reassoc_margin
    )
    # pair-list dilation must cover the FULL slack budget the kernel's
    # violation check tolerates: slack_base + slack * k at frame k
    radius2 = (
        base_r
        + config.slack_base
        + config.superstep_slack * jnp.arange(R, dtype=jnp.float32)
    ) ** 2
    params = LIOSuperblockParams(
        p2p=config.p2p,
        ekf=config.ekf,
        icp_pos_std=config.icp_pos_std,
        icp_rot_std=config.icp_rot_std,
        icp_cov_mode=config.icp_cov_mode,
        gn_cov_scale=config.gn_cov_scale,
        gn_pos_std_floor=config.gn_pos_std_floor,
        gn_rot_std_floor=config.gn_rot_std_floor,
        gn_anchor_cov=config.gn_anchor_cov,
        superstep_slack=config.superstep_slack,
        slack_base=config.slack_base,
    )

    def blk(x):
        return x.reshape((nB, R) + x.shape[1:])

    blocks = (
        blk(scan_points), blk(scan_mask), blk(imu_gyro), blk(imu_accel),
        blk(imu_dt), blk(gps_pos), blk(gps_var), blk(gps_valid), blk(valid),
        blk(scan_tau) if scan_tau is not None else None,
    )

    def block_body(st: LIOState, xs):
        sp, sm, gy, ac, dt, gp, gv, gok, vld, tau = xs

        # 1) anchor refresh
        a_pts, a_msk, a_nrm, a_nvl, cache = _refresh_anchor(
            st.ring, st.ring_mask, st.ekf_state.p, config
        )

        # 2) dead-reckoned predictions
        pred_R, pred_t = _dead_reckon(st.ekf_state, gy, ac, dt)

        # 3) deskew twists from the dead-reckoned between-frame motion.
        # Deskew is PER-POINT, so it runs after subset selection
        # (select-then-deskew == deskew-then-select): only the ::rsub
        # registration rows and the ring-insert sample are ever
        # corrected, never the full capacity — the old full-width
        # compact+deskew epilogue was ~45% of block device time at cap
        # 32768 (the compact's nonzero+gather, ARCHITECTURE §6c).
        xi = None
        if tau is not None:
            prev_R = jnp.concatenate([st.ekf_state.R[None], pred_R[:-1]])
            prev_t = jnp.concatenate([st.ekf_state.p[None], pred_t[:-1]])
            rel_R = jnp.einsum("kji,kjl->kil", prev_R, pred_R)
            rel_t = jnp.einsum("kji,kj->ki", prev_R, pred_t - prev_t)
            xi = se3_log(geometry.make_T(rel_R, rel_t))  # (R, 6)

        # 4) pair prologue: registration on every rsub-th point of the
        # (Morton-pre-sorted) scan; FINE sub-box gating against the
        # cache's sub-boxes so ragged Morton tiles don't admit the world
        rp = sp[:, ::rsub]
        rm = sm[:, ::rsub]
        if xi is not None:
            rp = jax.vmap(deskew)(rp, tau[:, ::rsub], xi)
        src_pages = jax.vmap(
            lambda p, m: make_pages(p, m, jnp.zeros(3), TM, sentinel=1.0e7)
        )(rp, rm)
        _, _, cnt_b = jax.vmap(tile_bboxes, in_axes=(0, 0, None))(rp, rm, TM)
        slo_b, shi_b, _ = jax.vmap(tile_bboxes, in_axes=(0, 0, None))(
            rp, rm, config.gate_sub_src
        )
        pred_T = geometry.make_T(pred_R, pred_t)
        slo_w, shi_w = _transformed_tile_boxes(pred_T, slo_b, shi_b)
        nTt = cache.pages.shape[0]
        d2_tiles = jax.vmap(
            lambda l, h: subtile_pair_dist2(
                l, h, cache.sub_lo, cache.sub_hi, nSt, nTt
            )
        )(slo_w, shi_w)
        visits, counts, v_ovf = jax.vmap(
            pair_tiles_from_d2, in_axes=(0, 0, 0, None)
        )(d2_tiles, cnt_b, radius2, config.p2p.max_visits)
        pair_start, pair_cnt, pair_tgt = jax.vmap(
            lambda v, c: _build_tile_pair_list(v, c, max_pairs)
        )(visits, counts)
        demand = jnp.sum(
            ((d2_tiles <= radius2[:, None, None]) & (cnt_b[:, :, None] > 0))
            .astype(jnp.int32),
            axis=(1, 2),
        )
        pair_ovf = vld & (v_ovf | (demand > max_pairs))

        # 5) the whole-block kernel
        e0 = st.ekf_state
        poses, stats, pose_n, v_n, bg_n, ba_n, P_n = lio_superblock(
            pair_start, pair_cnt, pair_tgt, vld, gy, ac, dt, gp, gv, gok,
            pred_t, ekf.pose_matrix(e0), e0.v, e0.bg, e0.ba, e0.P,
            cache.center, src_pages, cache.pages, params,
            interpret=interpret,
        )

        # 6) batched ring inserts. Sample indices come from the mask
        # alone, so the gather runs on the RAW scan at slot width and
        # the deskew only touches the sampled rows (see step 3).
        if config.packed_scans:
            ridx, smask = cl.packed_sample_indices(sm, config.slot_points)
            spts = jnp.take_along_axis(sp, ridx[..., None], axis=1)
            if xi is not None:
                rtau = jnp.take_along_axis(tau, ridx, axis=1)
                spts = jax.vmap(deskew)(spts, rtau, xi)
            sampled = cl.Cloud(spts, smask)
        else:
            # arbitrary masks: the generic compact path (full-capacity
            # nonzero+gather — measured slow, kept for correctness)
            if xi is not None:
                sp_full = jax.vmap(deskew)(sp, tau, xi)
            else:
                sp_full = sp
            sampled = jax.vmap(
                lambda c: cl.sample_to_capacity(c, config.slot_points)
            )(cl.Cloud(sp_full, sm))
        world = (
            jnp.einsum("kij,knj->kni", poses[:, :3, :3], sampled.points)
            + poses[:, None, :3, 3]
        )

        SP = config.slot_points
        if R <= config.window:
            # the R block slots are consecutive (mod window) and
            # distinct: rotate the ring so the write window starts at
            # row 0, merge with one static-width select, rotate back —
            # replaces R sequential dynamic_update_slice round trips
            off0 = (st.slot % config.window) * SP
            rolled_p = jnp.roll(st.ring, -off0, axis=0)
            rolled_m = jnp.roll(st.ring_mask, -off0, axis=0)
            cur_p = rolled_p[: R * SP].reshape(R, SP, 3)
            cur_m = rolled_m[: R * SP].reshape(R, SP)
            new_p = jnp.where(vld[:, None, None], world, cur_p)
            new_m = jnp.where(vld[:, None], sampled.mask, cur_m)
            rolled_p = rolled_p.at[: R * SP].set(new_p.reshape(R * SP, 3))
            rolled_m = rolled_m.at[: R * SP].set(new_m.reshape(R * SP))
            ring = jnp.roll(rolled_p, off0, axis=0)
            ring_mask = jnp.roll(rolled_m, off0, axis=0)
        else:
            # R > window: later frames overwrite earlier slots — keep
            # the sequential order-preserving loop
            def ins(i, rc):
                ring, ring_mask = rc
                off = ((st.slot + i) % config.window) * SP
                cur_p = jax.lax.dynamic_slice(ring, (off, 0), (SP, 3))
                cur_m = jax.lax.dynamic_slice(ring_mask, (off,), (SP,))
                new_p = jnp.where(vld[i], world[i], cur_p)
                new_m = jnp.where(vld[i], sampled.mask[i], cur_m)
                ring = jax.lax.dynamic_update_slice(ring, new_p, (off, 0))
                ring_mask = jax.lax.dynamic_update_slice(
                    ring_mask, new_m, (off,)
                )
                return ring, ring_mask

            ring, ring_mask = jax.lax.fori_loop(
                0, R, ins, (st.ring, st.ring_mask)
            )
        nv = jnp.sum(vld.astype(jnp.int32))
        new_state = LIOState(
            ekf_state=ekf.EKFState(
                p=pose_n[:3, 3], v=v_n, R=pose_n[:3, :3], bg=bg_n, ba=ba_n,
                P=P_n,
            ),
            ring=ring,
            ring_mask=ring_mask,
            slot=st.slot + nv,
            frame=st.frame + nv,
            anchor_points=a_pts,
            anchor_mask=a_msk,
            anchor_normals=a_nrm,
            anchor_normals_valid=a_nvl,
            anchor_cache=cache,
            anchor_P6=_pose_cov6(e0.P),
        )
        out = LIOOutput(
            world_T_body=poses,
            rmse=stats[:, 0],
            n_correspondences=stats[:, 1].astype(jnp.int32),
            refreshed=jnp.arange(R) == 0,
            gps_accepted=stats[:, 2] > 0.5,
            slack_violation=vld & (stats[:, 4] > 0.5),
            slack_dist=stats[:, 5],
            pair_overflow=pair_ovf,
            pair_demand=demand,
            icp_std_xyz=stats[:, 6:9],
        )
        return new_state, out

    def scan_body(st, xs):
        if blocks[-1] is None:
            xs = xs + (None,)
        return block_body(st, xs)

    xs_blocks = blocks[:-1] if blocks[-1] is None else blocks
    final, outs = jax.lax.scan(scan_body, state, xs_blocks)
    outs = jax.tree.map(lambda x: x.reshape((Tp,) + x.shape[2:])[:T], outs)
    return final, outs
