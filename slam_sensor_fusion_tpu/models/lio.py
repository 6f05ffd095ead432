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


class LIOOutput(NamedTuple):
    world_T_body: Array
    rmse: Array
    n_correspondences: Array
    refreshed: Array
    gps_accepted: Array


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
    cache = build_cached_p2p_target(
        anchor.points, anchor.mask, normals, nvalid, center,
        config.p2p.tile_tgt,
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
) -> tuple[LIOState, LIOOutput, Array]:
    """Propagate + register + fuse + ring insert — everything EXCEPT the
    anchor refresh (the drivers decide when to refresh)."""
    # 1) IMU propagation gives the registration prior
    e = ekf.propagate_batch(
        state.ekf_state, imu_gyro, imu_accel, imu_dt, config.ekf
    )
    prior_T = ekf.pose_matrix(e)

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
    e = ekf.update_pose(e, reg.transformation, config.icp_pos_std, config.icp_rot_std)
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
) -> tuple[LIOState, LIOOutput]:
    """One LIO frame: propagate, register, fuse, map-update, and the
    amortized anchor refresh under `lax.cond` (the reference's re-crop
    cadence, localization_node.cpp:299-305). `run_lio_blocks` is the
    throughput driver — it hoists the refresh out of the frame loop."""
    new_state, out, world_T_body = _frame_step(
        state, scan_points, scan_mask, imu_gyro, imu_accel, imu_dt,
        gps_pos, gps_var, gps_valid, config,
    )

    # 5) anchor refresh (amortized): Morton sort + normals + fused cache
    refresh = (state.frame % config.refresh_every) == 0

    def do_refresh():
        return _refresh_anchor(
            new_state.ring, new_state.ring_mask, world_T_body[:3, 3], config
        )

    def keep():
        return (
            state.anchor_points,
            state.anchor_mask,
            state.anchor_normals,
            state.anchor_normals_valid,
            state.anchor_cache,
        )

    a_pts, a_msk, a_nrm, a_nvl, a_cache = jax.lax.cond(refresh, do_refresh, keep)
    new_state = new_state._replace(
        anchor_points=a_pts,
        anchor_mask=a_msk,
        anchor_normals=a_nrm,
        anchor_normals_valid=a_nvl,
        anchor_cache=a_cache,
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
) -> tuple[LIOState, LIOOutput]:
    """lax.scan of lio_step over a chunk of frames."""

    def body(carry, frame):
        sp, sm, g, a, d, gp, gv, gok = frame
        return lio_step(carry, sp, sm, g, a, d, gp, gv, gok, config)

    return jax.lax.scan(
        body,
        state,
        (scan_points, scan_mask, imu_gyro, imu_accel, imu_dt, gps_pos, gps_var, gps_valid),
    )


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

    def frame_body(carry, frame):
        sp, sm, g, a, d, gp, gv, gok = frame
        new_state, out, _ = _frame_step(
            carry, sp, sm, g, a, d, gp, gv, gok, config
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
        )
        return jax.lax.scan(
            frame_body,
            state,
            (
                sl(scan_points), sl(scan_mask), sl(imu_gyro), sl(imu_accel),
                sl(imu_dt), sl(gps_pos), sl(gps_var), sl(gps_valid),
            ),
        )

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
