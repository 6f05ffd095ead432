"""The localization pipeline: per-scan fusion step and sequence driver.

Rebuild of LocalizationNode (localization/src/localization_node.cpp) as a
pure, fixed-shape JAX program:

* ROS pub/sub + ApproximateTime sync become a host-side prestaged
  `FrameBatch` of aligned arrays (one batched H2D copy per chunk);
* the per-callback pipeline (localization_node.cpp:263-374) becomes
  `step()` — one jitted program: subsample -> radius crop -> predicated
  map re-crop -> odometry prediction -> GPS coarse pose -> covariance-
  weighted blend -> stochastic gate -> ICP -> pose update;
* the steady state streams under `lax.scan` with a fixed-size carry
  (pose, filter queue, cropped map), so arbitrarily long trajectories run
  on device with no host round-trips;
* the one-shot startup (first-GPS initialization, brute-force coarse
  alignment with its rescue-ICP ladder, localization_node.cpp:181-261) is
  orchestrated per-frame from the host exactly like the reference retries
  per callback, each attempt a jitted program.

Parity notes (quirks preserved):
* the prior is an ELEMENT-WISE blend of two 4x4 pose matrices, not a
  manifold interpolation (localization_node.cpp:329);
* gains swap the covariance traces (odom_gain = gps_trace / sum,
  localization_node.cpp:172-178);
* frames with GPS altitude < 0 are skipped entirely (:269-276);
* the map is re-cropped (and the reference's kd-tree rebuilt — here: no
  tree at all) only after moving ref_frame_distance from the last crop
  pose (:299-305).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_sensor_fusion_tpu.models.mapping import MapData, gps_to_map_poses
from slam_sensor_fusion_tpu.ops import cloud as cl
from slam_sensor_fusion_tpu.ops import geometry as geo
from slam_sensor_fusion_tpu.ops import morton
from slam_sensor_fusion_tpu.ops import stochastic_filter as sf
from slam_sensor_fusion_tpu.ops.brute_force import brute_force_align
from slam_sensor_fusion_tpu.ops.icp import ICPResult, icp_align
from slam_sensor_fusion_tpu.ops.icp_fused import (
    CachedTarget,
    build_cached_target,
    icp_align_fused,
)
from slam_sensor_fusion_tpu.utils.config import LocalizationConfig

Array = jax.Array

_log = logging.getLogger("slam_sensor_fusion_tpu")


class FrameBatch(NamedTuple):
    """Time-aligned sensor arrays for a chunk of frames (leading axis T)."""

    scan_points: Array  # (T, S, 3)
    scan_mask: Array  # (T, S)
    odom_T_sensor: Array  # (T, 4, 4)
    map_T_sensor_gps: Array  # (T, 4, 4) precomputed GPS coarse poses
    odom_cov_trace: Array  # (T,)
    gps_cov_trace: Array  # (T,)
    valid: Array  # (T,) bool — GPS altitude >= 0 gate


class PipelineState(NamedTuple):
    """The lax.scan carry — everything the reference keeps as node members."""

    map_T_sensor: Array  # (4, 4)
    odom_T_sensor_previous: Array  # (4, 4)
    map_T_ref: Array  # (4, 4) pose of the last map crop
    cropped_map: cl.Cloud  # fixed-capacity ICP target
    filter_state: sf.FilterState
    #: target pages/bboxes for the fused ICP, rebuilt only at re-crop
    cached_target: CachedTarget
    #: () f32 — extra pair-prologue dilation carried by the FIRST
    #: superblock after (re)initialization: the coarse-alignment pose can
    #: be off by up to the fine-acceptance gate (~sqrt(0.5) m,
    #: localization_node.cpp:307-315) and ICP grinds that error out over
    #: several frames, so the realized chain legitimately departs the
    #: block-start prediction by up to this much. Consumed (reset to 0)
    #: after one valid block; fast path only.
    extra_slack: Array = jnp.float32(0.0)


class StepOutput(NamedTuple):
    map_T_sensor: Array  # (4, 4) posterior
    map_T_sensor_prior: Array  # (4, 4) fused prior (debug topic)
    map_T_sensor_odom: Array  # (4, 4) odometry prediction (debug)
    icp_error: Array
    icp_iterations: Array
    icp_converged: Array
    n_correspondences: Array
    recropped: Array  # bool
    #: bool — correspondence-search visit/pair list truncated this frame
    #: (silent-truncation observability; must be 0 in healthy runs)
    pair_overflow: Array
    #: f32 — min |det| of the fused kernel's Kabsch moment matrix (0 on
    #: non-fused paths); near-0 = degenerate correspondence geometry
    icp_det_min: Array
    #: superblock-only (None on the per-frame engine): the realized prior
    #: drifted from the dead-reckoned prediction the pair prologue used by
    #: more than that frame's dilation budget (superstep_slack * k +
    #: slack_base) — the pair list may be incomplete; assert zero in
    #: healthy runs, next to pair_overflow
    slack_violation: Array | None = None
    #: f32 — realized |prior - prediction| translation drift (0 = unused)
    slack_dist: Array | None = None
    #: (num_iterations,) f32 per-iteration ICP error, NaN past the last
    #: executed iteration — the reference's printStepDebug trace
    #: (icp_point_to_point.cpp:171-183); None unless
    #: config.icp.debug_trace (legacy XLA/while-loop engines only)
    icp_error_trace: Array | None = None
    #: i32 — total admissible (src, tgt) tile pairs this frame BEFORE
    #: capacity clipping (fast path only): the realized association load.
    #: Drift/gating regressions show up here before they overflow.
    pair_demand: Array | None = None


def init_state(
    config: LocalizationConfig,
    map_capacity: int,
    first_gps_pose: Array,
    first_odom_pose: Array,
) -> PipelineState:
    """initializePosesWithFirstReading (localization_node.cpp:181-198):
    pose from the first valid GPS fix, odometry reference recorded, map
    crop left empty so the first processed frame populates it."""
    del map_capacity
    cap = config.capacity.cropped_map
    n_tt = cap // config.icp.tile_tgt
    tn = config.icp.tile_tgt
    return PipelineState(
        map_T_sensor=first_gps_pose,
        odom_T_sensor_previous=first_odom_pose,
        map_T_ref=first_gps_pose,
        cropped_map=cl.Cloud(
            jnp.zeros((cap, 3), jnp.float32), jnp.zeros((cap,), bool)
        ),
        filter_state=sf.init_state(config.filter),
        # empty boxes (lo > hi) can never pair; first frame forces a re-crop
        cached_target=CachedTarget(
            pages=jnp.full((n_tt, 3, tn), -1.0e7, jnp.float32),
            lo=jnp.full((n_tt, 3), jnp.inf, jnp.float32),
            hi=jnp.full((n_tt, 3), -jnp.inf, jnp.float32),
            center=jnp.zeros(3, jnp.float32),
            sub_lo=(
                jnp.full((cap // config.icp.gate_sub_tgt, 3), jnp.inf)
                if config.icp.gate_sub_tgt is not None else None
            ),
            sub_hi=(
                jnp.full((cap // config.icp.gate_sub_tgt, 3), -jnp.inf)
                if config.icp.gate_sub_tgt is not None else None
            ),
        ),
        extra_slack=jnp.float32(config.startup_slack),
    )


def _preprocess(
    state: PipelineState,
    scan_points: Array,
    scan_mask: Array,
    map_cloud: cl.Cloud,
    config: LocalizationConfig,
    valid: Array | None = None,
) -> tuple[cl.Cloud, cl.Cloud, Array, Array]:
    """Scan subsample + crop, and predicated map re-crop
    (localization_node.cpp:285-305).

    Returns (cropped_scan, cropped_map, cached_target, map_T_ref, recropped).
    """
    scan = cl.Cloud(scan_points, scan_mask)
    if not config.host_preprocess:
        # otherwise the loader already subsampled (in original scan order,
        # parity-identical) and Morton pre-sorted (build_frame_batch)
        scan = cl.uniform_subsample(scan, config.scan_subsample_step)
    cropped_scan = cl.crop_radius(
        scan, jnp.zeros(3, jnp.float32), config.cloud_crop_radius
    )

    sensor_T_ref = geo.inv_T(state.map_T_sensor) @ state.map_T_ref
    moved = jnp.linalg.norm(sensor_T_ref[:3, 3]) > config.ref_frame_distance
    empty = state.cropped_map.count() == 0
    need = moved | empty
    if valid is not None:
        # invalid (skipped) frames must not touch the crop: gating here also
        # lets step() skip the expensive valid-select over the map buffer
        need = need & valid

    def recrop():
        mask = cl.crop_radius(
            map_cloud, state.map_T_sensor[:3, 3], config.cloud_crop_radius
        )
        packed = cl.compact(mask, config.capacity.cropped_map)
        # Morton order so ICP's gated correspondence search can cull
        # target tiles by bbox distance (the kd-tree-build equivalent,
        # done once per re-crop like icp_->setTargetPointCloud at :303).
        # With a presorted map the order-preserving compact() already
        # yields it (global Z-order restricted to the crop ball).
        sorted_map = (
            packed if config.presorted_map else morton.sort_by_morton(packed)
        )
        cache = build_cached_target(
            sorted_map.points,
            sorted_map.mask,
            state.map_T_sensor[:3, 3],
            config.icp.tile_tgt,
            gate_sub=config.icp.gate_sub_tgt,
        )
        return sorted_map, cache

    cropped_map, cached_target = jax.lax.cond(
        need, recrop, lambda: (state.cropped_map, state.cached_target)
    )
    map_T_ref = jnp.where(need, state.map_T_sensor, state.map_T_ref)
    return cropped_scan, cropped_map, cached_target, map_T_ref, need


def _pose_gains(
    odom_cov_trace: Array, gps_cov_trace: Array, config: LocalizationConfig
) -> tuple[Array, Array]:
    """computePoseGainsFromCovarianceMatrices (localization_node.cpp:151-179):
    each source's gain is the OTHER's covariance trace, normalized."""
    if config.fixed_gains:
        return jnp.float32(0.95), jnp.float32(0.05)
    total = odom_cov_trace + gps_cov_trace
    return gps_cov_trace / total, odom_cov_trace / total


def _fine(
    state: PipelineState,
    cropped_scan: cl.Cloud,
    cropped_map: cl.Cloud,
    cached_target: CachedTarget,
    map_T_ref: Array,
    recropped: Array,
    odom_T_sensor: Array,
    map_T_sensor_gps: Array,
    odom_cov_trace: Array,
    gps_cov_trace: Array,
    config: LocalizationConfig,
) -> tuple[PipelineState, StepOutput]:
    """The FINE ALIGNMENT section (localization_node.cpp:317-341)."""
    # odometry prediction: right-compose the odom delta onto the posterior
    # (localization_node.cpp:106-109)
    previous_T_current = geo.inv_T(state.odom_T_sensor_previous) @ odom_T_sensor
    map_T_sensor_odom = state.map_T_sensor @ previous_T_current

    odom_gain, gps_gain = _pose_gains(odom_cov_trace, gps_cov_trace, config)
    prior = odom_gain * map_T_sensor_odom + gps_gain * map_T_sensor_gps

    filter_state = sf.add_pose(state.filter_state, prior, config.filter)
    prior = sf.apply_gate(filter_state, state.map_T_sensor, prior, config.filter)

    if config.icp.mode == "fast":
        on_tpu = any("TPU" in d.device_kind for d in jax.devices())
        icp_result: ICPResult = icp_align_fused(
            cropped_scan.points,
            cropped_scan.mask,
            cropped_map.points,
            cropped_map.mask,
            prior,
            config.icp,
            interpret=not on_tpu,
            cached_target=cached_target,
        )
    else:
        icp_result = icp_align(
            cropped_scan.points,
            cropped_scan.mask,
            cropped_map.points,
            cropped_map.mask,
            prior,
            config.icp,
        )

    new_state = PipelineState(
        map_T_sensor=icp_result.transformation,
        odom_T_sensor_previous=odom_T_sensor,
        map_T_ref=map_T_ref,
        cropped_map=cropped_map,
        filter_state=filter_state,
        cached_target=cached_target,
        extra_slack=state.extra_slack,
    )
    out = StepOutput(
        map_T_sensor=icp_result.transformation,
        map_T_sensor_prior=prior,
        map_T_sensor_odom=map_T_sensor_odom,
        icp_error=icp_result.error,
        icp_iterations=icp_result.iterations,
        icp_converged=icp_result.has_converged,
        n_correspondences=icp_result.n_correspondences,
        recropped=recropped,
        pair_overflow=jnp.asarray(icp_result.pair_overflow, bool),
        icp_det_min=jnp.asarray(icp_result.det_min, jnp.float32),
        icp_error_trace=icp_result.error_trace,
    )
    return new_state, out


@functools.partial(jax.jit, static_argnames=("config",))
def step(
    state: PipelineState,
    scan_points: Array,
    scan_mask: Array,
    odom_T_sensor: Array,
    map_T_sensor_gps: Array,
    odom_cov_trace: Array,
    gps_cov_trace: Array,
    valid: Array,
    map_cloud: cl.Cloud,
    config: LocalizationConfig,
) -> tuple[PipelineState, StepOutput]:
    """One full steady-state localization callback as a single program."""
    cropped_scan, cropped_map, cached_target, map_T_ref, recropped = _preprocess(
        state, scan_points, scan_mask, map_cloud, config, valid
    )
    new_state, out = _fine(
        state,
        cropped_scan,
        cropped_map,
        cached_target,
        map_T_ref,
        recropped,
        odom_T_sensor,
        map_T_sensor_gps,
        odom_cov_trace,
        gps_cov_trace,
        config,
    )
    # invalid frames (GPS altitude < 0) are full no-ops (:269-276).
    # cropped_map is already valid-gated inside _preprocess, so the (1 MB)
    # select over the map buffer is skipped here.
    small_new = new_state._replace(
        cropped_map=state.cropped_map, cached_target=state.cached_target
    )
    small_old = state
    gated = jax.tree.map(
        lambda new, old: jnp.where(valid, new, old), small_new, small_old
    )
    new_state = gated._replace(
        cropped_map=new_state.cropped_map,
        cached_target=new_state.cached_target,
    )
    out = jax.tree.map(lambda x: jnp.where(valid, x, jnp.zeros_like(x)), out)
    out = out._replace(
        map_T_sensor=jnp.where(valid, out.map_T_sensor, state.map_T_sensor)
    )
    return new_state, out


@functools.partial(jax.jit, static_argnames=("config",))
def run_chunk(
    state: PipelineState,
    frames: FrameBatch,
    map_cloud: cl.Cloud,
    config: LocalizationConfig,
) -> tuple[PipelineState, StepOutput]:
    """lax.scan of `step` over a chunk of frames — the device-resident hot
    loop. Outputs are stacked per frame."""

    def body(carry, frame):
        return step(
            carry,
            frame.scan_points,
            frame.scan_mask,
            frame.odom_T_sensor,
            frame.map_T_sensor_gps,
            frame.odom_cov_trace,
            frame.gps_cov_trace,
            frame.valid,
            map_cloud,
            config,
        )

    return jax.lax.scan(body, state, frames)


# ---------------------------------------------------------------------------
# Startup: coarse alignment ladder (performCoarseAlignment, :200-261)
# ---------------------------------------------------------------------------


class CoarseOutput(NamedTuple):
    success: Array
    map_T_sensor: Array  # accepted pose if success, else best-so-far guess
    bf_success: Array
    score: Array


@functools.partial(jax.jit, static_argnames=("config",))
def coarse_attempt(
    state: PipelineState,
    scan_points: Array,
    scan_mask: Array,
    map_cloud: cl.Cloud,
    guess: Array,
    config: LocalizationConfig,
):
    """One coarse-alignment attempt on one frame.

    Mirrors the reference ladder: brute force on floor-removed, extra-
    subsampled clouds; on failure a loose "rescue" ICP from the best
    brute-force candidate (localization_node.cpp:200-261). Returns the
    preprocessing results too so the caller can continue with the fine
    step exactly like the reference does within the same callback.
    """
    cropped_scan, cropped_map, cached_target, map_T_ref, recropped = _preprocess(
        state, scan_points, scan_mask, map_cloud, config
    )

    # brute-force inputs: subsample(map, 15) + removeFloor(both) (:207-213).
    # The reference's crop is DISTANCE-ordered (kd-tree radiusSearch sorts
    # hits, point_cloud_processing.hpp:37-49), so its every-15th subsample
    # is a range-stratified subset; re-order the packed crop by distance
    # from the crop pose before the index-based subsample for selection
    # parity. Startup-only: the per-frame path keeps Morton order.
    bf_map = cl.sample_to_capacity(
        cl.remove_floor(
            cl.uniform_subsample(
                cl.compact_by_distance(cropped_map, map_T_ref[:3, 3]),
                config.brute_force_map_subsample_step,
            )
        ),
        config.capacity.bf_target,
    )
    bf_scan = cl.sample_to_capacity(
        cl.remove_floor(cropped_scan), config.capacity.bf_source
    )

    bf = brute_force_align(
        bf_scan.points,
        bf_scan.mask,
        bf_map.points,
        bf_map.mask,
        guess,
        config.brute_force,
    )

    def rescue():
        res = icp_align(
            bf_scan.points,
            bf_scan.mask,
            bf_map.points,
            bf_map.mask,
            bf.transformation,
            config.rescue_icp,
        )
        return res.has_converged, res.transformation

    success, pose = jax.lax.cond(
        bf.success, lambda: (jnp.bool_(True), bf.transformation), rescue
    )
    return (
        cropped_map,
        cached_target,
        map_T_ref,
        cropped_scan,
        CoarseOutput(
            success=success,
            map_T_sensor=jnp.where(success, pose, bf.transformation),
            bf_success=bf.success,
            score=bf.score,
        ),
    )


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LocalizationResult:
    map_T_sensor: np.ndarray  # (T, 4, 4); frames before startup hold init pose
    valid: np.ndarray  # (T,) which frames produced a posterior
    icp_error: np.ndarray
    icp_iterations: np.ndarray
    icp_converged: np.ndarray
    n_correspondences: np.ndarray
    first_processed_frame: int


def build_frame_batch(
    config: LocalizationConfig,
    scans: list[np.ndarray],
    odom_T_sensor: np.ndarray,
    map_T_sensor_gps: np.ndarray,
    odom_cov_trace: np.ndarray,
    gps_cov_trace: np.ndarray,
    valid: np.ndarray,
) -> FrameBatch:
    """Pad per-frame host scans into stacked device arrays.

    With config.host_preprocess the loader applies the reference's uniform
    subsample here (in original scan order — parity with
    localization_node.cpp:292) and Morton pre-sorts the result so the
    gated correspondence search gets tight tiles without a device sort.
    """
    S = config.capacity.scan
    T = len(scans)
    pts = np.zeros((T, S, 3), np.float32)
    msk = np.zeros((T, S), bool)
    for i, sc in enumerate(scans):
        if config.host_preprocess:
            if len(sc) >= config.scan_subsample_step:
                sc = sc[:: config.scan_subsample_step]
            sc = morton.sort_points_numpy(sc)
        n = min(len(sc), S)
        pts[i, :n] = sc[:n]
        msk[i, :n] = True
    return FrameBatch(
        scan_points=jnp.asarray(pts),
        scan_mask=jnp.asarray(msk),
        odom_T_sensor=jnp.asarray(odom_T_sensor, jnp.float32),
        map_T_sensor_gps=jnp.asarray(map_T_sensor_gps, jnp.float32),
        odom_cov_trace=jnp.asarray(odom_cov_trace, jnp.float32),
        gps_cov_trace=jnp.asarray(gps_cov_trace, jnp.float32),
        valid=jnp.asarray(valid, bool),
    )


class Localizer:
    """End-to-end localization session over a map (the node equivalent)."""

    def __init__(self, map_data: MapData, config: LocalizationConfig = LocalizationConfig()):
        self.config = config
        self.map_data = map_data
        # map load path: voxel-downsampled merged map further uniform-
        # subsampled by 3 (localization_node.cpp:19-20). The subsample
        # happens on host once — same every-kth semantics.
        pts = map_data.map_points[:: config.map_subsample_step]
        if config.presorted_map:
            # one host Morton sort at load; every re-crop then preserves
            # spatial tile locality through a plain compact() (the
            # device-side per-crop sort is skipped — see config docstring)
            from slam_sensor_fusion_tpu.ops.morton import sort_points_numpy

            pts = sort_points_numpy(np.asarray(pts, np.float32))
        cap = 1 << int(np.ceil(np.log2(max(len(pts), 1024))))
        self.map_cloud = cl.from_numpy(pts, cap)

    def gps_poses(self, lat, lon, compass_yaw) -> np.ndarray:
        return gps_to_map_poses(self.map_data, lat, lon, compass_yaw)

    def run(
        self,
        scans: list[np.ndarray],
        odom_T_sensor: np.ndarray,
        gps_lat: np.ndarray,
        gps_lon: np.ndarray,
        gps_alt: np.ndarray,
        compass_yaw: np.ndarray,
        odom_cov_trace: np.ndarray,
        gps_cov_trace: np.ndarray,
        chunk: int = 64,
        debug_dir: str | None = None,
    ) -> LocalizationResult:
        """Replay a full sequence: startup gating + coarse ladder on the
        host (one jitted attempt per frame, like the reference's per-
        callback retries), then chunked lax.scan for the steady state.

        With ``config.enable_debug`` this mirrors the reference node's
        debug branch (localization_node.cpp:348-373): wall-clock "CALLBACK
        TOOK" logs per chunk (StageTimer), and — when ``debug_dir`` is
        given — per-chunk export of the transformed cropped scan and the
        current cropped map (the two debug cloud topics, :354-372) plus a
        periodically refreshed map/trajectory artifact (the Python twin's
        5-second map republish, localization_node.py:96,174-183).
        """
        T = len(scans)
        cfg = self.config
        timer = None
        if cfg.enable_debug:
            from slam_sensor_fusion_tpu.utils.profiling import StageTimer

            timer = StageTimer()
            if debug_dir is not None:
                os.makedirs(debug_dir, exist_ok=True)
        valid = np.asarray(gps_alt) >= 0
        gps_T = self.gps_poses(gps_lat, gps_lon, compass_yaw)

        out_T = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
        out_valid = np.zeros(T, bool)
        out_err = np.zeros(T, np.float32)
        out_iters = np.zeros(T, np.int32)
        out_conv = np.zeros(T, bool)
        out_ncorr = np.zeros(T, np.int32)

        # ---- startup: first valid GPS fix initializes the pose ----
        first = int(np.argmax(valid)) if valid.any() else T
        if first >= T:
            return LocalizationResult(
                out_T, out_valid, out_err, out_iters, out_conv, out_ncorr, T
            )
        state = init_state(
            cfg,
            self.map_cloud.capacity,
            jnp.asarray(gps_T[first]),
            jnp.asarray(odom_T_sensor[first], jnp.float32),
        )
        out_T[: first + 1] = gps_T[first]

        # ---- coarse ladder: retry per frame until success ----
        i = first + 1
        guess = jnp.asarray(gps_T[first])
        coarse_done = False
        while i < T and not coarse_done:
            if not valid[i]:
                i += 1
                continue
            frame = build_frame_batch(
                cfg,
                [scans[i]],
                odom_T_sensor[i : i + 1],
                gps_T[i : i + 1],
                odom_cov_trace[i : i + 1],
                gps_cov_trace[i : i + 1],
                valid[i : i + 1],
            )
            cropped_map, cached_target, map_T_ref, cropped_scan, coarse = coarse_attempt(
                state,
                frame.scan_points[0],
                frame.scan_mask[0],
                self.map_cloud,
                guess,
                cfg,
            )
            state = state._replace(
                cropped_map=cropped_map,
                cached_target=cached_target,
                map_T_ref=map_T_ref,
            )
            if bool(coarse.success):
                coarse_done = True
                state = state._replace(map_T_sensor=coarse.map_T_sensor)
                # fine alignment runs in the same frame (:311-341)
                state, out = _fine_jit(
                    state,
                    cropped_scan,
                    state.cropped_map,
                    state.cached_target,
                    state.map_T_ref,
                    jnp.bool_(False),
                    frame.odom_T_sensor[0],
                    frame.map_T_sensor_gps[0],
                    frame.odom_cov_trace[0],
                    frame.gps_cov_trace[0],
                    cfg,
                )
                self._record(out, i, out_T, out_valid, out_err, out_iters, out_conv, out_ncorr)
            else:
                # next attempt searches around the best candidate
                # (brute_force_alignment.cpp:125-126)
                guess = coarse.map_T_sensor
                out_T[i] = np.asarray(state.map_T_sensor)
            i += 1

        # ---- steady state: chunked device scan ----
        # fast mode streams host-paged frames through the superblock
        # pipeline (models/pipeline_fast.py); parity mode keeps the exact
        # per-frame step unless superblock_parity opts into the superblock
        # shell (reference-exact ICP, block-granular re-crop)
        use_fast = cfg.host_preprocess and (
            cfg.icp.mode == "fast"
            or (cfg.icp.mode == "parity" and cfg.superblock_parity)
        )
        if use_fast:
            from slam_sensor_fusion_tpu.models.pipeline_fast import (
                build_paged_frames,
                run_chunk_fast,
            )

            on_tpu = any("TPU" in d.device_kind for d in jax.devices())
        while i < T:
            j = min(i + chunk, T)
            n = j - i
            import time as _time

            t_cb = _time.perf_counter()
            if use_fast:
                pad = (-n) % cfg.superstep
                def padded(a):
                    a = np.asarray(a)
                    parts = [a[i:j]] + ([a[i : i + 1]] * pad if pad else [])
                    return np.concatenate(parts)
                frames = build_paged_frames(
                    cfg,
                    scans[i:j] + [scans[i]] * pad,
                    padded(odom_T_sensor),
                    np.concatenate(
                        [gps_T[i:j]] + ([gps_T[i : i + 1]] * pad if pad else [])
                    ),
                    padded(odom_cov_trace),
                    padded(gps_cov_trace),
                    np.concatenate([valid[i:j], np.zeros(pad, bool)]),
                )
                state, outs = run_chunk_fast(
                    state, frames, self.map_cloud, cfg, interpret=not on_tpu
                )
                outs = jax.tree.map(lambda x: np.asarray(x)[:n], outs)
                out_valid[i:j] = np.asarray(frames.valid)[:n]
            else:
                frames = build_frame_batch(
                    cfg,
                    scans[i:j],
                    odom_T_sensor[i:j],
                    gps_T[i:j],
                    odom_cov_trace[i:j],
                    gps_cov_trace[i:j],
                    valid[i:j],
                )
                state, outs = run_chunk(state, frames, self.map_cloud, cfg)
                outs = jax.tree.map(np.asarray, outs)
                out_valid[i:j] = np.asarray(frames.valid)
            out_T[i:j] = outs.map_T_sensor
            out_err[i:j] = outs.icp_error
            out_iters[i:j] = outs.icp_iterations
            out_conv[i:j] = outs.icp_converged
            out_ncorr[i:j] = outs.n_correspondences
            if timer is not None:
                # the reference's "CALLBACK TOOK %f seconds" debug log
                # (localization_node.cpp:350-353), amortized per frame
                elapsed = _time.perf_counter() - t_cb
                timer.stages["chunk"] = timer.stages.get("chunk", 0.0) + elapsed
                _log.info(
                    "CALLBACK TOOK %f seconds (chunk of %d frames: %.3fs)",
                    elapsed / max(n, 1), n, elapsed,
                )
                if getattr(outs, "icp_error_trace", None) is not None:
                    # the reference's per-iteration printStepDebug lines
                    # (icp_point_to_point.cpp:171-183)
                    for f, tr in enumerate(np.asarray(outs.icp_error_trace)):
                        for it, e in enumerate(tr):
                            if np.isnan(e):
                                break
                            _log.info(
                                "[ICP INFO] frame %d iteration %d - Error: %f",
                                i + f, it, float(e),
                            )
                if debug_dir is not None:
                    self._emit_debug(debug_dir, state, scans, out_T, i, j)
            i = j

        if timer is not None:
            _log.info("debug timing report:\n%s", timer.report())
        return LocalizationResult(
            out_T, out_valid, out_err, out_iters, out_conv, out_ncorr, first
        )

    def _emit_debug(
        self,
        debug_dir: str,
        state: PipelineState,
        scans: list[np.ndarray],
        out_T: np.ndarray,
        i: int,
        j: int,
    ) -> None:
        """Debug cloud republication, offline equivalent of the reference's
        enable_debug branch: the cropped scan transformed into the map frame
        and the current cropped map (localization_node.cpp:354-372), plus a
        refreshed map + trajectory artifact standing in for the Python
        twin's 5-second map republish timer (localization_node.py:96,174-183).
        """
        from slam_sensor_fusion_tpu.utils import viz

        cfg = self.config
        k = j - 1  # last frame of the chunk
        sc = np.asarray(scans[k], np.float32).reshape(-1, 3)
        if cfg.scan_subsample_step > 1 and len(sc) >= cfg.scan_subsample_step:
            sc = sc[:: cfg.scan_subsample_step]
        keep = np.linalg.norm(sc, axis=1) <= cfg.cloud_crop_radius
        T_k = out_T[k]
        scan_map = sc[keep] @ T_k[:3, :3].T + T_k[:3, 3]
        viz.write_ply(
            os.path.join(debug_dir, "cropped_scan_map_frame.ply"),
            scan_map,
            color=(255, 80, 40),
        )
        cm_pts = np.asarray(state.cropped_map.points)
        cm_msk = np.asarray(state.cropped_map.mask)
        viz.write_ply(
            os.path.join(debug_dir, "cropped_map.ply"),
            cm_pts[cm_msk],
            color=(120, 160, 255),
        )
        map_path = os.path.join(debug_dir, "map.ply")
        if not os.path.exists(map_path):
            viz.write_ply(map_path, self.map_data.map_points)
        viz.plot_topdown(
            os.path.join(debug_dir, "trajectory.svg"),
            out_T[: j],
            map_points=self.map_data.map_points,
        )
        # interactive replay viewer (rviz-config equivalent, SURVEY C15)
        viz.write_html_viewer(
            os.path.join(debug_dir, "viewer.html"),
            map_points=self.map_data.map_points,
            est_poses=out_T[: j],
            scan_points=scan_map,
        )

    @staticmethod
    def _record(out: StepOutput, i, out_T, out_valid, out_err, out_iters, out_conv, out_ncorr):
        out_T[i] = np.asarray(out.map_T_sensor)
        out_valid[i] = True
        out_err[i] = float(out.icp_error)
        out_iters[i] = int(out.icp_iterations)
        out_conv[i] = bool(out.icp_converged)
        out_ncorr[i] = int(out.n_correspondences)


@functools.partial(jax.jit, static_argnames=("config",))
def _fine_jit(state, cropped_scan, cropped_map, cached_target, map_T_ref,
              recropped, odom_T_sensor, map_T_sensor_gps, odom_cov_trace,
              gps_cov_trace, config):
    return _fine(
        state, cropped_scan, cropped_map, cached_target, map_T_ref, recropped,
        odom_T_sensor, map_T_sensor_gps, odom_cov_trace, gps_cov_trace, config,
    )
