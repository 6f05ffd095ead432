"""The "lite" localization pipeline — twin of the reference's Python node.

The reference ships a simplified Python prototype alongside the C++ node
(localization_python/localization_python/localization_node.py, SURVEY C10)
with deliberately different semantics, all reproduced here:

* fixed fusion weights 0.2 GPS / 0.8 odometry (:212-215) — no covariance
  weighting and no stochastic gate;
* LEFT-composed odometry prediction: (odom_cur @ odom_prev^-1) @
  map_T_sensor (:161-167) — the C++ node right-composes;
* scan filtered by a forward axis-aligned box [0..15] x [-7.5..7.5] x
  [0..7.5] in the sensor frame (:53-57,105-115);
* map cropped by an ORIENTED bounding box of extent (30, 15, 15) at the
  coarse pose (:222-225), re-done EVERY frame (no 3 m cache);
* ICP: identity-initialized on the pre-transformed scan, threshold 0.5 m
  (TRUE distance — open3d, unlike the C++ node's squared 0.5), up to 30
  iterations, fresh correspondences per iteration (open3d semantics =
  this engine's fast mode); result left-composed onto the coarse pose
  (:231-243);
* GPS altitude used directly — no altitude table (:140);
* no startup brute force; the first GPS fix initializes the pose.

One jitted step per frame, `lax.scan` driver, exactly like the main
pipeline.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_sensor_fusion_tpu.ops import cloud as cl
from slam_sensor_fusion_tpu.ops import geometry as geo
from slam_sensor_fusion_tpu.ops.icp import icp_align
from slam_sensor_fusion_tpu.ops.icp_fused import icp_align_fused
from slam_sensor_fusion_tpu.utils.config import ICPConfig

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LiteConfig:
    """Constants of the Python twin (localization_node.py:52-57,212-215)."""

    gps_weight: float = 0.2
    bbox_side: float = 15.0
    #: open3d threshold is a true distance; our gate is squared
    icp: ICPConfig = dataclasses.field(
        default_factory=lambda: ICPConfig(
            max_correspondence_dist_sq=0.25,
            num_iterations=30,
            # open3d convergence: relative change thresholds; fresh
            # correspondences every iteration == fast mode
            acceptable_mean_error=0.0,
            transformation_epsilon=1e-6,
            mode="fast",
        )
    )
    scan_capacity: int = 16384
    cropped_map_capacity: int = 65536


class LiteState(NamedTuple):
    map_T_sensor: Array
    odom_T_sensor_previous: Array


class LiteOutput(NamedTuple):
    map_T_sensor: Array
    map_T_sensor_coarse: Array
    icp_error: Array
    n_correspondences: Array
    #: bool — the OBB map crop produced zero points; the twin then skips
    #: the WHOLE frame ("not localizing", localization_node.py:226-228):
    #: neither map_T_sensor nor odom_previous_T_sensor is updated
    cropped_map_empty: Array


def init_state(first_gps_pose: Array, first_odom_pose: Array) -> LiteState:
    return LiteState(
        map_T_sensor=first_gps_pose, odom_T_sensor_previous=first_odom_pose
    )


@functools.partial(jax.jit, static_argnames=("config",))
def lite_step(
    state: LiteState,
    scan_points: Array,
    scan_mask: Array,
    odom_T_sensor: Array,
    map_T_sensor_gps: Array,
    map_cloud: cl.Cloud,
    config: LiteConfig = LiteConfig(),
) -> tuple[LiteState, LiteOutput]:
    """One frame of the Python twin (syncCallback, :193-269)."""
    side = config.bbox_side
    # LEFT-composed prediction (:161-167)
    delta = odom_T_sensor @ geo.inv_T(state.odom_T_sensor_previous)
    map_T_sensor_odom = delta @ state.map_T_sensor

    w = config.gps_weight
    coarse = w * map_T_sensor_gps + (1.0 - w) * map_T_sensor_odom  # (:212-215)

    scan = cl.crop_box(
        cl.Cloud(scan_points, scan_mask),
        jnp.array([0.0, -side / 2, 0.0], jnp.float32),
        jnp.array([side, side / 2, side / 2], jnp.float32),
    )
    cropped_map = cl.crop_obb(
        map_cloud, coarse, jnp.array([side * 2, side, side], jnp.float32)
    )

    icp_fn = icp_align_fused if config.icp.mode == "fast" else icp_align
    res = icp_fn(
        scan.points, scan.mask, cropped_map.points, cropped_map.mask,
        coarse, config.icp,
    )

    # empty cropped map -> the frame is a FULL no-op: the twin warns and
    # returns before the ICP, the publish, AND the odom_previous update
    # (localization_node.py:226-228,248-255); the next frame's odometry
    # delta is therefore taken against the older previous pose
    empty = cropped_map.count() == 0
    new_state = LiteState(
        map_T_sensor=jnp.where(empty, state.map_T_sensor, res.transformation),
        odom_T_sensor_previous=jnp.where(
            empty, state.odom_T_sensor_previous, odom_T_sensor
        ),
    )
    return new_state, LiteOutput(
        map_T_sensor=new_state.map_T_sensor,
        map_T_sensor_coarse=coarse,
        icp_error=jnp.where(empty, jnp.float32(0.0), res.error),
        n_correspondences=jnp.where(empty, 0, res.n_correspondences),
        cropped_map_empty=empty,
    )


def run_lite(
    map_points: np.ndarray,
    scans: list[np.ndarray],
    odom_T_sensor: np.ndarray,
    map_T_sensor_gps: np.ndarray,
    config: LiteConfig = LiteConfig(),
) -> np.ndarray:
    """Host driver: first frame initializes, the rest are jitted steps.

    Returns the (T, 4, 4) trajectory (frame 0 holds the GPS init pose).
    The map is used at full resolution after a 0.1 voxel downsample like
    the twin (:46-47); GPS poses come precomputed with raw altitudes.
    """
    from slam_sensor_fusion_tpu.ops.morton import sort_points_numpy

    map_cloud = cl.from_numpy(
        sort_points_numpy(map_points),
        1 << int(np.ceil(np.log2(max(len(map_points), 1024)))),
    )
    T = len(scans)
    out = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    out[0] = map_T_sensor_gps[0]
    state = init_state(
        jnp.asarray(map_T_sensor_gps[0]),
        jnp.asarray(odom_T_sensor[0], jnp.float32),
    )
    S = config.scan_capacity
    for k in range(1, T):
        sc = sort_points_numpy(scans[k])
        buf = np.zeros((S, 3), np.float32)
        n = min(len(sc), S)
        buf[:n] = sc[:n]
        msk = np.zeros(S, bool)
        msk[:n] = True
        state, o = lite_step(
            state,
            jnp.asarray(buf),
            jnp.asarray(msk),
            jnp.asarray(odom_T_sensor[k], jnp.float32),
            jnp.asarray(map_T_sensor_gps[k], jnp.float32),
            map_cloud,
            config,
        )
        out[k] = np.asarray(o.map_T_sensor)
    return out
