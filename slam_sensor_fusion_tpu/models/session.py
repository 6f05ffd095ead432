"""Online (incremental) sessions: feed one frame, get one pose.

The reference is a live 10 Hz node — every sensor triplet arrives as a
callback and produces a pose immediately (localization_node.cpp:263-374).
`Localizer.run` replays complete sequences (throughput form); this module
is the real-time form: the SAME jitted per-frame programs, driven one
frame at a time, so a robot integrator gets the callback contract —
`push(frame) -> pose` — with single-frame host->device->host latency
(measured by the bench's latency section).

Equivalence guarantee: a frame-at-a-time session follows the exact
per-frame engine (`models/localization.step` / `models/lio.lio_step`), the
same programs the chunked `lax.scan` replay traces — trajectories match
the batch drivers (tests/test_session.py pins it).

The startup ladder (first-GPS init, brute-force coarse alignment with
rescue-ICP retries per frame, localization_node.cpp:181-261) runs inside
`push` exactly as the reference runs it inside callbacks.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_sensor_fusion_tpu.models import lio as lio_mod
from slam_sensor_fusion_tpu.models.localization import (
    Localizer,
    _fine_jit,
    build_frame_batch,
    coarse_attempt,
    init_state,
    step,
)
from slam_sensor_fusion_tpu.models.mapping import MapData
from slam_sensor_fusion_tpu.utils.config import LocalizationConfig


@dataclasses.dataclass
class PushResult:
    """One callback's outputs (the node's publish set, localization_node.cpp:343-373)."""

    map_T_sensor: np.ndarray  # (4, 4) posterior (or carried pose on skips)
    #: "init" | "skipped" (invalid GPS) | "coarse_retry" | "tracking"
    phase: str
    icp_error: float = float("nan")
    icp_converged: bool = False
    n_correspondences: int = 0


class LocalizerSession:
    """Incremental localization: the node's callback contract.

    Same construction surface as `Localizer` (map_data + config); `push`
    mirrors localizationCallback's gating order: invalid-GPS skip ->
    first-fix init -> coarse ladder (retry per frame) -> steady-state
    per-frame step.
    """

    def __init__(
        self,
        map_data: MapData,
        config: LocalizationConfig = LocalizationConfig(),
        profile: bool = False,
    ):
        self.loc = Localizer(map_data, config)
        self.config = config
        self.state = None
        self.coarse_done = False
        self._guess = None
        #: when `profile`, each steady-state push leaves
        #: {host_ms, dispatch_ms, device_ms} here: host = geodesy +
        #: frame staging on CPU, dispatch = the jitted-step Python call
        #: returning (async enqueue — on a tunnelled chip this carries
        #: the per-dispatch RPC), device = blocking until outputs are
        #: host-readable (device execute + D2H). The bench's latency
        #: section publishes these so the ~100 ms platform RPC floor is
        #: measured per-component, not asserted (VERDICT r4 #3).
        self.profile = profile
        self.last_timing: dict | None = None

    def push(
        self,
        scan: np.ndarray,
        odom_T_sensor: np.ndarray,
        lat: float,
        lon: float,
        alt: float,
        compass_yaw: float,
        odom_cov_trace: float,
        gps_cov_trace: float,
    ) -> PushResult:
        import time

        cfg = self.config
        valid = alt >= 0
        t_host0 = time.perf_counter() if self.profile else 0.0
        gps_T = self.loc.gps_poses(
            np.asarray([lat]), np.asarray([lon]), np.asarray([compass_yaw])
        )[0]

        # ---- startup gating: first valid GPS fix initializes the pose
        # (initializePosesWithFirstReading, localization_node.cpp:181-198)
        if self.state is None:
            if not valid:
                return PushResult(np.eye(4, dtype=np.float32), "skipped")
            self.state = init_state(
                cfg,
                self.loc.map_cloud.capacity,
                jnp.asarray(gps_T),
                jnp.asarray(odom_T_sensor, jnp.float32),
            )
            self._guess = jnp.asarray(gps_T)
            return PushResult(gps_T, "init")

        frame = build_frame_batch(
            cfg,
            [scan],
            np.asarray(odom_T_sensor)[None],
            gps_T[None],
            np.asarray([odom_cov_trace]),
            np.asarray([gps_cov_trace]),
            np.asarray([valid]),
        )

        # ---- coarse ladder: retry per callback until success
        # (performCoarseAlignment, localization_node.cpp:200-261,307-315)
        if not self.coarse_done:
            if not valid:
                return PushResult(
                    np.asarray(self.state.map_T_sensor), "skipped"
                )
            (cropped_map, cached_target, map_T_ref, cropped_scan,
             coarse) = coarse_attempt(
                self.state,
                frame.scan_points[0],
                frame.scan_mask[0],
                self.loc.map_cloud,
                self._guess,
                cfg,
            )
            self.state = self.state._replace(
                cropped_map=cropped_map,
                cached_target=cached_target,
                map_T_ref=map_T_ref,
            )
            if bool(coarse.success):
                self.coarse_done = True
                self.state = self.state._replace(
                    map_T_sensor=coarse.map_T_sensor
                )
                # fine alignment runs in the same callback (:311-341)
                self.state, out = _fine_jit(
                    self.state,
                    cropped_scan,
                    self.state.cropped_map,
                    self.state.cached_target,
                    self.state.map_T_ref,
                    jnp.bool_(False),
                    frame.odom_T_sensor[0],
                    frame.map_T_sensor_gps[0],
                    frame.odom_cov_trace[0],
                    frame.gps_cov_trace[0],
                    cfg,
                )
                return PushResult(
                    np.asarray(out.map_T_sensor),
                    "tracking",
                    icp_error=float(out.icp_error),
                    icp_converged=bool(out.icp_converged),
                    n_correspondences=int(out.n_correspondences),
                )
            # next attempt searches around the best brute-force candidate
            # (brute_force_alignment.cpp:125-126)
            self._guess = coarse.map_T_sensor
            return PushResult(
                np.asarray(self.state.map_T_sensor), "coarse_retry"
            )

        # ---- steady state: the per-frame jitted program
        t_disp0 = time.perf_counter() if self.profile else 0.0
        self.state, out = step(
            self.state,
            frame.scan_points[0],
            frame.scan_mask[0],
            frame.odom_T_sensor[0],
            frame.map_T_sensor_gps[0],
            frame.odom_cov_trace[0],
            frame.gps_cov_trace[0],
            frame.valid[0],
            self.loc.map_cloud,
            cfg,
        )
        t_dev0 = time.perf_counter() if self.profile else 0.0
        pose = np.asarray(out.map_T_sensor)
        if self.profile:
            t_end = time.perf_counter()
            self.last_timing = {
                "host_ms": (t_disp0 - t_host0) * 1e3,
                "dispatch_ms": (t_dev0 - t_disp0) * 1e3,
                "device_ms": (t_end - t_dev0) * 1e3,
            }
        if not valid:
            return PushResult(pose, "skipped")
        return PushResult(
            pose,
            "tracking",
            icp_error=float(out.icp_error),
            icp_converged=bool(out.icp_converged),
            n_correspondences=int(out.n_correspondences),
        )


class BlockLocalizerSession(LocalizerSession):
    """Dispatch-amortized online session: buffers K frames and runs the
    K-frame superblock program in ONE device dispatch.

    The per-frame `LocalizerSession.push` pays one host->device dispatch
    per frame; on a remotely-attached chip (this platform's tunnel) that
    dispatch carries a ~100 ms RPC floor, which busts the reference's
    10 Hz callback budget (stochastic_filter.cpp:41) no matter how fast
    the device work is. This variant trades K-1 frames of freshness for
    1/K the dispatch overhead: with K=2 at 10 Hz the pose stream lags at
    most 100 ms behind the sensor — the same latency one RPC costs anyway.

    Contract: `push(frame) -> list[PushResult]` — `[]` while buffering,
    K results (sensor order) when the block flushes. Startup (first-GPS
    init + coarse ladder) stays per-frame, exactly the parent's path.
    Trajectory equality with the per-frame engine holds the same way the
    batch replay's does (tests/test_session.py pins both).
    """

    def __init__(
        self,
        map_data: MapData,
        config: LocalizationConfig,
        profile: bool = False,
    ):
        if not config.block_kernel:
            raise ValueError(
                "BlockLocalizerSession needs block_kernel=True (the "
                "superblock program is the whole point); superstep is K"
            )
        super().__init__(map_data, config, profile=profile)
        self.K = config.superstep
        self._buf: list[tuple] = []
        import jax

        self._on_accel = jax.devices()[0].platform != "cpu"

    def push(
        self,
        scan: np.ndarray,
        odom_T_sensor: np.ndarray,
        lat: float,
        lon: float,
        alt: float,
        compass_yaw: float,
        odom_cov_trace: float,
        gps_cov_trace: float,
    ) -> list[PushResult]:
        import time

        if self.state is None or not self.coarse_done:
            # per-frame startup ladder (gating order is the reference's)
            return [
                super().push(
                    scan, odom_T_sensor, lat, lon, alt, compass_yaw,
                    odom_cov_trace, gps_cov_trace,
                )
            ]

        self._buf.append((
            np.asarray(scan), np.asarray(odom_T_sensor), float(lat),
            float(lon), float(alt), float(compass_yaw),
            float(odom_cov_trace), float(gps_cov_trace),
        ))
        if len(self._buf) < self.K:
            return []

        from slam_sensor_fusion_tpu.models.pipeline_fast import (
            build_paged_frames,
            run_chunk_fast,
        )

        cfg = self.config
        t_host0 = time.perf_counter() if self.profile else 0.0
        scans = [b[0] for b in self._buf]
        odom_T = np.stack([b[1] for b in self._buf])
        lats = np.asarray([b[2] for b in self._buf])
        lons = np.asarray([b[3] for b in self._buf])
        alts = np.asarray([b[4] for b in self._buf])
        yaws = np.asarray([b[5] for b in self._buf])
        ocov = np.asarray([b[6] for b in self._buf])
        gcov = np.asarray([b[7] for b in self._buf])
        self._buf.clear()
        valid = alts >= 0
        gps_T = self.loc.gps_poses(lats, lons, yaws)
        frames = jax.device_put(build_paged_frames(
            cfg, scans, odom_T, gps_T, ocov, gcov, valid,
        ))
        t_disp0 = time.perf_counter() if self.profile else 0.0
        self.state, outs = run_chunk_fast(
            self.state, frames, self.loc.map_cloud, cfg,
            interpret=not self._on_accel,
        )
        t_dev0 = time.perf_counter() if self.profile else 0.0
        poses = np.asarray(outs.map_T_sensor)
        errs = np.asarray(outs.icp_error)
        conv = np.asarray(outs.icp_converged)
        ncor = np.asarray(outs.n_correspondences)
        if self.profile:
            t_end = time.perf_counter()
            self.last_timing = {
                "host_ms": (t_disp0 - t_host0) * 1e3,
                "dispatch_ms": (t_dev0 - t_disp0) * 1e3,
                "device_ms": (t_end - t_dev0) * 1e3,
            }
        return [
            PushResult(
                poses[k],
                "tracking" if valid[k] else "skipped",
                icp_error=float(errs[k]),
                icp_converged=bool(conv[k]),
                n_correspondences=int(ncor[k]),
            )
            for k in range(self.K)
        ]


@dataclasses.dataclass
class LIOPushResult:
    world_T_body: np.ndarray  # (4, 4)
    rmse: float
    n_correspondences: int
    gps_accepted: bool


class LIOSession:
    """Incremental native-mode LIO: one `push` per (scan, IMU packet, GPS)
    triplet, wrapping the same jitted `lio_step` the chunk drivers scan
    over. Scans should arrive Morton-pre-sorted (the loader contract);
    `tau` rides the same permutation for deskew."""

    def __init__(
        self,
        config: lio_mod.LIOConfig,
        first_scan: np.ndarray,
        first_scan_mask: np.ndarray,
        world_T_body0: np.ndarray,
    ):
        self.config = config
        self.state = lio_mod.init_state(
            config,
            jnp.asarray(first_scan, jnp.float32),
            jnp.asarray(first_scan_mask, bool),
            jnp.asarray(world_T_body0, jnp.float32),
        )

    def push(
        self,
        scan_points: np.ndarray,  # (S, 3) padded to config.scan_capacity
        scan_mask: np.ndarray,  # (S,)
        imu_gyro: np.ndarray,  # (K, 3)
        imu_accel: np.ndarray,  # (K, 3)
        imu_dt: np.ndarray,  # (K,)
        gps_pos: np.ndarray,  # (3,)
        gps_var: float,
        gps_valid: bool,
        tau: np.ndarray | None = None,  # (S,) sweep fractions
    ) -> LIOPushResult:
        args = [
            jnp.asarray(scan_points, jnp.float32),
            jnp.asarray(scan_mask, bool),
            jnp.asarray(imu_gyro, jnp.float32),
            jnp.asarray(imu_accel, jnp.float32),
            jnp.asarray(imu_dt, jnp.float32),
            jnp.asarray(gps_pos, jnp.float32),
            jnp.float32(gps_var),
            jnp.bool_(gps_valid),
        ]
        if tau is None:
            self.state, out = lio_mod.lio_step(self.state, *args, self.config)
        else:
            self.state, out = lio_mod.lio_step(
                self.state, *args, self.config, jnp.asarray(tau, jnp.float32)
            )
        return LIOPushResult(
            world_T_body=np.asarray(out.world_T_body),
            rmse=float(out.rmse),
            n_correspondences=int(out.n_correspondences),
            gps_accepted=bool(out.gps_accepted),
        )
