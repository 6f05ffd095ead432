"""Trajectory-level parity: the fixed-shape device pipeline vs a float64
dynamic-shape oracle of the C++ node's exact math."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from slam_sensor_fusion_tpu.models.localization import (
    Localizer, build_frame_batch, init_state, run_chunk,
)
from oracles import PipelineOracle
from test_pipeline import TEST_CONFIG, build_world_and_sequence


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="~16 min on CPU; run with RUN_SLOW=1 (passes: device trajectory "
    "within 5 cm of the float64 reference-semantics oracle)",
)
def test_pipeline_matches_oracle_trajectory():
    n = 14
    seq, map_data = build_world_and_sequence(n_frames=n, seed=9)
    loc = Localizer(map_data, TEST_CONFIG)
    gps_T = loc.gps_poses(seq.gps_lat, seq.gps_lon, seq.compass_yaw)

    # device pipeline, parity mode, steady state only (skip coarse: start
    # from the same GPS-initialized state on both sides)
    state = init_state(
        TEST_CONFIG, loc.map_cloud.capacity,
        jnp.asarray(gps_T[0]), jnp.asarray(seq.odom_T_sensor[0], jnp.float32),
    )
    frames = build_frame_batch(
        TEST_CONFIG, seq.scans[1:], seq.odom_T_sensor[1:], gps_T[1:],
        seq.odom_cov_trace[1:], seq.gps_cov_trace[1:], np.ones(n - 1, bool),
    )
    _, outs = run_chunk(state, frames, loc.map_cloud, TEST_CONFIG)
    dev_traj = np.asarray(outs.map_T_sensor)

    # oracle on identical inputs (same subsampled map, same scans)
    map_pts = map_data.map_points[:: TEST_CONFIG.map_subsample_step]
    oracle = PipelineOracle(map_pts, gps_T[0], seq.odom_T_sensor[0])
    orc_traj = []
    for k in range(1, n):
        T, _ = oracle.step(
            seq.scans[k], seq.odom_T_sensor[k], gps_T[k],
            seq.odom_cov_trace[k], seq.gps_cov_trace[k],
        )
        orc_traj.append(T)
    orc_traj = np.stack(orc_traj)

    # f32 vs f64 + discrete re-association decisions: expect near-identical
    # trajectories, cm-level tolerance
    d = np.linalg.norm(dev_traj[:, :3, 3] - orc_traj[:, :3, 3], axis=1)
    assert d.max() < 0.05, d
    # rotations agree too
    rd = np.linalg.norm(dev_traj[:, :3, :3] - orc_traj[:, :3, :3], axis=(1, 2))
    assert rd.max() < 0.05, rd
