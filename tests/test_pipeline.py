import dataclasses

import numpy as np

from slam_sensor_fusion_tpu.models.localization import Localizer
from slam_sensor_fusion_tpu.models.mapping import build_map_data
from slam_sensor_fusion_tpu.utils import synthetic as syn
from slam_sensor_fusion_tpu.utils.config import (
    BruteForceConfig,
    CloudCapacity,
    LocalizationConfig,
)

# small capacities + a reduced brute-force grid keep CPU tests quick while
# exercising every code path
TEST_CONFIG = LocalizationConfig(
    capacity=CloudCapacity(
        scan=8192,
        cropped_scan=8192,
        cropped_map=16384,
        map=1 << 17,
        bf_source=512,
        bf_target=4096,
    ),
    brute_force=BruteForceConfig(
        x_step=0.2, y_step=0.2, z_step=0.1, x_range=0.8, y_range=0.8, z_range=0.2,
        yaw_step=np.pi / 18, yaw_range=np.pi / 9, mean_error_threshold=0.1,
    ),
    # the synthetic test world is far sparser than a real survey map, so
    # back off the reference's aggressive subsample ratios (3 and 15, which
    # assume ~100k-point local maps); ratio semantics are covered by the
    # oracle parity tests
    map_subsample_step=1,
    brute_force_map_subsample_step=3,
)


def build_world_and_sequence(n_frames=40, seed=3):
    rng = np.random.default_rng(seed)
    world = syn.make_world(
        rng, extent=60.0, n_buildings=25, n_poles=60, points_per_m2=24.0
    )
    poses = syn.make_trajectory(n_frames)
    seq = syn.make_sequence(
        seed=seed, world=world, poses=poses, scan_points=6000, gps_noise_m=0.3
    )

    # mapping run over the same trajectory: tiles are map-frame scans
    tiles = []
    map_rng = np.random.default_rng(seed + 1)
    for i in range(0, n_frames, 2):
        body = syn.render_scan(world, poses[i], map_rng, max_points=6000, noise=0.005)
        tiles.append(body @ poses[i][:3, :3].T + poses[i][:3, 3])
    odom_pos, gps_rows = syn.make_mapping_logs(seq, standstill_frames=10)
    map_data = build_map_data(tiles, odom_pos, gps_rows)
    return seq, map_data


def ate_rmse(est, gt, valid):
    d = est[valid, :3, 3] - gt[valid, :3, 3]
    return float(np.sqrt((d ** 2).sum(axis=1).mean()))


def test_end_to_end_localization():
    seq, map_data = build_world_and_sequence()
    loc = Localizer(map_data, TEST_CONFIG)
    res = loc.run(
        seq.scans,
        seq.odom_T_sensor,
        seq.gps_lat,
        seq.gps_lon,
        seq.gps_alt,
        seq.compass_yaw,
        seq.odom_cov_trace,
        seq.gps_cov_trace,
        chunk=16,
    )
    assert res.first_processed_frame == 0
    assert res.valid[5:].all()

    err = ate_rmse(res.map_T_sensor, seq.true_map_T_sensor, res.valid)
    # clean synthetic data, 0.1 m map voxel, 0.01 m scan noise: the pose
    # track should stay within a few cm of ground truth
    assert err < 0.12, f"ATE RMSE too high: {err}"

    # ICP must keep finding rich correspondence sets; the strict
    # `converged` flag (mean err < 0.05 m) depends on map voxelization, so
    # only require it on a meaningful fraction of frames
    assert (res.n_correspondences[res.valid] > 500).mean() > 0.9
    conv_rate = res.icp_converged[res.valid].mean()
    assert conv_rate > 0.3, f"ICP convergence rate: {conv_rate}"


def test_invalid_gps_frames_are_skipped():
    seq, map_data = build_world_and_sequence(n_frames=25, seed=5)
    # poison some mid-sequence altitudes: those frames must be no-ops
    seq.gps_alt[10:13] = -5.0
    loc = Localizer(map_data, TEST_CONFIG)
    res = loc.run(
        seq.scans,
        seq.odom_T_sensor,
        seq.gps_lat,
        seq.gps_lon,
        seq.gps_alt,
        seq.compass_yaw,
        seq.odom_cov_trace,
        seq.gps_cov_trace,
        chunk=8,
    )
    assert not res.valid[10:13].any()
    # pose is frozen across the gap (held at the last posterior)
    np.testing.assert_array_equal(res.map_T_sensor[10], res.map_T_sensor[11])
    # and recovers after
    err = ate_rmse(res.map_T_sensor[15:], seq.true_map_T_sensor[15:], res.valid[15:])
    assert err < 0.15


def test_startup_waits_for_valid_gps():
    seq, map_data = build_world_and_sequence(n_frames=20, seed=7)
    seq.gps_alt[:4] = -1.0  # node startup gate (localization_node.cpp:269-276)
    loc = Localizer(map_data, TEST_CONFIG)
    res = loc.run(
        seq.scans,
        seq.odom_T_sensor,
        seq.gps_lat,
        seq.gps_lon,
        seq.gps_alt,
        seq.compass_yaw,
        seq.odom_cov_trace,
        seq.gps_cov_trace,
    )
    assert res.first_processed_frame == 4
    assert not res.valid[:5].any()  # frame 4 itself only initializes
    assert res.valid[6:].all()
