import numpy as np

from slam_sensor_fusion_tpu.models import mapping as mp
from slam_sensor_fusion_tpu.ops.utm import ll_to_utm
from slam_sensor_fusion_tpu.utils.config import MappingConfig


def test_merge_tiles_voxelizes(rng):
    t1 = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    t2 = t1 + 0.001  # nearly duplicate tile
    merged = mp.merge_tiles([t1, t2], voxel_size=0.1)
    assert merged.shape[0] <= 500  # duplicates collapse into voxels
    assert merged.shape[0] > 300


def test_altitude_table_filters_and_looks_up():
    rows = np.array(
        [
            [47.0, 9.0, 400.0, 0.1],
            [47.1, 9.1, -1.0, 0.1],  # alt <= 0 excluded
            [47.2, 9.2, 420.0, 0.1],
        ]
    )
    table = mp.build_altitude_table(rows)
    assert table.shape == (2, 3)
    assert mp.closest_altitude(table, 47.01, 9.01) == 400.0
    assert mp.closest_altitude(table, 47.19, 9.19) == 420.0
    assert mp.closest_altitude(np.zeros((0, 3)), 47.0, 9.0) == 0.0
    got = mp.closest_altitude_batch(table, np.array([47.0, 47.2]), np.array([9.0, 9.2]))
    np.testing.assert_array_equal(got, [400.0, 420.0])


def test_solve_map_T_global_standstill():
    # robot standing still at a known datum with constant heading
    lat, lon, alt, yaw = 47.5, 9.0, 412.0, 0.3
    n = 20
    odom = np.zeros((n, 3))
    gps = np.tile([lat, lon, alt, yaw], (n, 1))
    T = mp.solve_map_T_global(odom, gps)
    e, nn = ll_to_utm(lat, lon)
    g = np.array([e, nn, alt])
    # map_T_global maps the datum UTM point to the map origin
    mapped = T[:3, :3] @ g + T[:3, 3]
    np.testing.assert_allclose(mapped, 0.0, atol=1e-6)
    # and undoes the heading: global x-axis rotated by -yaw
    c, s = np.cos(-yaw), np.sin(-yaw)
    np.testing.assert_allclose(T[:3, :3], [[c, -s, 0], [s, c, 0], [0, 0, 1]], atol=1e-9)


def test_solve_filters_moving_and_invalid_rows():
    lat, lon, alt, yaw = 47.5, 9.0, 412.0, 0.0
    odom = np.zeros((30, 3))
    odom[10:, 0] = 5.0  # moving -> excluded
    gps = np.tile([lat, lon, alt, yaw], (30, 1))
    gps[:5, 2] = -1.0  # invalid altitude -> excluded
    T = mp.solve_map_T_global(odom, gps)
    e, nn = ll_to_utm(lat, lon)
    mapped = T[:3, :3] @ np.array([e, nn, alt]) + T[:3, 3]
    np.testing.assert_allclose(mapped, 0.0, atol=1e-6)


def test_solve_empty_returns_identity():
    T = mp.solve_map_T_global(np.zeros((5, 3)) + 10.0, np.tile([47.0, 9.0, 400.0, 0.0], (5, 1)))
    np.testing.assert_array_equal(T, np.eye(4))


def test_max_poses_cap():
    cfg = MappingConfig(max_map_optimization_poses=3)
    odom = np.zeros((10, 3))
    gps = np.tile([47.5, 9.0, 412.0, 0.0], (10, 1))
    gps[3:, 3] = 5.0  # large yaw on rows past the cap — must be ignored
    T = mp.solve_map_T_global(odom, gps, cfg)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-9)


def test_gps_to_map_poses_roundtrip():
    lat, lon, alt, yaw = 47.5, 9.0, 412.0, 0.3
    odom = np.zeros((10, 3))
    gps = np.tile([lat, lon, alt, yaw], (10, 1))
    md = mp.MapData(
        map_points=np.zeros((0, 3), np.float32),
        map_T_global=mp.solve_map_T_global(odom, gps),
        altitude_table=mp.build_altitude_table(gps),
    )
    poses = mp.gps_to_map_poses(md, [lat], [lon], [yaw])
    # the calibration point maps to the origin with identity heading
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-5)


def test_streaming_mapper_tiles_and_flush(rng):
    m = mp.StreamingMapper(MappingConfig(cloud_save_rate=10))
    for i in range(25):
        m.add_frame(
            rng.uniform(0, 1, (100, 3)),
            np.zeros(3),
            47.5,
            9.0,
            412.0,
            0.0,
        )
    assert len(m.tiles) == 2  # tiles cut at frames 10 and 20
    md = m.finalize()
    assert len(m.tiles) == 3  # residual flushed on shutdown
    assert md.map_points.shape[0] > 0
    assert md.altitude_table.shape[0] == 25


def test_standstill_prefix_count_breaks_at_first_mover():
    odom = np.zeros((10, 3))
    odom[3] = [0.0, 0.3, 0.3]  # 3D norm 0.42 < 0.5 -> still standstill
    odom[6] = [0.6, 0.0, 0.0]  # first mover
    odom[8] = [0.0, 0.0, 0.0]  # later standstill must NOT count (prefix only)
    assert mp.standstill_prefix_count(odom) == 6
    assert mp.standstill_prefix_count(np.zeros((4, 3))) == 4
    assert mp.standstill_prefix_count(np.full((4, 3), 9.0)) == 0


def test_prefix_solver_matches_python_builder_oracle():
    """solve_map_T_global_prefix vs a scipy oracle of the reference's
    MapBuilder.optimize_map_T_global (optimize_global_map_pose.py:68-99):
    prefix-count pose selection, per-component euler mean, UTM-mean
    translation, inversion."""
    from scipy.spatial.transform import Rotation as R

    rng = np.random.default_rng(7)
    n = 30
    odom = rng.normal(0, 0.1, (n, 3))
    odom[12:] += 3.0  # prefix = 12 standstill poses
    rows = np.zeros((n, 6))
    rows[:, 0] = 47.5 + rng.normal(0, 1e-6, n)
    rows[:, 1] = 9.0 + rng.normal(0, 1e-6, n)
    rows[:, 2] = 400.0 + rng.normal(0, 0.2, n)
    rows[:, 3:6] = rng.normal([0.02, -0.01, 0.8], 0.01, (n, 3))

    got = mp.solve_map_T_global_prefix(odom, rows)

    n_poses = 12
    mean_rpy = rows[:n_poses, 3:6].mean(axis=0)
    e, nn = ll_to_utm(rows[:n_poses, 0], rows[:n_poses, 1])
    mean_t = np.stack([e, nn, rows[:n_poses, 2]], axis=1).mean(axis=0)
    g_T_m = np.eye(4)
    g_T_m[:3, :3] = R.from_euler("xyz", mean_rpy).as_matrix()
    g_T_m[:3, 3] = mean_t
    np.testing.assert_allclose(got, np.linalg.inv(g_T_m), atol=1e-9)

    # 4-column C++-format rows are accepted as yaw-only
    rows4 = rows[:, [0, 1, 2, 5]]
    got4 = mp.solve_map_T_global_prefix(odom, rows4)
    mean_yaw = rows4[:n_poses, 3].mean()
    g_T_m[:3, :3] = R.from_euler("xyz", [0.0, 0.0, mean_yaw]).as_matrix()
    np.testing.assert_allclose(got4, np.linalg.inv(g_T_m), atol=1e-9)

    # 50-pose cap (optimize_global_map_pose.py:15,75-77)
    long_odom = np.zeros((80, 3))
    long_rows = np.tile(rows[0], (80, 1))
    long_rows[50:, 2] = 1e6  # must be ignored past the cap
    capped = mp.solve_map_T_global_prefix(long_odom, long_rows)
    ref = mp.solve_map_T_global_prefix(long_odom[:50], long_rows[:50])
    np.testing.assert_allclose(capped, ref, atol=1e-12)


def test_build_map_data_prefix_solver_flag(rng):
    t = rng.uniform(0, 5, (200, 3)).astype(np.float32)
    odom = np.zeros((10, 3))
    rows = np.tile([47.5, 9.0, 400.0, 0.3], (10, 1))
    md_cpp = mp.build_map_data([t], odom, rows)
    md_py = mp.build_map_data([t], odom, rows, use_prefix_solver=True)
    # same standstill data -> both datums agree (yaw-only rows)
    np.testing.assert_allclose(md_py.map_T_global, md_cpp.map_T_global, atol=1e-9)
