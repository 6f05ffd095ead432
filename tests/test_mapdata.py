import os

import numpy as np

from slam_sensor_fusion_tpu.utils import mapdata
from slam_sensor_fusion_tpu.models.mapping import build_map_data


def make_run(rng, n_tiles=3):
    tiles = [rng.uniform(-5, 5, (200, 3)).astype(np.float32) for _ in range(n_tiles)]
    n = n_tiles * 10
    odom = np.zeros((n, 3))
    odom[15:, 0] = 2.0
    gps = np.tile([47.5, 9.0, 412.0, 0.3], (n, 1))
    return tiles, odom, gps


def test_save_load_roundtrip(tmp_path, rng):
    tiles, odom, gps = make_run(rng)
    path = str(tmp_path / "map_data")
    mapdata.save_map_data(path, tiles, odom, gps)
    files = sorted(os.listdir(path))
    assert "cloud_10.pcd" in files and "cloud_30.pcd" in files
    assert "odometry_positions.txt" in files and "gps_imu_poses.txt" in files

    md = mapdata.load_map_data(path)
    ref = build_map_data(tiles, odom, gps)
    assert md.map_points.shape == ref.map_points.shape
    np.testing.assert_allclose(md.map_T_global, ref.map_T_global, atol=1e-9)
    np.testing.assert_allclose(md.altitude_table, ref.altitude_table)
    # merged map + datum cached like the reference
    assert os.path.exists(os.path.join(path, "map.pcd"))
    assert os.path.exists(os.path.join(path, "map_T_global.npy"))


def test_load_uses_cache(tmp_path, rng):
    tiles, odom, gps = make_run(rng)
    path = str(tmp_path / "map_data")
    mapdata.save_map_data(path, tiles, odom, gps)
    md1 = mapdata.load_map_data(path)
    # remove the tiles: a cached load must still work (reference: cache hit
    # path loads map.pcd only, global_map_frames_manager.cpp:98-103)
    for f in os.listdir(path):
        if f.startswith("cloud_"):
            os.remove(os.path.join(path, f))
    md2 = mapdata.load_map_data(path)
    np.testing.assert_array_equal(md1.map_points, md2.map_points)
    np.testing.assert_allclose(md1.map_T_global, md2.map_T_global)


def test_wipe_recreates(tmp_path, rng):
    tiles, odom, gps = make_run(rng)
    path = str(tmp_path / "map_data")
    mapdata.save_map_data(path, tiles, odom, gps)
    mapdata.save_map_data(path, tiles[:1], odom[:10], gps[:10])
    files = [f for f in os.listdir(path) if f.startswith("cloud_")]
    assert files == ["cloud_10.pcd"]
