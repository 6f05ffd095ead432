import os
import subprocess

import numpy as np
import pytest

from slam_sensor_fusion_tpu.utils import native, pcdio, timesync
from slam_sensor_fusion_tpu.ops.morton import sort_points_numpy


def test_pcd_roundtrip_binary(tmp_path, rng):
    pts = rng.normal(size=(137, 3)).astype(np.float32)
    p = str(tmp_path / "a.pcd")
    pcdio.write_pcd(p, pts, binary=True)
    np.testing.assert_array_equal(pcdio.read_pcd(p), pts)


def test_pcd_roundtrip_ascii(tmp_path, rng):
    pts = rng.normal(size=(23, 3)).astype(np.float32)
    p = str(tmp_path / "a.pcd")
    pcdio.write_pcd(p, pts, binary=False)
    np.testing.assert_allclose(pcdio.read_pcd(p), pts, rtol=1e-6)


def test_pcd_extra_fields(tmp_path, rng):
    # PCL often writes x y z intensity; xyz must still parse
    pts = rng.normal(size=(10, 4)).astype(np.float32)
    p = str(tmp_path / "b.pcd")
    header = (
        "VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\nTYPE F F F F\n"
        "COUNT 1 1 1 1\nWIDTH 10\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        "POINTS 10\nDATA binary\n"
    )
    with open(p, "wb") as f:
        f.write(header.encode())
        f.write(pts.tobytes())
    np.testing.assert_array_equal(pcdio.read_pcd(p), pts[:, :3])


def test_text_log_roundtrip(tmp_path, rng):
    odom = rng.normal(size=(20, 3))
    gps = rng.normal(size=(20, 4)) * [10, 10, 100, 1]
    po = str(tmp_path / "odometry_positions.txt")
    pg = str(tmp_path / "gps_imu_poses.txt")
    pcdio.write_odometry_positions(po, odom)
    pcdio.write_gps_imu_poses(pg, gps)
    with open(po) as f:
        assert f.readline().strip() == "tx ty tz"
    with open(pg) as f:
        assert f.readline().strip() == "lat lon alt y"
    np.testing.assert_allclose(pcdio.read_odometry_positions(po), odom, rtol=1e-5)
    np.testing.assert_allclose(pcdio.read_gps_imu_poses(pg), gps, atol=1e-8)


@pytest.mark.skipif(not native.available(), reason="libsfio.so not built")
def test_native_pcd_matches_python(tmp_path, rng):
    pts = rng.normal(size=(501, 3)).astype(np.float32)
    p = str(tmp_path / "n.pcd")
    native.write_pcd(p, pts)
    np.testing.assert_array_equal(native.read_pcd(p), pts)
    np.testing.assert_array_equal(pcdio.read_pcd(p), pts)


@pytest.mark.skipif(not native.available(), reason="libsfio.so not built")
def test_native_morton_matches_numpy(rng):
    pts = rng.uniform(-10, 10, size=(1000, 3)).astype(np.float32)
    np.testing.assert_array_equal(native.morton_sort(pts), sort_points_numpy(pts))


def test_nearest_within(rng):
    stream = np.sort(rng.uniform(0, 10, 50))
    query = rng.uniform(-1, 11, 20)
    idx, ok = timesync.nearest_within(query, stream, slop=0.2)
    for q, i, o in zip(query, idx, ok):
        d = np.abs(stream - q)
        assert i == d.argmin()
        assert o == (d.min() <= 0.2)


@pytest.mark.skipif(not native.available(), reason="libsfio.so not built")
def test_native_nearest_matches_numpy(rng):
    stream = np.sort(rng.uniform(0, 10, 50))
    query = rng.uniform(-1, 11, 20)
    i0, o0 = timesync.nearest_within(query, stream, 0.2)
    i1, o1 = native.nearest_within(query, stream, 0.2)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_array_equal(o0, o1)


def test_align_streams():
    scan_t = np.array([0.0, 1.0, 2.0, 3.0])
    gps_t = np.array([0.05, 1.02, 2.5])  # frame 3 has no gps within slop
    odom_t = np.array([0.0, 0.99, 2.01, 3.0])
    compass_t = np.array([0.5])  # first frame has no compass yet
    al = timesync.align(scan_t, gps_t, odom_t, compass_t, slop=0.1)
    # frame 0: no compass yet; frames 2,3: no gps within slop -> only 1 kept
    np.testing.assert_array_equal(al.scan_idx, [1])
    np.testing.assert_array_equal(al.gps_idx, [1])
    np.testing.assert_array_equal(al.odom_idx, [1])
    np.testing.assert_array_equal(al.compass_idx, [0])


@pytest.mark.skipif(not native.available(), reason="libsfio.so not built")
def test_native_page_frame_matches_numpy_staging(rng):
    """sfio_page_frame == build_paged_frames' NumPy loop, element-exact."""
    from unittest import mock

    import jax.numpy as jnp

    from slam_sensor_fusion_tpu.models.pipeline_fast import build_paged_frames
    from slam_sensor_fusion_tpu.utils.config import (
        CloudCapacity,
        LocalizationConfig,
    )
    import dataclasses
    from slam_sensor_fusion_tpu.utils.config import ICPConfig

    config = dataclasses.replace(
        LocalizationConfig(),
        scan_subsample_step=3,
        capacity=CloudCapacity(scan=1024, cropped_scan=1024, cropped_map=1024,
                               map=1024, bf_source=256, bf_target=256),
        icp=dataclasses.replace(ICPConfig(), tile_src=256),
    )
    scans = [
        rng.uniform(-15, 15, (rng.integers(2, 900), 3)).astype(np.float32)
        for _ in range(5)
    ] + [np.zeros((0, 3), np.float32), rng.uniform(-1, 1, (2, 3)).astype(np.float32)]
    T = len(scans)
    eye = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    tr = np.ones(T, np.float32)
    ok = np.ones(T, bool)

    nat = build_paged_frames(config, scans, eye, eye, tr, tr, ok)
    with mock.patch(
        "slam_sensor_fusion_tpu.utils.native.available", return_value=False
    ):
        ref = build_paged_frames(config, scans, eye, eye, tr, tr, ok)

    np.testing.assert_array_equal(np.asarray(nat.src_pages), np.asarray(ref.src_pages))
    np.testing.assert_array_equal(np.asarray(nat.src_cnt), np.asarray(ref.src_cnt))
    np.testing.assert_allclose(np.asarray(nat.src_lo), np.asarray(ref.src_lo), atol=1e-6)
    np.testing.assert_allclose(np.asarray(nat.src_hi), np.asarray(ref.src_hi), atol=1e-6)
