"""Auto-sizing (utils/autosize): derived configs must FIT the data —
no truncation, complete pair lists — and actually run the pipeline.

This is the "just works on whatever arrives" property of the reference's
dynamic clouds (localization_node.cpp:6-28), recovered for fixed shapes.
"""

import dataclasses

import numpy as np

from slam_sensor_fusion_tpu.utils import autosize
from slam_sensor_fusion_tpu.utils import synthetic as syn


def test_capacities_fit_sample(rng):
    scans = [rng.uniform(-20, 20, (n, 3)).astype(np.float32)
             for n in (9000, 11000, 10_500)]
    map_pts = rng.uniform(-30, 30, (200_000, 3)).astype(np.float32)
    cfg = autosize.suggest_localization_config(scans, map_pts)
    assert cfg.capacity.scan >= 11000 / cfg.scan_subsample_step
    assert cfg.capacity.map >= 200_000 / cfg.map_subsample_step
    # visit/pair lists complete by construction
    assert cfg.icp.max_visits >= cfg.capacity.cropped_map // cfg.icp.tile_tgt
    # the crop estimate must cover the densest ball with margin: uniform
    # 60 m cube, 10 m ball => ~2.4% of points
    in_ball = autosize.estimate_crop_points(
        map_pts[:: cfg.map_subsample_step], cfg.cloud_crop_radius
    )
    assert cfg.capacity.cropped_map >= in_ball


def test_stress_shapes_get_stress_tiles(rng):
    scans = [rng.uniform(-20, 20, (120_000, 3)).astype(np.float32)]
    map_pts = rng.uniform(-30, 30, (50_000, 3)).astype(np.float32)
    base = autosize.suggest_localization_config(
        scans, map_pts,
        base=dataclasses.replace(
            autosize.LocalizationConfig(), scan_subsample_step=2
        ),
    )
    assert (base.icp.tile_src, base.icp.tile_tgt) == (4096, 128)


def test_lio_config_reg_subsample(rng):
    scans = [rng.uniform(-20, 20, (16_000, 3)).astype(np.float32)] * 3
    cfg = autosize.suggest_lio_config(scans)
    assert cfg.scan_capacity >= 16_000
    assert cfg.reg_subsample == 8  # 16k / 2k target


def test_autosized_pipeline_runs_clean(rng):
    """End-to-end proof: a pipeline configured ONLY from the data sample
    localizes with zero overflow flags."""
    from slam_sensor_fusion_tpu.models.localization import Localizer
    from slam_sensor_fusion_tpu.models.mapping import build_map_data
    from test_pipeline import TEST_CONFIG

    world = syn.make_world(rng, extent=60.0, n_buildings=25, n_poles=60,
                           points_per_m2=24.0)
    n_frames = 12
    poses = syn.make_trajectory(n_frames)
    seq = syn.make_sequence(seed=3, world=world, poses=poses,
                            scan_points=6000, gps_noise_m=0.3)
    tiles = []
    map_rng = np.random.default_rng(4)
    for i in range(0, n_frames, 2):
        body = syn.render_scan(world, poses[i], map_rng, max_points=6000,
                               noise=0.005)
        tiles.append(body @ poses[i][:3, :3].T + poses[i][:3, 3])
    odom_pos, gps_rows = syn.make_mapping_logs(seq, standstill_frames=6)
    map_data = build_map_data(tiles, odom_pos, gps_rows)

    # start from the hand-tuned TEST_CONFIG's ALGORITHM settings but let
    # autosize pick every capacity/tile from the data
    cfg = autosize.suggest_localization_config(
        seq.scans, map_data.map_points,
        base=dataclasses.replace(
            TEST_CONFIG,
            capacity=autosize.CloudCapacity(),  # throw away the hand caps
        ),
        poses_xyz=poses[:, :3, 3],
    )
    res = Localizer(map_data, cfg).run(
        seq.scans, seq.odom_T_sensor, seq.gps_lat, seq.gps_lon,
        seq.gps_alt, seq.compass_yaw, seq.odom_cov_trace,
        seq.gps_cov_trace, chunk=6,
    )
    err = np.linalg.norm(
        res.map_T_sensor[2:, :3, 3] - seq.true_map_T_sensor[2:, :3, 3],
        axis=1,
    )
    assert err.mean() < 0.3, err


def test_voxel_map_autosize_runs_clean(rng):
    """An autosized device voxel map absorbs the sample with zero
    dropped/oob and matches the host merge (the same completeness
    property as the pipeline configs, for the mapping product)."""
    import jax.numpy as jnp

    from slam_sensor_fusion_tpu.ops.cloud import voxel_downsample_numpy
    from slam_sensor_fusion_tpu.ops.voxel_map import (
        voxel_map_centroids_numpy,
        voxel_map_init,
        voxel_map_insert,
    )

    base = rng.uniform(0.0, 40.0, (600, 3)).astype(np.float32)
    frames = [
        (base[rng.integers(0, 600, 1500)]
         + rng.normal(0, 0.8, (1500, 3))).astype(np.float32)
        for _ in range(6)
    ]
    cfg, origin = autosize.suggest_voxel_map_config(
        frames, voxel_size=0.5, frames_per_insert=2
    )
    assert cfg.unique_capacity >= 4096
    state = voxel_map_init(cfg, jnp.asarray(origin))
    for i in range(0, 6, 2):
        pts = np.concatenate(frames[i:i + 2])
        state = voxel_map_insert(
            state, jnp.asarray(pts), jnp.ones(len(pts), bool), cfg
        )
    assert int(state.n_dropped) == 0 and int(state.n_oob) == 0

    got = voxel_map_centroids_numpy(state)
    want = voxel_downsample_numpy(np.concatenate(frames), 0.5, origin=origin)
    assert len(got) == len(want)
    order = lambda a: np.asarray(a, np.float64)[
        np.lexsort((a[:, 2], a[:, 1], a[:, 0]))
    ]
    np.testing.assert_allclose(order(got), order(want), atol=1e-4)
