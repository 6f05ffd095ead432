"""Trajectory-level parity: the fixed-shape device pipeline vs a float64
dynamic-shape oracle of the C++ node's exact math.

The oracles implement the reference ALGORITHMS independently (kd-tree NN,
sequential brute force, mutable filter — tests/oracles.py); the full-node
test reuses the engine's own deterministic data STAGING (crop, subsample,
capacity sampling) so both sides see identical point subsets and the
comparison isolates the math."""

import numpy as np
import jax.numpy as jnp

from slam_sensor_fusion_tpu.models.localization import (
    Localizer, build_frame_batch, init_state, run_chunk,
)
from oracles import PipelineOracle, brute_force_oracle, icp_oracle
from test_pipeline import TEST_CONFIG, build_world_and_sequence


def test_pipeline_matches_oracle_trajectory():
    """Steady state only (localization_node.cpp:263-374), 14 frames."""
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


# ---------------------------------------------------------------------------
# Full-node parity: startup gating + coarse ladder + invalid frames
# (localization_node.cpp:181-374 end to end)
# ---------------------------------------------------------------------------


def _stage_coarse_clouds(map_cloud, scan_pts, scan_msk, pose, cfg):
    """The engine's own deterministic staging for one coarse attempt
    (models/localization.py coarse_attempt + _preprocess): radius-cropped
    scan, Morton-sorted cropped map, and the brute-force subsample pair.
    Shared staging isolates the ALGORITHM parity in the oracle compare."""
    from slam_sensor_fusion_tpu.ops import cloud as cl
    from slam_sensor_fusion_tpu.ops import morton

    scan = cl.Cloud(jnp.asarray(scan_pts), jnp.asarray(scan_msk))
    cropped_scan = cl.crop_radius(
        scan, jnp.zeros(3, jnp.float32), cfg.cloud_crop_radius
    )
    mask = cl.crop_radius(
        map_cloud, jnp.asarray(pose[:3, 3], jnp.float32), cfg.cloud_crop_radius
    )
    packed = cl.compact(mask, cfg.capacity.cropped_map)
    # mirrors the engine's recrop exactly: with a presorted map the
    # order-preserving compact already yields Morton order
    sorted_map = (
        packed if cfg.presorted_map else morton.sort_by_morton(packed)
    )

    bf_map = cl.sample_to_capacity(
        cl.remove_floor(
            cl.uniform_subsample(
                cl.compact_by_distance(
                    sorted_map, jnp.asarray(pose[:3, 3], jnp.float32)
                ),
                cfg.brute_force_map_subsample_step,
            )
        ),
        cfg.capacity.bf_target,
    )
    bf_scan = cl.sample_to_capacity(
        cl.remove_floor(cropped_scan), cfg.capacity.bf_source
    )
    return (
        cl.to_numpy(cropped_scan).astype(np.float64),
        cl.to_numpy(sorted_map).astype(np.float64),
        cl.to_numpy(bf_scan).astype(np.float64),
        cl.to_numpy(bf_map).astype(np.float64),
    )


def _oracle_full_run(loc, cfg, scans, odom_T, gps_T, valid, odom_tr, gps_tr):
    """Float64 oracle of the WHOLE node: first-GPS init, per-frame coarse
    ladder (brute force -> rescue ICP, localization_node.cpp:200-261),
    fine pipeline, invalid-GPS skips (:269-276)."""
    from slam_sensor_fusion_tpu.models.localization import build_frame_batch

    T = len(scans)
    out = np.tile(np.eye(4), (T, 1, 1))
    first = int(np.argmax(valid))
    out[: first + 1] = gps_T[first]
    map_pts = loc.map_data.map_points[:: cfg.map_subsample_step]
    orc = PipelineOracle(
        map_pts, gps_T[first], odom_T[first],
        crop_radius=cfg.cloud_crop_radius, ref_dist=cfg.ref_frame_distance,
        subsample=cfg.scan_subsample_step,
    )

    ricp = cfg.rescue_icp
    guess = np.asarray(gps_T[first], np.float64)
    coarse_done = False
    i = first + 1
    while i < T and not coarse_done:
        if not valid[i]:
            out[i] = np.eye(4)  # engine leaves the init row untouched
            i += 1
            continue
        fb = build_frame_batch(
            cfg, [scans[i]], odom_T[i : i + 1], gps_T[i : i + 1],
            np.ones(1), np.ones(1), np.ones(1, bool),
        )
        cropped_scan, sorted_map, bf_scan, bf_map = _stage_coarse_clouds(
            loc.map_cloud, fb.scan_points[0], fb.scan_mask[0],
            orc.map_T_sensor, cfg,
        )
        if len(orc.cropped_map) == 0:  # _preprocess recrop on first attempt
            orc.cropped_map = sorted_map
            orc.map_T_ref = orc.map_T_sensor.copy()
        ok, bf_T, _score = brute_force_oracle(bf_scan, bf_map, guess, cfg.brute_force)
        pose = bf_T
        if not ok:
            res = icp_oracle(
                bf_scan, bf_map, bf_T,
                max_corr_d2=ricp.max_correspondence_dist_sq,
                num_iterations=ricp.num_iterations,
                acceptable_mean_error=ricp.acceptable_mean_error,
                transformation_epsilon=ricp.transformation_epsilon,
            )
            ok = res["converged"]
            pose = res["T"] if ok else bf_T
        if ok:
            coarse_done = True
            orc.map_T_sensor = pose
            # fine alignment in the same frame (:311-341); drive the
            # oracle's fine math manually on the already-staged crop
            prev_T_cur = np.linalg.inv(orc.odom_prev) @ np.asarray(odom_T[i], np.float64)
            odom_pred = orc.map_T_sensor @ prev_T_cur
            total = odom_tr[i] + gps_tr[i]
            og, gg = gps_tr[i] / total, odom_tr[i] / total
            prior = og * odom_pred + gg * np.asarray(gps_T[i], np.float64)
            orc.filter.add(prior)
            prior = orc.filter.apply(orc.map_T_sensor, prior)
            d = np.linalg.norm(cropped_scan, axis=1)
            res = icp_oracle(cropped_scan[d <= cfg.cloud_crop_radius],
                             orc.cropped_map, prior)
            orc.map_T_sensor = res["T"]
            orc.odom_prev = np.asarray(odom_T[i], np.float64)
            out[i] = orc.map_T_sensor
        else:
            guess = bf_T
            out[i] = orc.map_T_sensor
        i += 1

    while i < T:
        if valid[i]:
            Ti, _ = orc.step(scans[i], odom_T[i], gps_T[i], odom_tr[i], gps_tr[i])
            out[i] = Ti
        else:
            out[i] = orc.map_T_sensor  # step() reports the held pose
        i += 1
    return out, first


def test_full_node_matches_oracle_with_coarse_and_invalid_frames():
    """Device Localizer.run vs the float64 full-node oracle over 40 frames
    including the startup coarse ladder and mid-run invalid-GPS frames."""
    n = 40
    seq, map_data = build_world_and_sequence(n_frames=n, seed=3)
    seq.gps_alt[20:23] = -5.0  # mid-run skips
    # NB: natural covariance traces (odometry-dominant, the reference's
    # operating envelope). Forcing gains toward GPS (0.5/0.5 with 0.3 m
    # GPS noise) puts the REFERENCE ALGORITHM itself in a marginally
    # stable regime where f32-vs-f64 rounding flips which local basin a
    # frame lands in and trajectories cannot be compared; the lockstep
    # test below covers per-frame math under identical states instead.
    loc = Localizer(map_data, TEST_CONFIG)
    gps_T = loc.gps_poses(seq.gps_lat, seq.gps_lon, seq.compass_yaw)
    res = loc.run(
        seq.scans, seq.odom_T_sensor, seq.gps_lat, seq.gps_lon, seq.gps_alt,
        seq.compass_yaw, seq.odom_cov_trace, seq.gps_cov_trace, chunk=16,
    )
    valid = np.asarray(seq.gps_alt) >= 0
    orc_T, first = _oracle_full_run(
        loc, TEST_CONFIG, seq.scans, seq.odom_T_sensor, gps_T, valid,
        seq.odom_cov_trace, seq.gps_cov_trace,
    )
    assert first == 0
    cmp = res.valid.copy()
    d = np.linalg.norm(
        res.map_T_sensor[cmp, :3, 3] - orc_T[cmp, :3, 3], axis=1
    )
    assert d.max() < 0.05, d
    rd = np.linalg.norm(
        res.map_T_sensor[cmp, :3, :3] - orc_T[cmp, :3, :3], axis=(1, 2)
    )
    assert rd.max() < 0.05, rd
    # held poses across the invalid gap agree too
    np.testing.assert_allclose(
        res.map_T_sensor[20:23],
        np.tile(res.map_T_sensor[19], (3, 1, 1)),
        atol=1e-6,
    )


def test_lockstep_single_step_parity():
    """Strongest per-frame statement: for each frame, run the device
    `step()` from a PipelineState RECONSTRUCTED from the float64 oracle's
    state (pose, odom ref, crop, filter queue), and compare one-step
    outputs. No chaotic accumulation — every frame's decision chain
    (blend, gate, re-crop, lazy ICP) must match on identical inputs."""
    from slam_sensor_fusion_tpu.models.localization import step
    from slam_sensor_fusion_tpu.ops import cloud as cl
    from slam_sensor_fusion_tpu.ops import stochastic_filter as sf
    from slam_sensor_fusion_tpu.ops.icp_fused import build_cached_target
    from slam_sensor_fusion_tpu.ops.morton import sort_points_numpy

    n = 12
    cfg = TEST_CONFIG
    seq, map_data = build_world_and_sequence(n_frames=n, seed=7)
    loc = Localizer(map_data, cfg)
    gps_T = loc.gps_poses(seq.gps_lat, seq.gps_lon, seq.compass_yaw)
    map_pts = map_data.map_points[:: cfg.map_subsample_step]
    orc = PipelineOracle(map_pts, gps_T[0], seq.odom_T_sensor[0])

    CAP = cfg.capacity.cropped_map
    state0 = init_state(
        cfg, loc.map_cloud.capacity,
        jnp.asarray(gps_T[0]), jnp.asarray(seq.odom_T_sensor[0], jnp.float32),
    )
    Q = cfg.filter.queue_size
    for k in range(1, n):
        pose_in = orc.map_T_sensor.copy()
        prev_in = orc.odom_prev.copy()
        ref_in = orc.map_T_ref.copy()
        crop_in = orc.cropped_map.copy()
        fq = list(orc.filter.queue)
        fprev = orc.filter.prev.copy()

        T_orc, r = orc.step(
            seq.scans[k], seq.odom_T_sensor[k], gps_T[k],
            seq.odom_cov_trace[k], seq.gps_cov_trace[k],
        )

        crop_np = (
            sort_points_numpy(crop_in.astype(np.float32))
            if len(crop_in) else np.zeros((0, 3), np.float32)
        )
        cm = cl.from_numpy(crop_np, CAP)
        cache = build_cached_target(
            cm.points, cm.mask, jnp.asarray(pose_in[:3, 3], jnp.float32),
            cfg.icp.tile_tgt,
        )
        trans = jnp.tile(jnp.eye(4, dtype=jnp.float32), (Q, 1, 1))
        for i, t in enumerate(fq):
            trans = trans.at[i].set(jnp.asarray(t, jnp.float32))
        fstate = sf.FilterState(
            transitions=trans, count=jnp.int32(len(fq)),
            previous_pose=jnp.asarray(fprev, jnp.float32),
        )
        dstate = state0._replace(
            map_T_sensor=jnp.asarray(pose_in, jnp.float32),
            odom_T_sensor_previous=jnp.asarray(prev_in, jnp.float32),
            map_T_ref=jnp.asarray(ref_in, jnp.float32),
            cropped_map=cm, cached_target=cache, filter_state=fstate,
        )
        fb = build_frame_batch(
            cfg, [seq.scans[k]], seq.odom_T_sensor[k:k + 1], gps_T[k:k + 1],
            seq.odom_cov_trace[k:k + 1], seq.gps_cov_trace[k:k + 1],
            np.ones(1, bool),
        )
        _, out = step(
            dstate, fb.scan_points[0], fb.scan_mask[0], fb.odom_T_sensor[0],
            fb.map_T_sensor_gps[0], fb.odom_cov_trace[0], fb.gps_cov_trace[0],
            fb.valid[0], loc.map_cloud, cfg,
        )
        d = float(np.linalg.norm(
            np.asarray(out.map_T_sensor)[:3, 3] - T_orc[:3, 3]
        ))
        assert d < 0.03, (k, d)
        assert bool(out.icp_converged) == r["converged"], k
