"""Online session API (models/session) vs the batch replay drivers.

The claim under test: feeding frames ONE AT A TIME through the callback
contract (`push(frame) -> pose`) reproduces the chunked `lax.scan` replay
(`Localizer.run` / `run_lio_chunk`) — same programs, same trajectory. This
is the real-time form of the reference's 10 Hz node
(localization_node.cpp:263-374); the bench's latency section times it.
"""

import numpy as np
import jax.numpy as jnp

from slam_sensor_fusion_tpu.models import lio
from slam_sensor_fusion_tpu.models.localization import Localizer
from slam_sensor_fusion_tpu.models.session import LIOSession, LocalizerSession
from slam_sensor_fusion_tpu.ops.point_to_plane import PointToPlaneConfig

from test_pipeline import TEST_CONFIG, build_world_and_sequence


def test_localizer_session_matches_batch_replay():
    seq, map_data = build_world_and_sequence(n_frames=24, seed=3)
    # an invalid-GPS frame in the steady state: both forms must skip it
    seq.gps_alt[15] = -2.0

    res = Localizer(map_data, TEST_CONFIG).run(
        seq.scans,
        seq.odom_T_sensor,
        seq.gps_lat,
        seq.gps_lon,
        seq.gps_alt,
        seq.compass_yaw,
        seq.odom_cov_trace,
        seq.gps_cov_trace,
        chunk=7,  # deliberately not a divisor of T: chunking must not matter
    )

    sess = LocalizerSession(map_data, TEST_CONFIG)
    phases = []
    poses = []
    for i in range(len(seq.scans)):
        out = sess.push(
            seq.scans[i],
            seq.odom_T_sensor[i],
            float(seq.gps_lat[i]),
            float(seq.gps_lon[i]),
            float(seq.gps_alt[i]),
            float(seq.compass_yaw[i]),
            float(seq.odom_cov_trace[i]),
            float(seq.gps_cov_trace[i]),
        )
        phases.append(out.phase)
        poses.append(out.map_T_sensor)
    poses = np.stack(poses)

    assert phases[0] == "init"
    assert "tracking" in phases
    assert phases[15] == "skipped"
    # batch replay records the processed-frame trajectory; compare where
    # the batch driver produced a posterior
    valid = res.valid
    assert valid.sum() > 15
    np.testing.assert_allclose(
        poses[valid], res.map_T_sensor[valid], atol=1e-6
    )
    # the skipped frame carries the previous posterior in both forms
    np.testing.assert_allclose(poses[15], poses[14], atol=0)


def test_block_session_matches_batch_replay():
    """BlockLocalizerSession (K-frame dispatch-amortized pushes) must
    reproduce the batch replay driven in K-frame chunks EXACTLY — both
    run the same superblock program from the same state."""
    import dataclasses

    from slam_sensor_fusion_tpu.models.session import BlockLocalizerSession

    seq, map_data = build_world_and_sequence(n_frames=24, seed=3)
    K = 2
    cfg = dataclasses.replace(
        TEST_CONFIG,
        block_kernel=True,
        superblock_parity=True,
        superstep=K,
        icp=dataclasses.replace(TEST_CONFIG.icp, mode="parity"),
    )

    res = Localizer(map_data, cfg).run(
        seq.scans,
        seq.odom_T_sensor,
        seq.gps_lat,
        seq.gps_lon,
        seq.gps_alt,
        seq.compass_yaw,
        seq.odom_cov_trace,
        seq.gps_cov_trace,
        chunk=K,
    )

    sess = BlockLocalizerSession(map_data, cfg, profile=True)
    results = []
    for i in range(len(seq.scans)):
        outs = sess.push(
            seq.scans[i],
            seq.odom_T_sensor[i],
            float(seq.gps_lat[i]),
            float(seq.gps_lon[i]),
            float(seq.gps_alt[i]),
            float(seq.compass_yaw[i]),
            float(seq.odom_cov_trace[i]),
            float(seq.gps_cov_trace[i]),
        )
        results.extend(outs)
    # frames still buffered at the end never flushed — drop their slots
    n_out = len(results)
    assert n_out >= len(seq.scans) - (K - 1)
    assert results[0].phase == "init"
    tracking = [r.phase == "tracking" for r in results]
    assert sum(tracking) > 10
    poses = np.stack([r.map_T_sensor for r in results])
    sel = np.asarray(tracking) & res.valid[:n_out]
    np.testing.assert_allclose(
        poses[sel], res.map_T_sensor[:n_out][sel], atol=1e-6
    )
    # profile hook populated by the block flush path
    assert sess.last_timing is not None
    assert set(sess.last_timing) == {"host_ms", "dispatch_ms", "device_ms"}


def test_lio_session_matches_chunk(rng):
    from test_lio import SMALL_LIO, pad_scan
    from slam_sensor_fusion_tpu.utils import synthetic as syn

    n_frames = 7
    world = syn.make_world(rng, extent=50.0, n_buildings=15, n_poles=40,
                           points_per_m2=24.0)
    poses = syn.make_trajectory(n_frames, speed_per_frame=0.15)
    gyro, accel, dts = syn.make_imu(poses, gyro_noise=0.0, accel_noise=0.0)
    scans = [
        syn.render_scan(world, poses[i], rng, max_points=3000, max_range=25.0)
        for i in range(n_frames)
    ]
    s0, m0 = pad_scan(scans[0], SMALL_LIO.scan_capacity)
    sp = jnp.stack([pad_scan(s, SMALL_LIO.scan_capacity)[0] for s in scans[1:]])
    sm = jnp.stack([pad_scan(s, SMALL_LIO.scan_capacity)[1] for s in scans[1:]])
    gp = jnp.asarray(poses[1:, :3, 3])
    gv = jnp.full(n_frames - 1, 1.0, jnp.float32)
    gok = jnp.ones(n_frames - 1, bool)

    st = lio.init_state(SMALL_LIO, s0, m0, jnp.asarray(poses[0]))
    _, outs = lio.run_lio_chunk(
        st, sp, sm, jnp.asarray(gyro), jnp.asarray(accel), jnp.asarray(dts),
        gp, gv, gok, SMALL_LIO,
    )

    sess = LIOSession(SMALL_LIO, np.asarray(s0), np.asarray(m0), poses[0])
    got = []
    for k in range(n_frames - 1):
        r = sess.push(
            np.asarray(sp[k]), np.asarray(sm[k]), gyro[k], accel[k], dts[k],
            np.asarray(gp[k]), 1.0, True,
        )
        got.append(r.world_T_body)
    np.testing.assert_allclose(
        np.stack(got), np.asarray(outs.world_T_body), atol=1e-5
    )
    assert got[-1].shape == (4, 4)


def test_lio_session_with_deskew(rng):
    """Session accepts per-point sweep fractions (the KITTI/native path)."""
    from test_lio import SMALL_LIO, pad_scan
    from slam_sensor_fusion_tpu.utils import synthetic as syn

    world = syn.make_world(rng, extent=40.0, n_buildings=10, n_poles=30,
                           points_per_m2=24.0)
    poses = syn.make_trajectory(3, speed_per_frame=0.15)
    gyro, accel, dts = syn.make_imu(poses, gyro_noise=0.0, accel_noise=0.0)
    s0 = syn.render_scan(world, poses[0], rng, max_points=2000, max_range=20.0)
    p0, m0 = pad_scan(s0, SMALL_LIO.scan_capacity)
    sess = LIOSession(SMALL_LIO, np.asarray(p0), np.asarray(m0), poses[0])
    pts, tau = syn.render_scan_skewed(
        world, poses[0], poses[1], rng, max_points=2000, max_range=20.0
    )
    p1, m1 = pad_scan(pts, SMALL_LIO.scan_capacity)
    tau_pad = np.ones(SMALL_LIO.scan_capacity, np.float32)
    tau_pad[: len(tau)] = tau
    r = sess.push(
        np.asarray(p1), np.asarray(m1), gyro[0], accel[0], dts[0],
        poses[1, :3, 3], 1.0, True, tau=tau_pad,
    )
    err = np.linalg.norm(r.world_T_body[:3, 3] - poses[1, :3, 3])
    assert err < 0.2, err
