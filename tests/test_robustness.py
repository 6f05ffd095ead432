"""Field-failure scenarios (VERDICT r3 weak #6): GPS outage, dropped
scans, leaving the mapped region.

The reference's behavior under these is ad-hoc gating (SURVEY §5): skip
invalid GPS frames and carry the prior (localization_node.cpp:269-276),
abort ICP below 10 correspondences and return the prior
(icp_point_to_point.cpp:196-200). The TPU build must degrade the same
way — bounded error, zero NaN/overflow, clean recovery — under the same
scenarios, plus the native-mode EKF coasting an outage on IMU +
registration and re-accepting fixes through the chi^2 gate.
"""

import numpy as np
import jax.numpy as jnp

from slam_sensor_fusion_tpu.models import lio
from slam_sensor_fusion_tpu.models.localization import Localizer
from slam_sensor_fusion_tpu.models.mapping import build_map_data
from slam_sensor_fusion_tpu.utils import synthetic as syn

from test_pipeline import TEST_CONFIG
from test_lio import SMALL_LIO, pad_scan


def test_lio_gps_outage_coasts_and_reaccepts(rng):
    """A 50-frame GPS outage mid-run (VERDICT r3 #7's scenario size): the
    EKF coasts on IMU + scan-to-ring registration (bounded drift), and
    fixes are re-accepted cleanly when they return — no jump, no gate
    lockout."""
    n_frames = 80
    world = syn.make_world(rng, extent=60.0, n_buildings=20, n_poles=50,
                           points_per_m2=24.0)
    poses = syn.make_trajectory(n_frames, speed_per_frame=0.15)
    gyro, accel, dts = syn.make_imu(poses, gyro_noise=0.0005,
                                    accel_noise=0.005)
    scans = [
        syn.render_scan(world, poses[i], rng, max_points=3000, max_range=25.0)
        for i in range(n_frames)
    ]
    sp = jnp.stack([pad_scan(s, SMALL_LIO.scan_capacity)[0] for s in scans[1:]])
    sm = jnp.stack([pad_scan(s, SMALL_LIO.scan_capacity)[1] for s in scans[1:]])
    gp = jnp.asarray(
        poses[1:, :3, 3]
        + rng.normal(0, 0.1, (n_frames - 1, 3)).astype(np.float32)
    )
    gv = jnp.full(n_frames - 1, 1.0, jnp.float32)
    gok = np.ones(n_frames - 1, bool)
    gok[15:65] = False  # the outage

    s0, m0 = pad_scan(scans[0], SMALL_LIO.scan_capacity)
    state = lio.init_state(SMALL_LIO, s0, m0, jnp.asarray(poses[0]))
    v0 = (poses[1, :3, 3] - poses[0, :3, 3]) / 0.1
    state = state._replace(
        ekf_state=state.ekf_state._replace(v=jnp.asarray(v0, jnp.float32))
    )
    _, outs = lio.run_lio_chunk(
        state, sp, sm, jnp.asarray(gyro), jnp.asarray(accel),
        jnp.asarray(dts), gp, gv, jnp.asarray(gok), SMALL_LIO,
    )
    est = np.asarray(outs.world_T_body)
    assert np.isfinite(est).all()
    err = np.linalg.norm(est[:, :3, 3] - poses[1:, :3, 3], axis=1)
    acc = np.asarray(outs.gps_accepted)
    assert not acc[15:65].any(), "no fix may be consumed during the outage"
    # coasting drift stays bounded (registration against the ring holds it)
    assert err[15:65].max() < 0.5, err[15:65]
    # fixes re-accepted after the outage, and the trajectory recovers
    assert acc[67:].mean() > 0.7, acc[67:]
    assert err[-5:].mean() < 0.25, err[-5:]


def test_localization_dropped_scan_frame():
    """An empty scan mid-run (sensor dropout): ICP aborts below 10
    correspondences and RETURNS THE PRIOR (icp_point_to_point.cpp:196-200)
    — the trajectory carries through the gap and recovers."""
    from test_pipeline import build_world_and_sequence

    seq, map_data = build_world_and_sequence(n_frames=20, seed=3)
    k = 11
    seq.scans[k] = np.zeros((0, 3), np.float32)

    res = Localizer(map_data, TEST_CONFIG).run(
        seq.scans, seq.odom_T_sensor, seq.gps_lat, seq.gps_lon,
        seq.gps_alt, seq.compass_yaw, seq.odom_cov_trace,
        seq.gps_cov_trace, chunk=8,
    )
    assert np.isfinite(res.map_T_sensor).all()
    assert int(res.n_correspondences[k]) < 10
    assert not res.icp_converged[k]
    err = np.linalg.norm(
        res.map_T_sensor[:, :3, 3] - seq.true_map_T_sensor[:, :3, 3], axis=1
    )
    # the dropped frame holds the (odom+GPS blended, gated) prior
    assert err[k] < 1.0, err[k]
    # and the next frames re-converge to the map
    assert res.icp_converged[k + 2 :].any()
    assert err[-3:].mean() < 0.2, err[-3:]


def test_localization_leaves_mapped_region():
    """The trajectory drives off the mapped area: correspondences starve,
    the pipeline degrades to the prior chain — bounded error, zero NaN,
    zero overflow — instead of diverging or crashing."""
    rng = np.random.default_rng(3)
    n_frames = 26
    world = syn.make_world(rng, extent=60.0, n_buildings=25, n_poles=60,
                           points_per_m2=24.0)
    poses = syn.make_trajectory(n_frames)
    seq = syn.make_sequence(seed=3, world=world, poses=poses,
                            scan_points=6000, gps_noise_m=0.3)
    # map only the FIRST HALF of the survey: the second half is off-map
    tiles = []
    map_rng = np.random.default_rng(4)
    for i in range(0, n_frames // 2, 2):
        body = syn.render_scan(world, poses[i], map_rng, max_points=6000,
                               noise=0.005)
        tiles.append(body @ poses[i][:3, :3].T + poses[i][:3, 3])
    odom_pos, gps_rows = syn.make_mapping_logs(seq, standstill_frames=10)
    map_data = build_map_data(tiles, odom_pos, gps_rows)

    res = Localizer(map_data, TEST_CONFIG).run(
        seq.scans, seq.odom_T_sensor, seq.gps_lat, seq.gps_lon,
        seq.gps_alt, seq.compass_yaw, seq.odom_cov_trace,
        seq.gps_cov_trace, chunk=8,
    )
    assert np.isfinite(res.map_T_sensor).all()
    err = np.linalg.norm(
        res.map_T_sensor[:, :3, 3] - seq.true_map_T_sensor[:, :3, 3], axis=1
    )
    on_map = slice(2, n_frames // 2 - 2)
    assert err[on_map].mean() < 0.3, err[on_map]
    # off-map: held by the odometry/GPS prior chain — bounded, not tracked
    assert err.max() < 2.0, err
