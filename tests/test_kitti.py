"""KITTI odometry loader against a tiny generated fixture.

No dataset ships in this environment, so the fixture writes the standard
layout (sequences/<seq>/velodyne/*.bin float32 xyzr records, calib.txt Tr
line, poses/<seq>.txt 3x4 rows) with known values and checks the loader's
frame conversion (velodyne pose = Tr^-1 @ cam_pose @ Tr).
"""

import os

import numpy as np

from slam_sensor_fusion_tpu.utils import kitti


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _write_fixture(root, n_frames=3, n_pts=50, seed=0):
    rng = np.random.default_rng(seed)
    seq_dir = os.path.join(root, "sequences", "00")
    velo_dir = os.path.join(seq_dir, "velodyne")
    os.makedirs(velo_dir)
    os.makedirs(os.path.join(root, "poses"))

    scans = []
    for k in range(n_frames):
        xyz = rng.uniform(-20, 20, (n_pts, 3)).astype(np.float32)
        refl = rng.uniform(0, 1, (n_pts, 1)).astype(np.float32)
        np.hstack([xyz, refl]).tofile(os.path.join(velo_dir, f"{k:06d}.bin"))
        scans.append(xyz)

    # a non-trivial velodyne->cam0 Tr (rotation + offset)
    Tr = np.eye(4)
    Tr[:3, :3] = _rot_z(0.3) @ np.diag([1.0, -1.0, -1.0]) @ _rot_z(-0.1)
    Tr[:3, 3] = [0.27, -0.05, 0.8]
    # KITTI cam0 wants det(R)=1; the diag flip keeps it a rotation
    assert np.isclose(np.linalg.det(Tr[:3, :3]), 1.0)
    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        f.write("P0: " + " ".join(["1.0"] * 12) + "\n")
        f.write("Tr: " + " ".join(f"{v:.9f}" for v in Tr[:3, :4].ravel()) + "\n")

    velo_poses = np.tile(np.eye(4), (n_frames, 1, 1))
    for k in range(n_frames):
        velo_poses[k, :3, :3] = _rot_z(0.1 * k)
        velo_poses[k, :3, 3] = [1.5 * k, 0.2 * k, 0.01 * k]
    # poses file stores cam0-frame poses: cam = Tr @ velo @ Tr^-1
    cam_poses = np.einsum("ij,tjk,kl->til", Tr, velo_poses, np.linalg.inv(Tr))
    with open(os.path.join(root, "poses", "00.txt"), "w") as f:
        for T in cam_poses:
            f.write(" ".join(f"{v:.9f}" for v in T[:3, :4].ravel()) + "\n")
    return scans, velo_poses, Tr


def test_load_sequence_roundtrip(tmp_path):
    root = str(tmp_path)
    scans, velo_poses, Tr = _write_fixture(root)
    seq = kitti.load_sequence(root, "00")
    assert len(seq.scans) == 3
    for got, want in zip(seq.scans, scans):
        np.testing.assert_allclose(got, want)  # reflectance dropped
    np.testing.assert_allclose(seq.poses, velo_poses, atol=1e-6)


def test_load_sequence_max_frames(tmp_path):
    root = str(tmp_path)
    _write_fixture(root, n_frames=5)
    seq = kitti.load_sequence(root, "00", max_frames=2)
    assert len(seq.scans) == 2
    assert seq.poses.shape == (2, 4, 4)


def test_read_calib_tr_missing_raises(tmp_path):
    p = tmp_path / "calib.txt"
    p.write_text("P0: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    try:
        kitti.read_calib_tr(str(p))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_write_fixture_roundtrips_through_loader(tmp_path):
    """kitti.write_fixture emits the exact layout load_sequence parses."""
    rng = np.random.default_rng(1)
    scans = [rng.uniform(-15, 15, (n, 3)).astype(np.float32)
             for n in (120, 90, 150)]
    poses = np.tile(np.eye(4), (3, 1, 1))
    for k in range(3):
        poses[k, :3, :3] = _rot_z(0.05 * k)
        poses[k, :3, 3] = [0.5 * k, 0.1 * k, 0.0]
    kitti.write_fixture(str(tmp_path), scans, poses)
    seq = kitti.load_sequence(str(tmp_path), "00")
    for got, want in zip(seq.scans, scans):
        np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_allclose(seq.poses, poses, atol=1e-6)


def test_azimuth_taus_recover_sweep_fractions(tmp_path):
    """The geometric per-point time model (tau from azimuth — KITTI ships
    no stamps) must recover the TRUE sweep fractions of a skewed render to
    within the intra-sweep parallax error."""
    from slam_sensor_fusion_tpu.utils import synthetic as syn

    rng = np.random.default_rng(0)
    world = syn.make_world(rng, extent=50.0, n_buildings=12, n_poles=30,
                           points_per_m2=12.0)
    poses = syn.make_trajectory(4, speed_per_frame=0.15)
    pts, true_tau = syn.render_scan_skewed(
        world, poses[2], poses[3], rng, max_points=3000, max_range=25.0,
        tau_mode="azimuth",
    )
    got = kitti.azimuth_taus(pts)
    # exclude the sweep cut (rear seam): measured-frame azimuth can wrap
    # across it, flipping tau 0 <-> 1
    interior = (true_tau > 0.02) & (true_tau < 0.98)
    err = np.abs(got[interior] - true_tau[interior])
    assert np.quantile(err, 0.99) < 0.02, np.quantile(err, 0.99)


def test_suggest_scan_capacity():
    scans = [np.zeros((n, 3), np.float32) for n in (850, 1200, 990)]
    cap = kitti.suggest_scan_capacity(scans)
    assert cap >= 1200 * 1.25 and cap == 1 << int(np.log2(cap))
    assert kitti.suggest_scan_capacity(scans, subsample=2) >= 750
    assert kitti.suggest_scan_capacity([]) == 1024


def test_kitti_fixture_end_to_end_localization(tmp_path):
    """The LOCALIZATION product on KITTI-format data (bench_kitti_loc's
    path at test size): fixture -> real loader -> synthesized sensor
    streams (the odometry benchmark ships no LIO odometry / GPS / compass,
    localization_node.cpp:80-84) -> map built from ground-truth-posed
    scans (the mapping product's artifact) -> full per-scan pipeline,
    with an ATE bound against the loaded ground truth."""
    from slam_sensor_fusion_tpu.models.localization import Localizer
    from slam_sensor_fusion_tpu.models.mapping import build_map_data
    from slam_sensor_fusion_tpu.utils import synthetic as syn
    from slam_sensor_fusion_tpu.utils.config import (
        BruteForceConfig,
        CloudCapacity,
        LocalizationConfig,
    )

    root = str(tmp_path / "kitti")
    n_frames = 20
    kitti.make_synthetic_kitti(
        root, n_frames=n_frames, max_points=6000, extent=60.0, seed=0
    )
    kseq = kitti.load_sequence(root, "00")
    # the reference's localization node consumes the upstream LIO's
    # DESKEWED registered clouds (/cloud_registered_body,
    # localization_node.cpp:80); deskew with the GT twist standing in
    # for the upstream motion estimate (bench_kitti_loc's contract)
    from slam_sensor_fusion_tpu.ops.deskew import (
        deskew_numpy,
        se3_log_numpy,
    )

    scans = [kseq.scans[0]]
    for i in range(1, len(kseq.scans)):
        rel = (
            np.linalg.inv(kseq.poses[i - 1].astype(np.float64))
            @ kseq.poses[i].astype(np.float64)
        )
        scans.append(
            deskew_numpy(
                kseq.scans[i],
                kitti.azimuth_taus(kseq.scans[i]),
                se3_log_numpy(rel),
            )
        )
    seq = syn.make_sequence_from_scans(
        scans, kseq.poses, gps_noise_m=0.3
    )
    tiles = [
        (s @ kseq.poses[i][:3, :3].T + kseq.poses[i][:3, 3]).astype(
            np.float32
        )
        for i, s in enumerate(scans)
        if i % 2 == 0
    ]
    odom_pos, gps_rows = syn.make_mapping_logs(seq, standstill_frames=10)
    map_data = build_map_data(tiles, odom_pos, gps_rows)

    config = LocalizationConfig(
        capacity=CloudCapacity(
            scan=8192, cropped_scan=8192, cropped_map=16384, map=1 << 17,
            bf_source=512, bf_target=4096,
        ),
        brute_force=BruteForceConfig(
            x_step=0.2, y_step=0.2, z_step=0.1, x_range=0.8, y_range=0.8,
            z_range=0.2, yaw_step=np.pi / 18, yaw_range=np.pi / 9,
            mean_error_threshold=0.1,
        ),
        map_subsample_step=1,
        brute_force_map_subsample_step=3,
    )
    loc = Localizer(map_data, config)
    res = loc.run(
        seq.scans, seq.odom_T_sensor, seq.gps_lat, seq.gps_lon,
        seq.gps_alt, seq.compass_yaw, seq.odom_cov_trace,
        seq.gps_cov_trace, chunk=8,
    )
    assert res.valid[5:].all()
    d = res.map_T_sensor[res.valid, :3, 3] \
        - seq.true_map_T_sensor[res.valid, :3, 3]
    ate = float(np.sqrt((d ** 2).sum(axis=1).mean()))
    # deskew-fed scans (the upstream-LIO contract): the intra-sweep
    # skew floor is gone, so the bound tightens vs the r4 test (0.2)
    assert ate < 0.1, ate
    assert (res.n_correspondences[res.valid] > 500).mean() > 0.9


def test_kitti_fixture_end_to_end_lio(tmp_path):
    """The north-star path on KITTI-FORMAT data: generate a KITTI-layout
    dataset, load it through the real loader (bin/calib/poses parsing),
    synthesize per-point times + IMU + GPS like BENCH_MODE=kitti does, and
    drive the full native LIO stack (deskew -> point-to-plane GN -> EKF)
    to an ATE bound against the loaded ground truth."""
    import jax.numpy as jnp

    from slam_sensor_fusion_tpu.models import lio
    from slam_sensor_fusion_tpu.ops.morton import sort_order_numpy
    from slam_sensor_fusion_tpu.ops.point_to_plane import PointToPlaneConfig

    root = str(tmp_path / "kitti")
    n_frames = 12
    kitti.make_synthetic_kitti(
        root, n_frames=n_frames, max_points=3000, extent=60.0,
        points_per_m2=24.0, seed=0,
    )
    seq = kitti.load_sequence(root, "00")
    assert len(seq.scans) == n_frames
    sizes = {len(s) for s in seq.scans}
    assert len(sizes) > 1, "fixture scan sizes should vary like real logs"

    cap = kitti.suggest_scan_capacity(seq.scans)
    config = lio.LIOConfig(
        scan_capacity=cap,
        window=8,
        slot_points=2048,
        refresh_every=4,
        p2p=PointToPlaneConfig(
            nn_backend="xla", num_iterations=4, normal_voxel=1.0
        ),
    )

    # loader contract: Morton pre-sort, synthesized taus ride along
    sp = np.zeros((n_frames, cap, 3), np.float32)
    sm = np.zeros((n_frames, cap), bool)
    tp = np.ones((n_frames, cap), np.float32)
    for i, s in enumerate(seq.scans):
        tau = kitti.azimuth_taus(s)
        order = sort_order_numpy(s, isotropic=True)
        n = len(s)
        sp[i, :n] = s[order]
        sm[i, :n] = True
        tp[i, :n] = tau[order]

    gyro, accel, dts = kitti.synthesize_imu(seq.poses)
    gps = seq.poses[1:, :3, 3] + np.random.default_rng(3).normal(
        0, 0.05, (n_frames - 1, 3)
    ).astype(np.float32)

    state = lio.init_state(
        config, jnp.asarray(sp[0]), jnp.asarray(sm[0]),
        jnp.asarray(seq.poses[0], jnp.float32),
    )
    v0 = (seq.poses[1, :3, 3] - seq.poses[0, :3, 3]) / 0.1
    state = state._replace(
        ekf_state=state.ekf_state._replace(v=jnp.asarray(v0, jnp.float32))
    )
    _, outs = lio.run_lio_blocks(
        state,
        jnp.asarray(sp[1:]), jnp.asarray(sm[1:]),
        jnp.asarray(gyro), jnp.asarray(accel), jnp.asarray(dts),
        jnp.asarray(gps),
        jnp.full(n_frames - 1, 1.0, jnp.float32),
        jnp.ones(n_frames - 1, bool),
        config,
        scan_tau=jnp.asarray(tp[1:]),
    )
    est = np.asarray(outs.world_T_body)
    gt = seq.poses[1:]
    ate = float(np.sqrt(((est[:, :3, 3] - gt[:, :3, 3]) ** 2).sum(-1).mean()))
    assert ate < 0.2, ate
    assert int(np.asarray(outs.n_correspondences)[-1]) > 500
