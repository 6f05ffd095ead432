"""Equivalence + behavior tests for the whole-block fused LIO kernel
(ops/lio_superblock_fused.py) through its driver run_lio_superblocks,
in pallas interpret mode on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from slam_sensor_fusion_tpu.models import ekf, lio
from slam_sensor_fusion_tpu.ops.point_to_plane import PointToPlaneConfig
from slam_sensor_fusion_tpu.utils import synthetic as syn


SB_CONFIG = lio.LIOConfig(
    scan_capacity=4096,
    window=8,
    slot_points=2048,
    refresh_every=4,
    p2p=PointToPlaneConfig(
        nn_backend="xla", num_iterations=3, normal_voxel=1.0,
        tile_src=256, tile_tgt=512,
    ),
    superstep_slack=0.08,
    slack_base=0.08,
)


def pad_scan(pts, cap):
    buf = np.zeros((cap, 3), np.float32)
    n = min(len(pts), cap)
    buf[:n] = pts[:n]
    m = np.zeros(cap, bool)
    m[:n] = True
    return jnp.asarray(buf), jnp.asarray(m)


def _make_seq(rng, n_frames, config=SB_CONFIG):
    world = syn.make_world(rng, extent=50.0, n_buildings=15, n_poles=40,
                           points_per_m2=24.0)
    poses = syn.make_trajectory(n_frames, speed_per_frame=0.15)
    gyro, accel, dts = syn.make_imu(poses, gyro_noise=0.0, accel_noise=0.0)
    scans = [
        syn.render_scan(world, poses[i], rng, max_points=3000, max_range=25.0)
        for i in range(n_frames)
    ]
    sp = jnp.stack([pad_scan(s, config.scan_capacity)[0] for s in scans[1:]])
    sm = jnp.stack([pad_scan(s, config.scan_capacity)[1] for s in scans[1:]])
    gp = jnp.asarray(poses[1:, :3, 3])
    gv = jnp.full(n_frames - 1, 1.0, jnp.float32)
    gok = jnp.ones(n_frames - 1, bool)
    s0, m0 = pad_scan(scans[0], config.scan_capacity)
    return poses, (s0, m0), (sp, sm, jnp.asarray(gyro), jnp.asarray(accel),
                             jnp.asarray(dts), gp, gv, gok)


def test_superblock_matches_per_frame_blocks(rng):
    """The whole-block kernel (interpret) must track run_lio_blocks (XLA
    backend) to within the registration noise floor: same anchor refresh
    cadence, same GN semantics (the kernel's fresh-correspondence loop
    vs point_to_plane_align), same EKF updates modulo the kernel's
    small-angle/Taylor series."""
    n_frames = 9  # 8 steps = 2 full blocks of 4
    poses, (s0, m0), seq = _make_seq(rng, n_frames)
    st = lio.init_state(SB_CONFIG, s0, m0, jnp.asarray(poses[0]))
    v0 = (poses[1, :3, 3] - poses[0, :3, 3]) / 0.1
    st = st._replace(
        ekf_state=st.ekf_state._replace(v=jnp.asarray(v0, jnp.float32))
    )

    st_ref, out_ref = lio.run_lio_blocks(st, *seq, SB_CONFIG)
    st_sb, out_sb = lio.run_lio_superblocks(
        st, *seq, SB_CONFIG, interpret=True
    )

    d = np.linalg.norm(
        np.asarray(out_sb.world_T_body[:, :3, 3])
        - np.asarray(out_ref.world_T_body[:, :3, 3]),
        axis=1,
    )
    assert d.max() < 0.05, d
    # final EKF state agrees too (covariance within series tolerances)
    np.testing.assert_allclose(
        np.asarray(st_sb.ekf_state.p), np.asarray(st_ref.ekf_state.p),
        atol=0.05,
    )
    dP = np.abs(
        np.asarray(st_sb.ekf_state.P) - np.asarray(st_ref.ekf_state.P)
    )
    assert dP.max() < 5e-2, dP.max()
    # observability outputs exist and are healthy
    assert not np.asarray(out_sb.pair_overflow).any()
    assert not np.asarray(out_sb.slack_violation).any()
    assert np.asarray(out_sb.n_correspondences).min() > 500


def test_superblock_tail_padding(rng):
    """T not a multiple of refresh_every: the driver pads with no-op
    frames; outputs cover exactly T frames and track the unpadded math."""
    n_frames = 7  # 6 steps = 1 block of 4 + tail of 2
    poses, (s0, m0), seq = _make_seq(rng, n_frames)
    st = lio.init_state(SB_CONFIG, s0, m0, jnp.asarray(poses[0]))
    st_sb, out_sb = lio.run_lio_superblocks(
        st, *seq, SB_CONFIG, interpret=True
    )
    assert out_sb.world_T_body.shape[0] == n_frames - 1
    gt = np.linalg.norm(
        np.asarray(out_sb.world_T_body[:, :3, 3]) - poses[1:, :3, 3], axis=1
    )
    assert gt.max() < 0.3, gt
    # slot advanced only by the valid frames
    assert int(st_sb.slot) == n_frames


def test_superblock_deskew_recovers_skewed_scans(rng):
    """Scans rendered with intra-sweep motion degrade the trajectory;
    passing per-point sweep fractions (scan_tau) recovers it — the
    measured-loop deskew wiring (BASELINE config 5)."""
    n_frames = 9
    world = syn.make_world(rng, extent=50.0, n_buildings=15, n_poles=40,
                           points_per_m2=24.0)
    # fast yaw + translation so skew actually matters
    poses = syn.make_trajectory(n_frames, speed_per_frame=0.5, radius=12.0)
    gyro, accel, dts = syn.make_imu(poses, gyro_noise=0.0, accel_noise=0.0)
    cap = SB_CONFIG.scan_capacity

    scans, taus = [], []
    for i in range(n_frames):
        prev = poses[max(i - 1, 0)]
        pts, tau = syn.render_scan_skewed(
            world, prev, poses[i], rng, max_points=3000, max_range=25.0
        )
        scans.append(pts)
        taus.append(tau)

    sp = jnp.stack([pad_scan(s, cap)[0] for s in scans[1:]])
    sm = jnp.stack([pad_scan(s, cap)[1] for s in scans[1:]])
    tau_pad = np.ones((n_frames - 1, cap), np.float32)
    for i, t in enumerate(taus[1:]):
        tau_pad[i, : min(len(t), cap)] = t[:cap]
    tau = jnp.asarray(tau_pad)
    gp = jnp.asarray(poses[1:, :3, 3])
    gv = jnp.full(n_frames - 1, 1.0, jnp.float32)
    gok = jnp.ones(n_frames - 1, bool)
    seq = (sp, sm, jnp.asarray(gyro), jnp.asarray(accel), jnp.asarray(dts),
           gp, gv, gok)

    s0, m0 = pad_scan(scans[0], cap)
    st = lio.init_state(SB_CONFIG, s0, m0, jnp.asarray(poses[0]))
    v0 = (poses[1, :3, 3] - poses[0, :3, 3]) / 0.1
    st = st._replace(
        ekf_state=st.ekf_state._replace(v=jnp.asarray(v0, jnp.float32))
    )

    _, out_raw = lio.run_lio_superblocks(st, *seq, SB_CONFIG, interpret=True)
    _, out_fix = lio.run_lio_superblocks(
        st, *seq, SB_CONFIG, scan_tau=tau, interpret=True
    )
    err_raw = np.linalg.norm(
        np.asarray(out_raw.world_T_body[:, :3, 3]) - poses[1:, :3, 3], axis=1
    )
    err_fix = np.linalg.norm(
        np.asarray(out_fix.world_T_body[:, :3, 3]) - poses[1:, :3, 3], axis=1
    )
    # deskew must materially improve the skewed-scan trajectory
    assert err_fix.mean() < 0.6 * err_raw.mean(), (err_raw, err_fix)
    assert err_fix.mean() < 0.15, err_fix


def test_superblock_gn_covariance_corridor(rng):
    """icp_cov_mode="gn": in a corridor (two walls normal to y), the
    along-corridor x translation is unobservable by registration — the
    GN-derived measurement covariance must inflate along x so the EKF
    position variance grows along x while y stays bounded."""
    n_frames = 9
    # corridor world: two parallel walls + ground
    n = 18000
    x = rng.uniform(-30, 30, n)
    z = rng.uniform(-1.8, 4.0, n)
    y = np.where(rng.uniform(size=n) < 0.5, -4.0, 4.0)
    walls = np.stack([x, y, z], axis=1)
    ground = np.stack(
        [rng.uniform(-30, 30, 6000), rng.uniform(-4, 4, 6000),
         np.full(6000, -1.8)], axis=1,
    )
    world = np.concatenate([walls, ground]).astype(np.float32)

    poses = np.zeros((n_frames, 4, 4), np.float32)
    for i in range(n_frames):
        poses[i] = np.eye(4)
        poses[i][0, 3] = 0.15 * i  # straight down the corridor
    gyro, accel, dts = syn.make_imu(poses, gyro_noise=0.0, accel_noise=0.0)
    cap = SB_CONFIG.scan_capacity
    # low sensor noise + large normal cells: the walls' cell normals stay
    # clean (+-y), so the GN system is genuinely rank-deficient along x
    # instead of weakly (and spuriously) constrained by noise-tilted
    # normals
    scans = [
        syn.render_scan(world, poses[i], rng, max_points=3000,
                        max_range=25.0, noise=0.002)
        for i in range(n_frames)
    ]
    sp = jnp.stack([pad_scan(s, cap)[0] for s in scans[1:]])
    sm = jnp.stack([pad_scan(s, cap)[1] for s in scans[1:]])
    gp = jnp.asarray(poses[1:, :3, 3])
    gv = jnp.full(n_frames - 1, 1.0, jnp.float32)
    gok = jnp.zeros(n_frames - 1, bool)  # NO GPS: registration-only
    seq = (sp, sm, jnp.asarray(gyro), jnp.asarray(accel), jnp.asarray(dts),
           gp, gv, gok)

    cfg = SB_CONFIG._replace(
        icp_cov_mode="gn",
        gn_cov_scale=1.0,
        # planarity-gated cell normals: wall-ground crease cells would
        # otherwise contribute arbitrary (x-tilted) normals that fake
        # along-corridor information
        normal_voxel=2.0,
        normal_est="cells",
        normal_planarity=0.2,
        # isolate the GN term: no anchor-covariance flooring, tiny floors
        gn_anchor_cov=False,
        gn_pos_std_floor=0.005,
        # the initial pose is ground truth; a tight prior makes the
        # axes differentiate fast
        ekf=ekf.EKFConfig(init_pos_std=0.05, init_vel_std=0.1),
    )
    s0, m0 = pad_scan(scans[0], cap)
    st = lio.init_state(cfg, s0, m0, jnp.asarray(poses[0]))
    v0 = (poses[1, :3, 3] - poses[0, :3, 3]) / 0.1
    st = st._replace(
        ekf_state=st.ekf_state._replace(v=jnp.asarray(v0, jnp.float32))
    )
    st_f, out = lio.run_lio_superblocks(st, *seq, cfg, interpret=True)
    # the MEASUREMENT covariance fed to the EKF must inflate along the
    # unobservable x axis relative to the wall-constrained y axis
    std = np.asarray(out.icp_std_xyz)  # (T, 3)
    ratio = (std[:, 0] ** 2) / np.maximum(std[:, 1] ** 2, 1e-12)
    assert np.median(ratio) > 4.0, (np.median(ratio), std)
    # and the EKF position variance follows: x stays well above y
    P = np.asarray(st_f.ekf_state.P)
    assert P[0, 0] > 2.0 * P[1, 1], (P[0, 0], P[1, 1])


def test_superblock_subsampled_registration(rng):
    """reg_subsample + anchor_subsample + sub-box gating: registration on
    every 2nd point of Morton-pre-sorted scans against half-density
    anchor pages must still track ground truth, with COMPLETE pair lists
    (zero overflow at the production max_visits) — the capacity story the
    TPU bench asserts (bench.py BENCH_MODE=lio)."""
    from slam_sensor_fusion_tpu.ops.morton import sort_order_numpy

    n_frames = 9
    config = SB_CONFIG._replace(
        reg_subsample=2,
        anchor_subsample=2,
        p2p=SB_CONFIG.p2p._replace(tile_src=128, max_visits=64),
    )
    world = syn.make_world(rng, extent=50.0, n_buildings=15, n_poles=40,
                           points_per_m2=24.0)
    poses = syn.make_trajectory(n_frames, speed_per_frame=0.15)
    gyro, accel, dts = syn.make_imu(poses, gyro_noise=0.0, accel_noise=0.0)
    scans = []
    for i in range(n_frames):
        s = syn.render_scan(world, poses[i], rng, max_points=3000,
                            max_range=25.0)
        scans.append(s[sort_order_numpy(s, isotropic=True)])
    cap = config.scan_capacity
    sp = jnp.stack([pad_scan(s, cap)[0] for s in scans[1:]])
    sm = jnp.stack([pad_scan(s, cap)[1] for s in scans[1:]])
    gp = jnp.asarray(poses[1:, :3, 3])
    gv = jnp.full(n_frames - 1, 1.0, jnp.float32)
    gok = jnp.ones(n_frames - 1, bool)
    seq = (sp, sm, jnp.asarray(gyro), jnp.asarray(accel), jnp.asarray(dts),
           gp, gv, gok)
    s0, m0 = pad_scan(scans[0], cap)
    st = lio.init_state(config, s0, m0, jnp.asarray(poses[0]))
    v0 = (poses[1, :3, 3] - poses[0, :3, 3]) / 0.1
    st = st._replace(
        ekf_state=st.ekf_state._replace(v=jnp.asarray(v0, jnp.float32))
    )
    st_f, out = lio.run_lio_superblocks(st, *seq, config, interpret=True)
    gt = np.linalg.norm(
        np.asarray(out.world_T_body[:, :3, 3]) - poses[1:, :3, 3], axis=1
    )
    assert gt.max() < 0.3, gt
    assert not np.asarray(out.pair_overflow).any()
    assert not np.asarray(out.slack_violation).any()
    # registration really ran on the subsampled pages
    assert np.asarray(out.n_correspondences).max() <= cap // 2


def test_ekf_update_pose_cov_matches_diag(rng):
    """update_pose_cov with a diagonal Rm equals update_pose."""
    e0 = ekf.init_state(ekf.EKFConfig(), p0=jnp.asarray(rng.normal(0, 1, 3)))
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = rng.normal(0, 0.5, 3)
    a = ekf.update_pose(e0, jnp.asarray(T), 0.1, 0.02)
    Rm = jnp.diag(
        jnp.concatenate([jnp.full(3, 0.1**2), jnp.full(3, 0.02**2)])
    ).astype(jnp.float32)
    b = ekf.update_pose_cov(e0, jnp.asarray(T), Rm)
    np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.P), np.asarray(b.P), atol=1e-6)
