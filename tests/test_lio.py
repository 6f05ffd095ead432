import numpy as np
import jax
import jax.numpy as jnp

from slam_sensor_fusion_tpu.models import ekf, lio
from slam_sensor_fusion_tpu.ops.deskew import deskew, se3_log
from slam_sensor_fusion_tpu.ops import geometry
from slam_sensor_fusion_tpu.ops.point_to_plane import PointToPlaneConfig
from slam_sensor_fusion_tpu.utils import synthetic as syn


SMALL_LIO = lio.LIOConfig(
    scan_capacity=4096,
    window=8,
    slot_points=2048,
    refresh_every=4,
    p2p=PointToPlaneConfig(nn_backend="xla", num_iterations=4, normal_voxel=1.0),
)


def pad_scan(pts, cap):
    buf = np.zeros((cap, 3), np.float32)
    n = min(len(pts), cap)
    buf[:n] = pts[:n]
    m = np.zeros(cap, bool)
    m[:n] = True
    return jnp.asarray(buf), jnp.asarray(m)


def test_se3_log_exp_roundtrip(rng):
    xi = rng.normal(0, 0.3, 6).astype(np.float32)
    T = geometry.se3_exp(jnp.asarray(xi))
    xi_back = np.asarray(se3_log(T))
    np.testing.assert_allclose(xi_back, xi, atol=1e-5)


def test_deskew_recovers_static_points(rng):
    # points measured from a moving platform, then deskewed, must match
    # the true end-of-sweep geometry
    world_pts = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    xi = np.array([0.2, -0.1, 0.0, 0.0, 0.0, 0.05], np.float32)  # frame twist
    tau = rng.uniform(0, 1, 500).astype(np.float32)
    T_end = geometry.se3_exp(jnp.asarray(xi))
    # pose at fraction tau: T(tau) = exp((tau-1) xi) T_end  (ends at T_end)
    T_tau = geometry.se3_exp(jnp.asarray((tau[:, None] - 1.0) * xi)) @ T_end
    # body-frame measurement at time tau: p_body = T(tau)^-1 world
    R = np.asarray(T_tau[:, :3, :3])
    t = np.asarray(T_tau[:, :3, 3])
    body = np.einsum("nji,nj->ni", R, world_pts - t)
    fixed = deskew(jnp.asarray(body), jnp.asarray(tau), jnp.asarray(xi))
    # after deskewing, all points are in the END frame:
    expect = np.einsum("ji,nj->ni", np.asarray(T_end)[:3, :3],
                       world_pts - np.asarray(T_end)[:3, 3])
    np.testing.assert_allclose(np.asarray(fixed), expect, atol=1e-4)


def test_deskew_matches_per_point_exp(rng):
    """The fixed-axis Rodrigues deskew == the naive per-point matrix
    formulation exp((tau-1) xi) p (the (N, 4, 4) path it replaced for
    TPU speed — tiny-batched 3x3 matmuls tile terribly on the MXU)."""
    pts = rng.uniform(-10, 10, (777, 3)).astype(np.float32)
    tau = rng.uniform(0, 1, 777).astype(np.float32)
    # include tau ~ 1 (angle ~ 0: series branch) and a big twist
    tau[:10] = 1.0
    xi = np.array([0.3, -0.2, 0.05, 0.04, -0.02, 0.3], np.float32)
    T = geometry.se3_exp(jnp.asarray((tau[:, None] - 1.0) * xi))
    expect = np.einsum(
        "nij,nj->ni", np.asarray(T[:, :3, :3]), pts
    ) + np.asarray(T[:, :3, 3])
    got = np.asarray(deskew(jnp.asarray(pts), jnp.asarray(tau), jnp.asarray(xi)))
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_deskew_numpy_twins_match_device(rng):
    """Host-side se3_log_numpy/deskew_numpy == the jitted device forms
    (the bench stages deskewed scans on the host for the localization
    product's upstream-LIO input contract)."""
    from slam_sensor_fusion_tpu.ops.deskew import deskew_numpy, se3_log_numpy

    xi = np.array([0.3, -0.2, 0.05, 0.04, -0.02, 0.3], np.float32)
    T = np.asarray(geometry.se3_exp(jnp.asarray(xi)))
    np.testing.assert_allclose(se3_log_numpy(T), xi, atol=1e-5)
    # tiny-rotation branch
    xi_small = np.array([0.1, 0.05, -0.02, 1e-6, -2e-6, 1e-6], np.float32)
    T_small = np.asarray(geometry.se3_exp(jnp.asarray(xi_small)))
    np.testing.assert_allclose(se3_log_numpy(T_small), xi_small, atol=3e-6)

    pts = rng.uniform(-10, 10, (777, 3)).astype(np.float32)
    tau = rng.uniform(0, 1, 777).astype(np.float32)
    tau[:10] = 1.0
    want = np.asarray(deskew(jnp.asarray(pts), jnp.asarray(tau), jnp.asarray(xi)))
    got = deskew_numpy(pts, tau, xi)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lio_tracks_trajectory(rng):
    n_frames = 12
    world = syn.make_world(rng, extent=60.0, n_buildings=20, n_poles=50,
                           points_per_m2=24.0)
    poses = syn.make_trajectory(n_frames, speed_per_frame=0.15)
    gyro, accel, dts = syn.make_imu(poses, gyro_noise=0.0005, accel_noise=0.005)

    scans = [
        syn.render_scan(world, poses[i], rng, max_points=4000, max_range=25.0)
        for i in range(n_frames)
    ]
    s0, m0 = pad_scan(scans[0], SMALL_LIO.scan_capacity)
    state = lio.init_state(SMALL_LIO, s0, m0, jnp.asarray(poses[0]))
    # give the EKF the true initial velocity so the first prior is sane
    v0 = (poses[1, :3, 3] - poses[0, :3, 3]) / 0.1
    state = state._replace(
        ekf_state=state.ekf_state._replace(v=jnp.asarray(v0, jnp.float32))
    )

    errs = []
    for k in range(1, n_frames):
        sp, sm = pad_scan(scans[k], SMALL_LIO.scan_capacity)
        state, out = lio.lio_step(
            state,
            sp,
            sm,
            jnp.asarray(gyro[k - 1]),
            jnp.asarray(accel[k - 1]),
            jnp.asarray(dts[k - 1]),
            jnp.asarray(poses[k, :3, 3]),  # GPS at truth with 1 m^2 var
            jnp.float32(1.0),
            jnp.bool_(True),
            SMALL_LIO,
        )
        errs.append(
            np.linalg.norm(np.asarray(out.world_T_body)[:3, 3] - poses[k, :3, 3])
        )
    errs = np.asarray(errs)
    assert errs[-1] < 0.2, errs
    assert errs.mean() < 0.15, errs
    assert int(out.n_correspondences) > 1000


def test_lio_chunk_matches_stepwise(rng):
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
    st_a = lio.init_state(SMALL_LIO, s0, m0, jnp.asarray(poses[0]))
    st_b = st_a

    sp = jnp.stack([pad_scan(s, SMALL_LIO.scan_capacity)[0] for s in scans[1:]])
    sm = jnp.stack([pad_scan(s, SMALL_LIO.scan_capacity)[1] for s in scans[1:]])
    gp = jnp.asarray(poses[1:, :3, 3])
    gv = jnp.full(n_frames - 1, 1.0, jnp.float32)
    gok = jnp.ones(n_frames - 1, bool)

    st_a, outs = lio.run_lio_chunk(
        st_a, sp, sm, jnp.asarray(gyro), jnp.asarray(accel), jnp.asarray(dts),
        gp, gv, gok, SMALL_LIO,
    )
    for k in range(n_frames - 1):
        st_b, ob = lio.lio_step(
            st_b, sp[k], sm[k], jnp.asarray(gyro[k]), jnp.asarray(accel[k]),
            jnp.asarray(dts[k]), gp[k], gv[k], gok[k], SMALL_LIO,
        )
    np.testing.assert_allclose(
        np.asarray(outs.world_T_body[-1]), np.asarray(ob.world_T_body), atol=1e-5
    )
    jax.block_until_ready(st_a)


def _make_lio_seq(rng, n_frames):
    world = syn.make_world(rng, extent=50.0, n_buildings=15, n_poles=40,
                           points_per_m2=24.0)
    poses = syn.make_trajectory(n_frames, speed_per_frame=0.15)
    gyro, accel, dts = syn.make_imu(poses, gyro_noise=0.0, accel_noise=0.0)
    scans = [
        syn.render_scan(world, poses[i], rng, max_points=3000, max_range=25.0)
        for i in range(n_frames)
    ]
    sp = jnp.stack([pad_scan(s, SMALL_LIO.scan_capacity)[0] for s in scans[1:]])
    sm = jnp.stack([pad_scan(s, SMALL_LIO.scan_capacity)[1] for s in scans[1:]])
    gp = jnp.asarray(poses[1:, :3, 3])
    gv = jnp.full(n_frames - 1, 1.0, jnp.float32)
    gok = jnp.ones(n_frames - 1, bool)
    s0, m0 = pad_scan(scans[0], SMALL_LIO.scan_capacity)
    return poses, (s0, m0), (sp, sm, jnp.asarray(gyro), jnp.asarray(accel),
                             jnp.asarray(dts), gp, gv, gok)


def test_lio_blocks_close_to_chunk(rng):
    """run_lio_blocks (block-hoisted refresh, incl. a partial tail block)
    must track run_lio_chunk to within the registration noise floor —
    the refresh sees the ring one frame earlier, nothing else differs."""
    n_frames = 11  # 10 steps = 2 full blocks of 4 + tail of 2
    poses, (s0, m0), seq = _make_lio_seq(rng, n_frames)
    st = lio.init_state(SMALL_LIO, s0, m0, jnp.asarray(poses[0]))
    st_c, out_c = lio.run_lio_chunk(st, *seq, SMALL_LIO)
    st_b, out_b = lio.run_lio_blocks(st, *seq, SMALL_LIO)
    assert out_b.world_T_body.shape == out_c.world_T_body.shape
    d = np.linalg.norm(
        np.asarray(out_b.world_T_body[:, :3, 3])
        - np.asarray(out_c.world_T_body[:, :3, 3]),
        axis=1,
    )
    assert d.max() < 0.05, d


def test_lio_fused_backend_matches_xla(rng):
    """The whole-GN fused kernel (interpret mode) as the LIO registration
    backend must track the XLA backend's trajectory."""
    import dataclasses as _dc

    n_frames = 9
    poses, (s0, m0), seq = _make_lio_seq(rng, n_frames)
    cfg_fused = SMALL_LIO._replace(
        p2p=SMALL_LIO.p2p._replace(
            nn_backend="fused", pallas_interpret=True, tile_src=256,
            tile_tgt=512,
        )
    )
    st_x = lio.init_state(SMALL_LIO, s0, m0, jnp.asarray(poses[0]))
    st_f = lio.init_state(cfg_fused, s0, m0, jnp.asarray(poses[0]))
    _, out_x = lio.run_lio_blocks(st_x, *seq, SMALL_LIO)
    _, out_f = lio.run_lio_blocks(st_f, *seq, cfg_fused)
    d = np.linalg.norm(
        np.asarray(out_f.world_T_body[:, :3, 3])
        - np.asarray(out_x.world_T_body[:, :3, 3]),
        axis=1,
    )
    assert d.max() < 0.05, d
    gt = np.linalg.norm(
        np.asarray(out_f.world_T_body[:, :3, 3]) - poses[1:, :3, 3], axis=1
    )
    assert gt.max() < 0.3, gt
