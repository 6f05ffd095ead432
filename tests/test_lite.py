import numpy as np
import jax.numpy as jnp

from slam_sensor_fusion_tpu.models import localization_lite as lite
from slam_sensor_fusion_tpu.models.mapping import MapData, gps_to_map_poses
from slam_sensor_fusion_tpu.ops import cloud as cl
from slam_sensor_fusion_tpu.utils import synthetic as syn


def test_crop_box_and_obb(rng):
    pts = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    c = cl.from_numpy(pts, 512)
    boxed = cl.to_numpy(
        cl.crop_box(c, jnp.array([0.0, -2.0, 0.0]), jnp.array([5.0, 2.0, 3.0]))
    )
    ref = pts[
        (pts[:, 0] >= 0) & (pts[:, 0] <= 5)
        & (pts[:, 1] >= -2) & (pts[:, 1] <= 2)
        & (pts[:, 2] >= 0) & (pts[:, 2] <= 3)
    ]
    np.testing.assert_array_equal(boxed, ref)

    # OBB: rotate 90 deg about z -> local x is world y
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    obb = cl.to_numpy(cl.crop_obb(c, jnp.asarray(T), jnp.array([20.0, 2.0, 20.0])))
    ref = pts[(np.abs(pts[:, 1]) <= 10) & (np.abs(pts[:, 0]) <= 1) & (np.abs(pts[:, 2]) <= 10)]
    np.testing.assert_array_equal(obb, ref)


def test_lite_pipeline_tracks(rng):
    """The Python-twin pipeline localizes a short synthetic run."""
    import dataclasses
    n_frames = 15
    world = syn.make_world(rng, extent=60.0, n_buildings=25, n_poles=60,
                           points_per_m2=24.0)
    poses = syn.make_trajectory(n_frames)
    seq = syn.make_sequence(seed=4, world=world, poses=poses,
                            scan_points=6000, gps_noise_m=0.2)
    tiles = []
    mrng = np.random.default_rng(5)
    for i in range(0, n_frames, 2):
        body = syn.render_scan(world, poses[i], mrng, max_points=6000, noise=0.005)
        tiles.append(body @ poses[i][:3, :3].T + poses[i][:3, 3])
    from slam_sensor_fusion_tpu.models.mapping import build_map_data
    odom_pos, gps_rows = syn.make_mapping_logs(seq, standstill_frames=8)
    md = build_map_data(tiles, odom_pos, gps_rows)
    gps_T = gps_to_map_poses(md, seq.gps_lat, seq.gps_lon, seq.compass_yaw)

    cfg = dataclasses.replace(
        lite.LiteConfig(),
        scan_capacity=8192,
        icp=dataclasses.replace(
            lite.LiteConfig().icp, mode="parity", nn_backend="xla"
        ),
    )
    traj = lite.run_lite(md.map_points, seq.scans, seq.odom_T_sensor, gps_T, cfg)
    err = np.linalg.norm(
        traj[1:, :3, 3] - seq.true_map_T_sensor[1:, :3, 3], axis=1
    )
    # the twin has no gating and a narrow forward box: looser tolerance
    assert err.mean() < 0.3, err
    assert err[-1] < 0.4, err


def test_lite_empty_crop_is_full_noop(rng):
    """Empty OBB map crop -> the twin skips the WHOLE frame: neither
    map_T_sensor nor odom_previous_T_sensor updates
    (localization_node.py:226-228)."""
    import dataclasses
    cfg = dataclasses.replace(lite.LiteConfig(), scan_capacity=256)
    # map far away from the coarse pose -> OBB crop is empty
    map_cloud = cl.from_numpy(
        rng.uniform(500.0, 520.0, (200, 3)).astype(np.float32), 256
    )
    scan = rng.uniform(1.0, 10.0, (100, 3)).astype(np.float32)
    buf = np.zeros((256, 3), np.float32)
    buf[:100] = scan
    msk = np.zeros(256, bool)
    msk[:100] = True

    T0 = np.eye(4, dtype=np.float32)
    odom_prev = np.eye(4, dtype=np.float32)
    odom_prev[:3, 3] = [1.0, 2.0, 0.0]
    state = lite.init_state(jnp.asarray(T0), jnp.asarray(odom_prev))

    odom_cur = np.eye(4, dtype=np.float32)
    odom_cur[:3, 3] = [1.5, 2.0, 0.0]
    gps_T = np.eye(4, dtype=np.float32)
    gps_T[:3, 3] = [0.4, 0.1, 0.0]

    new_state, out = lite.lite_step(
        state, jnp.asarray(buf), jnp.asarray(msk),
        jnp.asarray(odom_cur), jnp.asarray(gps_T), map_cloud, cfg,
    )
    assert bool(out.cropped_map_empty)
    np.testing.assert_array_equal(np.asarray(new_state.map_T_sensor), T0)
    # odom_previous must stay at the OLD value (the twin returns before
    # the update at :248-250)
    np.testing.assert_array_equal(
        np.asarray(new_state.odom_T_sensor_previous), odom_prev
    )
    np.testing.assert_array_equal(np.asarray(out.map_T_sensor), T0)

    # a frame with map in range does update both
    near_map = cl.from_numpy(rng.uniform(0.0, 12.0, (200, 3)).astype(np.float32), 256)
    new_state2, out2 = lite.lite_step(
        state, jnp.asarray(buf), jnp.asarray(msk),
        jnp.asarray(odom_cur), jnp.asarray(gps_T), near_map, cfg,
    )
    assert not bool(out2.cropped_map_empty)
    np.testing.assert_array_equal(
        np.asarray(new_state2.odom_T_sensor_previous), odom_cur
    )
