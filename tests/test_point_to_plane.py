import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyR

from slam_sensor_fusion_tpu.ops.point_to_plane import (
    PointToPlaneConfig,
    estimate_normals,
    point_to_plane_align,
)
from test_icp import make_scene, padded


def test_estimate_normals_on_planes(rng):
    # axis-aligned planes -> normals must align with plane axes
    n = 2000
    wall = np.stack(
        [np.full(n, 2.0), rng.uniform(0, 10, n), rng.uniform(0, 3, n)], axis=1
    ).astype(np.float32)
    floor = np.stack(
        [rng.uniform(0, 10, n), rng.uniform(0, 10, n), np.zeros(n)], axis=1
    ).astype(np.float32)
    pts, mask = padded(np.concatenate([wall, floor]), 4096)
    normals, valid = estimate_normals(pts, mask, voxel=1.0)
    normals = np.asarray(normals)
    valid = np.asarray(valid)
    assert valid[: 2 * n].mean() > 0.8
    # wall normals ~ +-x, floor normals ~ +-z; test interior points only
    # (cells at the wall/floor intersection legitimately tilt)
    wall_interior = valid[:n] & (wall[:, 2] > 1.2)
    floor_interior = valid[n : 2 * n] & (np.abs(floor[:, 0] - 2.0) > 1.2)
    nx = np.abs(normals[:n, 0])
    nz = np.abs(normals[n : 2 * n, 2])
    assert nx[wall_interior].mean() > 0.99
    assert nz[floor_interior].mean() > 0.99


def test_point_to_plane_converges(rng):
    tgt = make_scene(rng, n=900)
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, :3] = ScipyR.from_rotvec([0.0, 0.0, 0.04]).as_matrix()
    T_true[:3, 3] = [0.3, -0.2, 0.1]
    src = (tgt - T_true[:3, 3]) @ T_true[:3, :3]
    s, sm = padded(src, 1024)
    t, tm = padded(tgt, 1024)
    normals, nvalid = estimate_normals(t, tm, voxel=1.5)
    cfg = PointToPlaneConfig(nn_backend="xla")
    res = point_to_plane_align(s, sm, t, tm, normals, nvalid, jnp.eye(4), cfg)
    T = np.asarray(res.transformation)
    np.testing.assert_allclose(T, T_true, atol=2e-2)
    assert float(res.rmse) < 0.03
    assert int(res.n_correspondences) > 500


def test_point_to_plane_beats_point_to_point_iterations(rng):
    """On planar scenes with sliding offsets, p2plane converges in far
    fewer iterations than point-to-point (the reason native mode uses it)."""
    tgt = make_scene(rng, n=900)
    offset = np.array([0.25, 0.25, 0.05], np.float32)
    src = tgt - offset
    s, sm = padded(src, 1024)
    t, tm = padded(tgt, 1024)
    normals, nvalid = estimate_normals(t, tm, voxel=1.5)
    cfg = PointToPlaneConfig(nn_backend="xla", num_iterations=4)
    res = point_to_plane_align(s, sm, t, tm, normals, nvalid, jnp.eye(4), cfg)
    err = np.linalg.norm(np.asarray(res.transformation)[:3, 3] - offset)
    assert err < 0.05, err


def test_point_to_plane_pallas_interpret_matches_xla(rng):
    tgt = make_scene(rng, n=700)
    src = (tgt - np.array([0.2, 0.1, 0.0], np.float32))[::2]
    s, sm = padded(src, 512)
    t, tm = padded(tgt, 1024)
    normals, nvalid = estimate_normals(t, tm, voxel=1.5)
    r_xla = point_to_plane_align(
        s, sm, t, tm, normals, nvalid, jnp.eye(4), PointToPlaneConfig(nn_backend="xla")
    )
    r_pal = point_to_plane_align(
        s, sm, t, tm, normals, nvalid, jnp.eye(4),
        PointToPlaneConfig(nn_backend="pallas", pallas_interpret=True,
                           tile_src=128, tile_tgt=256),
    )
    np.testing.assert_allclose(
        np.asarray(r_pal.transformation), np.asarray(r_xla.transformation), atol=1e-4
    )


def test_estimate_normals_tiled_on_planes(rng):
    """Morton-chunk PCA normals match the voxel estimator's quality on
    planar scenes (the LIO anchor's fast path)."""
    from slam_sensor_fusion_tpu.ops.morton import sort_points_numpy
    from slam_sensor_fusion_tpu.ops.point_to_plane import estimate_normals_tiled

    n = 2000
    wall = np.stack(
        [np.full(n, 2.0), rng.uniform(0, 10, n), rng.uniform(0, 3, n)], axis=1
    ).astype(np.float32)
    floor = np.stack(
        [rng.uniform(0, 10, n), rng.uniform(0, 10, n), np.zeros(n)], axis=1
    ).astype(np.float32)
    pts = sort_points_numpy(np.concatenate([wall, floor]))
    p, mask = padded(pts, 4096)
    normals, valid = estimate_normals_tiled(jnp.asarray(p), jnp.asarray(mask), 32)
    normals = np.asarray(normals)
    valid = np.asarray(valid)
    assert valid[: 2 * n].mean() > 0.9
    # interior points of either plane must get the plane's axis normal;
    # chunks straddling the wall/floor crease legitimately tilt
    is_wall = np.abs(p[: 2 * n, 0] - 2.0) < 1e-6
    interior_w = valid[: 2 * n] & is_wall & (p[: 2 * n, 2] > 1.2)
    interior_f = valid[: 2 * n] & ~is_wall & (np.abs(p[: 2 * n, 0] - 2.0) > 1.2)
    nx = np.abs(normals[: 2 * n, 0])
    nz = np.abs(normals[: 2 * n, 2])
    assert nx[interior_w].mean() > 0.95, nx[interior_w].mean()
    assert nz[interior_f].mean() > 0.95, nz[interior_f].mean()


def test_estimate_normals_cells_on_planes(rng):
    """Truncated-Morton cell PCA (scatter/eigh-free) matches the voxel
    estimator's quality on planar scenes."""
    from slam_sensor_fusion_tpu.ops.morton import sort_points_numpy
    from slam_sensor_fusion_tpu.ops.point_to_plane import estimate_normals_cells

    n = 2000
    wall = np.stack(
        [np.full(n, 2.0), rng.uniform(0, 10, n), rng.uniform(0, 3, n)], axis=1
    ).astype(np.float32)
    floor = np.stack(
        [rng.uniform(0, 10, n), rng.uniform(0, 10, n), np.zeros(n)], axis=1
    ).astype(np.float32)
    pts = sort_points_numpy(np.concatenate([wall, floor]))
    p, mask = padded(pts, 4096)
    normals, valid = estimate_normals_cells(jnp.asarray(p), jnp.asarray(mask), 1.0)
    normals = np.asarray(normals)
    valid = np.asarray(valid)
    assert valid[: 2 * n].mean() > 0.9
    is_wall = np.abs(p[: 2 * n, 0] - 2.0) < 1e-6
    iw = valid[: 2 * n] & is_wall & (p[: 2 * n, 2] > 1.2)
    ifl = valid[: 2 * n] & ~is_wall & (np.abs(p[: 2 * n, 0] - 2.0) > 1.2)
    assert np.abs(normals[: 2 * n, 0])[iw].mean() > 0.99
    assert np.abs(normals[: 2 * n, 2])[ifl].mean() > 0.99


def test_lio_cells_normals_trajectory(rng):
    """LIO with scatter-free cell normals tracks the voxel-normal
    trajectory (the bench's fast refresh path)."""
    from slam_sensor_fusion_tpu.models import lio as lio_mod
    from test_lio import SMALL_LIO, _make_lio_seq

    n_frames = 9
    poses, (s0, m0), seq = _make_lio_seq(rng, n_frames)
    cfg_t = SMALL_LIO._replace(normal_est="cells", normal_voxel=1.0)
    st_v = lio_mod.init_state(SMALL_LIO, s0, m0, jnp.asarray(poses[0]))
    st_t = lio_mod.init_state(cfg_t, s0, m0, jnp.asarray(poses[0]))
    _, out_v = lio_mod.run_lio_blocks(st_v, *seq, SMALL_LIO)
    _, out_t = lio_mod.run_lio_blocks(st_t, *seq, cfg_t)
    gt = poses[1:, :3, 3]
    err_v = np.linalg.norm(np.asarray(out_v.world_T_body[:, :3, 3]) - gt, axis=1)
    err_t = np.linalg.norm(np.asarray(out_t.world_T_body[:, :3, 3]) - gt, axis=1)
    # the cheap estimator must not blow up the trajectory
    assert err_t.max() < max(2.0 * err_v.max(), 0.15), (err_t.max(), err_v.max())
