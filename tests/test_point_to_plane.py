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
