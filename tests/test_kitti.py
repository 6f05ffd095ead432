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
