"""KITTI odometry dataset loading (for benchmark parity runs).

The north-star metric is defined on KITTI seq 00 (BASELINE.md). This
environment ships no dataset, so benches default to synthetic worlds —
but the loader is here so the same pipeline runs on real data unchanged:

    seq = load_sequence("/data/kitti/odometry", "00", max_frames=500)
    # seq.scans are velodyne points (x, y, z), seq.poses ground truth

Velodyne `.bin` files are float32 records (x, y, z, reflectance); poses
come from `poses/<seq>.txt` (3x4 row-major, cam0 frame) and are moved to
the velodyne frame via `calib.txt`'s Tr.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


def read_velodyne_bin(path: str) -> np.ndarray:
    """(n, 3) xyz from a KITTI velodyne .bin (reflectance dropped)."""
    raw = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    return np.ascontiguousarray(raw[:, :3])


def read_poses(path: str) -> np.ndarray:
    """(T, 4, 4) homogeneous poses from a KITTI poses txt (3x4 rows)."""
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    T = np.tile(np.eye(4), (rows.shape[0], 1, 1))
    T[:, :3, :4] = rows
    return T


def read_calib_tr(path: str) -> np.ndarray:
    """The velodyne->cam0 transform Tr from calib.txt (4x4)."""
    with open(path) as f:
        for line in f:
            if line.startswith("Tr"):
                vals = np.fromstring(line.split(":", 1)[1], sep=" ")
                T = np.eye(4)
                T[:3, :4] = vals.reshape(3, 4)
                return T
    raise ValueError(f"no Tr line in {path}")


@dataclasses.dataclass
class KittiSequence:
    scans: list[np.ndarray]  # velodyne-frame xyz per frame
    poses: np.ndarray  # (T, 4, 4) ground truth, velodyne frame


def load_sequence(
    root: str, sequence: str = "00", max_frames: int | None = None
) -> KittiSequence:
    """Load scans + ground-truth poses for one odometry sequence.

    Expects the standard layout: `<root>/sequences/<seq>/velodyne/*.bin`,
    `<root>/sequences/<seq>/calib.txt`, `<root>/poses/<seq>.txt`.
    """
    seq_dir = os.path.join(root, "sequences", sequence)
    velo_dir = os.path.join(seq_dir, "velodyne")
    files = sorted(f for f in os.listdir(velo_dir) if f.endswith(".bin"))
    if max_frames is not None:
        files = files[:max_frames]
    scans = [read_velodyne_bin(os.path.join(velo_dir, f)) for f in files]

    cam_poses = read_poses(os.path.join(root, "poses", f"{sequence}.txt"))
    Tr = read_calib_tr(os.path.join(seq_dir, "calib.txt"))
    # velodyne-frame pose: Tr^-1 @ cam_pose @ Tr
    Tr_inv = np.linalg.inv(Tr)
    poses = np.einsum("ij,tjk,kl->til", Tr_inv, cam_poses[: len(scans)], Tr)
    return KittiSequence(scans=scans, poses=poses)
