"""Offline visualization exports — the rviz-config equivalent (SURVEY C15).

No ROS/rviz on TPU hosts; instead the engine exports standard artifacts
for any viewer:

* `write_ply` — map clouds / scans as ASCII PLY (MeshLab, CloudCompare);
* `write_trajectory_ply` — a pose track as colored points;
* `plot_topdown` — a self-contained SVG of the top-down trajectory vs
  ground truth over the map footprint (no plotting dependency).
"""

from __future__ import annotations

import numpy as np


def write_ply(path: str, points: np.ndarray, color=(180, 180, 180)) -> None:
    points = np.asarray(points, np.float32).reshape(-1, 3)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(points)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        r, g, b = color
        for p in points:
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {r} {g} {b}\n")


def write_trajectory_ply(path: str, poses: np.ndarray, color=(255, 40, 40)) -> None:
    """Poses (T, 4, 4) -> their translations as a colored PLY track."""
    write_ply(path, np.asarray(poses)[:, :3, 3], color)


def _polyline(xy: np.ndarray, sx, sy, style: str) -> str:
    pts = " ".join(f"{sx(x):.1f},{sy(y):.1f}" for x, y in xy)
    return f'<polyline fill="none" {style} points="{pts}"/>'


def plot_topdown(
    path: str,
    est_poses: np.ndarray,
    gt_poses: np.ndarray | None = None,
    map_points: np.ndarray | None = None,
    size: int = 900,
) -> None:
    """Write a standalone SVG: map footprint (gray), ground truth (black),
    estimate (red). Dependency-free."""
    est = np.asarray(est_poses)[:, :3, 3]
    all_xy = [est[:, :2]]
    if gt_poses is not None:
        all_xy.append(np.asarray(gt_poses)[:, :3, 3][:, :2])
    if map_points is not None:
        mp = np.asarray(map_points)
        if len(mp) > 20000:
            mp = mp[:: len(mp) // 20000 + 1]
        all_xy.append(mp[:, :2])
    xy = np.concatenate(all_xy)
    lo = xy.min(axis=0) - 2
    hi = xy.max(axis=0) + 2
    span = float(max(hi[0] - lo[0], hi[1] - lo[1], 1e-6))
    margin = 20

    def sx(x):
        return margin + (x - lo[0]) / span * (size - 2 * margin)

    def sy(y):
        return size - margin - (y - lo[1]) / span * (size - 2 * margin)

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" height="{size}" '
        f'viewBox="0 0 {size} {size}"><rect width="100%" height="100%" fill="white"/>'
    ]
    if map_points is not None:
        for x, y in mp[:, :2]:
            parts.append(
                f'<circle cx="{sx(x):.1f}" cy="{sy(y):.1f}" r="0.7" fill="#cccccc"/>'
            )
    if gt_poses is not None:
        parts.append(
            _polyline(
                np.asarray(gt_poses)[:, :3, 3][:, :2], sx, sy,
                'stroke="#222222" stroke-width="1.5"',
            )
        )
    parts.append(
        _polyline(est[:, :2], sx, sy, 'stroke="#d62728" stroke-width="1.5"')
    )
    parts.append("</svg>")
    with open(path, "w") as f:
        f.write("".join(parts))
