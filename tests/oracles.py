"""NumPy oracles implementing the reference pipeline's exact semantics.

These are independent, dynamically-shaped reimplementations of the
algorithms in /root/reference (ICP per icp_point_to_point.cpp, the
stochastic filter per stochastic_filter.cpp, brute force per
brute_force_alignment.cpp), used to validate that the fixed-shape masked
TPU kernels reproduce the same math. They intentionally mirror the
reference's quirks: squared-distance thresholds, lazy re-association,
compaction to matched rows, duplicated zeros in the brute-force grid, and
the filter's composition-order inconsistency.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def nn_oracle(src: np.ndarray, tgt: np.ndarray, tree: cKDTree | None = None):
    """Exact NN: squared distances + indices (what PCL nearestKSearch(1)
    returns). Backed by a kd-tree — still exact, just not O(S*T); pass a
    prebuilt ``tree`` over ``tgt`` to amortize across calls."""
    if tree is None:
        tree = cKDTree(tgt)
    d, idx = tree.query(src, k=1)
    return d * d, idx


def transform(T: np.ndarray, pts: np.ndarray) -> np.ndarray:
    return pts @ T[:3, :3].T + T[:3, 3]


def kabsch_oracle(src: np.ndarray, tgt: np.ndarray) -> np.ndarray:
    """Reference Kabsch step (icp_point_to_point.cpp:112-159)."""
    c_s = src.mean(0)
    c_t = tgt.mean(0)
    H = (src - c_s).T @ (tgt - c_t)
    U, _, Vt = np.linalg.svd(H)
    V = Vt.T
    R = V @ U.T
    if np.linalg.det(R) < 0:
        V[:, 2] *= -1
        R = V @ U.T
    T = np.eye(4, dtype=np.float64)
    T[:3, :3] = R
    T[:3, 3] = c_t - R @ c_s
    return T


def icp_oracle(
    source: np.ndarray,
    target: np.ndarray,
    T0: np.ndarray,
    max_corr_d2: float = 0.5,
    num_iterations: int = 10,
    acceptable_mean_error: float = 0.05,
    transformation_epsilon: float = 1e-5,
):
    """Faithful dynamic-shape port of ICPPointToPoint::calculateAlignment."""
    tree = cKDTree(target)
    pts = transform(T0, source)
    d2, idx = nn_oracle(pts, target, tree)
    keep = d2 < max_corr_d2
    pts = pts[keep]
    corr = target[idx[keep]]
    if pts.shape[0] < 10:
        return dict(T=T0.copy(), error=1e6, iterations=0, converged=False)

    T = T0.copy()
    last_error = np.finfo(np.float32).max
    iters = 0
    error = last_error
    errors = []  # per-iteration printStepDebug trace
    for _ in range(num_iterations):
        error = float(np.linalg.norm(pts - corr, axis=1).mean())
        errors.append(error)
        if error < acceptable_mean_error:
            last_error = error
            break
        if abs(last_error - error) < transformation_epsilon:
            d2, idx = nn_oracle(pts, target, tree)
            keep = d2 < max_corr_d2
            pts = pts[keep]
            corr = target[idx[keep]]
        T_step = kabsch_oracle(pts, corr)
        T = T_step @ T
        pts = transform(T_step, pts)
        last_error = error
        iters += 1
    return dict(
        T=T,
        error=last_error,
        iterations=iters,
        converged=last_error < acceptable_mean_error,
        errors=errors,
    )


class StochasticFilterOracle:
    """Mutable port of StochasticFilter (stochastic_filter.cpp)."""

    def __init__(self, queue_size=4, threshold=3.0, dmin=0.05, dmax=0.20):
        self.queue_size = queue_size
        self.threshold = threshold
        self.dmin = dmin
        self.dmax = dmax
        self.queue: list[np.ndarray] = []
        self.prev = np.eye(4)
        w = np.exp(np.arange(queue_size) - queue_size)
        self.w = w / w.sum()

    def add(self, pose):
        if len(self.queue) >= self.queue_size:
            self.queue.pop(0)
        self.queue.append(np.linalg.inv(self.prev) @ pose)
        self.prev = pose.copy()

    def z_score(self, prev_pose, cur_pose):
        if len(self.queue) < self.queue_size:
            return 0.0
        preds = np.stack([prev_pose @ t for t in self.queue])
        xyz = preds[:, :3, 3]
        mean = (self.w[:, None] * xyz).sum(0)
        mad = (self.w[:, None] * np.abs(xyz - mean)).sum(0)
        mad = np.clip(mad, self.dmin, self.dmax / 3.0)
        return float(np.max(np.abs(cur_pose[:3, 3] - mean) / mad))

    def apply(self, prev_pose, cur_pose):
        z = self.z_score(prev_pose, cur_pose)
        if z > self.threshold:
            return sum(
                w * (t @ prev_pose) for w, t in zip(self.w, self.queue)
            )
        return cur_pose


def outward_sequence_oracle(rng, step):
    vals = []
    i = 0
    while i < rng / (2.0 * step) + 1.0:
        vals.append(-i * step)
        vals.append(i * step)
        i += 1
    return vals


def brute_force_oracle(source, target, guess, cfg):
    """Sequential port of BruteForceAlignment::alignClouds."""

    def rot_z(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    xs = outward_sequence_oracle(cfg.x_range, cfg.x_step)
    ys = outward_sequence_oracle(cfg.y_range, cfg.y_step)
    zs = outward_sequence_oracle(cfg.z_range, cfg.z_step)
    yaws = outward_sequence_oracle(cfg.yaw_range, cfg.yaw_step)
    best_T = np.eye(4)
    best_score = np.inf
    tree = cKDTree(target)
    for x in xs:
        for y in ys:
            for z in zs:
                for yaw in yaws:
                    T = np.eye(4)
                    T[:3, :3] = rot_z(yaw)
                    T[:3, 3] = [x, y, z]
                    T = guess @ T
                    pts = transform(T, source)
                    d2, _ = nn_oracle(pts, target, tree)
                    score = d2.mean()
                    if score < best_score:
                        best_score = score
                        best_T = T
                    if score < cfg.mean_error_threshold:
                        return True, T, score
    return False, best_T, best_score


class PipelineOracle:
    """Full per-scan pipeline oracle — the C++ node's steady-state math
    (localization_node.cpp:263-374) in float64 numpy, dynamic shapes."""

    def __init__(self, map_points, first_gps_T, first_odom_T,
                 crop_radius=10.0, ref_dist=3.0, subsample=2):
        self.map_points = np.asarray(map_points, np.float64)
        self.crop_radius = crop_radius
        self.ref_dist = ref_dist
        self.subsample = subsample
        self.map_T_sensor = np.asarray(first_gps_T, np.float64)
        self.odom_prev = np.asarray(first_odom_T, np.float64)
        self.map_T_ref = self.map_T_sensor.copy()
        self.cropped_map = np.zeros((0, 3))
        self.filter = StochasticFilterOracle()

    def step(self, scan, odom_T, gps_T, odom_tr, gps_tr):
        scan = np.asarray(scan, np.float64)[:: self.subsample]
        d = np.linalg.norm(scan, axis=1)
        cropped_scan = scan[d <= self.crop_radius]

        rel = np.linalg.inv(self.map_T_sensor) @ self.map_T_ref
        if np.linalg.norm(rel[:3, 3]) > self.ref_dist or len(self.cropped_map) == 0:
            dm = np.linalg.norm(self.map_points - self.map_T_sensor[:3, 3], axis=1)
            self.cropped_map = self.map_points[dm <= self.crop_radius]
            self.map_T_ref = self.map_T_sensor.copy()

        prev_T_cur = np.linalg.inv(self.odom_prev) @ odom_T
        odom_pred = self.map_T_sensor @ prev_T_cur
        total = odom_tr + gps_tr
        odom_gain, gps_gain = gps_tr / total, odom_tr / total
        prior = odom_gain * odom_pred + gps_gain * np.asarray(gps_T, np.float64)

        self.filter.add(prior)
        prior = self.filter.apply(self.map_T_sensor, prior)

        res = icp_oracle(cropped_scan, self.cropped_map, prior)
        self.map_T_sensor = res["T"]
        self.odom_prev = np.asarray(odom_T, np.float64)
        return self.map_T_sensor.copy(), res
