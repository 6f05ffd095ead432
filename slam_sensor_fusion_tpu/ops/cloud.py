"""Fixed-capacity masked point clouds and preprocessing primitives.

The reference manipulates dynamically sized PCL clouds
(point_cloud_processing.hpp:31-92). On TPU every shape must be static, so
a cloud is a `(capacity, 3)` float32 array plus a `(capacity,)` bool
validity mask. Host loaders produce *packed* clouds (valid points first);
device ops are mask-tolerant so downstream kernels never need compaction
except where the reference's index-based subsampling follows a crop (the
coarse-alignment path), for which `compact` is provided.

Reference ports:
* uniform_subsample   <- applyUniformSubsample (point_cloud_processing.hpp:55-74)
* crop_radius         <- cropPointCloudThroughRadius (:31-53) — the kd-tree
                         radiusSearch becomes a masked distance test (exact,
                         no tree needed)
* remove_floor        <- removeFloor (:76-92) (keeps z > 0)
* voxel_downsample    <- pcl::VoxelGrid centroid mode
                         (global_map_frames_manager.cpp:143-146)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class Cloud(NamedTuple):
    """A fixed-capacity masked point cloud (pytree)."""

    points: Array  # (N, 3) float32; invalid rows hold arbitrary data
    mask: Array  # (N,) bool

    @property
    def capacity(self) -> int:
        return self.points.shape[-2]

    def count(self) -> Array:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)


def from_numpy(points: np.ndarray, capacity: int) -> Cloud:
    """Pack a host (n, 3) array into a padded Cloud of given capacity."""
    points = np.asarray(points, dtype=np.float32).reshape(-1, 3)
    n = min(points.shape[0], capacity)
    buf = np.zeros((capacity, 3), dtype=np.float32)
    buf[:n] = points[:n]
    mask = np.zeros((capacity,), dtype=bool)
    mask[:n] = True
    return Cloud(jnp.asarray(buf), jnp.asarray(mask))


def to_numpy(cloud: Cloud) -> np.ndarray:
    """Extract the valid points of a cloud to a host (n, 3) array."""
    pts = np.asarray(cloud.points)
    msk = np.asarray(cloud.mask)
    return pts[msk]


def uniform_subsample(cloud: Cloud, step: int) -> Cloud:
    """Keep every ``step``-th point by index.

    Matches applyUniformSubsample semantics on packed clouds (the reference
    always calls it on compacted clouds); on sparse masks it subsamples by
    buffer index, which is only used where the reference order allows it.
    The reference's early-out for tiny clouds (size < step) is replicated.
    """
    if step <= 1:
        return cloud
    n = cloud.capacity
    idx = jnp.arange(n)
    keep = (idx % step == 0) & cloud.mask
    # reference keeps the cloud untouched if it has fewer points than step
    tiny = cloud.count() < step
    mask = jnp.where(tiny, cloud.mask, keep)
    return Cloud(cloud.points, mask)


def crop_radius(cloud: Cloud, center: Array, radius: float) -> Cloud:
    """Keep points within ``radius`` of ``center`` (masked, exact).

    Replaces cropPointCloudThroughRadius's kd-tree radiusSearch
    (point_cloud_processing.hpp:31-53) with a direct masked distance test —
    O(N) on the VPU, no tree build.
    """
    d2 = jnp.sum((cloud.points - center[None, :]) ** 2, axis=-1)
    keep = (d2 <= radius * radius) & cloud.mask
    return Cloud(cloud.points, keep)


def crop_box(cloud: Cloud, min_bound: Array, max_bound: Array) -> Cloud:
    """Axis-aligned box crop (the Python twin's scan filter,
    localization_node.py:105-115)."""
    p = cloud.points
    keep = (
        jnp.all(p >= min_bound[None, :], axis=-1)
        & jnp.all(p <= max_bound[None, :], axis=-1)
        & cloud.mask
    )
    return Cloud(cloud.points, keep)


def crop_obb(cloud: Cloud, T: Array, extent: Array) -> Cloud:
    """Oriented-bounding-box crop: keep points within +-extent/2 of T's
    origin along T's axes (open3d OrientedBoundingBox crop,
    localization_node.py:222-225)."""
    R = T[:3, :3]
    t = T[:3, 3]
    local = (cloud.points - t[None, :]) @ R  # R^T applied rowwise
    keep = jnp.all(jnp.abs(local) <= extent[None, :] / 2.0, axis=-1) & cloud.mask
    return Cloud(cloud.points, keep)


def remove_floor(cloud: Cloud) -> Cloud:
    """Drop points with z <= 0 (point_cloud_processing.hpp:76-92)."""
    keep = (cloud.points[:, 2] > 0.0) & cloud.mask
    return Cloud(cloud.points, keep)


def compact(cloud: Cloud, out_capacity: int | None = None) -> Cloud:
    """Pack valid points to the front, preserving order.

    Used by the map re-crop (gathering the ~10 m neighbourhood out of the
    full HBM-resident map into the fixed ICP target buffer) and where the
    reference's index-based subsample follows a crop (coarse-alignment
    path: localization_node.cpp:207-213). `nonzero(size=...)` lowers to a
    prefix-sum + gather — O(N), order preserving.
    """
    out_capacity = out_capacity or cloud.capacity
    (idx,) = jnp.nonzero(cloud.mask, size=out_capacity, fill_value=0)
    pts = jnp.take(cloud.points, idx, axis=0)
    n = jnp.minimum(cloud.count(), out_capacity)
    msk = jnp.arange(out_capacity) < n
    return Cloud(pts, msk)


def compact_by_distance(
    cloud: Cloud, center: Array, out_capacity: int | None = None
) -> Cloud:
    """Pack valid points to the front, ORDERED by distance from `center`.

    PCL's kdtree radiusSearch returns hits sorted by distance, so the
    reference's radius crops are distance-ordered clouds
    (point_cloud_processing.hpp:37-49) and every index-based subsample
    downstream selects a RANGE-STRATIFIED subset — most visibly
    applyUniformSubsample(map, 15) feeding the coarse brute force
    (localization_node.cpp:207-213). This is the parity-exact staging for
    those call sites: a masked argsort on d2 (invalid rows sort last via
    +inf keys, ties broken by index like a stable kd-tree traversal).
    O(N log N) once per coarse attempt — startup-only, not in the
    per-frame hot path, which keeps Morton order for gated NN.
    """
    out_capacity = out_capacity or cloud.capacity
    d2 = jnp.sum((cloud.points - center[None, :]) ** 2, axis=-1)
    key = jnp.where(cloud.mask, d2, jnp.inf)
    order = jnp.argsort(key, stable=True)[:out_capacity]
    pts = jnp.take(cloud.points, order, axis=0)
    n = jnp.minimum(cloud.count(), out_capacity)
    msk = jnp.arange(out_capacity) < n
    return Cloud(pts, msk)


def sample_to_capacity(cloud: Cloud, out_capacity: int) -> Cloud:
    """Evenly sample the valid points into a (possibly smaller) capacity.

    When the valid count fits, this is exactly `compact` (order-preserving,
    lossless). When it does not, valid points are taken at an even stride
    across the packed order, which keeps the sample spatially spread for
    ordered sensor scans instead of truncating to the first angular sector.
    Used to bound the brute-force scoring cloud (the reference scores every
    point, brute_force_alignment.cpp:96; capacity bounding is the
    static-shape equivalent).
    """
    packed = compact(cloud, cloud.capacity)
    n = packed.count()
    i = jnp.arange(out_capacity)
    idx = (i * n) // out_capacity  # hits every index once when n <= cap
    pts = jnp.take(packed.points, idx, axis=0)
    dup = jnp.concatenate([jnp.array([False]), idx[1:] == idx[:-1]])
    mask = (idx < n) & ~dup  # idx<n also kills everything when n == 0
    return Cloud(pts, mask)


def packed_sample_indices(
    mask: Array, out_capacity: int
) -> tuple[Array, Array]:
    """`sample_to_capacity`'s selection for PACKED masks, as indices.

    When the valid rows form a prefix (the loader contract for
    Morton-pre-sorted scans), `compact` is the identity — but its
    `nonzero` + full-capacity gather still execute, and on v5e that
    gather was measured at ~45% of the LIO superblock's device time
    (ARCHITECTURE §6c). This returns the even-stride sample indices
    (plus the output mask) directly from the mask count, letting callers
    gather ONLY `out_capacity` rows — and gather from the RAW scan
    before per-point work (select-then-deskew == deskew-then-select).

    Exactly `sample_to_capacity`'s selection on packed clouds: same
    `(i * n) // cap` stride, same duplicate kill, same empty handling.
    """
    n = jnp.sum(mask.astype(jnp.int32), axis=-1)  # (...,)
    i = jnp.arange(out_capacity)
    idx = (i * n[..., None]) // out_capacity
    dup = jnp.concatenate(
        [
            jnp.zeros(idx.shape[:-1] + (1,), bool),
            idx[..., 1:] == idx[..., :-1],
        ],
        axis=-1,
    )
    out_mask = (idx < n[..., None]) & ~dup
    return idx, out_mask


def masked_points(cloud: Cloud, fill: float = jnp.inf) -> Array:
    """Points with invalid rows replaced by ``fill`` (for NN targets)."""
    return jnp.where(cloud.mask[:, None], cloud.points, fill)


# ---------------------------------------------------------------------------
# Voxel-grid downsample (centroid mode)
# ---------------------------------------------------------------------------


def voxel_downsample(
    cloud: Cloud,
    voxel_size: float,
    out_capacity: int,
    origin: Array | None = None,
    grid_dim: int = 2048,
) -> Cloud:
    """Centroid-per-voxel downsample with a fixed output capacity.

    TPU-native replacement for pcl::VoxelGrid
    (global_map_frames_manager.cpp:143-146): voxel ids are linearized over a
    bounded ``grid_dim``^3 local grid anchored at ``origin`` (defaults to the
    masked min corner), points are sorted by id and reduced with a
    segment-sum — sort + segment ops instead of the hash map a CPU uses.

    Voxels beyond ``out_capacity`` are dropped deterministically (lowest
    linear ids kept); callers size capacity generously.
    """
    n = cloud.capacity
    pts = cloud.points
    big = jnp.asarray(jnp.inf, pts.dtype)
    safe_pts = jnp.where(cloud.mask[:, None], pts, big)
    if origin is None:
        origin = jnp.min(safe_pts, axis=0)
        origin = jnp.where(jnp.isfinite(origin), origin, 0.0)
    ijk = jnp.floor((pts - origin[None, :]) / voxel_size).astype(jnp.int32)
    ijk = jnp.clip(ijk, 0, grid_dim - 1)
    lin = (ijk[:, 0] * grid_dim + ijk[:, 1]) * grid_dim + ijk[:, 2]
    # invalid points get a sentinel id that sorts last
    sentinel = jnp.iinfo(jnp.int32).max
    lin = jnp.where(cloud.mask, lin, sentinel)

    order = jnp.argsort(lin)
    lin_s = lin[order]
    pts_s = pts[order]
    valid_s = cloud.mask[order]

    # segment boundaries: first occurrence of each voxel id
    first = jnp.concatenate([jnp.array([True]), lin_s[1:] != lin_s[:-1]])
    first = first & valid_s
    seg_id = jnp.cumsum(first.astype(jnp.int32)) - 1  # (n,), -1 impossible
    seg_id = jnp.where(valid_s, seg_id, out_capacity)  # overflow bucket

    sums = jnp.zeros((out_capacity + 1, 3), pts.dtype).at[seg_id].add(
        jnp.where(valid_s[:, None], pts_s, 0.0), mode="drop"
    )
    cnts = jnp.zeros((out_capacity + 1,), jnp.float32).at[seg_id].add(
        valid_s.astype(jnp.float32), mode="drop"
    )
    centroids = sums[:out_capacity] / jnp.maximum(cnts[:out_capacity], 1.0)[:, None]
    mask = cnts[:out_capacity] > 0
    del n
    return Cloud(centroids, mask)


def voxel_downsample_numpy(
    points: np.ndarray, voxel_size: float, origin: np.ndarray | None = None
) -> np.ndarray:
    """Host (init-time) voxel centroid downsample on arbitrary extents.

    Used when merging map tiles at load time, mirroring
    GlobalMapFramesManager::mergeScansAndSave
    (global_map_frames_manager.cpp:110-151). int64 ids, unbounded grid.
    ``origin`` pins the grid anchor (defaults to the data min corner) —
    pass the same anchor the incremental device store uses
    (ops/voxel_map) to get cell-identical results.
    """
    points = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    if points.shape[0] == 0:
        return points.astype(np.float32)
    if origin is None:
        origin = points.min(axis=0)
    else:
        origin = np.asarray(origin)
        if not (points >= origin - 1e-9).all():
            raise ValueError(
                "voxel_downsample_numpy: origin is above the data min "
                "(negative cell indices would collide); pass an origin "
                "<= the point minimum per axis"
            )
    ijk = np.floor((points - origin) / voxel_size).astype(np.int64)
    dims = ijk.max(axis=0) + 1
    lin = (ijk[:, 0] * dims[1] + ijk[:, 1]) * dims[2] + ijk[:, 2]
    order = np.argsort(lin, kind="stable")
    lin_s = lin[order]
    pts_s = points[order]
    first = np.concatenate([[True], lin_s[1:] != lin_s[:-1]])
    seg = np.cumsum(first) - 1
    nseg = seg[-1] + 1
    sums = np.zeros((nseg, 3))
    np.add.at(sums, seg, pts_s)
    cnts = np.zeros((nseg,))
    np.add.at(cnts, seg, 1.0)
    return (sums / cnts[:, None]).astype(np.float32)
