"""Morton (Z-order) codes and spatial sorting for point clouds.

The TPU-native substitute for a kd-tree's spatial structure: sorting a
cloud by Morton code makes fixed-size point tiles spatially coherent, so
tile bounding boxes become tight and a gated NN search can cull target
tiles by bbox distance (ops/nn_gated.py). One sort per map re-crop / one
per scan replaces every tree build (icp_point_to_point.cpp:54,
point_cloud_processing.hpp:37).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from slam_sensor_fusion_tpu.ops.cloud import Cloud

Array = jax.Array

_BITS = 10  # 10 bits/axis -> 30-bit codes, fits int32


def sort_points_numpy(points: np.ndarray, isotropic: bool = False) -> np.ndarray:
    """Host-side Morton sort of an (n, 3) array (loader pre-sort).

    Scans pre-sorted here keep their tile locality through every rigid
    transform of the ICP loop, so the device never needs to re-sort them.
    """
    points = np.asarray(points, np.float32).reshape(-1, 3)
    return points[sort_order_numpy(points, isotropic)]


def sort_order_numpy(points: np.ndarray, isotropic: bool = False) -> np.ndarray:
    """Host-side Morton sort ORDER of an (n, 3) array.

    Same code path as `sort_points_numpy` but returns the permutation, so
    per-point side channels (deskew timestamps, intensities) can ride
    along with the sort. `isotropic` quantizes over a CUBE instead of the
    per-axis box — metrically cubic cells keep fixed-count tiles compact
    on flat (road-scan) clouds, exactly as `cloud_box(isotropic=True)`
    does on device; use it whenever tile bboxes will gate NN search."""
    points = np.asarray(points, np.float32).reshape(-1, 3)
    n = points.shape[0]
    if n == 0:
        return np.zeros(0, np.int64)
    lo = points.min(axis=0)
    extent = np.maximum(points.max(axis=0) - lo, 1e-6)
    if isotropic:
        extent = np.full(3, extent.max(), extent.dtype)
    q = np.clip(
        ((points - lo) / extent * (1 << _BITS)).astype(np.int64),
        0,
        (1 << _BITS) - 1,
    )

    def spread(v):
        v = v & 0x3FF
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return np.argsort(code, kind="stable")


def _spread_bits(v: Array) -> Array:
    """Insert two zero bits between each of the low 10 bits of v."""
    v = v.astype(jnp.uint32) & 0x3FF
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def morton_codes(points: Array, mask: Array, lo: Array, hi: Array) -> Array:
    """30-bit Morton codes over the [lo, hi] box; invalid points get the
    maximal code so they sort to the end."""
    extent = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(
        ((points - lo) / extent * (1 << _BITS)).astype(jnp.int32), 0, (1 << _BITS) - 1
    )
    code = (
        _spread_bits(q[:, 0])
        | (_spread_bits(q[:, 1]) << 1)
        | (_spread_bits(q[:, 2]) << 2)
    ).astype(jnp.int32)
    return jnp.where(mask, code, jnp.int32((1 << 30) + 1))


def cloud_box(cloud: Cloud, isotropic: bool = False) -> tuple[Array, Array]:
    """Masked (lo, hi) bounding box of a cloud; `isotropic` expands it to
    a CUBE (hi = lo + max extent on every axis) so Morton cells are
    metrically cubic — required when truncated codes define spatial cells
    (ops/point_to_plane.estimate_normals_cells): per-axis normalization
    would make cells razor-thin along a flat cloud's short axis."""
    big = jnp.asarray(jnp.inf, cloud.points.dtype)
    safe = jnp.where(cloud.mask[:, None], cloud.points, big)
    lo = jnp.min(safe, axis=0)
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    safe_neg = jnp.where(cloud.mask[:, None], cloud.points, -big)
    hi = jnp.max(safe_neg, axis=0)
    hi = jnp.where(jnp.isfinite(hi), hi, 1.0)
    if isotropic:
        hi = lo + jnp.max(jnp.maximum(hi - lo, 1e-6))
    return lo, hi


def sort_by_morton(cloud: Cloud, isotropic: bool = False) -> Cloud:
    """Spatially sort the cloud (valid points first, Z-order)."""
    lo, hi = cloud_box(cloud, isotropic)
    codes = morton_codes(cloud.points, cloud.mask, lo, hi)
    order = jnp.argsort(codes)
    return Cloud(cloud.points[order], cloud.mask[order])


def tile_bboxes(points: Array, mask: Array, tile: int) -> tuple[Array, Array, Array]:
    """Per-tile (lo, hi, count) with invalid rows excluded.

    Empty tiles get inverted boxes (lo=+inf, hi=-inf) which can never pass
    a bbox-distance test.
    """
    n = points.shape[0]
    n_tiles = n // tile
    p = points.reshape(n_tiles, tile, 3)
    m = mask.reshape(n_tiles, tile)
    big = jnp.asarray(jnp.inf, points.dtype)
    lo = jnp.min(jnp.where(m[..., None], p, big), axis=1)
    hi = jnp.max(jnp.where(m[..., None], p, -big), axis=1)
    cnt = jnp.sum(m.astype(jnp.int32), axis=1)
    return lo, hi, cnt


def bbox_pair_dist2(
    lo_a: Array, hi_a: Array, lo_b: Array, hi_b: Array
) -> Array:
    """Squared min distance between every box in A and every box in B.

    (nA, nB); empty (inverted) boxes yield +inf.
    """
    # per-axis gap = max(0, lo_b - hi_a, lo_a - hi_b)
    gap = jnp.maximum(
        lo_b[None, :, :] - hi_a[:, None, :], lo_a[:, None, :] - hi_b[None, :, :]
    )
    gap = jnp.maximum(gap, 0.0)
    d2 = jnp.sum(gap * gap, axis=-1)
    empty_a = jnp.any(lo_a > hi_a, axis=-1)
    empty_b = jnp.any(lo_b > hi_b, axis=-1)
    return jnp.where(
        empty_a[:, None] | empty_b[None, :], jnp.asarray(jnp.inf, d2.dtype), d2
    )
