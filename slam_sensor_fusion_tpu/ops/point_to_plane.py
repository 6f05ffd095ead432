"""Point-to-plane Gauss-Newton scan-to-map registration (native mode).

The reference stops at point-to-point ICP; the north-star scope
(BASELINE.json configs 2-3) absorbs the FAST-LIO-style upstream: scan-to-
map POINT-TO-PLANE alignment, which converges far faster on structured
scenes. TPU-first formulation:

* map normals are estimated ONCE per map (re-)crop by voxel-neighbourhood
  PCA — points are bucketed into normal_voxel-sized cells with a sort +
  segment-sum, each cell's 3x3 scatter matrix is eigen-decomposed in one
  batched `jnp.linalg.eigh`, and every point inherits its cell's smallest
  eigenvector. No kd-tree, no per-point neighbour search.
* each GN iteration: 1-NN correspondences from the pair-list Pallas
  kernel (ops/nn_pallas.py), residuals r = n . (p - q), Jacobian rows
  J = [n, (p x n)] and the 6x6 JtJ / 6 Jtr reduced with one masked einsum
  on the MXU; solve and left-compose exp(dx).
* fixed iteration count under `lax.fori_loop`, Huber weights for
  robustness — everything fixed-shape.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_sensor_fusion_tpu.ops import geometry
from slam_sensor_fusion_tpu.ops.nn_gated import build_visit_lists
from slam_sensor_fusion_tpu.ops.nn_pallas import (
    _build_pair_list,
    make_pages,
    pair_nn,
)
from slam_sensor_fusion_tpu.ops.nn import nearest_neighbor

Array = jax.Array


class PointToPlaneConfig(NamedTuple):
    """Static config (NamedTuple so it hashes as a jit static arg)."""

    num_iterations: int = 6
    max_correspondence_dist_sq: float = 1.0
    #: voxel size for normal estimation neighbourhoods [m]
    normal_voxel: float = 0.75
    #: cells with fewer points than this get no (invalid) normal
    min_cell_points: int = 5
    #: Huber kernel width on the plane residual [m]
    huber_delta: float = 0.3
    #: Levenberg damping added to JtJ's diagonal
    damping: float = 1e-4
    tile_src: int = 256
    tile_tgt: int = 512
    max_visits: int = 24
    reassoc_margin: float = 0.5
    nn_backend: str = "pallas"
    pallas_interpret: bool = False


class PointToPlaneResult(NamedTuple):
    transformation: Array  # (4, 4)
    rmse: Array  # () plane-residual RMS over inliers
    n_correspondences: Array  # () int32 from the final iteration


def estimate_normals(
    points: Array,
    mask: Array,
    voxel: float,
    min_cell_points: int = 5,
    grid_dim: int = 1024,
) -> tuple[Array, Array]:
    """Per-point normals by voxel-cell PCA.

    Returns (normals (N, 3), valid (N,)). Cells are `voxel`-sized; each
    valid point takes the smallest-eigenvalue eigenvector of its cell's
    covariance. Orientation is arbitrary (plane residuals are sign-
    agnostic after squaring; callers must not assume outward normals).
    """
    N = points.shape[0]
    big = jnp.asarray(jnp.inf, points.dtype)
    safe = jnp.where(mask[:, None], points, big)
    origin = jnp.min(safe, axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0)
    ijk = jnp.clip(
        jnp.floor((points - origin[None]) / voxel).astype(jnp.int32), 0, grid_dim - 1
    )
    lin = (ijk[:, 0] * grid_dim + ijk[:, 1]) * grid_dim + ijk[:, 2]
    sentinel = jnp.iinfo(jnp.int32).max
    lin = jnp.where(mask, lin, sentinel)

    order = jnp.argsort(lin)
    lin_s = lin[order]
    pts_s = points[order]
    valid_s = mask[order]

    first = jnp.concatenate([jnp.array([True]), lin_s[1:] != lin_s[:-1]]) & valid_s
    seg_of_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg_of_sorted = jnp.where(valid_s, seg_of_sorted, N)  # overflow bucket

    # per-cell first and second moments
    w = valid_s.astype(jnp.float32)
    sums = jnp.zeros((N + 1, 3), jnp.float32).at[seg_of_sorted].add(
        pts_s * w[:, None], mode="drop"
    )
    cnts = jnp.zeros((N + 1,), jnp.float32).at[seg_of_sorted].add(w, mode="drop")
    outer = pts_s[:, :, None] * pts_s[:, None, :] * w[:, None, None]
    sq = jnp.zeros((N + 1, 3, 3), jnp.float32).at[seg_of_sorted].add(
        outer, mode="drop"
    )
    c = jnp.maximum(cnts, 1.0)
    mean = sums / c[:, None]
    cov = sq / c[:, None, None] - mean[:, :, None] * mean[:, None, :]
    # regularize for eigh stability
    cov = cov + 1e-9 * jnp.eye(3)[None]
    _, vecs = jnp.linalg.eigh(cov)  # ascending eigenvalues
    cell_normal = vecs[..., 0]  # smallest-eigenvalue direction
    cell_valid = cnts >= min_cell_points

    # scatter back to original point order
    normals_sorted = jnp.take(cell_normal, jnp.minimum(seg_of_sorted, N), axis=0)
    valid_sorted = jnp.take(cell_valid, jnp.minimum(seg_of_sorted, N)) & valid_s
    inv = jnp.zeros((N,), jnp.int32).at[order].set(jnp.arange(N, dtype=jnp.int32))
    normals = jnp.take(normals_sorted, inv, axis=0)
    nvalid = jnp.take(valid_sorted, inv)
    return normals, nvalid & mask


@functools.partial(jax.jit, static_argnames=("config",))
def point_to_plane_align(
    source: Array,
    source_mask: Array,
    target: Array,
    target_mask: Array,
    target_normals: Array,
    target_normals_valid: Array,
    initial_T: Array,
    config: PointToPlaneConfig = PointToPlaneConfig(),
) -> PointToPlaneResult:
    """Gauss-Newton point-to-plane alignment of source onto target."""
    center = initial_T[:3, 3]
    M, N = source.shape[0], target.shape[0]
    use_pallas = (
        config.nn_backend == "pallas"
        and M % config.tile_src == 0
        and N % config.tile_tgt == 0
        and (
            any("TPU" in d.device_kind for d in jax.devices())
            or config.pallas_interpret
        )
    )
    interpret = not any("TPU" in d.device_kind for d in jax.devices())
    gate = config.max_correspondence_dist_sq

    pts0 = geometry.transform_points(initial_T, source)

    if use_pallas:
        TM, TN = config.tile_src, config.tile_tgt
        nSt = M // TM
        search_r2 = (math.sqrt(gate) + config.reassoc_margin) ** 2
        visits, counts, _ = build_visit_lists(
            pts0, source_mask, target, target_mask, search_r2, TM, TN,
            config.max_visits,
        )
        pair_src, pair_tgt, n_pairs = _build_pair_list(visits, counts, nSt * 8)
        tgt_pages = make_pages(target, target_mask, center, TN)

        def associate(pts):
            pages = make_pages(pts, source_mask, center, TM)
            d2, idx, _ = pair_nn(
                pages, tgt_pages, pair_src, pair_tgt, n_pairs, interpret
            )
            return d2.reshape(M), idx.reshape(M)

    else:

        def associate(pts):
            return nearest_neighbor(pts, source_mask, target, target_mask, center)

    src_rebased = source  # transformed fresh every iteration

    def gn_step(i, T):
        del i
        pts = geometry.transform_points(T, src_rebased)
        d2, idx = associate(pts)
        q = jnp.take(target, idx, axis=0)
        n = jnp.take(target_normals, idx, axis=0)
        nv = jnp.take(target_normals_valid, idx)
        w_in = (
            source_mask & (d2 < gate) & nv
        ).astype(jnp.float32)

        r = jnp.sum(n * (pts - q), axis=-1)  # signed plane distance
        # Huber weights
        absr = jnp.abs(r)
        w = w_in * jnp.where(
            absr <= config.huber_delta, 1.0, config.huber_delta / jnp.maximum(absr, 1e-12)
        )
        # J row: d r / d xi with xi = [rho, phi], T <- exp(xi) T
        # r = n.(p + rho + phi x p - q) => dr/drho = n, dr/dphi = (p x n)
        pxn = jnp.cross(pts, n)
        J = jnp.concatenate([n, pxn], axis=-1)  # (M, 6)
        JtJ = jnp.einsum("mi,mj,m->ij", J, J, w)
        Jtr = jnp.einsum("mi,m->i", J, r * w)
        JtJ = JtJ + config.damping * jnp.eye(6)
        dx = -jnp.linalg.solve(JtJ, Jtr)
        return geometry.se3_exp(dx) @ T

    T_final = jax.lax.fori_loop(0, config.num_iterations, gn_step, initial_T)

    # final stats
    pts = geometry.transform_points(T_final, src_rebased)
    d2, idx = associate(pts)
    q = jnp.take(target, idx, axis=0)
    n = jnp.take(target_normals, idx, axis=0)
    nv = jnp.take(target_normals_valid, idx)
    w = (source_mask & (d2 < gate) & nv).astype(jnp.float32)
    r = jnp.sum(n * (pts - q), axis=-1)
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    rmse = jnp.sqrt(jnp.sum(w * r * r) / cnt)
    return PointToPlaneResult(
        transformation=T_final,
        rmse=rmse,
        n_correspondences=jnp.sum(w).astype(jnp.int32),
    )
