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
    #: pair-list capacity = max_pairs_factor * n_source_tiles (fused
    #: kernels); compact scenes where most tile pairs are admissible need
    #: headroom past the default or the list truncates (nearest-first)
    max_pairs_factor: int = 16
    reassoc_margin: float = 0.5
    nn_backend: str = "pallas"
    pallas_interpret: bool = False
    #: (fused kernel) associate ONCE at the prior and keep the matched
    #: point/normal set fixed across all GN iterations + the stats pass
    #: (the lazy trade the superblock ICP kernel also makes — association
    #: dominates kernel time; with an IMU prior the correspondences
    #: barely change between iterations)
    fixed_correspondences: bool = False
    #: admitted target tiles per sequential pair-loop trip in the fused
    #: kernels (see ICPConfig.assoc_unroll — amortizes the ~4 us/trip
    #: scalar-loop overhead; results bit-identical for any value)
    assoc_unroll: int = 1


class PointToPlaneResult(NamedTuple):
    transformation: Array  # (4, 4)
    rmse: Array  # () plane-residual RMS over inliers
    n_correspondences: Array  # () int32 from the final iteration
    #: unscaled (6, 6) covariance of the (dp, dtheta_body) pose error
    #: from the final GN moments (pose_covariance_from_jtj); None when
    #: the backend does not export it
    cov_pose: Array | None = None
    #: sum of w_in * r^2 over inliers at the final transform
    wr2: Array | None = None


def pose_covariance_from_jtj(JtJ: Array, T: Array, reg: float = 1e-6) -> Array:
    """Map the GN information matrix to a pose-error covariance.

    `JtJ` is the (Huber-weighted) 6x6 system of the left-perturbation
    parameterization T <- exp([rho, phi]) T, expressed in whatever frame
    the GN ran in; `T` is the final transform IN THAT FRAME. The EKF's
    measurement error is (dp, dtheta_body) with dp = rho + phi x t and
    dtheta_body = R^T phi, so the returned covariance is
    C (JtJ + reg I)^-1 C^T with C = [[I, -skew(t)], [0, R^T]] —
    parameterization-invariant, so rebased and world-frame GN solvers
    yield the same result. Scale by the residual variance sigma^2 before
    use as a measurement covariance."""
    R = T[:3, :3]
    t = T[:3, 3]
    inv = jnp.linalg.inv(JtJ + reg * jnp.eye(6, dtype=jnp.float32))
    top = jnp.concatenate([jnp.eye(3, dtype=jnp.float32), -geometry.skew(t)], axis=1)
    bot = jnp.concatenate([jnp.zeros((3, 3), jnp.float32), R.T], axis=1)
    C = jnp.concatenate([top, bot], axis=0)
    return C @ inv @ C.T


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


def estimate_normals_tiled(
    points: Array,
    mask: Array,
    chunk: int = 32,
    min_chunk_points: int = 5,
    max_planarity: float = 0.25,
) -> tuple[Array, Array]:
    """Per-point normals by PCA over fixed Morton-contiguous chunks.

    TPU-first replacement for `estimate_normals` on clouds that are
    ALREADY Morton-sorted (the LIO anchor is): consecutive runs of
    `chunk` points are spatially compact, so each run's covariance is a
    usable local plane estimate. The whole computation is reshapes,
    masked means and ONE batched (N/chunk, 3, 3) eigh — no argsort, no
    scatter (both serialize on TPU; the voxel estimator's 3 scatter-adds
    + 2 argsorts cost ~65 ms per 65k-point refresh on v5e, ~90% of the
    LIO frame budget at refresh_every=8).

    Quality: chunks straddling surface creases tilt, exactly like voxel
    cells straddling creases in `estimate_normals`; downstream Huber
    weights + the d2 gate absorb both.
    """
    N = points.shape[0]
    C = N // chunk
    P = points[: C * chunk].reshape(C, chunk, 3)
    w = mask[: C * chunk].reshape(C, chunk).astype(jnp.float32)
    cnt = jnp.sum(w, axis=1)
    denom = jnp.maximum(cnt, 1.0)[:, None]
    mean = jnp.sum(P * w[..., None], axis=1) / denom
    X = (P - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("cki,ckj->cij", X, X) / denom[..., None]
    cov = cov + 1e-9 * jnp.eye(3)[None]
    vals, vecs = jnp.linalg.eigh(cov)  # ascending
    chunk_normal = vecs[..., 0]  # (C, 3)
    # planarity gate: a crease/volume chunk has lam_min comparable to
    # lam_mid — its "normal" is arbitrary; drop it rather than tilt the
    # GN solve (the voxel estimator's small cells rarely straddle, so it
    # needs no gate; big Morton chunks do)
    planar = vals[..., 0] < max_planarity * jnp.maximum(vals[..., 1], 1e-12)
    chunk_valid = (cnt >= min_chunk_points) & planar

    normals = jnp.broadcast_to(chunk_normal[:, None, :], (C, chunk, 3)).reshape(
        C * chunk, 3
    )
    valid = jnp.broadcast_to(chunk_valid[:, None], (C, chunk)).reshape(C * chunk)
    if C * chunk < N:  # ragged tail: no normals
        pad = N - C * chunk
        normals = jnp.concatenate([normals, jnp.zeros((pad, 3))], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
    return normals, valid & mask


def _smallest_eigvec3(cov: Array) -> tuple[Array, Array, Array]:
    """Analytic smallest eigenpair of symmetric (..., 3, 3) matrices.

    Pure elementwise math (trigonometric eigenvalue formula + row-cross
    eigenvector), no LAPACK/eigh custom call — the batched eigh is the
    costly part of normal estimation on TPU. Returns (eigvec (..., 3),
    lam_min, lam_mid)."""
    a00 = cov[..., 0, 0]
    a11 = cov[..., 1, 1]
    a22 = cov[..., 2, 2]
    a01 = cov[..., 0, 1]
    a02 = cov[..., 0, 2]
    a12 = cov[..., 1, 2]
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22) / 6.0 + (
        a01 * a01 + a02 * a02 + a12 * a12
    ) / 3.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    # det(B)/2 with B = (A - qI)/p
    detB = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    ) / (p * p * p)
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam_max = q + 2.0 * p * jnp.cos(phi)
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_max - lam_min
    # eigenvector of lam_min: any nonzero cross product of two rows of
    # (A - lam_min I); take the largest of the three for stability
    c0 = jnp.stack([a00 - lam_min, a01, a02], axis=-1)
    c1 = jnp.stack([a01, a11 - lam_min, a12], axis=-1)
    c2 = jnp.stack([a02, a12, a22 - lam_min], axis=-1)
    x01 = jnp.cross(c0, c1)
    x02 = jnp.cross(c0, c2)
    x12 = jnp.cross(c1, c2)
    n01 = jnp.sum(x01 * x01, axis=-1)
    n02 = jnp.sum(x02 * x02, axis=-1)
    n12 = jnp.sum(x12 * x12, axis=-1)
    best = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None],
        x01,
        jnp.where((n02 >= n12)[..., None], x02, x12),
    )
    nrm = jnp.sqrt(jnp.maximum(n01, jnp.maximum(n02, n12)))
    vec = best / jnp.maximum(jnp.sqrt(jnp.sum(best * best, axis=-1)), 1e-20)[
        ..., None
    ]
    # fully degenerate (isotropic) matrices: arbitrary unit vector
    vec = jnp.where((nrm > 1e-20)[..., None], vec, jnp.array([0.0, 0.0, 1.0]))
    return vec, lam_min, lam_mid


def estimate_normals_cells(
    points: Array,
    mask: Array,
    cell_size: float = 0.75,
    min_cell_points: int = 5,
    max_planarity: float | None = None,
) -> tuple[Array, Array]:
    """Voxel-cell PCA normals for a MORTON-SORTED cloud, scatter-free.

    Exact cell semantics like `estimate_normals` (every point gets its
    spatial cell's plane normal) but built for the TPU: a truncated
    Morton code IS a spatial octant cell, and in Morton-sorted order each
    cell's points form a CONTIGUOUS RUN — so per-cell moments are cumsum
    differences at run boundaries (two gathers), and the smallest
    eigenvector comes from the analytic 3x3 solver. No argsort, no
    scatter, no eigh: ~8x cheaper per 65k-point refresh on v5e than the
    scatter/eigh voxel path.

    The cell edge is the power-of-2 fraction of the cloud extent nearest
    ABOVE `cell_size` (octree-aligned; data-dependent like the Morton
    grid itself). Callers must pass the cloud ALREADY sorted by
    `sort_by_morton` (the LIO anchor is); unsorted input degrades to
    per-run-fragment normals, still valid but noisier.
    """
    from slam_sensor_fusion_tpu.ops.cloud import Cloud
    from slam_sensor_fusion_tpu.ops.morton import _BITS, cloud_box, morton_codes

    N = points.shape[0]
    # CUBE box: cells must be metrically cubic, and the caller must have
    # sorted with the same box (sort_by_morton(..., isotropic=True)) for
    # the contiguous-run property to hold
    lo, hi = cloud_box(Cloud(points, mask), isotropic=True)
    codes = morton_codes(points, mask, lo, hi)

    # level with cell edge <= cell_size (finest that still covers it):
    # edge(l) = extent / 2^l  ->  l = ceil(log2(extent / cell_size))
    extent = jnp.max(jnp.maximum(hi - lo, 1e-6))
    lvl = jnp.clip(
        jnp.ceil(jnp.log2(extent / cell_size)).astype(jnp.int32), 1, _BITS
    )
    drop = 3 * (_BITS - lvl)
    cell = jax.lax.shift_right_logical(codes, drop)

    w = mask.astype(jnp.float32)
    x, y, z = points[:, 0] * w, points[:, 1] * w, points[:, 2] * w
    mom = jnp.stack(
        [
            w, x, y, z,
            x * points[:, 0], y * points[:, 1], z * points[:, 2],
            x * points[:, 1], x * points[:, 2], y * points[:, 2],
        ],
        axis=1,
    )  # (N, 10): cnt, sums, xx yy zz xy xz yz
    csum = jnp.cumsum(mom, axis=0)

    idx = jnp.arange(N, dtype=jnp.int32)
    firstmask = jnp.concatenate(
        [jnp.ones(1, bool), cell[1:] != cell[:-1]]
    )
    # run start per point: last boundary index <= i (cummax); run end:
    # next boundary - 1 (reverse cummax trick)
    start = jax.lax.cummax(jnp.where(firstmask, idx, 0))
    nxt = jnp.concatenate([firstmask[1:], jnp.ones(1, bool)])
    end = jnp.flip(jax.lax.cummin(jnp.flip(jnp.where(nxt, idx, N - 1))))

    seg_hi = jnp.take(csum, end, axis=0)
    seg_lo = jnp.where(
        (start > 0)[:, None], jnp.take(csum, jnp.maximum(start - 1, 0), axis=0), 0.0
    )
    seg = seg_hi - seg_lo  # (N, 10) per-point cell moments
    cnt = seg[:, 0]
    c = jnp.maximum(cnt, 1.0)
    mx, my, mz = seg[:, 1] / c, seg[:, 2] / c, seg[:, 3] / c
    cxx = seg[:, 4] / c - mx * mx
    cyy = seg[:, 5] / c - my * my
    czz = seg[:, 6] / c - mz * mz
    cxy = seg[:, 7] / c - mx * my
    cxz = seg[:, 8] / c - mx * mz
    cyz = seg[:, 9] / c - my * mz
    cov = jnp.stack(
        [
            jnp.stack([cxx, cxy, cxz], axis=-1),
            jnp.stack([cxy, cyy, cyz], axis=-1),
            jnp.stack([cxz, cyz, czz], axis=-1),
        ],
        axis=-2,
    ) + 1e-9 * jnp.eye(3)[None]

    normals, lam_min, lam_mid = _smallest_eigvec3(cov)
    valid = mask & (cnt >= min_cell_points)
    if max_planarity is not None:
        valid = valid & (lam_min < max_planarity * jnp.maximum(lam_mid, 1e-12))
    return normals, valid


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

    # final stats (+ the GN covariance export for icp_cov_mode="gn":
    # Huber-weighted JtJ at the final transform, world-frame J rows)
    pts = geometry.transform_points(T_final, src_rebased)
    d2, idx = associate(pts)
    q = jnp.take(target, idx, axis=0)
    n = jnp.take(target_normals, idx, axis=0)
    nv = jnp.take(target_normals_valid, idx)
    w = (source_mask & (d2 < gate) & nv).astype(jnp.float32)
    r = jnp.sum(n * (pts - q), axis=-1)
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    wr2 = jnp.sum(w * r * r)
    rmse = jnp.sqrt(wr2 / cnt)
    absr = jnp.abs(r)
    wh = w * jnp.minimum(1.0, config.huber_delta / jnp.maximum(absr, 1e-12))
    pxn = jnp.cross(pts, n)
    J = jnp.concatenate([n, pxn], axis=-1)
    JtJ = jnp.einsum("mi,mj,m->ij", J, J, wh)
    return PointToPlaneResult(
        transformation=T_final,
        rmse=rmse,
        n_correspondences=jnp.sum(w).astype(jnp.int32),
        cov_pose=pose_covariance_from_jtj(JtJ, T_final),
        wr2=wr2,
    )
