"""Whole-ICP fused Pallas kernel — the native-mode fast registration path.

The parity ICP (ops/icp.py) reproduces the reference's lazy-re-association
control flow, which costs one XLA while-iteration of op-dispatch overhead
per ICP step (~0.8 ms/step measured on v5e — dominated by op issue, not
compute). This kernel runs the ENTIRE alignment in one `pallas_call`:

  per iteration (all inside VMEM):
    1. associate: loop the culled tile-pair list; transform each source
       tile by the CURRENT (R, t) on the fly and keep the running
       (min d2, target coords) per source point;
    2. reduce: one pass over source tiles accumulating the gated weighted
       moments (W, sum s, sum t, sum s t^T, sum |s'-t|) — all matmuls and
       sublane reductions;
    3. solve: Kabsch step from the moments with a closed-form-adjugate
       NEWTON POLAR iteration (X <- (X + X^-T)/2, quadratic convergence)
       instead of an SVD custom call;
    4. early-exit predication: iterations after convergence are skipped
       with `pl.when` (the grid still steps but does no work).

Semantics = "fresh-correspondence" point-to-point ICP: correspondences are
re-found every iteration (the classical algorithm). This is intentionally
NOT the reference's lazy variant — it converges at least as fast per
iteration and is the engine's native mode; parity mode remains available
in ops/icp.py. Stopping rules mirror the reference's thresholds: stop when
the mean correspondence error drops below `acceptable_mean_error` or
changes by less than `transformation_epsilon`.

The Newton polar solve yields the same rotation as SVD-based Kabsch for
det(H) > 0 (always, for non-degenerate correspondence sets); the
determinant is exported for observability.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_sensor_fusion_tpu.ops import geometry
from slam_sensor_fusion_tpu.ops.nn_gated import build_visit_lists
from slam_sensor_fusion_tpu.ops.nn_pallas import _build_tile_pair_list, make_pages
from slam_sensor_fusion_tpu.ops.icp import ICPResult, _icp_xla
from slam_sensor_fusion_tpu.utils.config import ICPConfig

Array = jax.Array

_BIG = 3.0e38


def _adjugate_transpose_over_det(X):
    """X^{-T} for 3x3 via the adjugate (register math, no solver)."""
    a, b, c = X[0, 0], X[0, 1], X[0, 2]
    d, e, f = X[1, 0], X[1, 1], X[1, 2]
    g, h, i = X[2, 0], X[2, 1], X[2, 2]
    A = e * i - f * h
    B = f * g - d * i
    C = d * h - e * g
    D = c * h - b * i
    E = a * i - c * g
    F = b * g - a * h
    G = b * f - c * e
    H = c * d - a * f
    I = a * e - b * d
    det = a * A + b * B + c * C
    # cofactor matrix (= adjugate^T) over det is exactly X^{-T}
    cof = jnp.array([[A, B, C], [D, E, F], [G, H, I]])
    return cof / det, det


def _mv3(M, v):
    """3x3 @ 3 as scalar math — Mosaic rejects tiny vector reductions."""
    return jnp.stack(
        [
            M[0, 0] * v[0] + M[0, 1] * v[1] + M[0, 2] * v[2],
            M[1, 0] * v[0] + M[1, 1] * v[1] + M[1, 2] * v[2],
            M[2, 0] * v[0] + M[2, 1] * v[1] + M[2, 2] * v[2],
        ]
    )


def _mm3(A, B):
    """3x3 @ 3x3 as scalar math."""
    rows = []
    for r in range(3):
        rows.append(
            jnp.stack(
                [
                    A[r, 0] * B[0, c] + A[r, 1] * B[1, c] + A[r, 2] * B[2, c]
                    for c in range(3)
                ]
            )
        )
    return jnp.stack(rows)


def _newton_polar(H, steps: int = 8):
    """Orthogonal polar factor of a 3x3 matrix by Newton iteration.

    Returns (R, ok). Unlike SVD, Newton diverges on (near-)singular
    matrices — a rank-deficient moment matrix (all correspondences on one
    plane/line) trips `ok=False` and callers must skip the step.
    """
    X0 = H / jnp.sqrt(jnp.maximum(jnp.sum(H * H), 1e-20))
    _, det0 = _adjugate_transpose_over_det(X0)
    ok = jnp.abs(det0) > 1e-6

    def body(_, X):
        X_invT, det = _adjugate_transpose_over_det(X)
        # freeze when the iterate degenerates instead of spraying NaNs
        good = jnp.abs(det) > 1e-12
        return jnp.where(good, 0.5 * (X + X_invT), X)

    R = jax.lax.fori_loop(0, steps, body, X0)
    finite = jnp.all(jnp.isfinite(R))
    return R, ok & finite


def _sum_all(x2d):
    """Full reduction of a 2-D array via staged axis sums (Mosaic rejects
    some direct multi-dim reductions to scalar)."""
    col = jnp.sum(x2d, axis=1, keepdims=True)  # (n, 1)
    return jnp.sum(col, axis=0, keepdims=True)[0, 0]


def _make_fused_kernel(
    tile_src: int, tile_tgt: int, config: ICPConfig, lazy: bool = False
):
    """Whole-ICP kernel.

    lazy=False: fresh correspondences every iteration (native fast mode).
    lazy=True : the reference's EXACT control flow
      (icp_point_to_point.cpp:185-254) — correspondences found once at the
      prior, then FIXED; re-association only when the error improvement
      drops below transformation_epsilon; the alive set only shrinks; the
      epsilon criterion triggers re-association, never termination.
    """
    gate = config.max_correspondence_dist_sq
    num_iterations = config.num_iterations
    eps = config.transformation_epsilon
    acc = config.acceptable_mean_error

    def kernel(
        pair_start_ref,  # (nSt,) SMEM: per-src-tile offset into pair_tgt
        pair_cnt_ref,  # (nSt,) SMEM: per-src-tile admitted-tile count
        pair_tgt_ref,  # (max_pairs,) SMEM: flat row-major target tiles
        T0_ref,  # (4, 4) VMEM — rebased initial transform
        src_pages_ref,  # (nSt, 3, TM) rebased, invalid -> FAR
        tgt_pages_ref,  # (nTt, 3, TN) rebased, invalid -> FAR
        T_out_ref,  # (4, 4) VMEM
        stats_ref,  # (1, 128) VMEM: [err, iters, ncorr, detH, ...]
        best_d2_ref,  # scratch (nSt, 1, TM)
        best_xyz_ref,  # scratch (nSt, 3, TM)
        alive_ref,  # scratch (nSt, 1, TM) f32 (lazy mode only)
    ):
        nSt = src_pages_ref.shape[0]

        def associate(R, t):
            """Fill best_d2/best_xyz for the current transform.

            Tile-major: the outer loop walks src tiles, the inner loop the
            tile's admitted target tiles, keeping the running (min d2,
            coords) in REGISTERS and writing each best ref slot exactly
            once. Distances are direct (tx-sx)^2 VPU broadcasts over a
            (TN, TM) panel — the old per-pair K=3 f32 matmul paid ~128
            MXU cycles per output tile at 2.3% contraction utilization,
            ~4.4 us per pair at (512, 1024); this formulation measures
            ~0.9 us per pair at (128, 1024) with exact f32 results (and
            is BETTER conditioned: no |t|^2 - 2ts + |s|^2 cancellation).
            """

            U = max(int(config.assoc_unroll), 1)

            def tile_body(i, _):
                sp = src_pages_ref[i]  # (3, TM)
                spx, spy, spz = sp[0:1], sp[1:2], sp[2:3]
                sx = R[0, 0] * spx + R[0, 1] * spy + R[0, 2] * spz + t[0]
                sy = R[1, 0] * spx + R[1, 1] * spy + R[1, 2] * spz + t[1]
                sz = R[2, 0] * spx + R[2, 1] * spy + R[2, 2] * spz + t[2]
                start = pair_start_ref[i]
                cnt = pair_cnt_ref[i]
                last = start + cnt - 1

                def inner(q, carry):
                    # U tiles per trip amortize the ~4 us trip overhead;
                    # tail lanes clamp to the run's last tile — a no-op
                    # under the strict `<` winner (bit-identical)
                    base = start + q * U
                    for u in range(U):
                        bmin, bx, by, bz = carry
                        j = pair_tgt_ref[jnp.minimum(base + u, last)]
                        tt = tgt_pages_ref[j]  # (3, TN)
                        txc = tt[0].reshape(tile_tgt, 1)
                        tyc = tt[1].reshape(tile_tgt, 1)
                        tzc = tt[2].reshape(tile_tgt, 1)
                        dx = txc - sx  # (TN, TM)
                        dy = tyc - sy
                        dz = tzc - sz
                        d2 = dx * dx + dy * dy + dz * dz
                        tile_min = jnp.min(d2, axis=0, keepdims=True)
                        arg = jnp.argmin(d2, axis=0).astype(jnp.int32)[None, :]
                        rows = jax.lax.broadcasted_iota(
                            jnp.int32, (tile_tgt, tile_src), 0
                        )
                        onehot = (rows == arg).astype(jnp.float32)
                        coords = jax.lax.dot_general(
                            tt, onehot, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        better = tile_min < bmin
                        carry = (
                            jnp.where(better, tile_min, bmin),
                            jnp.where(better, coords[0:1], bx),
                            jnp.where(better, coords[1:2], by),
                            jnp.where(better, coords[2:3], bz),
                        )
                    return carry

                big = jnp.full((1, tile_src), _BIG)
                zero = jnp.zeros((1, tile_src), jnp.float32)
                trips = (cnt + U - 1) // U
                bmin, bx, by, bz = jax.lax.fori_loop(
                    0, trips, inner, (big, zero, zero, zero)
                )
                best_d2_ref[i] = bmin
                best_xyz_ref[i] = jnp.concatenate([bx, by, bz], axis=0)
                return 0

            jax.lax.fori_loop(0, nSt, tile_body, 0)

        def reduce_moments(R, t, w):
            """Weighted moments over ALL pages in ~25 full-width VPU
            reductions (a per-tile loop would issue nSt x 5 small ops).
            w (nSt, TM): correspondence weights (fresh: current-gate
            indicator; lazy: the persistent alive set)."""
            s_all = src_pages_ref[...]  # (nSt, 3, TM)
            sx, sy, sz = s_all[:, 0, :], s_all[:, 1, :], s_all[:, 2, :]
            spx = R[0, 0] * sx + R[0, 1] * sy + R[0, 2] * sz + t[0]
            spy = R[1, 0] * sx + R[1, 1] * sy + R[1, 2] * sz + t[1]
            spz = R[2, 0] * sx + R[2, 1] * sy + R[2, 2] * sz + t[2]
            tb = best_xyz_ref[...]
            tx, ty, tz = tb[:, 0, :], tb[:, 1, :], tb[:, 2, :]

            W = _sum_all(w)
            Ss = jnp.stack(
                [_sum_all(spx * w), _sum_all(spy * w), _sum_all(spz * w)]
            )
            St = jnp.stack(
                [_sum_all(tx * w), _sum_all(ty * w), _sum_all(tz * w)]
            )
            Mst = jnp.stack(
                [
                    jnp.stack(
                        [
                            _sum_all(spx * w * tx),
                            _sum_all(spx * w * ty),
                            _sum_all(spx * w * tz),
                        ]
                    ),
                    jnp.stack(
                        [
                            _sum_all(spy * w * tx),
                            _sum_all(spy * w * ty),
                            _sum_all(spy * w * tz),
                        ]
                    ),
                    jnp.stack(
                        [
                            _sum_all(spz * w * tx),
                            _sum_all(spz * w * ty),
                            _sum_all(spz * w * tz),
                        ]
                    ),
                ]
            )
            dx, dy, dz = spx - tx, spy - ty, spz - tz
            Eabs = _sum_all(w * jnp.sqrt(dx * dx + dy * dy + dz * dz))
            return W, Ss, St, Mst, Eabs

        def solve_step(W, Ss, St, Mst):
            """Kabsch step from weighted moments via the Newton polar."""
            Wc = jnp.maximum(W, 1.0)
            c_s = Ss / Wc
            c_t = St / Wc
            Hm = Mst - W * jnp.outer(c_s, c_t)  # sum w (s-cs)(t-ct)^T
            # R_step = polar(H^T) (maps source onto target)
            R_step, polar_ok = _newton_polar(Hm.T)
            _, detH = _adjugate_transpose_over_det(Hm)
            t_step = c_t - _mv3(R_step, c_s)
            return R_step, t_step, polar_ok, detH

        T0 = T0_ref[...]
        R0, t0 = T0[:3, :3], T0[:3, 3]

        def fresh_iter_body(it, carry):
            R, t, err_prev, n_corr, iters, live, det_min = carry

            def do(R=R, t=t):
                associate(R, t)
                d2 = best_d2_ref[...][:, 0, :]
                w = (d2 < gate).astype(jnp.float32)
                W, Ss, St, Mst, Eabs = reduce_moments(R, t, w)
                Wc = jnp.maximum(W, 1.0)
                # starvation guard: with too few matches the step is
                # meaningless; report a huge error so the loop stops and
                # the caller's min_correspondences abort kicks in
                err = jnp.where(
                    W >= config.min_correspondences, Eabs / Wc, jnp.float32(_BIG)
                )
                R_step, t_step, polar_ok, detH = solve_step(W, Ss, St, Mst)
                stop = (
                    (err < acc)
                    | (jnp.abs(err_prev - err) < eps)
                    | ~polar_ok  # degenerate moments: no usable step
                )
                R_new = jnp.where(stop, R, _mm3(R_step, R))
                t_new = jnp.where(stop, t, _mv3(R_step, t) + t_step)
                return (
                    R_new,
                    t_new,
                    err,
                    W.astype(jnp.int32),
                    jnp.where(stop, iters, iters + 1),
                    ~stop,
                    jnp.minimum(det_min, detH),
                )

            def skip():
                return (R, t, err_prev, n_corr, iters, live, det_min)

            return jax.lax.cond(live, do, skip)

        def lazy_iter_body(it, carry):
            """One reference iteration (icp_point_to_point.cpp:203-235):
            error from the FIXED correspondences at the current transform,
            early exit on acceptable error, plateau-triggered
            re-association (alive only shrinks), Kabsch step."""
            R, t, err_prev, n_corr, iters, live, det_min = carry

            def do(R=R, t=t):
                alive = alive_ref[...][:, 0, :]
                W, Ss, St, Mst, Eabs = reduce_moments(R, t, alive)
                err = Eabs / jnp.maximum(W, 1.0)
                hit = err < acc
                plateau = jnp.abs(err_prev - err) < eps
                need = (~hit) & plateau

                def reassoc():
                    associate(R, t)
                    d2 = best_d2_ref[...][:, 0, :]
                    new_alive = alive * (d2 < gate).astype(jnp.float32)
                    alive_ref[...] = new_alive[:, None, :]
                    return reduce_moments(R, t, new_alive)

                W2, Ss2, St2, Mst2, _ = jax.lax.cond(
                    need, reassoc, lambda: (W, Ss, St, Mst, Eabs)
                )
                R_step, t_step, polar_ok, detH = solve_step(W2, Ss2, St2, Mst2)
                stop = hit | ~polar_ok
                R_new = jnp.where(stop, R, _mm3(R_step, R))
                t_new = jnp.where(stop, t, _mv3(R_step, t) + t_step)
                return (
                    R_new,
                    t_new,
                    err,
                    n_corr,
                    jnp.where(stop, iters, iters + 1),
                    ~stop,
                    jnp.minimum(det_min, detH),
                )

            def skip():
                return (R, t, err_prev, n_corr, iters, live, det_min)

            return jax.lax.cond(live, do, skip)

        if lazy:
            # initial association at the prior; the alive set starts as
            # the in-gate matches and can only shrink (cpp:193-200)
            associate(R0, t0)
            d2_0 = best_d2_ref[...][:, 0, :]
            alive0 = (d2_0 < gate).astype(jnp.float32)
            alive_ref[...] = alive0[:, None, :]
            n_corr0 = _sum_all(alive0).astype(jnp.int32)
            carry0 = (
                R0,
                t0,
                jnp.float32(_BIG),
                n_corr0,
                jnp.int32(0),
                n_corr0 >= config.min_correspondences,
                jnp.float32(_BIG),
            )
            body = lazy_iter_body
        else:
            carry0 = (
                R0,
                t0,
                jnp.float32(_BIG),
                jnp.int32(0),
                jnp.int32(0),
                jnp.bool_(True),
                jnp.float32(_BIG),
            )
            body = fresh_iter_body
        R, t, err, n_corr, iters, live, det_min = jax.lax.fori_loop(
            0, num_iterations, body, carry0
        )

        # assemble without .at[].set (scatter has no Mosaic lowering) and
        # without array literals (pallas rejects captured constants)
        top = jnp.concatenate([R, t[:, None]], axis=1)  # (3, 4)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
        bottom = (cols == 3).astype(jnp.float32)
        T_out_ref[...] = jnp.concatenate([top, bottom], axis=0)
        packed = jnp.stack(
            [err, iters.astype(jnp.float32), n_corr.astype(jnp.float32), det_min]
        )
        stats_ref[...] = jnp.concatenate(
            [packed, jnp.zeros(124, jnp.float32)]
        )[None, :]

    return kernel


class CachedTarget(NamedTuple):
    """Precomputed target-side structures, valid until the map re-crops.

    Built by `build_cached_target` once per re-crop; `icp_align_fused`
    then skips the per-frame page transpose and bbox pass entirely.
    """

    pages: Array  # (nTt, 3, TN) rebased by `center`, -FAR sentinels
    lo: Array  # (nTt, 3) tile bbox minima (original frame)
    hi: Array  # (nTt, 3)
    center: Array  # (3,) the rebase point (crop pose translation)
    #: FINE gating sub-boxes (nTt * q, 3), original frame — see
    #: ops/nn_gated.subtile_pair_dist2 (ragged-Morton-tile cull)
    sub_lo: Array | None = None
    sub_hi: Array | None = None


def build_cached_target(
    target: Array,
    target_mask: Array,
    center: Array,
    tile_tgt: int,
    gate_sub: int | None = None,
) -> CachedTarget:
    from slam_sensor_fusion_tpu.ops.morton import tile_bboxes

    pages = make_pages(target, target_mask, center, tile_tgt, sentinel=-1.0e7)
    lo, hi, _ = tile_bboxes(target, target_mask, tile_tgt)
    sub_lo = sub_hi = None
    if gate_sub is not None:
        sub_lo, sub_hi, _ = tile_bboxes(target, target_mask, gate_sub)
    return CachedTarget(
        pages=pages, lo=lo, hi=hi, center=center, sub_lo=sub_lo, sub_hi=sub_hi
    )


def _fused_core(
    src_pages: Array,
    tgt_pages: Array,
    pair_start: Array,
    pair_cnt: Array,
    pair_tgt: Array,
    T0_rebased: Array,
    config: ICPConfig,
    interpret: bool,
    lazy: bool = False,
) -> tuple[Array, Array]:
    """One pallas_call of the whole-ICP kernel on prebuilt pages.

    Pair lists are per-src-tile: pair_tgt is the row-major flat list of
    admitted target tiles, pair_start/pair_cnt (nSt,) index each src
    tile's run (ops/nn_pallas._build_tile_pair_list).

    Returns (T_out (4,4) in the rebased frame, stats (1,128)):
    stats[0, :4] = [mean error, iterations, n_correspondences, det_min]
    (n_correspondences: final gated count in fresh mode, the INITIAL
    alive count in lazy/parity mode, mirroring icp_point_to_point.cpp).
    """
    nSt, _, TM = src_pages.shape
    TN = tgt_pages.shape[2]
    return pl.pallas_call(
        _make_fused_kernel(TM, TN, config, lazy),
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, 4), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nSt, 1, TM), jnp.float32),
            pltpu.VMEM((nSt, 3, TM), jnp.float32),
            pltpu.VMEM((nSt, 1, TM), jnp.float32),
        ],
        interpret=interpret,
    )(pair_start, pair_cnt, pair_tgt, T0_rebased, src_pages, tgt_pages)


def _fused_result(
    T_out: Array,
    stats: Array,
    shift: Array,
    initial_T: Array,
    config: ICPConfig,
    pair_overflow: Array,
) -> ICPResult:
    err = stats[0, 0]
    iters = stats[0, 1].astype(jnp.int32)
    n_corr = stats[0, 2].astype(jnp.int32)
    det_min = stats[0, 3]
    enough = n_corr >= config.min_correspondences
    T_final = shift @ T_out
    return ICPResult(
        transformation=jnp.where(enough, T_final, initial_T),
        error=jnp.where(enough, err, jnp.float32(1e6)),
        iterations=jnp.where(enough, iters, 0),
        has_converged=enough & (err < config.acceptable_mean_error),
        n_correspondences=n_corr,
        pair_overflow=pair_overflow,
        det_min=det_min,
    )


def icp_align_fused_paged(
    src_pages: Array,
    pair_start: Array,
    pair_cnt: Array,
    pair_tgt: Array,
    initial_T: Array,
    cached_target: CachedTarget,
    config: ICPConfig,
    interpret: bool = False,
    pair_overflow: Array | None = None,
    lazy: bool = False,
) -> ICPResult:
    """Fused ICP on host-prebuilt source pages and a precomputed pair list.

    The fast pipeline's hot entry point: source pages are packed once in
    the loader (sensor frame, +FAR sentinels) and the pair list for every
    frame of a superblock is built in one vectorized prologue — this call
    is just the kernel plus result assembly. lazy=True runs the
    reference's exact lazy-re-association control flow (parity mode) in
    the same single kernel launch.
    """
    center = cached_target.center
    eye3 = jnp.eye(3, dtype=jnp.float32)
    shift = geometry.make_T(eye3, center)
    unshift = geometry.make_T(eye3, -center)
    T_out, stats = _fused_core(
        src_pages, cached_target.pages, pair_start, pair_cnt, pair_tgt,
        unshift @ initial_T, config, interpret, lazy,
    )
    if pair_overflow is None:
        pair_overflow = jnp.bool_(False)
    return _fused_result(T_out, stats, shift, initial_T, config, pair_overflow)


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def icp_align_fused(
    source: Array,
    source_mask: Array,
    target: Array,
    target_mask: Array,
    initial_T: Array,
    config: ICPConfig = ICPConfig(),
    interpret: bool = False,
    cached_target: CachedTarget | None = None,
) -> ICPResult:
    """Fresh-correspondence point-to-point ICP, fully fused on TPU.

    Shapes must be tile-divisible; otherwise falls back to the XLA path.
    Passing `cached_target` (see build_cached_target) skips the per-frame
    target page/bbox construction — the pipeline caches it per re-crop.
    """
    M, N = source.shape[0], target.shape[0]
    TM, TN = config.tile_src, config.tile_tgt
    if M % TM or N % TN:
        return _icp_xla(
            source, source_mask, target, target_mask, initial_T, config, False
        )
    nSt = M // TM
    gate = config.max_correspondence_dist_sq

    pts0 = geometry.transform_points(initial_T, source)
    search_r2 = (math.sqrt(gate) + config.reassoc_margin) ** 2
    from slam_sensor_fusion_tpu.ops.morton import tile_bboxes
    from slam_sensor_fusion_tpu.ops.nn_gated import pair_tiles

    if cached_target is None:
        cached_target = build_cached_target(
            target, target_mask, initial_T[:3, 3], TN
        )
    center = cached_target.center
    lo_s, hi_s, cnt_s = tile_bboxes(pts0, source_mask, TM)
    visits, counts, v_overflow = pair_tiles(
        lo_s, hi_s, cnt_s, cached_target.lo, cached_target.hi, search_r2,
        config.max_visits,
    )
    max_pairs = nSt * config.max_pairs_factor
    pair_start, pair_cnt, pair_tgt = _build_tile_pair_list(
        visits, counts, max_pairs
    )
    pair_overflow = v_overflow | (jnp.sum(counts) > max_pairs)

    # note: SOURCE pages stay untransformed/unrebased; the kernel applies
    # the full current transform. Rebase happens through T (conjugation).
    # Distinct +/- sentinels keep invalid source points from "matching"
    # invalid target points at distance zero.
    src_pages = make_pages(source, source_mask, center * 0, TM, sentinel=1.0e7)
    tgt_pages = cached_target.pages
    shift = geometry.make_T(jnp.eye(3, dtype=jnp.float32), center)
    unshift = geometry.make_T(jnp.eye(3, dtype=jnp.float32), -center)
    T0_rebased = unshift @ initial_T

    T_out, stats = _fused_core(
        src_pages, tgt_pages, pair_start, pair_cnt, pair_tgt, T0_rebased,
        config, interpret,
    )
    return _fused_result(T_out, stats, shift, initial_T, config, pair_overflow)
