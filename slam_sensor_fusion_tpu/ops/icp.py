"""Point-to-point ICP as a fixed-shape `lax.while_loop` program.

Functional rebuild of ICPPointToPoint (icp_point_to_point.cpp:185-254) with
the reference's exact control-flow semantics expressed as predicated
updates over static shapes:

* initial correspondences are found ONCE against the prior-transformed
  source and then stay FIXED across iterations (the reference compacts to
  matched rows, :193-195); here the match set is a shrinking `alive` mask;
* abort if fewer than `min_correspondences` matches — return the prior
  (:196-200);
* per iteration: masked mean Euclidean error (:161-170); early exit when
  error < acceptable_mean_error (:215-219); LAZY re-association — only when
  |last_error - error| < transformation_epsilon are neighbours recomputed
  (:221-224), and the alive set can only shrink;
* Kabsch/SVD step on the masked correspondences (:112-159); left-composed
  T = T_step @ T (:228);
* has_converged = final error < acceptable_mean_error (:252).

The correspondence threshold is applied to SQUARED distances, matching the
PCL convention the reference (perhaps unknowingly) relies on
(icp_point_to_point.cpp:70).

Two executions of the same semantics:

* PALLAS path (TPU production): state lives in (n_tiles, 3, TILE) page
  layout end to end — associations run the single-shot VMEM pair-list
  kernel (ops/nn_pallas.py) against a pair list built ONCE with a dilated
  radius, matched coordinates come back from the kernel (no gathers), and
  the lazy re-association is computed unconditionally + selected, so the
  loop body contains no `lax.cond` at all (conds cost ~0.5 ms each in
  branch materialization on TPU);
* DENSE/XLA path (CPU tests, fallback): (M, 3) layout with `lax.cond`ed
  re-association using the dense sweep or the XLA gather formulation.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_sensor_fusion_tpu.ops import geometry
from slam_sensor_fusion_tpu.ops.nn import nearest_neighbor
from slam_sensor_fusion_tpu.ops.nn_gated import gated_nn
from slam_sensor_fusion_tpu.ops.nn_pallas import (
    _build_pair_list,
    make_pages,
    pair_nn,
)
from slam_sensor_fusion_tpu.utils.config import ICPConfig

Array = jax.Array

_F32_MAX = float(jnp.finfo(jnp.float32).max)
_BIG = 3.0e38


class ICPResult(NamedTuple):
    """Mirror of the reference's ICPResult (icp_point_to_point.h:28-39),
    plus observability extras the reference silently drops."""

    transformation: Array  # (4, 4)
    error: Array  # () mean correspondence error [m]
    iterations: Array  # () int32
    has_converged: Array  # () bool
    n_correspondences: Array  # () int32 (extra observability)
    #: () bool — the tile-culled correspondence search truncated its visit
    #: or pair list (max_visits/max_pairs); correspondences may be missing.
    #: Silent truncation corrupted nothing observable in round 1 — this
    #: flag exists so it never can.
    pair_overflow: Array | bool = False
    #: () f32 — smallest |det| of the Kabsch moment matrix seen by the
    #: fused kernel's Newton-polar solve (0 for non-fused paths); values
    #: near 0 mean a degenerate (planar/linear) correspondence set.
    det_min: Array | float = 0.0
    #: (num_iterations,) f32 per-iteration mean error, NaN beyond the
    #: last executed iteration — the reference's printStepDebug signal
    #: ("[ICP INFO] Iteration i - Error: e", icp_point_to_point.cpp:
    #: 171-183). Exported only with ICPConfig.debug_trace.
    error_trace: Array | None = None


def _result(
    enough, final_T, final_err, final_i, n_corr0, initial_T, config,
    pair_overflow=None, error_trace=None,
):
    # iterations counter: the reference counts completed step iterations
    # (icp_point_to_point.cpp:234); the early-exit path does not increment.
    error_out = jnp.where(enough, final_err, jnp.float32(1e6))
    T_out = jnp.where(enough, final_T, initial_T)
    if pair_overflow is None:
        pair_overflow = jnp.bool_(False)
    return ICPResult(
        transformation=T_out,
        error=error_out,
        iterations=jnp.where(enough, final_i, 0),
        has_converged=enough & (error_out < config.acceptable_mean_error),
        n_correspondences=n_corr0,
        pair_overflow=pair_overflow,
        det_min=jnp.float32(0.0),
        error_trace=error_trace if config.debug_trace else None,
    )


# ---------------------------------------------------------------------------
# Pallas pages-native path
# ---------------------------------------------------------------------------


def _pages_transform(T: Array, pages: Array) -> Array:
    """Apply a rigid transform to (nSt, 3, TM) pages."""
    R = T[:3, :3]
    t = T[:3, 3]
    return jnp.einsum("ij,sjt->sit", R, pages) + t[None, :, None]


def _pages_masked_mean_error(pts: Array, corr: Array, w: Array) -> Array:
    """Mean Euclidean error over matched entries; pages layout.
    (icp_point_to_point.cpp:161-170)."""
    d = jnp.sqrt(jnp.maximum(jnp.sum((pts - corr) ** 2, axis=1), 0.0))  # (nSt, TM)
    return jnp.sum(d * w) / jnp.maximum(jnp.sum(w), 1.0)


def _pages_kabsch(src: Array, tgt: Array, w: Array) -> Array:
    """Weighted Kabsch on (nSt, 3, TM) pages (icp_point_to_point.cpp:112-159)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    c_src = jnp.einsum("sct,st->c", src, w) / wsum
    c_tgt = jnp.einsum("sct,st->c", tgt, w) / wsum
    src0 = (src - c_src[None, :, None]) * w[:, None, :]
    tgt0 = tgt - c_tgt[None, :, None]
    H = jnp.einsum("sct,sdt->cd", src0, tgt0)
    U, _, Vh = jnp.linalg.svd(H, full_matrices=True)
    V = Vh.T
    R0 = V @ U.T
    det = jnp.linalg.det(R0)
    V_fixed = V.at[:, 2].multiply(jnp.where(det < 0, -1.0, 1.0))
    R = V_fixed @ U.T
    t = c_tgt - R @ c_src
    return geometry.make_T(R.astype(src.dtype), t.astype(src.dtype))


class _PState(NamedTuple):
    i: Array
    T: Array
    pts: Array  # (nSt, 3, TM) current transformed source (rebased frame)
    corr: Array  # (nSt, 3, TM) matched target coords (rebased frame)
    alive: Array  # (nSt, TM) f32 weights
    last_error: Array
    error: Array
    done: Array
    pair_src: Array  # (max_pairs,) current tile-pair list
    pair_tgt: Array
    n_pairs: Array
    #: upper bound on point displacement since the pair list was built;
    #: past `reassoc_margin` the list may miss true neighbours -> rebuild
    moved: Array
    pair_overflow: Array
    #: (num_iterations,) per-iteration error (printStepDebug trace)
    err_trace: Array


def _pages_bboxes(pages: Array, mask_pages: Array):
    """tile_bboxes over (nSt, 3, TM) pages (invalid entries excluded)."""
    m = mask_pages[:, None, :]
    big = jnp.asarray(jnp.inf, pages.dtype)
    lo = jnp.min(jnp.where(m, pages, big), axis=2)  # (nSt, 3)
    hi = jnp.max(jnp.where(m, pages, -big), axis=2)
    return lo, hi


def _step_displacement_bound(T_step: Array, rho: Array) -> Array:
    """Max displacement of any point within radius `rho` of the origin
    under the rigid step: ||t|| + 2 sin(theta/2) * rho."""
    R = T_step[:3, :3]
    cos_theta = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    half = jnp.sqrt(jnp.maximum(0.5 * (1.0 - cos_theta), 0.0))  # sin(theta/2)
    return jnp.linalg.norm(T_step[:3, 3]) + 2.0 * half * rho


def _icp_pallas(source, source_mask, target, target_mask, initial_T, config,
                interpret, axis_name=None):
    """Pages-native loop; no lax.cond in the steady-state body path.

    The tile-pair list is built with the gate radius dilated by
    `reassoc_margin` and reused across re-associations. A MOVEMENT GUARD
    tracks an upper bound on accumulated point displacement and rebuilds
    the list once it could exceed the margin — metre-scale alignments
    (the rescue ICP ladder, localization_node.cpp:222-241, gate sqrt(5),
    80 iterations) stay exact instead of silently missing neighbours.
    Fine ICP (cm steps) never triggers the rebuild.

    `axis_name` (map-sharded mode, parallel/map_shard.py): when set, this
    function runs inside `shard_map` with `target`/`target_mask` being the
    LOCAL map shard and everything else replicated. Each device associates
    against its shard with the production kernel; winners are min-combined
    over the mesh axis (tiny (nSt, 4, TM) all_gather riding ICI), so the
    loop state stays replicated and the Kabsch/error math is unchanged.
    Per-point d2 values are bit-identical to the single-device sweep —
    each distance depends only on its point pair — so the combined result
    equals running against the full map (up to distance ties)."""
    center = initial_T[:3, 3]
    TM, TN = config.tile_src, config.tile_tgt
    nSt = source.shape[0] // TM
    gate = config.max_correspondence_dist_sq

    pts0_flat = geometry.transform_points(initial_T, source)
    search_r2 = (math.sqrt(gate) + config.reassoc_margin) ** 2
    max_pairs = nSt * config.max_pairs_factor
    # target bboxes are fixed; cache them (original frame) for rebuilds
    from slam_sensor_fusion_tpu.ops.morton import tile_bboxes
    from slam_sensor_fusion_tpu.ops.nn_gated import pair_tiles

    lo_t, hi_t, _ = tile_bboxes(target, target_mask, TN)

    def build_pairs(lo_s, hi_s, cnt_s):
        visits, counts, v_ovf = pair_tiles(
            lo_s, hi_s, cnt_s, lo_t, hi_t, search_r2, config.max_visits
        )
        p_src, p_tgt, n_p = _build_pair_list(visits, counts, max_pairs)
        return p_src, p_tgt, n_p, v_ovf | (jnp.sum(counts) > max_pairs)

    lo_s0, hi_s0, cnt_s0 = tile_bboxes(pts0_flat, source_mask, TM)
    pair_src, pair_tgt, n_pairs, pair_overflow = build_pairs(
        lo_s0, hi_s0, cnt_s0
    )
    tgt_pages = make_pages(target, target_mask, center, TN)
    pts0 = make_pages(pts0_flat, source_mask, center, TM)
    smask_pages = source_mask.reshape(nSt, TM)
    cnt_pages = jnp.sum(smask_pages.astype(jnp.int32), axis=1)
    # working radius for the displacement bound (rebased frame)
    rho = jnp.sqrt(
        jnp.maximum(
            jnp.max(
                jnp.where(
                    source_mask,
                    jnp.sum((pts0_flat - center[None, :]) ** 2, axis=-1),
                    0.0,
                )
            ),
            0.0,
        )
    )

    def associate(pts_pages, alive_w, p_src, p_tgt, n_p):
        d2, _, xyz_pages = pair_nn(
            pts_pages, tgt_pages, p_src, p_tgt, n_p, interpret
        )
        if axis_name is not None:
            # min-combine the per-shard winners over the map axis: gather
            # (d2, xyz) — (n_shards, nSt, 4, TM) floats total, a few
            # hundred KB — and take the closest shard's match per point
            d2_all = jax.lax.all_gather(d2, axis_name)  # (n, nSt, 1, TM)
            xyz_all = jax.lax.all_gather(xyz_pages, axis_name)
            win = jnp.argmin(d2_all, axis=0)  # (nSt, 1, TM)
            d2 = jnp.take_along_axis(d2_all, win[None], axis=0)[0]
            xyz_pages = jnp.take_along_axis(
                xyz_all, jnp.broadcast_to(win[None], (1,) + xyz_all.shape[1:]),
                axis=0,
            )[0]
        d2 = d2[:, 0, :]  # (nSt, TM)
        new_alive = alive_w * (d2 < gate).astype(jnp.float32)
        return d2, xyz_pages, new_alive

    alive_init = smask_pages.astype(jnp.float32)
    d2_0, corr0, alive0 = associate(
        pts0, alive_init, pair_src, pair_tgt, n_pairs
    )
    n_corr0 = jnp.sum(alive0).astype(jnp.int32)
    enough = n_corr0 >= config.min_correspondences

    def cond(s: _PState) -> Array:
        return (s.i < config.num_iterations) & ~s.done

    def body(s: _PState) -> _PState:
        # movement guard: past the margin, the dilated list may miss true
        # neighbours; rebuild from the CURRENT point positions
        def rebuild():
            lo_r, hi_r = _pages_bboxes(s.pts, smask_pages)
            p_src, p_tgt, n_p, ovf = build_pairs(
                lo_r + center[None, :], hi_r + center[None, :], cnt_pages
            )
            return p_src, p_tgt, n_p, ovf, jnp.float32(0.0)

        pair_src_c, pair_tgt_c, n_pairs_c, ovf_c, moved_c = jax.lax.cond(
            s.moved > config.reassoc_margin,
            rebuild,
            lambda: (s.pair_src, s.pair_tgt, s.n_pairs,
                     jnp.bool_(False), s.moved),
        )

        error = _pages_masked_mean_error(s.pts, s.corr, s.alive)
        hit = error < config.acceptable_mean_error
        need = (~hit) & (
            jnp.abs(s.last_error - error) < config.transformation_epsilon
        )
        # unconditional association (the kernel costs ~20 us) + select —
        # semantically identical to the reference's lazy re-association
        _, corr_new, alive_new = associate(
            s.pts, s.alive, pair_src_c, pair_tgt_c, n_pairs_c
        )
        corr_new = jnp.where(alive_new[:, None, :] > 0, corr_new, s.corr)
        corr = jnp.where(need, corr_new, s.corr)
        alive = jnp.where(need, alive_new, s.alive)

        T_step = _pages_kabsch(s.pts, corr, alive)
        T_new = jnp.where(hit, s.T, T_step @ s.T)
        pts_new = jnp.where(hit, s.pts, _pages_transform(T_step, s.pts))
        moved_new = moved_c + jnp.where(
            hit, 0.0, _step_displacement_bound(T_step, rho)
        )
        return _PState(
            i=jnp.where(hit, s.i, s.i + 1),
            T=T_new,
            pts=pts_new,
            corr=corr,
            alive=alive,
            last_error=error,
            error=error,
            done=hit,
            pair_src=pair_src_c,
            pair_tgt=pair_tgt_c,
            n_pairs=n_pairs_c,
            moved=moved_new,
            pair_overflow=s.pair_overflow | ovf_c,
            err_trace=s.err_trace.at[s.i].set(error),
        )

    # NOTE: the rebased frame shifts translations by `center`; run the
    # composition in the original frame by conjugation at the end.
    shift = geometry.make_T(jnp.eye(3, dtype=jnp.float32), center)
    unshift = geometry.make_T(jnp.eye(3, dtype=jnp.float32), -center)
    T_init_rebased = unshift @ initial_T

    init = _PState(
        i=jnp.int32(0),
        T=T_init_rebased,
        pts=pts0,
        corr=corr0,
        alive=alive0,
        last_error=jnp.float32(_F32_MAX),
        error=jnp.float32(_F32_MAX),
        done=~enough,
        pair_src=pair_src,
        pair_tgt=pair_tgt,
        n_pairs=n_pairs,
        moved=jnp.float32(0.0),
        pair_overflow=pair_overflow,
        err_trace=jnp.full(config.num_iterations, jnp.nan, jnp.float32),
    )
    final = jax.lax.while_loop(cond, body, init)
    final_T = shift @ final.T
    final_overflow = final.pair_overflow
    if axis_name is not None:
        # per-shard pair lists can overflow independently; any shard's
        # truncation makes the combined correspondence set suspect
        final_overflow = jnp.any(jax.lax.all_gather(final_overflow, axis_name))
    return _result(
        enough, final_T, final.last_error, final.i, n_corr0, initial_T, config,
        pair_overflow=final_overflow,
        error_trace=final.err_trace,
    )


# ---------------------------------------------------------------------------
# Dense / XLA-gated path ((M, 3) layout, lax.cond re-association)
# ---------------------------------------------------------------------------


class _State(NamedTuple):
    i: Array
    T: Array
    pts: Array  # (M, 3) current transformed source points
    corr: Array  # (M, 3) matched target coordinates
    alive: Array  # (M,) bool
    last_error: Array
    error: Array
    done: Array
    #: (num_iterations,) per-iteration error (printStepDebug trace)
    err_trace: Array


def _masked_mean_error(pts: Array, corr: Array, alive: Array) -> Array:
    d = jnp.linalg.norm(pts - corr, axis=-1)
    w = alive.astype(jnp.float32)
    return jnp.sum(d * w) / jnp.maximum(jnp.sum(w), 1.0)


def _icp_xla(source, source_mask, target, target_mask, initial_T, config, use_gated):
    center = initial_T[:3, 3]
    pts0 = geometry.transform_points(initial_T, source)

    def associate(pts, mask):
        if use_gated:
            res = gated_nn(
                pts,
                mask,
                target,
                target_mask,
                center,
                config.max_correspondence_dist_sq,
                config.tile_src,
                config.tile_tgt,
                config.max_visits,
            )
            return res.d2, res.idx, res.visit_overflow
        d2, idx = nearest_neighbor(pts, mask, target, target_mask, center)
        return d2, idx, jnp.bool_(False)

    d2, idx, pair_overflow = associate(pts0, source_mask)
    alive0 = source_mask & (d2 < config.max_correspondence_dist_sq)
    corr0 = jnp.take(target, idx, axis=0)
    n_corr0 = jnp.sum(alive0.astype(jnp.int32))
    enough = n_corr0 >= config.min_correspondences

    def reassociate(pts, corr, alive):
        d2n, idxn, _ = associate(pts, alive)
        new_alive = alive & (d2n < config.max_correspondence_dist_sq)
        new_corr = jnp.where(
            new_alive[:, None], jnp.take(target, idxn, axis=0), corr
        )
        return new_corr, new_alive

    def cond(s: _State) -> Array:
        return (s.i < config.num_iterations) & ~s.done

    def body(s: _State) -> _State:
        error = _masked_mean_error(s.pts, s.corr, s.alive)
        hit_acceptable = error < config.acceptable_mean_error
        trace = s.err_trace.at[s.i].set(error)

        def after_accept(s=s, error=error, trace=trace):
            return _State(
                s.i, s.T, s.pts, s.corr, s.alive, error, error,
                jnp.bool_(True), trace,
            )

        def take_step(s=s, error=error, trace=trace):
            need_reassoc = (
                jnp.abs(s.last_error - error) < config.transformation_epsilon
            )
            corr, alive = jax.lax.cond(
                need_reassoc,
                lambda: reassociate(s.pts, s.corr, s.alive),
                lambda: (s.corr, s.alive),
            )
            T_step = geometry.kabsch(s.pts, corr, alive.astype(jnp.float32))
            T_new = T_step @ s.T
            pts_new = geometry.transform_points(T_step, s.pts)
            return _State(
                s.i + 1, T_new, pts_new, corr, alive, error, error,
                jnp.bool_(False), trace,
            )

        return jax.lax.cond(hit_acceptable, after_accept, take_step)

    init = _State(
        i=jnp.int32(0),
        T=initial_T,
        pts=pts0,
        corr=corr0,
        alive=alive0,
        last_error=jnp.float32(_F32_MAX),
        error=jnp.float32(_F32_MAX),
        done=~enough,
        err_trace=jnp.full(config.num_iterations, jnp.nan, jnp.float32),
    )
    final = jax.lax.while_loop(cond, body, init)
    return _result(
        enough, final.T, final.last_error, final.i, n_corr0, initial_T, config,
        pair_overflow=pair_overflow,
        error_trace=final.err_trace,
    )


@functools.partial(jax.jit, static_argnames=("config",))
def icp_align(
    source: Array,
    source_mask: Array,
    target: Array,
    target_mask: Array,
    initial_T: Array,
    config: ICPConfig = ICPConfig(),
) -> ICPResult:
    """Align ``source`` onto ``target`` starting from ``initial_T``.

    Args:
      source: (M, 3) padded source points (the cropped scan), ideally in a
        spatially coherent order (host Morton pre-sort).
      source_mask: (M,) validity mask.
      target: (N, 3) padded target points (the cropped map), Morton-sorted
        by the map re-crop.
      target_mask: (N,) validity mask.
      initial_T: (4, 4) prior map_T_sensor.
      config: ICPConfig (static).
    """
    # tile culling needs capacities divisible by the tile sizes; fall back
    # to the dense sweep otherwise (static decision at trace time)
    use_gated = (
        config.gated
        and source.shape[0] % config.tile_src == 0
        and target.shape[0] % config.tile_tgt == 0
    )
    # NB: prefer device_kind detection — tunnelled TPU platforms may alias
    # the platform name
    on_tpu = any("TPU" in d.device_kind for d in jax.devices())
    if use_gated and config.nn_backend == "pallas" and (
        on_tpu or config.pallas_interpret
    ):
        return _icp_pallas(
            source,
            source_mask,
            target,
            target_mask,
            initial_T,
            config,
            interpret=not on_tpu,
        )
    return _icp_xla(
        source, source_mask, target, target_mask, initial_T, config, use_gated
    )
