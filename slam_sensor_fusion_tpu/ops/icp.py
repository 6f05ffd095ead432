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
* Kabsch/SVD step on the masked correspondences (:112-159) via
  geometry.kabsch; left-composition T = T_step @ T (:228);
* has_converged = final error < acceptable_mean_error (:252).

The correspondence threshold is applied to SQUARED distances, matching the
PCL convention the reference (perhaps unknowingly) relies on
(icp_point_to_point.cpp:70).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_sensor_fusion_tpu.ops import geometry
from slam_sensor_fusion_tpu.ops.nn import nearest_neighbor
from slam_sensor_fusion_tpu.ops.nn_gated import gated_nn
from slam_sensor_fusion_tpu.ops.nn_pallas import gated_nn_pallas
from slam_sensor_fusion_tpu.utils.config import ICPConfig

Array = jax.Array

_F32_MAX = float(jnp.finfo(jnp.float32).max)


class ICPResult(NamedTuple):
    """Mirror of the reference's ICPResult (icp_point_to_point.h:28-39)."""

    transformation: Array  # (4, 4)
    error: Array  # () mean correspondence error [m]
    iterations: Array  # () int32
    has_converged: Array  # () bool
    n_correspondences: Array  # () int32 (extra observability)


class _State(NamedTuple):
    i: Array
    T: Array
    pts: Array  # (M, 3) current transformed source points
    corr: Array  # (M, 3) matched target coordinates
    alive: Array  # (M,) bool
    last_error: Array
    error: Array
    done: Array


def _masked_mean_error(pts: Array, corr: Array, alive: Array) -> Array:
    """Mean Euclidean (not squared) error over matched rows
    (icp_point_to_point.cpp:161-170)."""
    d = jnp.linalg.norm(pts - corr, axis=-1)
    w = alive.astype(jnp.float32)
    return jnp.sum(d * w) / jnp.maximum(jnp.sum(w), 1.0)


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
      source: (M, 3) padded source points (the cropped scan).
      source_mask: (M,) validity mask.
      target: (N, 3) padded target points (the cropped map).
      target_mask: (N,) validity mask.
      initial_T: (4, 4) prior map_T_sensor.
      config: ICPConfig (static).

    Returns:
      ICPResult with the refined transform.
    """
    center = initial_T[:3, 3]

    pts0 = geometry.transform_points(initial_T, source)

    # tile culling needs capacities divisible by the tile sizes; fall back
    # to the dense sweep otherwise (static decision at trace time).
    # Spatial coherence of the source order is the CALLER's job (host
    # Morton pre-sort / sorted map crops) — culling is exact regardless,
    # only tile tightness varies.
    use_gated = (
        config.gated
        and source.shape[0] % config.tile_src == 0
        and target.shape[0] % config.tile_tgt == 0
    )
    use_pallas = use_gated and (
        config.nn_backend == "pallas" and jax.default_backend() == "tpu"
    )
    config = dataclasses.replace(config, gated=use_gated)

    def associate(pts, mask):
        if config.gated and use_pallas:
            res = gated_nn_pallas(
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
            return res.d2, res.idx
        if config.gated:
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
            return res.d2, res.idx
        return nearest_neighbor(pts, mask, target, target_mask, center)

    d2, idx = associate(pts0, source_mask)
    alive0 = source_mask & (d2 < config.max_correspondence_dist_sq)
    corr0 = jnp.take(target, idx, axis=0)
    n_corr0 = jnp.sum(alive0.astype(jnp.int32))
    enough = n_corr0 >= config.min_correspondences

    def reassociate(pts, corr, alive):
        d2n, idxn = associate(pts, alive)
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

        def after_accept(s=s, error=error):
            # break: record error as last_error, stop
            return _State(
                s.i, s.T, s.pts, s.corr, s.alive, error, error, jnp.bool_(True)
            )

        def take_step(s=s, error=error):
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
                s.i + 1, T_new, pts_new, corr, alive, error, error, jnp.bool_(False)
            )

        return jax.lax.cond(hit_acceptable, after_accept, take_step)

    init = _State(
        i=jnp.int32(0),
        T=initial_T,
        pts=pts0,
        corr=corr0,
        alive=alive0,
        last_error=_F32_MAX,
        error=_F32_MAX,
        done=~enough,
    )
    final = jax.lax.while_loop(cond, body, init)

    # iterations counter: the reference counts completed step iterations
    # (icp_point_to_point.cpp:234); the early-exit path does not increment.
    error_out = jnp.where(enough, final.last_error, jnp.float32(1e6))
    T_out = jnp.where(enough, final.T, initial_T)
    return ICPResult(
        transformation=T_out,
        error=error_out,
        iterations=jnp.where(enough, final.i, 0),
        has_converged=enough & (error_out < config.acceptable_mean_error),
        n_correspondences=n_corr0,
    )
