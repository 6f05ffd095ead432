"""Stochastic outlier gate on fused pose priors.

Functional rebuild of StochasticFilter (stochastic_filter.cpp). The C++
class keeps a mutable queue of the last `queue_size` relative pose
transitions; here that queue is a fixed-shape pytree carried through the
pipeline's `lax.scan`, and every update is a pure function.

Replicated semantics (including the reference's quirks):

* weights w_i = exp(i - queue_size), normalized; queue index 0 is the
  OLDEST transition (stochastic_filter.cpp:14-26, erase-front/push-back
  at :44-55) so newer transitions weigh more;
* transitions are previous_prior^-1 @ current_prior (:52) — the filter is
  fed the fused PRIOR each scan (localization_node.cpp:331), while the
  z-score prediction is re-rooted at the POSTERIOR map_T_sensor;
* prediction for the z-score composes origin_pose_previous @ transition
  (:72) but the replacement mean pose composes transition @
  origin_pose_previous (:106) — an operand-order inconsistency in the
  reference that we reproduce for trajectory parity;
* per-axis weighted MEAN ABSOLUTE deviation (not std), clamped to
  [min_distance_per_scan, max_distance_per_scan / 3] (:80-87);
* z-score is 0 while the queue is not yet full (:60-63) — a mean over a
  partially filled queue is never used.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_sensor_fusion_tpu.ops.geometry import inv_T
from slam_sensor_fusion_tpu.utils.config import StochasticFilterConfig

Array = jax.Array


class FilterState(NamedTuple):
    """Carry for the transition queue."""

    transitions: Array  # (queue_size, 4, 4), index 0 oldest
    count: Array  # () int32, saturates at queue_size
    previous_pose: Array  # (4, 4) last pose added to the queue


def init_state(config: StochasticFilterConfig) -> FilterState:
    return FilterState(
        transitions=jnp.tile(jnp.eye(4, dtype=jnp.float32), (config.queue_size, 1, 1)),
        count=jnp.int32(0),
        previous_pose=jnp.eye(4, dtype=jnp.float32),
    )


def _weights(config: StochasticFilterConfig) -> Array:
    i = jnp.arange(config.queue_size, dtype=jnp.float32)
    w = jnp.exp(i - config.queue_size)
    return w / jnp.sum(w)


def add_pose(state: FilterState, pose: Array, config: StochasticFilterConfig) -> FilterState:
    """Push previous_pose^-1 @ pose, dropping the oldest transition
    (stochastic_filter.cpp:44-55)."""
    transition = inv_T(state.previous_pose) @ pose
    transitions = jnp.concatenate(
        [state.transitions[1:], transition[None]], axis=0
    )
    # while filling, the reference appends without dropping; emulate by
    # writing into slot `count` when not yet full
    not_full = state.count < config.queue_size

    def fill():
        return state.transitions.at[state.count].set(transition)

    transitions = jax.lax.cond(not_full, fill, lambda: transitions)
    count = jnp.minimum(state.count + 1, config.queue_size)
    return FilterState(transitions, count, pose)


def pose_z_score(
    state: FilterState,
    origin_pose_previous: Array,
    origin_pose_current: Array,
    config: StochasticFilterConfig,
) -> Array:
    """Max per-axis z-score of the current pose vs the queue's prediction
    (stochastic_filter.cpp:57-92)."""
    w = _weights(config)
    # predicted poses: previous @ transition_i (:72)
    preds = jnp.einsum("ij,qjk->qik", origin_pose_previous, state.transitions)
    xyz = preds[:, :3, 3]  # (q, 3)
    xyz_mean = jnp.sum(w[:, None] * xyz, axis=0)
    mad = jnp.sum(w[:, None] * jnp.abs(xyz - xyz_mean[None]), axis=0)
    mad = jnp.clip(mad, config.min_distance_per_scan, config.max_distance_per_scan / 3.0)
    z = jnp.abs(origin_pose_current[:3, 3] - xyz_mean) / mad
    z_max = jnp.max(z)
    return jnp.where(state.count < config.queue_size, 0.0, z_max)


def apply_gate(
    state: FilterState,
    origin_pose_previous: Array,
    origin_pose_current: Array,
    config: StochasticFilterConfig,
) -> Array:
    """Replace the pose by the weighted-mean prediction when gated
    (stochastic_filter.cpp:94-113). Note the transition @ previous
    composition order of :106 is intentional (reference quirk)."""
    z = pose_z_score(state, origin_pose_previous, origin_pose_current, config)
    w = _weights(config)
    mean_pose = jnp.einsum(
        "q,qij->ij",
        w,
        jnp.einsum("qij,jk->qik", state.transitions, origin_pose_previous),
    )
    return jnp.where(z > config.z_score_threshold, mean_pose, origin_pose_current)
