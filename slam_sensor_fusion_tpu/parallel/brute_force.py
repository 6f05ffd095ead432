"""Brute-force first fix sharded over the candidate grid.

The 4-DoF candidate sweep (ops/brute_force.py) is the reference's most
compute-intense moment (SURVEY.md §3.4: ~52k kd-tree sweeps in nested
loops). On a multi-chip mesh we split the candidate axis across devices
with `shard_map`: each device scores a contiguous slice of the enumeration
order against the (replicated) clouds, finds its local first-hit and best
candidates, and a single all-gather reduces the winners — preserving the
sequential "first candidate in enumeration order under threshold"
semantics exactly, because candidate slices are contiguous and ordered by
device index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from slam_sensor_fusion_tpu.ops import geometry
from slam_sensor_fusion_tpu.ops.brute_force import (
    BruteForceResult,
    _chunk_scores,
    candidate_grid,
)
from slam_sensor_fusion_tpu.utils.config import BruteForceConfig

Array = jax.Array

_BIG = jnp.float32(3.0e38)
_IBIG = jnp.int32(2**30)


@functools.partial(
    jax.jit, static_argnames=("config", "mesh", "axis", "target_chunk")
)
def sharded_brute_force_align(
    source: Array,
    source_mask: Array,
    target: Array,
    target_mask: Array,
    guess: Array,
    config: BruteForceConfig,
    mesh: Mesh,
    axis: str = "dp",
    target_chunk: int = 2048,
) -> BruteForceResult:
    """Candidate-parallel sweep; equivalent to ops.brute_force_align.

    Trades the single-chip early exit for full-width parallel scoring —
    with N devices each scoring C/N candidates in one shot, the whole grid
    costs less wall-clock than the sequential chunks it replaces.
    """
    n_dev = mesh.shape[axis]
    offs_np, yaws_np = candidate_grid(config)
    C = offs_np.shape[0]
    per = -(-C // n_dev)
    pad = per * n_dev - C
    if pad:
        offs_np = np.concatenate([offs_np, np.repeat(offs_np[-1:], pad, 0)])
        yaws_np = np.concatenate([yaws_np, np.repeat(yaws_np[-1:], pad, 0)])
    offsets = jnp.asarray(offs_np)
    yaws = jnp.asarray(yaws_np)
    center = guess[:3, 3]

    def device_fn(offs_shard, yaws_shard):
        # contiguous slice of the enumeration order for this device
        dev = jax.lax.axis_index(axis)
        scores = _chunk_scores(
            guess,
            offs_shard,
            yaws_shard,
            source,
            source_mask,
            target,
            target_mask,
            center,
            target_chunk,
        )
        hits = scores < config.mean_error_threshold
        first_local = jnp.argmax(hits)
        has_hit = jnp.any(hits)
        hit_global = jnp.where(has_hit, dev * per + first_local, _IBIG)
        best_local = jnp.argmin(scores)
        best_global = dev * per + best_local
        best_score = scores[best_local]
        # gather the 4 winner stats from every device
        packed = jnp.stack(
            [
                hit_global.astype(jnp.float32),
                best_score,
                best_global.astype(jnp.float32),
                jnp.where(has_hit, scores[first_local], _BIG),
            ]
        )
        return jax.lax.all_gather(packed, axis)  # (n_dev, 4)

    stats = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        # the scan carry inside _chunk_scores starts replicated and becomes
        # device-varying; skip the varying-manual-axes check
        check_vma=False,
    )(offsets.reshape(n_dev * per, 3), yaws)

    hit_idx_all = stats[:, 0].astype(jnp.int32)
    best_scores = stats[:, 1]
    best_idx_all = stats[:, 2].astype(jnp.int32)
    hit_scores = stats[:, 3]

    found = jnp.any(hit_idx_all < _IBIG)
    first_dev = jnp.argmin(hit_idx_all)  # earliest hit in enumeration order
    hit_idx = hit_idx_all[first_dev]
    best_dev = jnp.argmin(best_scores)
    best_idx = best_idx_all[best_dev]

    idx = jnp.where(found, hit_idx, best_idx)
    idx = jnp.clip(idx, 0, offsets.shape[0] - 1)
    T = guess @ geometry.make_T(geometry.rot_z(yaws[idx]), offsets[idx])
    score = jnp.where(found, hit_scores[first_dev], best_scores[best_dev])
    return BruteForceResult(success=found, transformation=T, score=score)
