"""4-DoF brute-force global alignment as a data-parallel candidate sweep.

Rebuild of BruteForceAlignment (brute_force_alignment.cpp). The reference
runs a 4-nested loop over (x, y, z, yaw) perturbations of an initial guess,
scoring each candidate by the mean kd-tree NN distance of every source
point, with a sequential early-exit on the first candidate under the
threshold (:79-123).

TPU-first formulation: the candidate grid is enumerated ONCE in the exact
nesting order of the reference (outward-expanding sequences including the
duplicated 0 entry, :148-180), scores for a whole chunk of candidates are
computed as one batched matmul + masked min-reduction, and the sequential
early-exit becomes "first index whose score beats the threshold" — combined
with a `lax.while_loop` over chunks so a hit near the guess (the common
case) stops the sweep early, exactly like the reference's `return`.

Scores are mean SQUARED NN distance (PCL nearestKSearch returns squared
distances, :102-103), so the default threshold 0.1 means ~0.32 m RMS.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_sensor_fusion_tpu.ops import geometry
from slam_sensor_fusion_tpu.utils.config import BruteForceConfig

Array = jax.Array

_BIG = np.float32(3.0e38)


def _outward_sequence(rng: float, step: float) -> np.ndarray:
    """0, -0, -s, s, -2s, 2s, ... exactly like createTestTransformSequences
    (brute_force_alignment.cpp:160-179), duplicated zero included."""
    vals = []
    i = 0
    while i < rng / (2.0 * step) + 1.0:
        vals.append(-i * step)
        vals.append(i * step)
        i += 1
    return np.asarray(vals, dtype=np.float32)


@functools.lru_cache(maxsize=8)
def candidate_grid(config: BruteForceConfig) -> tuple[np.ndarray, np.ndarray]:
    """All candidate (offset, yaw) pairs in the reference's nesting order
    (x outermost ... yaw innermost, brute_force_alignment.cpp:80-87).

    Returns (offsets (C, 3) f32, yaws (C,) f32) as host arrays.
    """
    xs = _outward_sequence(config.x_range, config.x_step)
    ys = _outward_sequence(config.y_range, config.y_step)
    zs = _outward_sequence(config.z_range, config.z_step)
    yaws = _outward_sequence(config.yaw_range, config.yaw_step)
    X, Y, Z, W = np.meshgrid(xs, ys, zs, yaws, indexing="ij")
    offsets = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1)
    return offsets.astype(np.float32), W.ravel().astype(np.float32)


class BruteForceResult(NamedTuple):
    success: Array  # () bool: some candidate beat the threshold
    transformation: Array  # (4, 4): first hit if success, else best-so-far
    score: Array  # () the corresponding mean squared NN distance


def _chunk_scores(
    guess: Array,
    offsets: Array,  # (K, 3)
    yaws: Array,  # (K,)
    source: Array,  # (M, 3)
    source_mask: Array,
    target: Array,  # (N, 3)
    target_mask: Array,
    center: Array,
    chunk_n: int,
) -> Array:
    """Mean squared NN distance for K candidate transforms at once."""
    K, M = offsets.shape[0], source.shape[0]
    cand_T = guess @ geometry.make_T(geometry.rot_z(yaws), offsets)  # (K,4,4)
    pts = geometry.transform_points(cand_T, source[None, :, :])  # (K,M,3)
    flat = (pts - center[None, None, :]).reshape(K * M, 3)
    tgt = target - center[None, :]

    n_chunks = -(-target.shape[0] // chunk_n)
    pad = n_chunks * chunk_n - target.shape[0]
    if pad:
        tgt = jnp.concatenate([tgt, jnp.zeros((pad, 3), jnp.float32)])
        target_mask = jnp.concatenate([target_mask, jnp.zeros((pad,), bool)])
    t_tiles = tgt.reshape(n_chunks, chunk_n, 3)
    m_tiles = target_mask.reshape(n_chunks, chunk_n)

    s_norm = jnp.sum(flat * flat, axis=-1)

    def step(best, tile):
        t, m = tile
        cross = jax.lax.dot_general(
            flat,
            t.T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d2 = s_norm[:, None] - 2.0 * cross + jnp.sum(t * t, axis=-1)[None, :]
        d2 = jnp.where(m[None, :], d2, _BIG)
        return jnp.minimum(best, jnp.min(d2, axis=1)), None

    best, _ = jax.lax.scan(step, jnp.full((K * M,), _BIG, jnp.float32), (t_tiles, m_tiles))
    best = jnp.maximum(best, 0.0).reshape(K, M)
    w = source_mask.astype(jnp.float32)[None, :]
    return jnp.sum(best * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)


@functools.partial(
    jax.jit, static_argnames=("config", "candidate_chunk", "target_chunk")
)
def brute_force_align(
    source: Array,
    source_mask: Array,
    target: Array,
    target_mask: Array,
    guess: Array,
    config: BruteForceConfig = BruteForceConfig(),
    candidate_chunk: int = 54,
    target_chunk: int = 2048,
) -> BruteForceResult:
    """Sweep the candidate grid; stop at the first chunk containing a hit.

    Equivalent to BruteForceAlignment::alignClouds (:65-136): on success the
    returned transform is the first candidate (in enumeration order) whose
    score < mean_error_threshold; on failure it is the best-scoring
    candidate, which the caller should use as the rescue-ICP initial guess
    and as the next attempt's search centre (localization_node.cpp:225,
    brute_force_alignment.cpp:125-126,143-146).
    """
    offs_np, yaws_np = candidate_grid(config)
    C = offs_np.shape[0]
    n_chunks = -(-C // candidate_chunk)
    pad = n_chunks * candidate_chunk - C
    if pad:
        # padded candidates duplicate the last entry; they can never win the
        # "first hit" selection because real hits come earlier in order, and
        # for argmin ties the earlier index wins.
        offs_np = np.concatenate([offs_np, np.repeat(offs_np[-1:], pad, 0)])
        yaws_np = np.concatenate([yaws_np, np.repeat(yaws_np[-1:], pad, 0)])
    offsets = jnp.asarray(offs_np).reshape(n_chunks, candidate_chunk, 3)
    yaws = jnp.asarray(yaws_np).reshape(n_chunks, candidate_chunk)

    center = guess[:3, 3]

    class _S(NamedTuple):
        j: Array
        found: Array
        hit_idx: Array  # global candidate index of first hit
        best_idx: Array
        best_score: Array
        hit_score: Array

    def cond(s: _S) -> Array:
        return (s.j < n_chunks) & ~s.found

    def body(s: _S) -> _S:
        scores = _chunk_scores(
            guess,
            offsets[s.j],
            yaws[s.j],
            source,
            source_mask,
            target,
            target_mask,
            center,
            target_chunk,
        )
        hits = scores < config.mean_error_threshold
        any_hit = jnp.any(hits)
        first = jnp.argmax(hits)  # first True in chunk order
        hit_idx = s.j * candidate_chunk + first
        cmin = jnp.argmin(scores)
        better = scores[cmin] < s.best_score
        return _S(
            j=s.j + 1,
            found=any_hit,
            hit_idx=jnp.where(any_hit, hit_idx, s.hit_idx),
            best_idx=jnp.where(better, s.j * candidate_chunk + cmin, s.best_idx),
            best_score=jnp.where(better, scores[cmin], s.best_score),
            hit_score=jnp.where(any_hit, scores[first], s.hit_score),
        )

    init = _S(
        j=jnp.int32(0),
        found=jnp.bool_(False),
        hit_idx=jnp.int32(0),
        best_idx=jnp.int32(0),
        best_score=_BIG,
        hit_score=_BIG,
    )
    s = jax.lax.while_loop(cond, body, init)

    all_offs = jnp.asarray(offs_np)
    all_yaws = jnp.asarray(yaws_np)
    idx = jnp.where(s.found, s.hit_idx, s.best_idx)
    T = guess @ geometry.make_T(geometry.rot_z(all_yaws[idx]), all_offs[idx])
    return BruteForceResult(
        success=s.found,
        transformation=T,
        score=jnp.where(s.found, s.hit_score, s.best_score),
    )
