import dataclasses

import numpy as np
import jax.numpy as jnp

from slam_sensor_fusion_tpu.ops.brute_force import (
    brute_force_align,
    candidate_grid,
    _outward_sequence,
)
from slam_sensor_fusion_tpu.utils.config import BruteForceConfig
from oracles import brute_force_oracle, outward_sequence_oracle


SMALL = BruteForceConfig(
    x_step=0.2, y_step=0.2, z_step=0.1, x_range=0.8, y_range=0.8, z_range=0.2,
    yaw_step=np.pi / 18, yaw_range=np.pi / 9, mean_error_threshold=0.05,
)


def padded(pts, capacity):
    buf = np.zeros((capacity, 3), np.float32)
    buf[: len(pts)] = pts
    mask = np.zeros(capacity, bool)
    mask[: len(pts)] = True
    return jnp.asarray(buf), jnp.asarray(mask)


def test_outward_sequence_matches_reference():
    for rng_, step in [(1.5, 0.1), (0.1, 0.05), (np.pi / 6, np.pi / 18)]:
        got = _outward_sequence(rng_, step)
        want = outward_sequence_oracle(rng_, step)
        np.testing.assert_allclose(got, np.asarray(want, np.float32))


def test_candidate_count_default_config():
    offs, yaws = candidate_grid(BruteForceConfig())
    # x:18, y:18, z:4, yaw:6 (duplicated zeros included) -> 7776
    assert offs.shape == (7776, 3)
    assert yaws.shape == (7776,)


def test_finds_planted_offset(rng):
    # exact overlay at the true offset scores ~0; a tight threshold makes
    # the true candidate the only possible early-exit hit
    cfg = dataclasses.replace(SMALL, mean_error_threshold=1e-3)
    tgt = rng.uniform(-5, 5, size=(400, 3)).astype(np.float32)
    tgt[:, 2] = np.abs(tgt[:, 2])
    true_off = np.array([0.4, -0.2, 0.0], np.float32)
    src = tgt - true_off
    s, sm = padded(src, 512)
    t, tm = padded(tgt, 512)
    res = brute_force_align(s, sm, t, tm, jnp.eye(4), cfg, candidate_chunk=25)
    assert bool(res.success)
    np.testing.assert_allclose(
        np.asarray(res.transformation)[:3, 3], true_off, atol=1e-4
    )


def test_matches_sequential_oracle(rng):
    tgt = rng.uniform(-3, 3, size=(150, 3)).astype(np.float32)
    src = (tgt - np.array([0.35, 0.15, 0.05], np.float32)) + rng.normal(
        0, 0.02, tgt.shape
    ).astype(np.float32)
    guess = np.eye(4, dtype=np.float32)

    ok_ref, T_ref, score_ref = brute_force_oracle(
        src.astype(np.float64), tgt.astype(np.float64), guess.astype(np.float64), SMALL
    )

    s, sm = padded(src, 256)
    t, tm = padded(tgt, 256)
    res = brute_force_align(s, sm, t, tm, jnp.asarray(guess), SMALL, candidate_chunk=16)

    assert bool(res.success) == ok_ref
    np.testing.assert_allclose(np.asarray(res.transformation), T_ref, atol=1e-4)
    np.testing.assert_allclose(float(res.score), score_ref, rtol=1e-3)


def test_failure_returns_best_candidate(rng):
    # impossible threshold -> no hit; result must equal the global argmin
    cfg = dataclasses.replace(SMALL, mean_error_threshold=1e-9)
    tgt = rng.uniform(-3, 3, size=(100, 3)).astype(np.float32)
    src = tgt - np.array([0.4, 0.0, 0.0], np.float32) + rng.normal(
        0, 0.03, tgt.shape
    ).astype(np.float32)
    guess = np.eye(4, dtype=np.float32)

    ok_ref, T_ref, score_ref = brute_force_oracle(
        src.astype(np.float64), tgt.astype(np.float64), guess.astype(np.float64), cfg
    )
    s, sm = padded(src, 128)
    t, tm = padded(tgt, 128)
    res = brute_force_align(s, sm, t, tm, jnp.asarray(guess), cfg, candidate_chunk=16)
    assert not bool(res.success) and not ok_ref
    np.testing.assert_allclose(np.asarray(res.transformation), T_ref, atol=1e-4)
    np.testing.assert_allclose(float(res.score), score_ref, rtol=1e-3)


def test_early_exit_first_hit_in_order(rng):
    # loose threshold: many candidates qualify; the sequential reference
    # returns the FIRST in nesting order — ours must match it exactly
    cfg = dataclasses.replace(SMALL, mean_error_threshold=0.5)
    tgt = rng.uniform(-3, 3, size=(120, 3)).astype(np.float32)
    src = tgt - np.array([0.1, -0.1, 0.0], np.float32)
    guess = np.eye(4, dtype=np.float32)
    ok_ref, T_ref, _ = brute_force_oracle(
        src.astype(np.float64), tgt.astype(np.float64), guess.astype(np.float64), cfg
    )
    s, sm = padded(src, 128)
    t, tm = padded(tgt, 128)
    res = brute_force_align(s, sm, t, tm, jnp.asarray(guess), cfg, candidate_chunk=7)
    assert bool(res.success) and ok_ref
    np.testing.assert_allclose(np.asarray(res.transformation), T_ref, atol=1e-4)
