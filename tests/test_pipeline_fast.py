"""Tests for the superblock fast pipeline (models/pipeline_fast.py).

Coverage:
* icp_align_fused_paged is bit-identical to icp_align_fused when fed the
  same pages/pair list (the paged entry is the same kernel minus the
  prologue);
* build_paged_frames reproduces the device preprocessing (subsample ->
  crop -> Morton sort -> pages) exactly;
* the end-to-end fast pipeline localizes a synthetic sequence through
  Localizer.run (CPU interpret kernels), including re-crops, invalid
  frames and the overflow observability contract.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from slam_sensor_fusion_tpu.models.localization import Localizer
from slam_sensor_fusion_tpu.models import pipeline_fast as pf
from slam_sensor_fusion_tpu.ops import morton
from slam_sensor_fusion_tpu.ops.icp_fused import (
    build_cached_target,
    icp_align_fused,
    icp_align_fused_paged,
)
from slam_sensor_fusion_tpu.ops.nn_gated import build_visit_lists
from slam_sensor_fusion_tpu.ops.nn_pallas import _build_pair_list, make_pages
from slam_sensor_fusion_tpu.utils.config import ICPConfig, LocalizationConfig
from tests.test_pipeline import TEST_CONFIG, ate_rmse, build_world_and_sequence

FAST_CONFIG = dataclasses.replace(
    TEST_CONFIG,
    icp=dataclasses.replace(ICPConfig(), mode="fast"),
    superstep=4,
)


def _cloud_pair(rng, n_src=512, n_tgt=1024):
    tgt = rng.uniform(-8, 8, (n_tgt, 3)).astype(np.float32)
    src = tgt[rng.choice(n_tgt, n_src, replace=False)] + rng.normal(
        0, 0.02, (n_src, 3)
    ).astype(np.float32)
    src = morton.sort_points_numpy(src)
    tgt = morton.sort_points_numpy(tgt)
    return src, tgt


def test_paged_entry_matches_unpaged(rng):
    cfg = dataclasses.replace(ICPConfig(), tile_src=256, tile_tgt=512)
    src, tgt = _cloud_pair(rng)
    sm = np.ones(len(src), bool)
    tm = np.ones(len(tgt), bool)
    yaw = 0.05
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, :3] = np.array(
        [
            [math.cos(yaw), -math.sin(yaw), 0],
            [math.sin(yaw), math.cos(yaw), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    T0[:3, 3] = [0.15, -0.1, 0.05]
    T0 = jnp.asarray(T0)
    s, smj, t, tmj = map(jnp.asarray, (src, sm, tgt, tm))

    ref = icp_align_fused(s, smj, t, tmj, T0, cfg, interpret=True)

    # reproduce the unpaged prologue by hand, then call the paged entry
    cached = build_cached_target(t, tmj, T0[:3, 3], cfg.tile_tgt)
    pts0 = np.asarray(jnp.einsum("ij,nj->ni", T0[:3, :3], s) + T0[:3, 3])
    search_r2 = (
        math.sqrt(cfg.max_correspondence_dist_sq) + cfg.reassoc_margin
    ) ** 2
    visits, counts, _ = build_visit_lists(
        jnp.asarray(pts0), smj, t, tmj, search_r2, cfg.tile_src, cfg.tile_tgt,
        cfg.max_visits,
    )
    nSt = len(src) // cfg.tile_src
    pair_src, pair_tgt, n_pairs = _build_pair_list(visits, counts, nSt * 8)
    src_pages = make_pages(
        s, smj, jnp.zeros(3, jnp.float32), cfg.tile_src, sentinel=1.0e7
    )
    got = icp_align_fused_paged(
        src_pages, pair_src, pair_tgt, n_pairs, T0, cached, cfg, interpret=True
    )

    np.testing.assert_allclose(
        np.asarray(got.transformation), np.asarray(ref.transformation),
        rtol=0, atol=1e-6,
    )
    assert int(got.n_correspondences) == int(ref.n_correspondences)
    assert float(got.error) == float(ref.error)


def test_build_paged_frames_matches_device_preprocess(rng):
    cfg = FAST_CONFIG
    scan = rng.uniform(-15, 15, (3000, 3)).astype(np.float32)
    frames = pf.build_paged_frames(
        cfg,
        [scan],
        np.eye(4, dtype=np.float32)[None],
        np.eye(4, dtype=np.float32)[None],
        np.array([0.05]),
        np.array([1.0]),
        np.array([True]),
    )
    # oracle: subsample in original order, crop, Morton sort
    sub = scan[:: cfg.scan_subsample_step]
    kept = sub[(sub * sub).sum(1) <= cfg.cloud_crop_radius ** 2]
    kept = morton.sort_points_numpy(kept)
    S = cfg.capacity.cropped_scan
    TM = cfg.icp.tile_src
    buf = np.full((S, 3), 1.0e7, np.float32)
    buf[: len(kept)] = kept
    expect_pages = buf.reshape(S // TM, TM, 3).transpose(0, 2, 1)
    np.testing.assert_array_equal(np.asarray(frames.src_pages[0]), expect_pages)
    assert int(frames.src_cnt[0].sum()) == len(kept)
    # bboxes cover exactly the valid rows
    n_tiles = S // TM
    for k in range(min(4, n_tiles)):
        c = int(frames.src_cnt[0, k])
        if c == 0:
            continue
        rows = buf[k * TM : k * TM + c]
        np.testing.assert_allclose(np.asarray(frames.src_lo[0, k]), rows.min(0))
        np.testing.assert_allclose(np.asarray(frames.src_hi[0, k]), rows.max(0))


def test_fast_pipeline_end_to_end():
    seq, map_data = build_world_and_sequence(n_frames=28, seed=3)
    loc = Localizer(map_data, FAST_CONFIG)
    res = loc.run(
        seq.scans,
        seq.odom_T_sensor,
        seq.gps_lat,
        seq.gps_lon,
        seq.gps_alt,
        seq.compass_yaw,
        seq.odom_cov_trace,
        seq.gps_cov_trace,
        chunk=8,
    )
    assert res.first_processed_frame == 0
    assert res.valid[5:].all()
    err = ate_rmse(res.map_T_sensor, seq.true_map_T_sensor, res.valid)
    assert err < 0.12, f"fast-pipeline ATE RMSE too high: {err}"
    assert (res.n_correspondences[res.valid] > 500).mean() > 0.9


def test_fast_pipeline_invalid_frames_are_noops():
    seq, map_data = build_world_and_sequence(n_frames=20, seed=5)
    seq.gps_alt[9:12] = -5.0
    loc = Localizer(map_data, FAST_CONFIG)
    res = loc.run(
        seq.scans,
        seq.odom_T_sensor,
        seq.gps_lat,
        seq.gps_lon,
        seq.gps_alt,
        seq.compass_yaw,
        seq.odom_cov_trace,
        seq.gps_cov_trace,
        chunk=8,
    )
    assert not res.valid[9:12].any()
    np.testing.assert_array_equal(res.map_T_sensor[9], res.map_T_sensor[10])
    err = ate_rmse(
        res.map_T_sensor[14:], seq.true_map_T_sensor[14:], res.valid[14:]
    )
    assert err < 0.15


def test_superblock_recrop_and_overflow_flags():
    """Drive run_chunk_fast directly: re-crop must fire on the first block,
    and a healthy run must never set pair_overflow."""
    from slam_sensor_fusion_tpu.models.localization import init_state

    seq, map_data = build_world_and_sequence(n_frames=12, seed=3)
    cfg = FAST_CONFIG
    loc = Localizer(map_data, cfg)
    gps_T = loc.gps_poses(seq.gps_lat, seq.gps_lon, seq.compass_yaw)
    state = init_state(
        cfg,
        loc.map_cloud.capacity,
        jnp.asarray(gps_T[0]),
        jnp.asarray(seq.odom_T_sensor[0], jnp.float32),
    )
    frames = pf.build_paged_frames(
        cfg,
        seq.scans[1:9],
        seq.odom_T_sensor[1:9],
        gps_T[1:9],
        seq.odom_cov_trace[1:9],
        seq.gps_cov_trace[1:9],
        np.ones(8, bool),
    )
    final, outs = pf.run_chunk_fast(
        state, frames, loc.map_cloud, cfg, interpret=True
    )
    outs = jax.tree.map(np.asarray, outs)
    assert outs.recropped[0]  # first block must populate the empty crop
    assert not outs.pair_overflow.any()
    assert (outs.n_correspondences > 100).all()
    # the carry advanced
    assert not np.allclose(
        np.asarray(final.map_T_sensor), np.asarray(state.map_T_sensor)
    )


def test_superblock_parity_tracks_legacy_parity_engine():
    """Parity mode through the superblock shell (lazy fused kernel,
    block-granular re-crop) must stay within a few cm of the legacy
    per-frame parity engine on the same sequence — the ICP control flow
    is identical (test_lazy_fused_kernel_matches_parity_xla); only the
    re-crop granularity differs."""
    seq, map_data = build_world_and_sequence(n_frames=16, seed=11)
    base = dataclasses.replace(TEST_CONFIG, superstep=4)

    runs = {}
    for name, sb in [("legacy", False), ("superblock", True)]:
        cfg = dataclasses.replace(base, superblock_parity=sb)
        loc = Localizer(map_data, cfg)
        runs[name] = loc.run(
            seq.scans,
            seq.odom_T_sensor,
            seq.gps_lat,
            seq.gps_lon,
            seq.gps_alt,
            seq.compass_yaw,
            seq.odom_cov_trace,
            seq.gps_cov_trace,
            chunk=8,
        )

    a, b = runs["legacy"], runs["superblock"]
    va = a.valid & b.valid
    assert va[5:].all()
    err_a = ate_rmse(a.map_T_sensor, seq.true_map_T_sensor, va)
    err_b = ate_rmse(b.map_T_sensor, seq.true_map_T_sensor, va)
    assert err_b < max(0.12, err_a * 1.5), (err_a, err_b)
    # frame-by-frame closeness of the two engines
    d = np.linalg.norm(
        a.map_T_sensor[va][:, :3, 3] - b.map_T_sensor[va][:, :3, 3], axis=1
    )
    assert d.max() < 0.08, f"engines diverge: max {d.max():.3f} m"
