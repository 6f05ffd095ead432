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
from slam_sensor_fusion_tpu.ops.nn_pallas import _build_tile_pair_list, make_pages
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
    pair_start, pair_cnt, pair_tgt = _build_tile_pair_list(visits, counts, nSt * 8)
    src_pages = make_pages(
        s, smj, jnp.zeros(3, jnp.float32), cfg.tile_src, sentinel=1.0e7
    )
    got = icp_align_fused_paged(
        src_pages, pair_start, pair_cnt, pair_tgt, T0, cached, cfg, interpret=True
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
    # start from the TRUE pose (the production flow's coarse alignment
    # delivers this): a raw noisy GPS init would be corrected ~1 m by
    # frame 0's ICP, and frames 1+ of that block would then legitimately
    # trip the slack-violation flag (pair lists built at the stale
    # block-start pose) — that transient is asserted separately below
    state = init_state(
        cfg,
        loc.map_cloud.capacity,
        jnp.asarray(seq.true_map_T_sensor[0], jnp.float32),
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
    # healthy steady-state run: every realized prior stayed inside the
    # pair-list dilation budget (slack-violation observability, r2 #6)
    assert not outs.slack_violation.any()
    assert (outs.slack_dist >= 0).all()
    assert (outs.n_correspondences > 100).all()
    # the carry advanced
    assert not np.allclose(
        np.asarray(final.map_T_sensor), np.asarray(state.map_T_sensor)
    )


SUBGATE_CONFIG = dataclasses.replace(
    FAST_CONFIG,
    icp=dataclasses.replace(
        FAST_CONFIG.icp, gate_sub_src=64, gate_sub_tgt=64
    ),
)


def test_subbox_gating_equivalent_end_to_end():
    """FINE sub-box pair gating (ICPConfig.gate_sub_*) must not change the
    fast pipeline's output: gating stays a superset of the true point-pair
    distances, so every in-gate correspondence survives and the fine loop
    sees identical geometry. Only the pair-list contents shrink."""
    seq, map_data = build_world_and_sequence(n_frames=16, seed=7)
    runs = {}
    for name, cfg in [("coarse", FAST_CONFIG), ("sub", SUBGATE_CONFIG)]:
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
    a, b = runs["coarse"], runs["sub"]
    va = a.valid & b.valid
    assert va[5:].all()
    d = np.linalg.norm(
        a.map_T_sensor[va][:, :3, 3] - b.map_T_sensor[va][:, :3, 3], axis=1
    )
    assert d.max() < 1e-4, f"sub-box gating changed the trajectory: {d.max()}"


def test_subbox_prologue_superset_and_reduction(rng):
    """Prologue-level contract: sub-box tile-pair distances (1) never
    exceed the coarse bbox distance is FALSE in general — they never
    UNDERCUT the true point-pair minimum (superset of admissibility), and
    (2) admit no more pairs than coarse boxes."""
    from slam_sensor_fusion_tpu.models.pipeline_fast import (
        _page_subboxes,
        _transformed_tile_boxes,
    )
    from slam_sensor_fusion_tpu.ops.morton import (
        bbox_pair_dist2,
        tile_bboxes,
    )
    from slam_sensor_fusion_tpu.ops.nn_gated import subtile_pair_dist2
    from slam_sensor_fusion_tpu.ops.nn_pallas import make_pages

    TM, TN, gs, gt = 256, 512, 64, 64
    # clustered source so Morton tiles go ragged; count NOT a multiple of
    # the sub-box size (empty sub-groups must stay NaN-free: the
    # _transformed_tile_boxes sanitize regression)
    n_src = 2 * TM + 37
    src = np.concatenate(
        [
            rng.normal([-6, -6, 0], 0.5, (n_src // 3, 3)),
            rng.normal([6, 6, 1], 0.5, (n_src // 3, 3)),
            rng.normal([6, -6, 2], 0.5, (n_src - 2 * (n_src // 3), 3)),
        ]
    ).astype(np.float32)
    src = morton.sort_points_numpy(src, isotropic=True)
    tgt = rng.uniform(-8, 8, (4 * TN, 3)).astype(np.float32)
    tgt = morton.sort_points_numpy(tgt, isotropic=True)

    S = 3 * TM  # capacity with one partial + zero-count tail handling
    buf = np.full((S, 3), 1.0e7, np.float32)
    buf[:n_src] = src
    msk = np.arange(S) < n_src
    nSt, nTt = S // TM, len(tgt) // TN

    pages = jnp.asarray(buf.reshape(nSt, TM, 3).transpose(0, 2, 1))[None]
    cnt = jnp.asarray(
        np.clip(n_src - np.arange(nSt) * TM, 0, TM).astype(np.int32)
    )[None]
    pred = jnp.eye(4, dtype=jnp.float32)[None]

    slo, shi = _page_subboxes(pages, cnt, gs)
    slo_w, shi_w = _transformed_tile_boxes(pred, slo, shi)
    tlo, thi, _ = tile_bboxes(jnp.asarray(tgt), jnp.ones(len(tgt), bool), gt)
    d2_sub = np.asarray(
        subtile_pair_dist2(slo_w[0], shi_w[0], tlo, thi, nSt, nTt)
    )
    assert np.isfinite(d2_sub[np.asarray(cnt[0]) > 0].min(axis=1)).all()

    # coarse distances for comparison
    clo, chi, ccnt = tile_bboxes(jnp.asarray(buf), jnp.asarray(msk), TM)
    ctlo, cthi, _ = tile_bboxes(jnp.asarray(tgt), jnp.ones(len(tgt), bool), TN)
    d2_coarse = np.asarray(bbox_pair_dist2(clo, chi, ctlo, cthi))

    # true point-pair minimum per (src tile, tgt tile)
    d_true = np.full((nSt, nTt), np.inf, np.float32)
    for i in range(nSt):
        sp = buf[i * TM : (i + 1) * TM][msk[i * TM : (i + 1) * TM]]
        if not len(sp):
            continue
        for j in range(nTt):
            tp = tgt[j * TN : (j + 1) * TN]
            d = ((sp[:, None] - tp[None]) ** 2).sum(-1).min()
            d_true[i, j] = d

    # (1) sub-box distance never exceeds the true point distance
    valid_rows = np.asarray(cnt[0]) > 0
    assert (
        d2_sub[valid_rows] <= d_true[valid_rows] + 1e-3
    ).all(), "sub-box gating undercuts a true pair (would drop it)"
    # (2) sub-box distance is at least the coarse distance (tighter gate)
    finite = np.isfinite(d2_coarse)
    assert (
        d2_sub[valid_rows & np.ones(nSt, bool)][:, :][finite[valid_rows]]
        >= d2_coarse[valid_rows][finite[valid_rows]] - 1e-3
    ).all()
    # and it genuinely prunes on ragged clustered tiles
    r2 = 0.5
    assert (d2_sub <= r2).sum() <= (d2_coarse <= r2).sum()


def test_gps_yank_is_covered_by_pull_aware_dilation():
    """A mid-block GPS jump with near-zero covariance yanks the blended
    prior metres from the odometry prediction — but the pair prologue
    KNOWS the per-frame GPS poses and blend gains, folds the exact pull
    into its dilation, and must therefore NOT flag it (the pair list was
    built wide enough)."""
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
    gps_T = np.asarray(gps_T[1:9]).copy()
    gps_tr = np.asarray(seq.gps_cov_trace[1:9]).copy()
    # frame 2 (block-local k=2): 2 m GPS jump, near-zero covariance so
    # the covariance-weighted blend follows it almost exactly. Early in
    # the block ON PURPOSE: the stochastic gate's z-score is 0 while its
    # queue warms up (stochastic_filter.cpp:60-63), so the yanked prior
    # passes through un-replaced.
    gps_T[2, :3, 3] += np.array([2.0, 0, 0], np.float32)
    gps_tr[2] = 1e-6
    frames = pf.build_paged_frames(
        cfg, seq.scans[1:9], seq.odom_T_sensor[1:9], gps_T,
        seq.odom_cov_trace[1:9], gps_tr, np.ones(8, bool),
    )
    _, outs = pf.run_chunk_fast(state, frames, loc.map_cloud, cfg, interpret=True)
    outs = jax.tree.map(np.asarray, outs)
    assert outs.slack_dist[2] > 1.0, (
        f"yank did not move the prior: dist={outs.slack_dist[2]}"
    )
    assert not outs.slack_violation[2], (
        "exactly-known GPS pull must be dilation, not slack"
    )


def test_slack_violation_flag_trips_on_gate_replacement():
    """The one prior source the pair prologue CANNOT fold into its
    dilation: a stochastic-gate replacement (apply_gate,
    stochastic_filter.cpp:94-113) lands the prior at the filter's
    weighted-mean prediction. Seed the transition queue with bogus 3 m
    hops (full count, so the z-score is live); frame 0's ordinary prior
    is then an outlier vs the queue stats, the gate snaps it to
    previous_pose + ~3 m, and the slack-violation flag must fire."""
    from slam_sensor_fusion_tpu.models.localization import init_state
    from slam_sensor_fusion_tpu.ops import stochastic_filter as sf

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
    hop = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(3.0)
    q = cfg.filter.queue_size
    state = state._replace(
        filter_state=sf.FilterState(
            transitions=jnp.tile(hop[None], (q, 1, 1)),
            count=jnp.int32(q),
            previous_pose=state.map_T_sensor,
        )
    )
    frames = pf.build_paged_frames(
        cfg, seq.scans[1:9], seq.odom_T_sensor[1:9], np.asarray(gps_T[1:9]),
        seq.odom_cov_trace[1:9], seq.gps_cov_trace[1:9], np.ones(8, bool),
    )
    _, outs = pf.run_chunk_fast(state, frames, loc.map_cloud, cfg, interpret=True)
    outs = jax.tree.map(np.asarray, outs)
    assert outs.slack_violation[0], (
        f"gate replacement not flagged: dist={outs.slack_dist[0]}"
    )
    assert outs.slack_dist[0] > 1.0


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
