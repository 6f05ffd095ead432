"""Whole-superblock kernel (ops/superblock_fused.py) vs the per-frame
fine scan: same superblock inputs, same outputs — the kernel only moves
the prediction/blend/gate/ICP/state-select chain inside one pallas call.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_sensor_fusion_tpu.models import pipeline_fast as pf
from slam_sensor_fusion_tpu.models.localization import Localizer, init_state
from tests.test_pipeline_fast import FAST_CONFIG
from tests.test_pipeline import build_world_and_sequence


def _run(cfg, state, frames, map_cloud):
    final, outs = pf.run_chunk_fast(state, frames, map_cloud, cfg, interpret=True)
    return jax.tree.map(np.asarray, final), jax.tree.map(np.asarray, outs)


def test_block_kernel_matches_per_frame_scan():
    n = 13
    seq, map_data = build_world_and_sequence(n_frames=n, seed=5)
    cfg_scan = FAST_CONFIG
    cfg_kern = dataclasses.replace(FAST_CONFIG, block_kernel=True)
    loc = Localizer(map_data, cfg_scan)
    gps_T = loc.gps_poses(seq.gps_lat, seq.gps_lon, seq.compass_yaw)
    valid = np.ones(n - 1, bool)
    valid[6] = False  # exercise the invalid-frame no-op inside the kernel
    frames = pf.build_paged_frames(
        cfg_scan, seq.scans[1:], seq.odom_T_sensor[1:], gps_T[1:],
        seq.odom_cov_trace[1:], seq.gps_cov_trace[1:], valid,
    )
    state = init_state(
        cfg_scan, loc.map_cloud.capacity,
        jnp.asarray(gps_T[0]), jnp.asarray(seq.odom_T_sensor[0], jnp.float32),
    )

    fin_a, out_a = _run(cfg_scan, state, frames, loc.map_cloud)
    fin_b, out_b = _run(cfg_kern, state, frames, loc.map_cloud)

    np.testing.assert_allclose(
        out_b.map_T_sensor, out_a.map_T_sensor, atol=3e-4
    )
    np.testing.assert_allclose(
        out_b.map_T_sensor_prior, out_a.map_T_sensor_prior, atol=3e-4
    )
    np.testing.assert_allclose(
        out_b.map_T_sensor_odom, out_a.map_T_sensor_odom, atol=3e-4
    )
    np.testing.assert_allclose(out_b.icp_error, out_a.icp_error, atol=1e-3)
    np.testing.assert_array_equal(out_b.icp_converged, out_a.icp_converged)
    np.testing.assert_array_equal(
        out_b.n_correspondences, out_a.n_correspondences
    )
    np.testing.assert_array_equal(out_b.icp_iterations, out_a.icp_iterations)
    # state carry agrees too (pose, odometry ref, filter queue)
    np.testing.assert_allclose(
        fin_b.map_T_sensor, fin_a.map_T_sensor, atol=3e-4
    )
    np.testing.assert_allclose(
        fin_b.odom_T_sensor_previous, fin_a.odom_T_sensor_previous, atol=1e-5
    )
    np.testing.assert_allclose(
        fin_b.filter_state.transitions, fin_a.filter_state.transitions,
        atol=3e-4,
    )
    assert int(fin_b.filter_state.count) == int(fin_a.filter_state.count)
    np.testing.assert_allclose(
        fin_b.filter_state.previous_pose, fin_a.filter_state.previous_pose,
        atol=3e-4,
    )


def test_block_kernel_matches_per_frame_scan_parity_mode():
    """Lazy (reference-exact) ICP inside the superblock kernel == the
    per-frame lazy fused path."""
    n = 9
    seq, map_data = build_world_and_sequence(n_frames=n, seed=2)
    base = dataclasses.replace(
        FAST_CONFIG,
        icp=dataclasses.replace(FAST_CONFIG.icp, mode="parity"),
        superblock_parity=True,
    )
    cfg_kern = dataclasses.replace(base, block_kernel=True)
    loc = Localizer(map_data, base)
    gps_T = loc.gps_poses(seq.gps_lat, seq.gps_lon, seq.compass_yaw)
    frames = pf.build_paged_frames(
        base, seq.scans[1:], seq.odom_T_sensor[1:], gps_T[1:],
        seq.odom_cov_trace[1:], seq.gps_cov_trace[1:],
        np.ones(n - 1, bool),
    )
    state = init_state(
        base, loc.map_cloud.capacity,
        jnp.asarray(gps_T[0]), jnp.asarray(seq.odom_T_sensor[0], jnp.float32),
    )
    fin_a, out_a = _run(base, state, frames, loc.map_cloud)
    fin_b, out_b = _run(cfg_kern, state, frames, loc.map_cloud)
    np.testing.assert_allclose(
        out_b.map_T_sensor, out_a.map_T_sensor, atol=3e-4
    )
    np.testing.assert_array_equal(
        out_b.n_correspondences, out_a.n_correspondences
    )
    np.testing.assert_array_equal(out_b.icp_iterations, out_a.icp_iterations)
    np.testing.assert_array_equal(out_b.icp_converged, out_a.icp_converged)
    np.testing.assert_allclose(
        fin_b.map_T_sensor, fin_a.map_T_sensor, atol=3e-4
    )


def test_block_kernel_assoc_unroll_bit_identical():
    """assoc_unroll inside the superblock kernel is BIT-identical to the
    U=1 loop (tail lanes clamp to the run's last tile — a strict-min
    no-op); it only amortizes sequential pair-trip overhead."""
    n = 9
    seq, map_data = build_world_and_sequence(n_frames=n, seed=7)
    cfg1 = dataclasses.replace(FAST_CONFIG, block_kernel=True)
    loc = Localizer(map_data, cfg1)
    gps_T = loc.gps_poses(seq.gps_lat, seq.gps_lon, seq.compass_yaw)
    frames = pf.build_paged_frames(
        cfg1, seq.scans[1:], seq.odom_T_sensor[1:], gps_T[1:],
        seq.odom_cov_trace[1:], seq.gps_cov_trace[1:], np.ones(n - 1, bool),
    )
    state = init_state(
        cfg1, loc.map_cloud.capacity,
        jnp.asarray(gps_T[0]), jnp.asarray(seq.odom_T_sensor[0], jnp.float32),
    )
    fin1, out1 = _run(cfg1, state, frames, loc.map_cloud)
    for U in (2, 4):
        cfgU = dataclasses.replace(
            cfg1, icp=dataclasses.replace(cfg1.icp, assoc_unroll=U)
        )
        finU, outU = _run(cfgU, state, frames, loc.map_cloud)
        np.testing.assert_array_equal(outU.map_T_sensor, out1.map_T_sensor)
        np.testing.assert_array_equal(outU.icp_error, out1.icp_error)
        np.testing.assert_array_equal(
            outU.n_correspondences, out1.n_correspondences
        )
