"""Benchmark: registered scans/sec of the full per-scan localization loop.

Runs the steady-state pipeline (subsample -> crop -> predicated map re-crop
-> odometry prediction -> GPS fusion -> stochastic gate -> ICP) as a chunked
`lax.scan` on the available accelerator, over a synthetic LiDAR sequence at
production capacities, and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "scans/sec", "vs_baseline": N,
     "submetrics": {...}}

vs_baseline is measured against the driver's north-star target of 1000
registered scans/sec on one TPU v5e chip (BASELINE.md — the reference
publishes no numbers of its own).

The default run (`python bench.py`) measures the HEADLINE localization
number, then folds the companion hardware numbers into `submetrics` of the
same line so the driver captures all of them every round (VERDICT r3 #8):
KITTI-shape stress, native-mode LIO, mapping throughput, KITTI-format
end-to-end (LIO and the localization product), single-frame latency, and
a roofline/utilization estimate.
`BENCH_MODE=loc|stress|lio|map|kitti|kitti_loc|latency` runs one section
alone;
`BENCH_SUBS` (comma list) selects which companions the default run
includes; `BENCH_BUDGET_S` bounds total wall time (late sections are
skipped, observably, once exceeded).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _env(name: str, default, overrides: dict | None = None) -> str:
    """Env var, then per-section override, then default — so the combined
    run can configure each section without mutating os.environ."""
    if name in os.environ:
        return os.environ[name]
    if overrides and name in overrides:
        return str(overrides[name])
    return str(default)


def bench_lio() -> dict:
    """Native-mode hardware number (north-star configs 2-3/5): deskewed
    scan -> point-to-plane GN -> error-state EKF over a rolling keyframe
    ring (models/lio.py). Scans are rendered WITH intra-sweep motion
    (render_scan_skewed) and the measured loop deskews them — BASELINE
    config 5's "deskewed scans" is now literally what runs.

    BENCH_LIO_OUTAGE="a:b" invalidates GPS on frames [a, b) — the
    robustness A/B (EKF coasts on IMU+registration, chi^2 gate re-accepts
    when fixes return)."""
    import jax
    import jax.numpy as jnp

    from slam_sensor_fusion_tpu.models import lio
    from slam_sensor_fusion_tpu.models.ekf import EKFConfig
    from slam_sensor_fusion_tpu.ops.point_to_plane import PointToPlaneConfig
    from slam_sensor_fusion_tpu.utils import synthetic as syn

    n_frames = int(os.environ.get("BENCH_FRAMES", "512"))
    chunk = int(os.environ.get("BENCH_CHUNK", str(n_frames - 1)))
    scan_cap = int(os.environ.get("BENCH_LIO_SCAN_CAP", "8192"))
    on_tpu = any("TPU" in d.device_kind for d in jax.devices())
    # block = whole-superblock kernel (ops/lio_superblock_fused.py): EKF
    # propagate + GN + Kalman updates for refresh_every frames per launch;
    # blocks = per-frame launches of the fused GN kernel (r2 driver)
    driver = os.environ.get("BENCH_LIO_DRIVER", "block" if on_tpu else "blocks")
    backend = os.environ.get(
        "BENCH_LIO_BACKEND", "fused" if on_tpu else "xla"
    )
    # skewed scans + in-loop deskew are the default now; BENCH_LIO_SKEW=0
    # falls back to static rendering (for A/B: deskew off must degrade)
    skew = os.environ.get("BENCH_LIO_SKEW", "1") == "1"
    use_deskew = os.environ.get("BENCH_LIO_DESKEW", "1" if skew else "0") == "1"
    config = lio.LIOConfig(
        scan_capacity=scan_cap,
        window=int(os.environ.get("BENCH_LIO_WINDOW", "16")),
        slot_points=int(os.environ.get("BENCH_LIO_SLOT", "4096")),
        # measured (v5e, superblock kernel): 8 -> 650.0 @ ATE 0.054,
        # 16 -> 768.0 @ 0.049 (refresh ~0.4 ms/frame at 8, halved; the
        # slack budget's per-frame dilation covers the longer block)
        refresh_every=int(os.environ.get("BENCH_LIO_REFRESH", "16")),
        p2p=PointToPlaneConfig(
            nn_backend=backend,
            # measured (v5e, cells normals 1.8): iters 4 -> 124.3 @ 0.149,
            # 2 -> 193.7 @ 0.141 (the IMU prior is good; 2 GN steps suffice)
            num_iterations=int(os.environ.get("BENCH_LIO_ITERS", "2")),
            # associate ONCE at the IMU prior, reuse across GN iterations
            # + stats: association dominates the kernel (microbench at
            # these shapes: fresh 4.9 ms vs fixed 2.1 ms for 2 iters)
            fixed_correspondences=os.environ.get("BENCH_LIO_FIXED_CORR", "1")
            == "1",
            # with prior-fixed correspondences the pair list only needs to
            # cover cm-scale GN corrections, not inter-iteration drift
            reassoc_margin=float(os.environ.get("BENCH_LIO_MARGIN", "0.15")),
            # FAT tiles: the in-kernel pair loop is sequential and
            # overhead-bound (~4 us/iteration regardless of tile width —
            # measured TM=128: 516 pairs -> 3.3 ms/frame vs TM=512/
            # TN=1024: ~80 pairs), so fewer+fatter pair blocks win even
            # at slightly more distance evals
            tile_src=int(os.environ.get("BENCH_LIO_TILE_SRC", "512")),
            tile_tgt=int(os.environ.get("BENCH_LIO_TILE_TGT", "1024")),
            # >= the target tile count: pair lists complete by construction
            max_visits=int(os.environ.get("BENCH_LIO_MAX_VISITS", "64")),
            assoc_unroll=int(os.environ.get("BENCH_LIO_UNROLL", "1")),
        ),
        # association work scales with scan x anchor density; register on
        # every 4th scan point / every 2nd anchor point (Morton-sorted =>
        # spatially uniform) while deskew + ring insert keep full scans
        reg_subsample=int(os.environ.get("BENCH_LIO_REG_SUB", "4")),
        anchor_subsample=int(os.environ.get("BENCH_LIO_ANCHOR_SUB", "2")),
        # truncated-Morton cell PCA: voxel-quality normals with no
        # argsort/scatter/eigh in the refresh (the voxel estimator costs
        # ~61 ms per 65k-point refresh on v5e, ~90% of the frame budget)
        normal_est=os.environ.get("BENCH_LIO_NORMALS", "cells"),
        # octree level formula floors this to the nearest power-of-2
        # fraction of the ring extent (~1.7 m cells here); sweep: 0.75 ->
        # ATE 0.482 (starved cells), 1.2 -> 0.314, 1.8 -> 0.149
        normal_voxel=float(os.environ.get("BENCH_LIO_NORMAL_VOXEL", "1.8")),
        normal_planarity=(
            float(os.environ["BENCH_LIO_PLANARITY"])
            if "BENCH_LIO_PLANARITY" in os.environ else None
        ),
        # measurement covariance from the GN system itself (sigma^2
        # (JtJ)^-1, VERDICT r2 #5) — no per-world std sweep; "constant"
        # restores the fixed swept std below
        icp_cov_mode=os.environ.get("BENCH_LIO_COV", "gn"),
        gn_cov_scale=float(os.environ.get("BENCH_LIO_GN_SCALE", "1.0")),
        # registration against the ring map is RELATIVE (the ring drifts
        # with the estimate); don't let the EKF treat it as a cm-accurate
        # absolute fix or GPS can never bound the drift
        # measured sweep (v5e, 511 frames, GPS @ 0.5 m): std 0.03 -> ATE
        # 1.42 m, 0.1 -> 1.09, 0.3 -> 0.26 (GPS can finally correct)
        icp_pos_std=float(os.environ.get("BENCH_LIO_ICP_STD", "0.3")),
        superstep_slack=float(os.environ.get("BENCH_LIO_SLACK", "0.05")),
        slack_base=float(os.environ.get("BENCH_LIO_SLACK_BASE", "0.1")),
        # the bench seeds pose AND velocity from the true initial state
        # (v0 below); declare that in the priors or the wide default P0
        # lets the first noisy GPS fixes yank the posterior ~0.5 m off the
        # dead-reckoned prediction and trip the superstep slack budget on
        # the warm-up blocks
        ekf=EKFConfig(
            init_pos_std=float(os.environ.get("BENCH_LIO_INIT_POS_STD", "0.1")),
            init_vel_std=float(os.environ.get("BENCH_LIO_INIT_VEL_STD", "0.1")),
        ),
    )

    log(f"devices: {jax.devices()}  driver={driver}  skew={skew} "
        f"deskew={use_deskew}  cov={config.icp_cov_mode}")
    rng = np.random.default_rng(0)
    world = syn.make_world(rng, extent=140.0, n_buildings=70, n_poles=200,
                           points_per_m2=24.0)
    poses = syn.make_trajectory(n_frames, speed_per_frame=0.15, radius=30.0)
    gyro, accel, dts = syn.make_imu(poses, gyro_noise=0.0005, accel_noise=0.005)
    if skew:
        scans, taus = [], []
        for i in range(n_frames):
            pts, tau = syn.render_scan_skewed(
                world, poses[max(i - 1, 0)], poses[i], rng,
                max_points=scan_cap, max_range=25.0,
            )
            scans.append(pts)
            taus.append(tau)
    else:
        scans = [
            syn.render_scan(world, poses[i], rng, max_points=scan_cap,
                            max_range=25.0)
            for i in range(n_frames)
        ]
        taus = [np.ones(len(s), np.float32) for s in scans]
    # loader-contract Morton pre-sort (ops/morton.sort_order_numpy): tile
    # locality survives the rigid transforms of the whole pipeline, so
    # the device never re-sorts and every-kth subsampling is spatially
    # uniform; deskew timestamps ride the same permutation
    from slam_sensor_fusion_tpu.ops.morton import sort_order_numpy

    for i in range(n_frames):
        order = sort_order_numpy(scans[i], isotropic=True)
        scans[i] = scans[i][order]
        taus[i] = taus[i][order]

    def pad(pts):
        buf = np.zeros((scan_cap, 3), np.float32)
        n = min(len(pts), scan_cap)
        buf[:n] = pts[:n]
        m = np.zeros(scan_cap, bool)
        m[:n] = True
        return buf, m

    padded = [pad(s) for s in scans]
    sp = np.stack([p for p, _ in padded])
    sm = np.stack([m for _, m in padded])
    tp = np.ones((n_frames, scan_cap), np.float32)
    for i, t in enumerate(taus):
        tp[i, : min(len(t), scan_cap)] = t[:scan_cap]
    state = lio.init_state(
        config, jnp.asarray(sp[0]), jnp.asarray(sm[0]), jnp.asarray(poses[0])
    )
    v0 = (poses[1][:3, 3] - poses[0][:3, 3]) / 0.1
    state = state._replace(
        ekf_state=state.ekf_state._replace(v=jnp.asarray(v0, jnp.float32))
    )
    # GPS fixes at scan rate (0.5 m noise) — the full native fusion stack
    # (north-star config 5); pure-LIO drift is unbounded by construction.
    # BENCH_LIO_GPS=0 benches odometry-only.
    use_gps = os.environ.get("BENCH_LIO_GPS", "1") != "0"
    gps_noise = 0.5
    gps_pos = (
        poses[1:, :3, 3]
        + np.random.default_rng(3).normal(0, gps_noise, (n_frames - 1, 3))
    ).astype(np.float32)
    gps_valid = np.full(n_frames - 1, use_gps, bool)
    outage = os.environ.get("BENCH_LIO_OUTAGE")
    if outage:
        a, b = (int(v) for v in outage.split(":"))
        gps_valid[a:b] = False
        log(f"GPS outage: frames [{a}, {b})")

    batches = []
    for i in range(0, n_frames - 1, chunk):
        j = min(i + chunk, n_frames - 1)
        batches.append(
            tuple(
                jax.device_put(jnp.asarray(a))
                for a in (
                    sp[i + 1 : j + 1], sm[i + 1 : j + 1], gyro[i:j],
                    accel[i:j], dts[i:j], gps_pos[i:j],
                    np.full(j - i, gps_noise**2, np.float32), gps_valid[i:j],
                    tp[i + 1 : j + 1],
                )
            )
        )

    if driver == "block":

        def run(s, b):
            *core, tau = b
            return lio.run_lio_superblocks(
                s, *core, config, scan_tau=tau if use_deskew else None
            )

    else:

        def run(s, b):
            *core, tau = b
            return lio.run_lio_blocks(
                s, *core, config, scan_tau=tau if use_deskew else None
            )

    log("compiling ...")
    t0 = time.perf_counter()
    ws, _ = run(state, batches[0])
    np.asarray(ws.ekf_state.p)
    log(f"compile+first chunk: {time.perf_counter() - t0:.1f}s")

    # best-of-N repeats from the same initial state: identical device work
    # each pass, so min() strips the tunnel's additive host/transport noise
    trace_dir = os.environ.get("BENCH_TRACE")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    repeats = int(os.environ.get("BENCH_REPEATS", "1" if trace_dir else "3"))
    elapsed = float("inf")
    outs = []
    for r in range(max(repeats, 1)):
        t0 = time.perf_counter()
        s = state
        routs = []
        for b in batches:
            s, o = run(s, b)
            routs.append(o)
        np.asarray(s.ekf_state.p)
        dt = time.perf_counter() - t0
        log(f"  pass {r}: {dt:.3f}s")
        elapsed = min(elapsed, dt)
        if not outs:
            outs = routs
    if trace_dir:
        jax.profiler.stop_trace()
        from slam_sensor_fusion_tpu.utils.profiling import summarize_trace
        for name, ms, n in summarize_trace(trace_dir, top=20):
            log(f"  trace {ms:9.3f} ms  x{n:<5d} {name}")
    total = n_frames - 1
    est = np.concatenate([np.asarray(o.world_T_body) for o in outs])
    gt = poses[1:]
    ate = float(np.sqrt(((est[:, :3, 3] - gt[:, :3, 3]) ** 2).sum(-1).mean()))
    extra = ""
    if driver == "block":
        n_ovf = int(sum(np.asarray(o.pair_overflow).sum() for o in outs))
        viol = np.concatenate([np.asarray(o.slack_violation) for o in outs])
        sdist = np.concatenate([np.asarray(o.slack_dist) for o in outs])
        n_slack = int(viol.sum())
        demand = np.concatenate([np.asarray(o.pair_demand) for o in outs])
        extra = (
            f"  pair-overflow: {n_ovf}  slack-violations: {n_slack}"
            f"  pair-demand mean/p99/max: {demand.mean():.0f}/"
            f"{np.percentile(demand, 99):.0f}/{demand.max()}"
            f"  slack-dist p99/max: {np.percentile(sdist, 99):.3f}/"
            f"{sdist.max():.3f}"
        )
        if n_slack:
            idx = np.nonzero(viol)[0]
            extra += f"  viol-frames: {idx[:16].tolist()}"
    log(f"frames: {total}  elapsed: {elapsed:.3f}s  ATE-RMSE: {ate:.3f} m"
        + extra)
    if driver == "block":
        assert n_ovf == 0, f"pair list overflow on {n_ovf} frames"
        assert n_slack == 0, f"superstep slack violated on {n_slack} frames"
    return {
        "metric": "LIO scans/sec (deskew+point-to-plane+EKF, native mode)",
        "value": round(total / elapsed, 2),
        "unit": "scans/sec",
        "vs_baseline": round(total / elapsed / 1000.0, 4),
        "ate_rmse_m": round(ate, 4),
    }


# capacity-stress at KITTI-like shapes: ~122k raw points/scan, reference
# subsample 2 -> 61k device points, 128k-point map crop. Tile choices from
# the measured sweeps at these shapes (v5e, best-of-3): coarser source
# tiles cut pair-loop trips, finer TARGET tiles shrink the admitted
# per-pair work (the bbox gate culls more precisely) -- tile 1024/512
# -> 972, 2048/256 -> 980.7, 2048/128 -> 962.5, 4096/128 -> 1006.7
# scans/s @ ATE 0.027. 4096/256 exceeds the 16M scoped-VMEM limit;
# 2048/64 overflows the pair list (admitted tiles outgrow capacity).
# Sub-box pair gating measured SLOWER here (v5e: gate 64/64 -> 367.9
# scans/s vs coarse boxes -> 499.7 @ the same ATE 0.027): at stress shapes
# the map crop is dense and near-isotropic, so sub-boxes barely shrink the
# admitted set while the (K, nSub_s, nSub_t) prologue cost is real.
# Coarse tile boxes by default; BENCH_GATE_SUB_* opts back in.
STRESS_OVERRIDES = {
    "BENCH_SCAN_POINTS": "122000",
    "BENCH_SUBSAMPLE": "2",
    "BENCH_CROPPED_MAP": "131072",
    "BENCH_FRAMES": "256",
    "BENCH_DENSITY": "48.0",
    "BENCH_TILE_SRC": "4096",
    "BENCH_TILE_TGT": "128",
}


def bench_loc(
    overrides: dict | None = None,
    data: tuple | None = None,
    metric: str | None = None,
) -> dict:
    """The headline number: full per-scan localization loop throughput
    (and, with STRESS_OVERRIDES, the KITTI-shape capacity-stress number).

    `data=(poses, seq, map_data)` replays an externally built run (the
    KITTI-format path, bench_kitti_loc) through the identical measured
    loop; `metric` overrides the reported metric name for such runs."""
    ov = overrides

    import jax
    import jax.numpy as jnp

    from slam_sensor_fusion_tpu.models.localization import (
        Localizer,
        build_frame_batch,
        init_state,
        run_chunk,
    )
    from slam_sensor_fusion_tpu.models.pipeline_fast import (
        build_paged_frames,
        run_chunk_fast,
    )
    from slam_sensor_fusion_tpu.models.mapping import build_map_data
    from slam_sensor_fusion_tpu.utils import synthetic as syn
    from slam_sensor_fusion_tpu.utils.config import CloudCapacity, LocalizationConfig

    import dataclasses

    from slam_sensor_fusion_tpu.utils.config import ICPConfig

    n_frames = int(_env("BENCH_FRAMES", "1024", ov))
    # default: the whole sequence in ONE device program — per-call dispatch
    # costs ~0.5 s through the tunnel and would otherwise dominate
    chunk = int(_env("BENCH_CHUNK", str(n_frames - 1), ov))
    # "fast" = the native fused-kernel ICP (fresh correspondences);
    # "parity" = the reference's exact lazy-re-association control flow
    # the reference's exact lazy-re-association control flow through the
    # whole-superblock kernel is BOTH reference-exact and the fastest
    # measured configuration (v5e: parity 1581.1 vs fresh 1346.6 scans/s
    # -- lazy does ~1 association/frame vs fresh's 2-3)
    icp_mode = _env("BENCH_ICP_MODE", "parity", ov)

    # Native-mode defaults, measured on the v5e sweep (ARCHITECTURE.md §6):
    # scan subsample 8 (3k pts/frame) holds the voxel-limited ATE floor
    # (0.031 m vs 0.030 m at the reference's subsample 2) while the fused
    # kernel's association cost drops ~4x. Fatter source tiles cut
    # pair-loop trips (the loop is ~us/trip overhead-bound) up to a knee
    # where wasted distance lanes win: tile_src 512 -> 2530, 1024 -> 2622,
    # 2048 -> 2232 scans/s at identical ATE 0.032.
    # ATE degrades gracefully down to ~750 pts/frame.
    superstep = int(_env("BENCH_SUPERSTEP", "8", ov))
    slack = float(_env("BENCH_SLACK", "0.08", ov))
    margin = float(_env("BENCH_MARGIN", "0.5", ov))
    iters = int(_env("BENCH_ICP_ITERS", "10", ov))
    subsample = int(_env("BENCH_SUBSAMPLE", "8", ov))
    tile_src = int(_env("BENCH_TILE_SRC", "1024", ov))
    raw_points = int(_env("BENCH_SCAN_POINTS", "24000", ov))
    density = float(_env("BENCH_DENSITY", "24.0", ov))
    scan_cap = 1 << max(int(np.ceil(np.log2(max(raw_points // subsample, 1024)))), 10)
    config = LocalizationConfig(
        # one pallas launch per K-frame superblock (prediction/blend/
        # gate/ICP/state-select all in-kernel, ops/superblock_fused.py)
        block_kernel=_env("BENCH_BLOCK_KERNEL", "1", ov) == "1",
        superstep=superstep,
        superstep_slack=slack,
        scan_subsample_step=subsample,
        # parity mode benches through the superblock shell too (the lazy
        # fused kernel IS the reference control flow; see config docstring)
        superblock_parity=_env("BENCH_LEGACY_PARITY", "0", ov) != "1",
        icp=dataclasses.replace(
            ICPConfig(), mode=icp_mode, reassoc_margin=margin,
            num_iterations=iters, tile_src=tile_src,
            # convergence target: the reference's launch-file default is
            # 0.05 m; like any launch param it is tuned per deployment.
            # At stress shapes the synthetic map's density floor leaves
            # ~20% of frames plateauing at 0.051-0.057 m, and each
            # plateaued iteration re-associates (reference control flow,
            # icp_point_to_point.cpp:221-225) at full sweep cost.
            acceptable_mean_error=float(
                _env("BENCH_ICP_ACC", "0.05", ov)
            ),
            tile_tgt=int(_env("BENCH_TILE_TGT", "512", ov)),
            max_visits=int(_env("BENCH_MAX_VISITS", "128", ov)),
            max_pairs_factor=int(_env("BENCH_PAIRS_FACTOR", "128", ov)),
            # pair-loop trip unroll (bit-identical results; amortizes
            # the ~4 us sequential-trip overhead — ARCHITECTURE §6b)
            assoc_unroll=int(_env("BENCH_UNROLL", "1", ov)),
            gate_sub_src=(
                int(os.environ["BENCH_GATE_SUB_SRC"])
                if os.environ.get("BENCH_GATE_SUB_SRC") not in (None, "", "0")
                else None
            ),
            gate_sub_tgt=(
                int(os.environ["BENCH_GATE_SUB_TGT"])
                if os.environ.get("BENCH_GATE_SUB_TGT") not in (None, "", "0")
                else None
            ),
        ),
        # capacities sized to the synthetic sensor (24k raw points -> 12k
        # after the host subsample; ~45k map points in a 10 m crop)
        capacity=CloudCapacity(
            scan=scan_cap,
            cropped_scan=scan_cap,
            cropped_map=int(_env("BENCH_CROPPED_MAP", "65536", ov)),
            map=1 << int(_env("BENCH_MAP_CAP_LOG2", "20", ov)),
            bf_source=1024,
            bf_target=8192,
        ),
        # synthetic worlds are sparser than survey maps; keep full density
        map_subsample_step=1,
        brute_force_map_subsample_step=3,
    )

    log(f"devices: {jax.devices()}")

    # the deterministic world/sequence/map build costs 1-2 min of host
    # time at stress shapes; cache it on disk keyed by its parameters so
    # config sweeps only pay it once (BENCH_NO_CACHE=1 disables)
    import pickle

    cache_key = f"v1_{n_frames}_{raw_points}_{density}"
    cache_path = f"/tmp/sfbench_world_{cache_key}.pkl"
    use_cache = os.environ.get("BENCH_NO_CACHE", "0") != "1"
    if data is not None:
        poses, seq, map_data = data
        n_frames = len(seq.scans)
        chunk = int(_env("BENCH_CHUNK", str(n_frames - 1), ov))
    elif use_cache and os.path.exists(cache_path):
        log(f"loading cached world/sequence ({cache_path}) ...")
        with open(cache_path, "rb") as f:
            poses, seq, map_data = pickle.load(f)
    else:
        log("building synthetic world + sequence ...")
        rng = np.random.default_rng(0)
        world = syn.make_world(rng, extent=140.0, n_buildings=70, n_poles=200,
                               points_per_m2=density)
        # radius 30 keeps the full circle inside the 140 m world for any
        # sequence length (off-map the reference pipeline diverges
        # identically)
        poses = syn.make_trajectory(n_frames, speed_per_frame=0.15, radius=30.0)
        seq = syn.make_sequence(seed=0, world=world, poses=poses,
                                scan_points=raw_points)

        tiles = []
        map_rng = np.random.default_rng(1)
        for i in range(0, n_frames, 4):
            body = syn.render_scan(world, poses[i], map_rng,
                                   max_points=raw_points, noise=0.005)
            tiles.append(body @ poses[i][:3, :3].T + poses[i][:3, 3])
        odom_pos, gps_rows = syn.make_mapping_logs(seq)
        map_data = build_map_data(tiles, odom_pos, gps_rows)
        if use_cache:
            with open(cache_path, "wb") as f:
                pickle.dump((poses, seq, map_data), f)
    log(f"map points: {map_data.map_points.shape}")

    loc = Localizer(map_data, config)
    gps_T = loc.gps_poses(seq.gps_lat, seq.gps_lon, seq.compass_yaw)

    state = init_state(
        config,
        loc.map_cloud.capacity,
        jnp.asarray(gps_T[0]),
        jnp.asarray(seq.odom_T_sensor[0], jnp.float32),
    )

    # reference-faithful startup: the node NEVER starts fine ICP from a raw
    # GPS fix — performCoarseAlignment (brute force + rescue ICP) runs
    # first (localization_node.cpp:200-261,307-315). GPS noise is 0.6 m;
    # the fine gate is sqrt(0.5)=0.7 m. Outside the timed loop.
    from slam_sensor_fusion_tpu.models.localization import coarse_attempt

    fb0 = build_frame_batch(
        config, [seq.scans[1]], seq.odom_T_sensor[1:2], gps_T[1:2],
        seq.odom_cov_trace[1:2], seq.gps_cov_trace[1:2], np.ones(1, bool),
    )
    cm0, ct0, ref0, _, coarse = coarse_attempt(
        state, fb0.scan_points[0], fb0.scan_mask[0], loc.map_cloud,
        jnp.asarray(gps_T[0]), config,
    )
    state = state._replace(
        map_T_sensor=coarse.map_T_sensor, cropped_map=cm0,
        cached_target=ct0, map_T_ref=ref0,
    )
    log(f"coarse init: success={bool(coarse.success)} score={float(coarse.score):.3f}")

    # prestage all chunks on device (the host IO path is not what we bench);
    # pad the final chunk to the common shape with valid=False no-op frames
    # so every chunk reuses ONE compiled program
    fast = icp_mode == "fast" or config.superblock_parity
    if fast and chunk % config.superstep:
        chunk += config.superstep - chunk % config.superstep
    build = (
        (lambda *a: jax.device_put(build_paged_frames(*a)))
        if fast
        else (lambda *a: jax.device_put(build_frame_batch(*a)))
    )
    run = (
        (lambda s, fb: run_chunk_fast(s, fb, loc.map_cloud, config))
        if fast
        else (lambda s, fb: run_chunk(s, fb, loc.map_cloud, config))
    )
    batches = []
    n_valid_frames = 0
    for i in range(1, n_frames, chunk):
        j = min(i + chunk, n_frames)
        n = j - i
        n_valid_frames += n
        pad = chunk - n
        scans = seq.scans[i:j] + [seq.scans[i]] * pad
        def padded(a):
            a = np.asarray(a)
            return np.concatenate([a[i:j]] + ([a[i : i + 1]] * pad if pad else []))
        fb = build(
            config,
            scans,
            padded(seq.odom_T_sensor),
            np.concatenate([gps_T[i:j]] + ([gps_T[i : i + 1]] * pad if pad else [])),
            padded(seq.odom_cov_trace),
            padded(seq.gps_cov_trace),
            np.concatenate([np.ones(n, bool), np.zeros(pad, bool)]),
        )
        batches.append(fb)

    # warmup / compile on the first chunk.
    # NB: timing uses forced host reads (np.asarray) — on tunnelled TPU
    # platforms jax.block_until_ready can return before execution finishes.
    log("compiling ...")
    t0 = time.perf_counter()
    wstate, wout = run(state, batches[0])
    np.asarray(wstate.map_T_sensor)
    log(f"compile+first chunk: {time.perf_counter() - t0:.1f}s")

    # timed run over all chunks, carrying state exactly like a deployment.
    # The tunnelled TPU adds run-to-run host/transport noise (measured
    # swings of 25% on identical programs), so the run repeats from the
    # SAME initial state (identical device work each pass) and reports the
    # best pass — the additive-noise-free throughput of the compiled
    # program. Outputs/ATE come from the first pass.
    trace_dir = os.environ.get("BENCH_TRACE")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    repeats = int(os.environ.get("BENCH_REPEATS", "1" if trace_dir else "3"))
    elapsed = float("inf")
    outs = []
    for r in range(max(repeats, 1)):
        t0 = time.perf_counter()
        s = state
        routs = []
        for fb in batches:
            s, out = run(s, fb)
            routs.append(out)
        # the final state depends on every frame of every chunk; reading it
        # to the host cannot complete before the whole pipeline has executed
        np.asarray(s.map_T_sensor)
        dt = time.perf_counter() - t0
        log(f"  pass {r}: {dt:.3f}s")
        elapsed = min(elapsed, dt)
        if not outs:
            outs = routs
    if trace_dir:
        jax.profiler.stop_trace()
        from slam_sensor_fusion_tpu.utils.profiling import summarize_trace
        for name, ms, n in summarize_trace(trace_dir, top=30):
            log(f"  trace {ms:9.3f} ms  x{n:<5d} {name}")
    total_frames = n_valid_frames
    scans_per_sec = total_frames / elapsed

    # sanity: the benched run must actually localize
    est = np.concatenate([np.asarray(o.map_T_sensor) for o in outs])[:total_frames]
    gt = seq.true_map_T_sensor[1:total_frames + 1]
    ate = float(np.sqrt(((est[:, :3, 3] - gt[:, :3, 3]) ** 2).sum(-1).mean()))
    valid_mask = np.concatenate([np.asarray(fb.valid) for fb in batches])
    conv = float(
        np.concatenate([np.asarray(o.icp_converged) for o in outs])[valid_mask].mean()
    )
    # silent-truncation observability: a healthy run must never overflow
    # the correspondence visit/pair lists (VERDICT r1 weak #4)
    n_overflow = int(
        np.concatenate([np.asarray(o.pair_overflow) for o in outs])[valid_mask].sum()
    )
    # superstep slack observability (VERDICT r2 #6): every realized prior
    # stayed within the pair prologue's dilation budget
    sv = [o.slack_violation for o in outs if o.slack_violation is not None]
    n_slack = int(np.concatenate([np.asarray(v) for v in sv])[valid_mask].sum()) if sv else 0
    sstr = ""
    sd = [o.slack_dist for o in outs if o.slack_dist is not None]
    if sd:
        sdist = np.concatenate([np.asarray(d) for d in sd])[valid_mask]
        K = len(np.asarray(sv[0]))
        kidx = np.arange(len(sdist)) % K
        worst = np.argsort(sdist)[-3:][::-1]
        sstr = "  slack-dist top3 (d, k): " + " ".join(
            f"({sdist[i]:.3f}, {kidx[i]})" for i in worst
        )
        if os.environ.get("BENCH_SLACK_DIAG"):
            svf = np.concatenate([np.asarray(v) for v in sv])[valid_mask]
            convf = np.concatenate(
                [np.asarray(o.icp_converged) for o in outs]
            )[valid_mask]
            ncor = np.concatenate(
                [np.asarray(o.n_correspondences) for o in outs]
            )[valid_mask]
            prior = np.concatenate(
                [np.asarray(o.map_T_sensor_prior) for o in outs]
            )[valid_mask]
            odo = np.concatenate(
                [np.asarray(o.map_T_sensor_odom) for o in outs]
            )[valid_mask]
            for i in np.where(svf)[0]:
                lo = max(i - i % K, i - 4)
                for j in range(lo, min(i + 2, len(sdist))):
                    gd = np.linalg.norm(
                        prior[j, :3, 3] - odo[j, :3, 3]
                    )
                    log(f"  diag f={j} k={j % K} d={sdist[j]:.3f} "
                        f"conv={convf[j]} ncor={ncor[j]} "
                        f"|prior-odomchain|={gd:.3f} viol={svf[j]}")
    dm = [o.pair_demand for o in outs if o.pair_demand is not None]
    dstr = ""
    if dm:
        demand = np.concatenate([np.asarray(d) for d in dm])[valid_mask]
        dstr = (f"  pair-demand mean/p99/max: {demand.mean():.0f}/"
                f"{np.percentile(demand, 99):.0f}/{demand.max()}")
    log(f"frames: {total_frames}  elapsed: {elapsed:.3f}s  "
        f"ATE-RMSE: {ate:.3f} m  icp-converged: {conv:.2f}  "
        f"pair-overflow frames: {n_overflow}  slack-violations: {n_slack}"
        + dstr + sstr)
    assert n_overflow == 0, f"correspondence list overflow on {n_overflow} frames"
    assert n_slack == 0, f"superstep slack violated on {n_slack} frames"

    result = {
        "metric": metric if metric is not None else (
            "registered scans/sec (full per-scan localization loop, "
            + ("KITTI-sized scans ~122k raw pts"
               if overrides is not None
               else "synthetic seq")
            + ")"
        ),
        "value": round(scans_per_sec, 2),
        "unit": "scans/sec",
        "vs_baseline": round(scans_per_sec / 1000.0, 4),
        "ate_rmse_m": round(ate, 4),
    }

    # roofline/utilization estimate (VERDICT r3 weak #1): what fraction of
    # the chip's stated ceilings the measured throughput corresponds to,
    # from the run's own pair-demand/iteration observability
    if dm:
        from slam_sensor_fusion_tpu.utils.roofline import (
            association_model,
            frame_time_budget,
        )

        iters_mean = float(
            np.concatenate([np.asarray(o.icp_iterations) for o in outs])[
                valid_mask
            ].mean()
        )
        scan_pts = int(
            np.asarray(batches[0].src_cnt).sum(-1).mean()
            if hasattr(batches[0], "src_cnt")
            else np.asarray(batches[0].scan_mask).sum(-1).mean()
        )
        roof = association_model(
            pairs_per_frame=float(demand.mean()),
            tile_src=config.icp.tile_src,
            tile_tgt=config.icp.tile_tgt,
            live_iters_per_frame=iters_mean,
            scan_points=scan_pts,
            target_points=config.capacity.cropped_map,
            frames_per_sec=scans_per_sec,
            superstep=config.superstep,
        )
        roof.update(frame_time_budget(scans_per_sec))
        result["roofline"] = roof
        log(f"roofline: {roof}")
    return result


def bench_latency() -> dict:
    """Online-operation envelope (VERDICT r3 #3): single-frame callback
    latency through the session API (`LocalizerSession.push` — host
    preprocessing + H2D + the per-frame jitted step + D2H), p50/p99, plus
    the K-frame superblock program's latency — the numbers a robot
    integrator asks for next to throughput."""
    import jax
    import jax.numpy as jnp

    from slam_sensor_fusion_tpu.models.localization import (
        Localizer, build_frame_batch, coarse_attempt, init_state,
    )
    from slam_sensor_fusion_tpu.models.mapping import build_map_data
    from slam_sensor_fusion_tpu.models.pipeline_fast import (
        build_paged_frames, run_chunk_fast,
    )
    from slam_sensor_fusion_tpu.models.session import LocalizerSession
    from slam_sensor_fusion_tpu.utils import synthetic as syn
    from slam_sensor_fusion_tpu.utils.config import (
        CloudCapacity, ICPConfig, LocalizationConfig,
    )
    import dataclasses

    n_frames = int(os.environ.get("BENCH_LAT_FRAMES", "144"))
    warmup = 16
    log("latency: building world ...")
    rng = np.random.default_rng(0)
    world = syn.make_world(rng, extent=120.0, n_buildings=50, n_poles=150,
                           points_per_m2=24.0)
    poses = syn.make_trajectory(n_frames, speed_per_frame=0.15, radius=26.0)
    seq = syn.make_sequence(seed=0, world=world, poses=poses,
                            scan_points=24000)
    tiles = []
    map_rng = np.random.default_rng(1)
    for i in range(0, n_frames, 4):
        body = syn.render_scan(world, poses[i], map_rng, max_points=24000,
                               noise=0.005)
        tiles.append(body @ poses[i][:3, :3].T + poses[i][:3, 3])
    odom_pos, gps_rows = syn.make_mapping_logs(seq)
    map_data = build_map_data(tiles, odom_pos, gps_rows)

    # the per-frame engine an online integrator runs: fused-kernel ICP per
    # callback (no superblock batching — that is the throughput form)
    config = LocalizationConfig(
        block_kernel=False,
        superblock_parity=False,
        scan_subsample_step=8,
        icp=dataclasses.replace(ICPConfig(), mode="fast", tile_src=512),
        capacity=CloudCapacity(
            scan=4096, cropped_scan=4096, cropped_map=65536, map=1 << 20,
            bf_source=1024, bf_target=8192,
        ),
        map_subsample_step=1,
        brute_force_map_subsample_step=3,
    )
    sess = LocalizerSession(map_data, config, profile=True)

    def push(i):
        return sess.push(
            seq.scans[i], seq.odom_T_sensor[i], float(seq.gps_lat[i]),
            float(seq.gps_lon[i]), float(seq.gps_alt[i]),
            float(seq.compass_yaw[i]), float(seq.odom_cov_trace[i]),
            float(seq.gps_cov_trace[i]),
        )

    log("latency: warmup/compile ...")
    i = 0
    while i < len(seq.scans) and (i < warmup or not sess.coarse_done):
        push(i)
        i += 1
    lat, split = [], []
    while i < n_frames:
        t0 = time.perf_counter()
        out = push(i)
        lat.append(time.perf_counter() - t0)
        split.append(dict(sess.last_timing))
        i += 1
    lat_ms = np.asarray(lat) * 1000.0
    assert out.phase == "tracking"
    # where the frame budget goes (VERDICT r4 #3): host staging vs the
    # async dispatch call vs blocking on device outputs. On this
    # platform's tunnelled chip the dispatch+fetch legs carry the
    # per-call RPC; on a locally-attached TPU they collapse to sub-ms.
    split_p50 = {
        k: round(float(np.percentile([s[k] for s in split], 50)), 3)
        for k in ("host_ms", "dispatch_ms", "device_ms")
    }

    # the K-frame superblock program (the headline throughput form) driven
    # one block at a time: its latency is the freshness bound of a batched
    # deployment
    sb_cfg = dataclasses.replace(
        config,
        block_kernel=True,
        superblock_parity=True,
        icp=dataclasses.replace(config.icp, mode="parity"),
    )
    K = sb_cfg.superstep
    loc = Localizer(map_data, sb_cfg)
    gps_T = loc.gps_poses(seq.gps_lat, seq.gps_lon, seq.compass_yaw)
    state = init_state(
        sb_cfg, loc.map_cloud.capacity, jnp.asarray(gps_T[0]),
        jnp.asarray(seq.odom_T_sensor[0], jnp.float32),
    )
    fb0 = build_frame_batch(
        sb_cfg, [seq.scans[1]], seq.odom_T_sensor[1:2], gps_T[1:2],
        seq.odom_cov_trace[1:2], seq.gps_cov_trace[1:2], np.ones(1, bool),
    )
    cm0, ct0, ref0, _, coarse = coarse_attempt(
        state, fb0.scan_points[0], fb0.scan_mask[0], loc.map_cloud,
        jnp.asarray(gps_T[0]), sb_cfg,
    )
    state = state._replace(
        map_T_sensor=coarse.map_T_sensor, cropped_map=cm0,
        cached_target=ct0, map_T_ref=ref0,
    )
    on_tpu = any("TPU" in d.device_kind for d in jax.devices())
    blk_lat = []
    for b in range(1, (n_frames - 1) // K):
        i0, j0 = 1 + (b - 1) * K, 1 + b * K
        frames = jax.device_put(build_paged_frames(
            sb_cfg, seq.scans[i0:j0], seq.odom_T_sensor[i0:j0],
            gps_T[i0:j0], seq.odom_cov_trace[i0:j0],
            seq.gps_cov_trace[i0:j0], np.ones(K, bool),
        ))
        t0 = time.perf_counter()
        state, outs = run_chunk_fast(
            state, frames, loc.map_cloud, sb_cfg, interpret=not on_tpu
        )
        np.asarray(state.map_T_sensor)
        blk_lat.append(time.perf_counter() - t0)
    blk_ms = np.asarray(blk_lat[2:]) * 1000.0  # skip compile blocks

    # ---- dispatch-amortized micro-block sessions (VERDICT r4 #3): the
    # SAME callback contract, buffered K frames per device dispatch —
    # the mitigation for RPC-floor-dominated deployments. Reported as
    # block latency (the freshness bound) and per-frame amortized cost.
    from slam_sensor_fusion_tpu.models.session import BlockLocalizerSession

    micro = {}
    for Km in [int(k) for k in os.environ.get(
        "BENCH_LAT_MICROK", "2,4"
    ).split(",") if k.strip()]:
        m_cfg = dataclasses.replace(
            config,
            block_kernel=True,
            superblock_parity=True,
            superstep=Km,
            icp=dataclasses.replace(config.icp, mode="parity"),
        )
        msess = BlockLocalizerSession(map_data, m_cfg, profile=True)
        log(f"latency: micro-block K={Km} warmup/compile ...")
        i = 0
        flushed = 0  # steady-state block flushes only (compile warmers)
        while i < n_frames and (flushed < 4 or not msess.coarse_done):
            was_tracking = msess.coarse_done
            if msess.push(
                seq.scans[i], seq.odom_T_sensor[i], float(seq.gps_lat[i]),
                float(seq.gps_lon[i]), float(seq.gps_alt[i]),
                float(seq.compass_yaw[i]), float(seq.odom_cov_trace[i]),
                float(seq.gps_cov_trace[i]),
            ) and was_tracking:
                flushed += 1
            i += 1
        blat, bsplit = [], []
        t_block0 = None
        while i < n_frames:
            if t_block0 is None:
                t_block0 = time.perf_counter()
            outs = msess.push(
                seq.scans[i], seq.odom_T_sensor[i], float(seq.gps_lat[i]),
                float(seq.gps_lon[i]), float(seq.gps_alt[i]),
                float(seq.compass_yaw[i]), float(seq.odom_cov_trace[i]),
                float(seq.gps_cov_trace[i]),
            )
            if outs:
                blat.append(time.perf_counter() - t_block0)
                bsplit.append(dict(msess.last_timing))
                t_block0 = None
                assert outs[-1].phase == "tracking"
            i += 1
        bms = np.asarray(blat) * 1e3
        micro[f"K{Km}"] = {
            "block_p50_ms": round(float(np.percentile(bms, 50)), 3),
            "block_p99_ms": round(float(np.percentile(bms, 99)), 3),
            "per_frame_p50_ms": round(
                float(np.percentile(bms, 50)) / Km, 3
            ),
            "split_p50_ms": {
                k: round(float(np.percentile([s[k] for s in bsplit], 50)), 3)
                for k in ("host_ms", "dispatch_ms", "device_ms")
            },
            "n_blocks": len(bms),
        }
        log(f"latency: micro-block K={Km}: {micro[f'K{Km}']}")

    res = {
        "metric": "single-frame callback latency (session push)",
        "value": round(float(np.percentile(lat_ms, 50)), 3),
        "unit": "ms p50",
        "push_p50_ms": round(float(np.percentile(lat_ms, 50)), 3),
        "push_p99_ms": round(float(np.percentile(lat_ms, 99)), 3),
        "push_mean_ms": round(float(lat_ms.mean()), 3),
        "push_split_p50_ms": split_p50,
        "micro_block": micro,
        "superblock_K": K,
        "superblock_p50_ms": round(float(np.percentile(blk_ms, 50)), 3),
        "superblock_p99_ms": round(float(np.percentile(blk_ms, 99)), 3),
        "n_timed": len(lat_ms),
    }
    log(f"latency: {res}")
    return res


def bench_map() -> dict:
    """Mapping throughput (VERDICT r3 #2): skewed scans -> on-device
    deskew -> map-frame transform -> incremental voxel-map insert, all one
    lax.scan program — the mapping product's accumulate loop
    (map_data_save_node.cpp:60-99) device-resident."""
    import jax
    import jax.numpy as jnp

    from slam_sensor_fusion_tpu.ops.deskew import deskew, se3_log
    from slam_sensor_fusion_tpu.ops.voxel_map import (
        VoxelMapConfig, voxel_map_init, voxel_map_insert,
    )
    from slam_sensor_fusion_tpu.utils import synthetic as syn

    n_frames = int(os.environ.get("BENCH_MAP_FRAMES", "512"))
    scan_cap = int(os.environ.get("BENCH_MAP_SCAN_CAP", "16384"))
    voxel = float(os.environ.get("BENCH_MAP_VOXEL", "0.2"))
    # frames per table update: the insert is LAUNCH-bound (measured:
    # ~3.8 ms/frame for ~1.3M scatter elements, far off element-rate), so
    # batching frames into one update is near-linear speedup. Sums/counts
    # are associative — batching is bit-identical to per-frame inserts —
    # and the reference's own recorder only materializes every 10th frame
    # (map_data_save_node.h:72), so batch=8 UPDATES the map more often
    # than the reference persists it.
    batch = int(os.environ.get("BENCH_MAP_BATCH", "8"))

    import pickle

    cache_path = f"/tmp/sfbench_mapworld_v1_{n_frames}_{scan_cap}.pkl"
    if os.environ.get("BENCH_NO_CACHE", "0") != "1" and os.path.exists(cache_path):
        log(f"map: loading cached scans ({cache_path})")
        with open(cache_path, "rb") as f:
            poses, scans, taus = pickle.load(f)
    else:
        log("map: rendering skewed scans ...")
        rng = np.random.default_rng(0)
        world = syn.make_world(rng, extent=140.0, n_buildings=70,
                               n_poles=200, points_per_m2=24.0)
        poses = syn.make_trajectory(n_frames, speed_per_frame=0.15,
                                    radius=30.0)
        scans, taus = [], []
        for i in range(n_frames):
            pts, tau = syn.render_scan_skewed(
                world, poses[max(i - 1, 0)], poses[i], rng,
                max_points=scan_cap, max_range=25.0,
            )
            scans.append(pts)
            taus.append(tau)
        if os.environ.get("BENCH_NO_CACHE", "0") != "1":
            with open(cache_path, "wb") as f:
                pickle.dump((poses, scans, taus), f)

    origin = np.array([-100.0, -100.0, -10.0], np.float32)

    # size the dedup stage from the data (autosize-style): measure unique
    # cells per insert group on a few sample groups, take 1.5x headroom.
    # n_dropped == 0 is asserted below, so an undersized guess is loud.
    uniq_env = os.environ.get("BENCH_MAP_UNIQ")
    if uniq_env is not None:
        uniq_cap = int(uniq_env)
    else:
        n_groups = max(n_frames // batch, 1)
        worst = 0
        for g in {0, n_groups // 2, n_groups - 1}:
            pts = []
            for i in range(g * batch, min((g + 1) * batch, n_frames)):
                s = scans[i][:scan_cap]
                pts.append(s @ poses[i][:3, :3].T + poses[i][:3, 3])
            p = np.concatenate(pts)
            ijk = np.floor((p - origin) / voxel).astype(np.int64)
            assert ijk.min() >= 0 and ijk.max() < (1 << 21), (
                "sample cells out of packable range — origin above data min?"
            )
            packed = (ijk[:, 0] << 42) + (ijk[:, 1] << 21) + ijk[:, 2]
            worst = max(worst, len(np.unique(packed)))
        uniq_cap = min(batch * scan_cap, -(-int(worst * 1.5) // 4096) * 4096)
        log(f"map: unique cells/group <= {worst} -> unique_capacity {uniq_cap}")

    # insert implementation: "sorted" (default) is the sort-merge store —
    # measured v5e primitives: random claim/scatter rounds + nonzero
    # compactions in the hash insert cost ~15 ms/group while the same
    # merge as sort-shaped work is ~5 ms (see ops/voxel_map_sorted.py
    # header for the numbers); "hash" keeps the open-addressing store
    impl = os.environ.get("BENCH_MAP_IMPL", "sorted")
    if impl == "sorted":
        from slam_sensor_fusion_tpu.ops.voxel_map_sorted import (
            SortedVoxelMapConfig,
            sorted_voxel_map_init,
            sorted_voxel_map_insert,
        )

        cfg = SortedVoxelMapConfig(
            voxel_size=voxel,
            capacity=1 << int(os.environ.get("BENCH_MAP_CAP_LOG2", "18")),
            unique_capacity=uniq_cap,
            dim_xy=1024,
            dim_z=128,
        )
        insert_fn, init_fn = sorted_voxel_map_insert, sorted_voxel_map_init
    else:
        cfg = VoxelMapConfig(
            voxel_size=voxel,
            table_size=1 << int(os.environ.get("BENCH_MAP_TABLE_LOG2", "21")),
            max_probes=int(os.environ.get("BENCH_MAP_PROBES", "8")),
            # straggler compaction scales with the grouped insert width
            straggler_capacity=max(1024, batch * 512),
            dim_xy=1024,
            dim_z=128,
            unique_capacity=uniq_cap,
        )
        insert_fn, init_fn = voxel_map_insert, voxel_map_init

    sp = np.zeros((n_frames, scan_cap, 3), np.float32)
    sm = np.zeros((n_frames, scan_cap), bool)
    tp = np.ones((n_frames, scan_cap), np.float32)
    for i, (s, t) in enumerate(zip(scans, taus)):
        n = min(len(s), scan_cap)
        sp[i, :n] = s[:n]
        sm[i, :n] = True
        tp[i, :n] = t[:n]
    # per-frame twists for deskew (prev -> curr, ground truth like the
    # recorder's registered input stream)
    xi = np.stack([
        np.asarray(se3_log(jnp.asarray(
            (np.linalg.inv(poses[max(i - 1, 0)].astype(np.float64))
             @ poses[i].astype(np.float64)).astype(np.float32))))
        for i in range(n_frames)
    ])

    @jax.jit
    def run(state, frames):
        def body(carry, frame):
            # a frame here is a BATCH of `batch` scans: deskew each with
            # its own twist (vmap), then one table update for the group
            pts, msk, tau, tw, T = frame
            fixed = jax.vmap(deskew)(pts, tau, tw)
            world_pts = jnp.einsum("bij,bnj->bni", T[:, :3, :3], fixed) \
                + T[:, None, :3, 3]
            return (
                insert_fn(
                    carry,
                    world_pts.reshape(-1, 3),
                    msk.reshape(-1),
                    cfg,
                ),
                None,
            )

        state, _ = jax.lax.scan(body, state, frames)
        return state

    nb = n_frames // batch * batch  # whole groups only
    if nb != n_frames:
        log(f"map: truncating to {nb} frames ({batch}-frame groups)")

    def group(a):
        a = np.asarray(a)[:nb]
        return a.reshape(nb // batch, batch, *a.shape[1:])

    frames = tuple(
        jax.device_put(jnp.asarray(group(a)))
        for a in (sp, sm, tp, xi.astype(np.float32),
                  poses.astype(np.float32))
    )
    n_frames = nb
    init = init_fn(cfg, origin)
    log("map: compiling ...")
    t0 = time.perf_counter()
    st = run(init, frames)
    int(st.n_dropped)
    log(f"map: compile+first pass: {time.perf_counter() - t0:.1f}s")

    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    elapsed = float("inf")
    for r in range(max(repeats, 1)):
        t0 = time.perf_counter()
        st = run(init, frames)
        int(st.n_dropped)  # forced host read: timing barrier
        elapsed = min(elapsed, time.perf_counter() - t0)
    n_cells = int(st.n_cells())
    dropped, oob = int(st.n_dropped), int(st.n_oob)
    log(f"map: frames {n_frames}  elapsed {elapsed:.3f}s  cells {n_cells}"
        f"  dropped {dropped}  oob {oob}")
    assert dropped == 0, f"voxel table probe budget exhausted: {dropped}"
    assert oob == 0, f"points outside grid extents: {oob}"
    return {
        "metric": "mapping scans/sec (deskew + device voxel-map insert)",
        "value": round(n_frames / elapsed, 2),
        "unit": "scans/sec",
        "map_cells": n_cells,
        "voxel_m": voxel,
        "impl": impl,
        "group": batch,
    }


def bench_kitti() -> dict:
    """KITTI-format end-to-end (VERDICT r3 #1 — the north-star metric's
    own format): load `sequences/<seq>` through the real loader, synthesize
    the per-point times / IMU / GPS the odometry benchmark doesn't ship,
    and run the full native LIO stack. `KITTI_ROOT` points at a real
    dataset; without it a synthetic KITTI-layout fixture is generated and
    consumed through the SAME loader path."""
    import jax
    import jax.numpy as jnp

    from slam_sensor_fusion_tpu.models import lio
    from slam_sensor_fusion_tpu.models.ekf import EKFConfig
    from slam_sensor_fusion_tpu.ops.morton import sort_order_numpy
    from slam_sensor_fusion_tpu.ops.point_to_plane import PointToPlaneConfig
    from slam_sensor_fusion_tpu.utils import kitti

    root = os.environ.get("KITTI_ROOT")
    seq_name = os.environ.get("BENCH_KITTI_SEQ", "00")
    source = "real"
    if root:
        n_frames = int(os.environ.get("BENCH_KITTI_FRAMES", "512"))
    else:
        source = "fixture"
        n_frames = int(os.environ.get("BENCH_KITTI_FRAMES", "256"))
        fix_pts = int(os.environ.get("BENCH_KITTI_FIXTURE_PTS", "16384"))
        root = f"/tmp/sfbench_kitti_v1_{n_frames}_{fix_pts}"
        if not os.path.exists(os.path.join(root, "poses", "00.txt")):
            log(f"kitti: generating fixture at {root} ...")
            kitti.make_synthetic_kitti(
                root, n_frames=n_frames, max_points=fix_pts, extent=140.0
            )
    log(f"kitti: loading {root} seq {seq_name} ({source}) ...")
    seq = kitti.load_sequence(root, seq_name, max_frames=n_frames)
    n_frames = len(seq.scans)

    scan_cap = int(
        os.environ.get(
            "BENCH_KITTI_SCAN_CAP",
            str(kitti.suggest_scan_capacity(seq.scans)),
        )
    )
    on_tpu = any("TPU" in d.device_kind for d in jax.devices())
    # real KITTI scans are ~8x the synthetic density; register on a
    # sparser subset (association cost scales with it), keep deskew +
    # ring insert full-density. Fixture sweep (v5e, 255 frames, 16k-pt
    # scans @ cap 32768): rs4 -> 687.7 @ ATE 0.068, rs8 -> 801.6 @ 0.052,
    # rs16 -> 890.1 @ 0.078 — rs8 is the accuracy/throughput knee (past
    # it, full-density deskew + ring inserts dominate the frame).
    reg_sub = int(os.environ.get(
        "BENCH_KITTI_REG_SUB", "16" if source == "real" else "8"
    ))
    config = lio.LIOConfig(
        scan_capacity=scan_cap,
        window=int(os.environ.get("BENCH_LIO_WINDOW", "16")),
        slot_points=int(os.environ.get("BENCH_LIO_SLOT", "4096")),
        refresh_every=int(os.environ.get("BENCH_LIO_REFRESH", "16")),
        p2p=PointToPlaneConfig(
            nn_backend="fused" if on_tpu else "xla",
            num_iterations=int(os.environ.get("BENCH_LIO_ITERS", "2")),
            fixed_correspondences=True,
            reassoc_margin=0.15,
            tile_src=int(os.environ.get("BENCH_LIO_TILE_SRC", "512")),
            tile_tgt=int(os.environ.get("BENCH_LIO_TILE_TGT", "1024")),
            max_visits=int(os.environ.get("BENCH_LIO_MAX_VISITS", "64")),
            assoc_unroll=int(os.environ.get("BENCH_LIO_UNROLL", "1")),
        ),
        reg_subsample=reg_sub,
        anchor_subsample=2,
        normal_est="cells",
        # KITTI-shape scans want finer normal cells than the sparse
        # synthetic survey (v5e sweep at rs8: 1.8 -> ATE 0.052,
        # 1.2 -> 0.0297, 0.9 -> 0.0297 plateau; throughput unchanged —
        # the cell estimator is not the frame's cost center)
        normal_voxel=float(os.environ.get("BENCH_LIO_NORMAL_VOXEL", "1.2")),
        icp_cov_mode="gn",
        icp_pos_std=0.3,
        superstep_slack=float(os.environ.get("BENCH_LIO_SLACK", "0.05")),
        slack_base=float(os.environ.get("BENCH_LIO_SLACK_BASE", "0.1")),
        ekf=EKFConfig(init_pos_std=0.1, init_vel_std=0.1),
    )

    # loader contract: synthesized sweep fractions ride the Morton order
    sp = np.zeros((n_frames, scan_cap, 3), np.float32)
    sm = np.zeros((n_frames, scan_cap), bool)
    tp = np.ones((n_frames, scan_cap), np.float32)
    clipped = 0
    for i, s in enumerate(seq.scans):
        tau = kitti.azimuth_taus(s)
        order = sort_order_numpy(s, isotropic=True)
        n = min(len(s), scan_cap)
        clipped += max(len(s) - scan_cap, 0)
        sp[i, :n] = s[order][:n]
        sm[i, :n] = True
        tp[i, :n] = tau[order][:n]
    assert clipped == 0, (
        f"{clipped} points truncated: capacity {scan_cap} under-sized "
        "(suggest_scan_capacity would not have picked this)"
    )

    gyro, accel, dts = kitti.synthesize_imu(seq.poses)
    gps_noise = float(os.environ.get("BENCH_KITTI_GPS_NOISE", "0.5"))
    gps = (
        seq.poses[1:, :3, 3]
        + np.random.default_rng(3).normal(0, gps_noise, (n_frames - 1, 3))
    ).astype(np.float32)

    state = lio.init_state(
        config, jnp.asarray(sp[0]), jnp.asarray(sm[0]),
        jnp.asarray(seq.poses[0], jnp.float32),
    )
    v0 = (seq.poses[1, :3, 3] - seq.poses[0, :3, 3]) / 0.1
    state = state._replace(
        ekf_state=state.ekf_state._replace(v=jnp.asarray(v0, jnp.float32))
    )
    driver = os.environ.get(
        "BENCH_LIO_DRIVER", "block" if on_tpu else "blocks"
    )
    run_fn = (
        lio.run_lio_superblocks if driver == "block" else lio.run_lio_blocks
    )
    batch = tuple(
        jax.device_put(jnp.asarray(a))
        for a in (
            sp[1:], sm[1:], gyro, accel, dts, gps,
            np.full(n_frames - 1, gps_noise**2, np.float32),
            np.ones(n_frames - 1, bool), tp[1:],
        )
    )

    log(f"kitti: compiling (cap {scan_cap}, reg_sub {reg_sub}) ...")
    t0 = time.perf_counter()
    ws, _ = run_fn(state, *batch[:-1], config, scan_tau=batch[-1])
    np.asarray(ws.ekf_state.p)
    log(f"kitti: compile+first pass: {time.perf_counter() - t0:.1f}s")

    trace_dir = os.environ.get("BENCH_TRACE")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    repeats = int(os.environ.get("BENCH_REPEATS", "1" if trace_dir else "3"))
    elapsed = float("inf")
    outs = None
    for r in range(max(repeats, 1)):
        t0 = time.perf_counter()
        s, o = run_fn(state, *batch[:-1], config, scan_tau=batch[-1])
        np.asarray(s.ekf_state.p)
        dt = time.perf_counter() - t0
        log(f"  kitti pass {r}: {dt:.3f}s")
        elapsed = min(elapsed, dt)
        if outs is None:
            outs = o
    if trace_dir:
        jax.profiler.stop_trace()
        from slam_sensor_fusion_tpu.utils.profiling import summarize_trace

        for name, ms, n in summarize_trace(trace_dir, top=30):
            log(f"  trace {ms:9.3f} ms  x{n:<5d} {name}")
    est = np.asarray(outs.world_T_body)
    gt = seq.poses[1:]
    ate = float(np.sqrt(((est[:, :3, 3] - gt[:, :3, 3]) ** 2).sum(-1).mean()))
    n_ovf = (
        int(np.asarray(outs.pair_overflow).sum())
        if outs.pair_overflow is not None else 0
    )
    log(f"kitti: frames {n_frames - 1}  elapsed {elapsed:.3f}s  "
        f"ATE {ate:.3f} m  overflow {n_ovf}")
    assert n_ovf == 0, f"pair list overflow on {n_ovf} frames"
    return {
        "metric": f"KITTI-format LIO scans/sec ({source} seq {seq_name})",
        "value": round((n_frames - 1) / elapsed, 2),
        "unit": "scans/sec",
        "vs_baseline": round((n_frames - 1) / elapsed / 1000.0, 4),
        "ate_rmse_m": round(ate, 4),
        "source": source,
        "frames": n_frames,
        "scan_capacity": scan_cap,
    }


def bench_kitti_loc() -> dict:
    """KITTI-format data through the LOCALIZATION product — the reference's
    own per-scan pipeline (localization_node.cpp:263-374) fed from the
    KITTI loader instead of the synthetic world. Scans + ground truth come
    from `KITTI_ROOT` (or the generated fixture); the map is the mapping
    product's artifact (every 4th scan at its ground-truth pose, merged +
    voxel-downsampled, global_map_frames_manager.cpp:110-151); the streams
    the odometry benchmark doesn't ship — upstream LIO odometry, GPS
    NavSatFix, compass heading (localization_node.cpp:80-84) — are
    synthesized from ground truth (synthetic.make_sequence_from_scans).
    The measured loop is bench_loc's, unchanged."""
    from slam_sensor_fusion_tpu.models.mapping import build_map_data
    from slam_sensor_fusion_tpu.utils import kitti
    from slam_sensor_fusion_tpu.utils import synthetic as syn

    root = os.environ.get("KITTI_ROOT")
    seq_name = os.environ.get("BENCH_KITTI_SEQ", "00")
    source = "real"
    if root:
        n_frames = int(os.environ.get("BENCH_KITTI_FRAMES", "512"))
    else:
        source = "fixture"
        n_frames = int(os.environ.get("BENCH_KITTI_FRAMES", "256"))
        fix_pts = int(os.environ.get("BENCH_KITTI_FIXTURE_PTS", "16384"))
        root = f"/tmp/sfbench_kitti_v1_{n_frames}_{fix_pts}"
        if not os.path.exists(os.path.join(root, "poses", "00.txt")):
            log(f"kitti-loc: generating fixture at {root} ...")
            kitti.make_synthetic_kitti(
                root, n_frames=n_frames, max_points=fix_pts, extent=140.0
            )
    log(f"kitti-loc: loading {root} seq {seq_name} ({source}) ...")
    kseq = kitti.load_sequence(root, seq_name, max_frames=n_frames)
    n_frames = len(kseq.scans)

    # The reference's localization node consumes the upstream LIO's
    # DESKEWED registered clouds (/cloud_registered_body,
    # localization_node.cpp:80) — raw KITTI scans carry intra-sweep
    # skew the upstream stack removes before this product ever sees
    # them. Feeding deskewed scans is therefore parity-faithful, not a
    # shortcut (VERDICT r4 #6); the GT relative twist stands in for the
    # upstream LIO's motion estimate.
    scans = kseq.scans
    if os.environ.get("BENCH_KITTI_LOC_DESKEW", "1") == "1":
        from slam_sensor_fusion_tpu.ops.deskew import (
            deskew_numpy,
            se3_log_numpy,
        )

        log("kitti-loc: deskewing scans with GT twists (upstream-LIO "
            "contract) ...")
        scans = []
        for i, s in enumerate(kseq.scans):
            if i == 0:
                scans.append(s)
                continue
            rel = (
                np.linalg.inv(kseq.poses[i - 1].astype(np.float64))
                @ kseq.poses[i].astype(np.float64)
            )
            scans.append(
                deskew_numpy(s, kitti.azimuth_taus(s), se3_log_numpy(rel))
            )

    seq = syn.make_sequence_from_scans(scans, kseq.poses)
    tiles = [
        (s @ kseq.poses[i][:3, :3].T + kseq.poses[i][:3, 3]).astype(np.float32)
        for i, s in enumerate(scans)
        if i % 4 == 0
    ]
    odom_pos, gps_rows = syn.make_mapping_logs(seq)
    map_data = build_map_data(tiles, odom_pos, gps_rows)
    log(f"kitti-loc: map points {map_data.map_points.shape}")

    raw = max(len(s) for s in kseq.scans)
    map_cap_log2 = int(np.ceil(np.log2(max(len(map_data.map_points), 1024))))
    ov = {
        "BENCH_SCAN_POINTS": str(raw),
        "BENCH_MAP_CAP_LOG2": str(map_cap_log2),
    }
    res = bench_loc(
        overrides=ov,
        data=(np.asarray(kseq.poses, np.float32), seq, map_data),
        metric=(
            f"KITTI-format localization scans/sec ({source} seq {seq_name})"
        ),
    )
    res["source"] = source
    res["frames"] = n_frames
    return res


def bench_shard_compile() -> dict:
    """Mosaic-compile every shard_map production program on a REAL
    1-device mesh (VERDICT r4 #2): until now the multi-device paths only
    ever ran interpret-mode Pallas on the virtual CPU mesh, which
    validates semantics but not Mosaic lowering under shard_map. This
    section builds `Mesh(jax.devices()[:1])` and compiles + executes each
    program with `interpret=False` on the TPU (on CPU it falls back to
    interpret mode so the section stays runnable everywhere), recording
    per-program pass/fail + first-call (compile) and cached-call wall
    times in the JSON."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from slam_sensor_fusion_tpu.models import pipeline_fast as pf
    from slam_sensor_fusion_tpu.models.lio import LIOConfig
    from slam_sensor_fusion_tpu.models.localization import init_state
    from slam_sensor_fusion_tpu.ops import cloud as cl
    from slam_sensor_fusion_tpu.ops.icp import icp_align
    from slam_sensor_fusion_tpu.ops.morton import sort_points_numpy
    from slam_sensor_fusion_tpu.ops.p2p_fused import (
        build_cached_p2p_target,
        point_to_plane_align_fused,
    )
    from slam_sensor_fusion_tpu.ops.point_to_plane import (
        PointToPlaneConfig,
        estimate_normals,
    )
    from slam_sensor_fusion_tpu.ops.voxel_map import (
        VoxelMapConfig,
        voxel_map_centroids_numpy,
        voxel_map_init,
        voxel_map_insert,
    )
    from slam_sensor_fusion_tpu.parallel.batch import (
        fleet_run_chunk_fast,
        shard_batch,
    )
    from slam_sensor_fusion_tpu.parallel.lio_fleet import (
        fleet_init,
        fleet_run_lio_superblocks,
    )
    from slam_sensor_fusion_tpu.parallel.map_shard import (
        shard_cloud,
        shard_p2p_target,
        sp_icp_align,
        sp_init_state,
        sp_p2p_align,
        sp_run_chunk,
    )
    from slam_sensor_fusion_tpu.parallel.mesh import make_mesh
    from slam_sensor_fusion_tpu.parallel.voxel_map_shard import (
        sp_voxel_map_centroids_numpy,
        sp_voxel_map_flags,
        sp_voxel_map_init,
        sp_voxel_map_insert_chunk,
    )
    from slam_sensor_fusion_tpu.utils.config import (
        BruteForceConfig,
        CloudCapacity,
        LocalizationConfig,
        StochasticFilterConfig,
    )

    on_tpu = any("TPU" in d.device_kind for d in jax.devices())
    interp = not on_tpu
    B = 1
    mesh = make_mesh(B)
    sp_mesh = make_mesh(B, axis="sp")

    config = LocalizationConfig(
        capacity=CloudCapacity(
            scan=2048, cropped_scan=2048, cropped_map=4096, map=8192,
            bf_source=128, bf_target=512,
        ),
        brute_force=BruteForceConfig(
            x_step=0.2, y_step=0.2, z_step=0.1,
            x_range=0.4, y_range=0.4, z_range=0.2,
            yaw_step=np.pi / 18, yaw_range=np.pi / 18,
        ),
        map_subsample_step=1,
    )
    eye = jnp.eye(4, dtype=jnp.float32)
    results: dict[str, dict] = {}

    def run(name, thunk):
        log(f"shard: {name} (interpret={interp}) ...")
        try:
            t0 = time.perf_counter()
            thunk()
            t_compile = time.perf_counter() - t0
            t0 = time.perf_counter()
            thunk()
            t_cached = time.perf_counter() - t0
            results[name] = {
                "status": "ok",
                "first_call_s": round(t_compile, 2),
                "cached_ms": round(t_cached * 1e3, 1),
            }
            log(f"shard: {name} OK "
                f"(first {t_compile:.1f}s, cached {t_cached * 1e3:.0f}ms)")
        except Exception as e:  # noqa: BLE001 — reported per program
            import traceback

            log(traceback.format_exc())
            results[name] = {
                "status": "fail", "error": f"{type(e).__name__}: {e}"
            }

    # ---- 1. superblock LIO fleet (whole-block Pallas LIO kernel under
    # shard_map over dp)
    lio_cfg = LIOConfig(
        scan_capacity=256, window=2, slot_points=256, refresh_every=2,
        p2p=PointToPlaneConfig(
            nn_backend="xla", num_iterations=2, normal_voxel=2.0
        ),
        normal_est="cells", normal_voxel=2.0,
    )
    Tl, K = 4, 3
    rng = np.random.default_rng(0)
    sp0 = jnp.asarray(rng.uniform(-5, 5, (B, 256, 3)).astype(np.float32))
    sm0 = jnp.ones((B, 256), bool)
    lio_in = (
        jnp.asarray(rng.uniform(-5, 5, (B, Tl, 256, 3)).astype(np.float32)),
        jnp.ones((B, Tl, 256), bool),
        jnp.zeros((B, Tl, K, 3), jnp.float32),
        jnp.zeros((B, Tl, K, 3), jnp.float32)
        + jnp.asarray([0, 0, 9.81], jnp.float32),
        jnp.full((B, Tl, K), 0.033, jnp.float32),
        jnp.zeros((B, Tl, 3), jnp.float32),
        jnp.ones((B, Tl), jnp.float32),
        jnp.zeros((B, Tl), bool),
    )
    lio_in = tuple(shard_batch(x, mesh) for x in lio_in)

    def _lio():
        st = fleet_init(
            lio_cfg, sp0, sm0, jnp.broadcast_to(eye, (B, 4, 4))
        )
        st = shard_batch(st, mesh)
        fin, outs = fleet_run_lio_superblocks(
            st, *lio_in, lio_cfg, mesh=mesh, interpret=interp
        )
        jax.block_until_ready((fin, outs))
        assert outs.world_T_body.shape == (B, Tl, 4, 4)
        assert bool(np.isfinite(np.asarray(outs.world_T_body)).all())

    run("lio_superblock_fleet", _lio)

    # ---- 2. fast (superblock localization) fleet under shard_map
    T = 2
    fast_cfg = dataclasses.replace(config, block_kernel=True, superstep=T)
    rngf = np.random.default_rng(1)
    map_pts = rngf.uniform(-20, 20, (4096, 3)).astype(np.float32)
    map_cloud = cl.from_numpy(map_pts, config.capacity.map)
    scans_np = [
        rngf.uniform(-10, 10, (1024, 3)).astype(np.float32) for _ in range(T)
    ]
    pframes = pf.build_paged_frames(
        fast_cfg, scans_np,
        np.broadcast_to(np.eye(4, dtype=np.float32), (T, 4, 4)),
        np.broadcast_to(np.eye(4, dtype=np.float32), (T, 4, 4)),
        np.full(T, 0.05, np.float32), np.ones(T, np.float32),
        np.ones(T, bool),
    )
    state0 = init_state(config, config.capacity.map, eye, eye)

    def _fast():
        bstate = shard_batch(
            jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), state0),
            mesh,
        )
        bframes = shard_batch(
            jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), pframes),
            mesh,
        )
        bmaps = shard_batch(
            jax.tree.map(
                lambda x: jnp.broadcast_to(x, (B,) + x.shape), map_cloud
            ),
            mesh,
        )
        fin, outs = fleet_run_chunk_fast(
            bstate, bframes, bmaps, fast_cfg, mesh, interpret=interp
        )
        jax.block_until_ready((fin, outs))
        assert outs.map_T_sensor.shape == (B, T, 4, 4)

    run("fast_superblock_fleet", _fast)

    # ---- 3+4. map-sharded (sp) ICP and point-to-plane: production pair
    # kernels per shard + ICI min-combine; checked EQUAL to single-device
    icp_cfg = dataclasses.replace(
        config.icp, nn_backend="pallas", pallas_interpret=interp,
        tile_src=128, tile_tgt=128, max_pairs_factor=64,
    )
    rng_sp = np.random.default_rng(5)
    sp_tgt = sort_points_numpy(
        rng_sp.uniform(-8, 8, (1500, 3)).astype(np.float32)
    )
    sp_src = sp_tgt[rng_sp.choice(1500, 300, replace=False)] - np.asarray(
        [0.08, 0.05, 0.02], np.float32
    )
    sps = jnp.zeros((384, 3), jnp.float32).at[:300].set(jnp.asarray(sp_src))
    spm = jnp.zeros(384, bool).at[:300].set(True)
    spt = jnp.zeros((1536, 3), jnp.float32).at[:1500].set(jnp.asarray(sp_tgt))
    sptm = jnp.zeros(1536, bool).at[:1500].set(True)
    shards, shard_mask = shard_cloud(sp_tgt, B, icp_cfg.tile_tgt)

    def _sp_icp():
        icp_single = icp_align(sps, spm, spt, sptm, eye, icp_cfg)
        icp_sp = sp_icp_align(
            sps, spm, jnp.asarray(shards), jnp.asarray(shard_mask),
            eye, icp_cfg, sp_mesh, interpret=interp,
        )
        jax.block_until_ready(icp_sp)
        np.testing.assert_allclose(
            np.asarray(icp_sp.transformation),
            np.asarray(icp_single.transformation), atol=1e-4,
        )

    run("sp_map_icp", _sp_icp)

    p2p_cfg = PointToPlaneConfig(
        tile_src=128, tile_tgt=128, fixed_correspondences=True
    )
    nrm, nvalid = estimate_normals(spt, sptm, voxel=4.0)

    def _sp_p2p():
        cached = build_cached_p2p_target(
            spt, sptm, nrm, nvalid, jnp.zeros(3, jnp.float32), p2p_cfg.tile_tgt
        )
        single = point_to_plane_align_fused(
            sps, spm, cached, eye, p2p_cfg, interpret=interp
        )
        tgt_sh = shard_p2p_target(
            sp_tgt, np.asarray(nrm)[:1500], np.asarray(nvalid)[:1500],
            B, p2p_cfg.tile_tgt,
        )
        got = sp_p2p_align(
            sps, spm, tgt_sh, eye, p2p_cfg, sp_mesh, interpret=interp
        )
        jax.block_until_ready(got)
        np.testing.assert_allclose(
            np.asarray(got.transformation),
            np.asarray(single.transformation), atol=1e-4,
        )
        assert int(got.n_correspondences) == int(single.n_correspondences)

    run("sp_map_p2p", _sp_p2p)

    # ---- 5. sp steady-state trajectory (predict/blend/gate/ICP against
    # the sharded map, chunked scan)
    Tsp = 4
    sp_cfg_traj = dataclasses.replace(
        icp_cfg, max_visits=64, max_pairs_factor=64
    )
    fcfg = StochasticFilterConfig()
    traj_sp = jnp.stack([
        jnp.asarray(sp_src - np.array([0.02, 0.01, 0.0], np.float32) * k)
        for k in range(Tsp)
    ])
    traj_pts = jnp.zeros((Tsp, 384, 3), jnp.float32).at[:, :300].set(traj_sp)
    traj_msk = jnp.zeros((Tsp, 384), bool).at[:, :300].set(True)
    pose_k = jnp.stack([
        jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(
            jnp.asarray([0.02, 0.01, 0.0]) * k
        )
        for k in range(Tsp)
    ])
    covs = jnp.full((Tsp,), 0.05, jnp.float32)

    def _sp_chunk():
        st0 = sp_init_state(eye, eye, fcfg)
        st, traj = sp_run_chunk(
            st0, traj_pts, traj_msk, pose_k, pose_k, covs, covs,
            jnp.asarray(shards), jnp.asarray(shard_mask),
            sp_cfg_traj, fcfg, sp_mesh, interpret=interp,
        )
        jax.block_until_ready((st, traj))
        assert not bool(np.asarray(traj.pair_overflow).any())
        assert bool(np.isfinite(np.asarray(traj.map_T_sensor)).all())

    run("sp_steady_state", _sp_chunk)

    # ---- 5b. sp steady-state THROUGHPUT (VERDICT r4 #7): the map-
    # sharded pipeline timed at production-ish shapes on the real chip,
    # so its compiled performance is a recorded number instead of
    # unknown. Equality vs the single-device loop is spot-checked on
    # the first chunk.
    if on_tpu and results.get("sp_steady_state", {}).get("status") == "ok":
        try:
            from slam_sensor_fusion_tpu.parallel.map_shard import (
                sp_run_chunk_single,
            )
            from slam_sensor_fusion_tpu.utils import synthetic as syn

            Tsp2 = int(os.environ.get("BENCH_SP_FRAMES", "128"))
            rng_w = np.random.default_rng(7)
            world = syn.make_world(rng_w, extent=100.0, n_buildings=40,
                                   n_poles=120, points_per_m2=12.0)
            poses_sp = syn.make_trajectory(
                Tsp2, speed_per_frame=0.12, radius=22.0
            )
            map_pts = sort_points_numpy(np.concatenate([
                (syn.render_scan(world, poses_sp[i], rng_w,
                                 max_points=12000, noise=0.005)
                 @ poses_sp[i][:3, :3].T + poses_sp[i][:3, 3])
                for i in range(0, Tsp2, 8)
            ]).astype(np.float32))
            sp_icp2 = dataclasses.replace(
                config.icp, nn_backend="pallas", pallas_interpret=False,
                tile_src=512, tile_tgt=128, max_visits=128,
                max_pairs_factor=128,
            )
            S2 = 2048
            scans2 = np.zeros((Tsp2, S2, 3), np.float32)
            masks2 = np.zeros((Tsp2, S2), bool)
            for i in range(Tsp2):
                body = syn.render_scan(world, poses_sp[i], rng_w,
                                       max_points=8000, noise=0.005)
                body = body[:: max(len(body) // S2, 1)][:S2]
                scans2[i, : len(body)] = body
                masks2[i, : len(body)] = True
            covs2 = np.full((Tsp2,), 0.05, np.float32)
            sh2, shm2 = shard_cloud(map_pts, B, sp_icp2.tile_tgt)
            pose_j = jnp.asarray(poses_sp, jnp.float32)
            st0 = sp_init_state(pose_j[0], pose_j[0], fcfg)
            a = (
                st0, jnp.asarray(scans2), jnp.asarray(masks2), pose_j,
                pose_j, jnp.asarray(covs2), jnp.asarray(covs2),
            )
            stA, trajA = sp_run_chunk(
                *a, jnp.asarray(sh2), jnp.asarray(shm2),
                sp_icp2, fcfg, sp_mesh, interpret=False,
            )
            np.asarray(stA.map_T_sensor)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                stA, trajA = sp_run_chunk(
                    *a, jnp.asarray(sh2), jnp.asarray(shm2),
                    sp_icp2, fcfg, sp_mesh, interpret=False,
                )
                np.asarray(stA.map_T_sensor)
                best = min(best, time.perf_counter() - t0)
            # spot equality vs the single-device loop
            mpad = -(len(map_pts)) % sp_icp2.tile_tgt
            mp = np.concatenate(
                [map_pts, np.zeros((mpad, 3), np.float32)]
            )
            mm = np.concatenate(
                [np.ones(len(map_pts), bool), np.zeros(mpad, bool)]
            )
            stB, trajB = sp_run_chunk_single(
                *a, jnp.asarray(mp), jnp.asarray(mm), sp_icp2, fcfg,
                interpret=False,
            )
            dmax = float(np.abs(
                np.asarray(trajA.map_T_sensor)
                - np.asarray(trajB.map_T_sensor)
            ).max())
            results["sp_throughput"] = {
                "status": "ok" if dmax < 1e-3 else "fail",
                "scans_per_sec": round(Tsp2 / best, 1),
                "frames": Tsp2,
                "map_points": int(len(map_pts)),
                "max_abs_diff_vs_single": dmax,
            }
            log(f"shard: sp throughput {results['sp_throughput']}")
        except Exception as e:  # noqa: BLE001
            import traceback

            log(traceback.format_exc())
            results["sp_throughput"] = {
                "status": "fail", "error": f"{type(e).__name__}: {e}"
            }

    # ---- 6. sharded global voxel map insert (mapping accumulator),
    # union checked cell-exact vs the single-table store
    vm_rng = np.random.default_rng(11)
    vm_pts = jnp.asarray(
        vm_rng.uniform(1.0, 39.0, (3, 1024, 3)).astype(np.float32)
    )
    vm_msk = jnp.ones((3, 1024), bool)
    vm_cfg = VoxelMapConfig(
        voxel_size=0.5, table_size=1 << 14, dim_xy=128, dim_z=128
    )

    def _sp_vm():
        single = voxel_map_init(vm_cfg, jnp.zeros(3, jnp.float32))
        for k in range(3):
            single = voxel_map_insert(single, vm_pts[k], vm_msk[k], vm_cfg)
        want = voxel_map_centroids_numpy(single)
        st = sp_voxel_map_init(vm_cfg, np.zeros(3, np.float32), sp_mesh)
        st = sp_voxel_map_insert_chunk(st, vm_pts, vm_msk, vm_cfg, sp_mesh)
        drop, oob, per_shard = sp_voxel_map_flags(st)
        assert drop == 0 and oob == 0
        assert per_shard.sum() == len(want)
        got = sp_voxel_map_centroids_numpy(st)

        def _rows(a):
            a = np.asarray(a, np.float64)
            return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]

        np.testing.assert_allclose(_rows(got), _rows(want), atol=2e-5)

    run("sp_voxel_map", _sp_vm)

    n_ok = sum(1 for r in results.values() if r["status"] == "ok")
    res = {
        "metric": "shard_map Mosaic compile+run (1-device mesh, "
        + ("interpret=False on TPU" if on_tpu else "interpret fallback, CPU"),
        "value": n_ok,
        "unit": f"programs green of {len(results)}",
        "on_tpu": on_tpu,
        "interpret": interp,
        "programs": results,
    }
    log(f"shard: {n_ok}/{len(results)} green")
    return res


_SECTIONS = {
    "loc": lambda: bench_loc(),
    "stress": lambda: bench_loc(STRESS_OVERRIDES),
    "lio": lambda: bench_lio(),
    "map": lambda: bench_map(),
    "kitti": lambda: bench_kitti(),
    "kitti_loc": lambda: bench_kitti_loc(),
    "latency": lambda: bench_latency(),
    "shard": lambda: bench_shard_compile(),
}


def main() -> None:
    # persistent compile cache: the heavy scan program compiles once per
    # configuration (~1-8 min on the tunnelled compiler), then loads in
    # seconds on every subsequent bench run
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    try:
        # which IO path is live (VERDICT r3 weak #5 observability): the
        # native loader accelerates PCD/Morton/timesync host staging
        from slam_sensor_fusion_tpu.utils import native

        log("native IO library: "
            + ("libsfio.so" if native.available() else "NumPy fallback"))
    except Exception as e:  # noqa: BLE001
        log(f"native IO probe failed: {e}")
    t_start = time.perf_counter()
    mode = os.environ.get("BENCH_MODE", "full")
    if mode in _SECTIONS:
        print(json.dumps(_SECTIONS[mode]()))
        return

    # the default combined run: headline first (hard asserts), then the
    # companion numbers folded into the same JSON line so the driver
    # captures them every round. Sub-section failures are REPORTED, not
    # fatal — the headline must stand on its own.
    result = bench_loc()
    selected = [
        s.strip()
        for s in os.environ.get(
            "BENCH_SUBS", "latency,stress,lio,map,kitti,kitti_loc,shard"
        ).split(",")
        if s.strip()
    ]
    budget = float(os.environ.get("BENCH_BUDGET_S", "2400"))
    subs = {}
    for name in selected:
        spent = time.perf_counter() - t_start
        if spent > budget:
            subs[name] = {"skipped": f"wall budget {budget:.0f}s exceeded"}
            log(f"[{name}] skipped: {spent:.0f}s > budget")
            continue
        log(f"=== submetric: {name} (t+{spent:.0f}s) ===")
        try:
            t0 = time.perf_counter()
            subs[name] = _SECTIONS[name]()
            subs[name]["section_s"] = round(time.perf_counter() - t0, 1)
        except Exception as e:  # noqa: BLE001 — reported in the JSON
            import traceback

            log(traceback.format_exc())
            subs[name] = {"error": f"{type(e).__name__}: {e}"}
    result["submetrics"] = subs
    print(json.dumps(result))


if __name__ == "__main__":
    main()
