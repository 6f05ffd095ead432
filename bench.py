"""Benchmark: registered scans/sec of the full per-scan localization loop.

Runs the steady-state pipeline (subsample -> crop -> predicated map re-crop
-> odometry prediction -> GPS fusion -> stochastic gate -> ICP) as a chunked
`lax.scan` on the available accelerator, over a synthetic LiDAR sequence at
production capacities, and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "scans/sec", "vs_baseline": N}

vs_baseline is measured against the driver's north-star target of 1000
registered scans/sec on one TPU v5e chip (BASELINE.md — the reference
publishes no numbers of its own).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_lio() -> None:
    """Native-mode hardware number (north-star configs 2-3/5): deskewed
    scan -> point-to-plane GN -> error-state EKF over a rolling keyframe
    ring (models/lio.py). Scans are rendered WITH intra-sweep motion
    (render_scan_skewed) and the measured loop deskews them — BASELINE
    config 5's "deskewed scans" is now literally what runs. Prints ONE
    JSON line like the main bench."""
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
    print(
        json.dumps(
            {
                "metric": "LIO scans/sec (deskew+point-to-plane+EKF, native mode)",
                "value": round(total / elapsed, 2),
                "unit": "scans/sec",
                "vs_baseline": round(total / elapsed / 1000.0, 4),
                "ate_rmse_m": round(ate, 4),
            }
        )
    )


def main() -> None:
    # persistent compile cache: the heavy scan program compiles once per
    # configuration (~1-8 min on the tunnelled compiler), then loads in
    # seconds on every subsequent bench run
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    if os.environ.get("BENCH_MODE", "loc") == "lio":
        bench_lio()
        return
    if os.environ.get("BENCH_MODE") == "stress":
        # capacity-stress at KITTI-like shapes: ~122k raw points/scan,
        # reference subsample 2 -> 61k device points, 128k-point map crop
        os.environ.setdefault("BENCH_SCAN_POINTS", "122000")
        os.environ.setdefault("BENCH_SUBSAMPLE", "2")
        os.environ.setdefault("BENCH_CROPPED_MAP", "131072")
        os.environ.setdefault("BENCH_FRAMES", "256")
        os.environ.setdefault("BENCH_DENSITY", "48.0")
        # measured sweeps at these shapes (v5e, best-of-3): coarser source
        # tiles cut pair-loop trips, finer TARGET tiles shrink the admitted
        # per-pair work (the bbox gate culls more precisely) -- tile 1024/512
        # -> 972, 2048/256 -> 980.7, 2048/128 -> 962.5, 4096/128 -> 1006.7
        # scans/s @ ATE 0.027. 4096/256 exceeds the 16M scoped-VMEM limit;
        # 2048/64 overflows the pair list (admitted tiles outgrow capacity).
        os.environ.setdefault("BENCH_TILE_SRC", "4096")
        os.environ.setdefault("BENCH_TILE_TGT", "128")
        # sub-box pair gating measured SLOWER here (v5e: gate 64/64 ->
        # 367.9 scans/s vs coarse boxes -> 499.7 @ the same ATE 0.027):
        # at stress shapes the map crop is dense and near-isotropic, so
        # sub-boxes barely shrink the admitted set while the (K, nSub_s,
        # nSub_t) prologue cost is real. Coarse tile boxes by default;
        # BENCH_GATE_SUB_* opts back in.

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

    n_frames = int(os.environ.get("BENCH_FRAMES", "1024"))
    # default: the whole sequence in ONE device program — per-call dispatch
    # costs ~0.5 s through the tunnel and would otherwise dominate
    chunk = int(os.environ.get("BENCH_CHUNK", str(n_frames - 1)))
    # "fast" = the native fused-kernel ICP (fresh correspondences);
    # "parity" = the reference's exact lazy-re-association control flow
    # the reference's exact lazy-re-association control flow through the
    # whole-superblock kernel is BOTH reference-exact and the fastest
    # measured configuration (v5e: parity 1581.1 vs fresh 1346.6 scans/s
    # -- lazy does ~1 association/frame vs fresh's 2-3)
    icp_mode = os.environ.get("BENCH_ICP_MODE", "parity")

    # Native-mode defaults, measured on the v5e sweep (ARCHITECTURE.md §6):
    # scan subsample 8 (3k pts/frame) holds the voxel-limited ATE floor
    # (0.031 m vs 0.030 m at the reference's subsample 2) while the fused
    # kernel's association cost drops ~4x. tile_src=512 halves pair-loop
    # trip counts. ATE degrades gracefully down to ~750 pts/frame.
    superstep = int(os.environ.get("BENCH_SUPERSTEP", "8"))
    slack = float(os.environ.get("BENCH_SLACK", "0.08"))
    margin = float(os.environ.get("BENCH_MARGIN", "0.5"))
    iters = int(os.environ.get("BENCH_ICP_ITERS", "10"))
    subsample = int(os.environ.get("BENCH_SUBSAMPLE", "8"))
    tile_src = int(os.environ.get("BENCH_TILE_SRC", "512"))
    raw_points = int(os.environ.get("BENCH_SCAN_POINTS", "24000"))
    density = float(os.environ.get("BENCH_DENSITY", "24.0"))
    scan_cap = 1 << max(int(np.ceil(np.log2(max(raw_points // subsample, 1024)))), 10)
    config = LocalizationConfig(
        # one pallas launch per K-frame superblock (prediction/blend/
        # gate/ICP/state-select all in-kernel, ops/superblock_fused.py)
        block_kernel=os.environ.get("BENCH_BLOCK_KERNEL", "1") == "1",
        superstep=superstep,
        superstep_slack=slack,
        scan_subsample_step=subsample,
        # parity mode benches through the superblock shell too (the lazy
        # fused kernel IS the reference control flow; see config docstring)
        superblock_parity=os.environ.get("BENCH_LEGACY_PARITY", "0") != "1",
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
                os.environ.get("BENCH_ICP_ACC", "0.05")
            ),
            tile_tgt=int(os.environ.get("BENCH_TILE_TGT", "512")),
            max_visits=int(os.environ.get("BENCH_MAX_VISITS", "128")),
            max_pairs_factor=int(os.environ.get("BENCH_PAIRS_FACTOR", "128")),
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
            cropped_map=int(os.environ.get("BENCH_CROPPED_MAP", "65536")),
            map=1 << 20,
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
    if use_cache and os.path.exists(cache_path):
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

    print(
        json.dumps(
            {
                "metric": (
                    "registered scans/sec (full per-scan localization loop, "
                    + ("KITTI-sized scans ~122k raw pts"
                       if os.environ.get("BENCH_MODE") == "stress"
                       else "synthetic seq")
                    + ")"
                ),
                "value": round(scans_per_sec, 2),
                "unit": "scans/sec",
                "vs_baseline": round(scans_per_sec / 1000.0, 4),
                "ate_rmse_m": round(ate, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
