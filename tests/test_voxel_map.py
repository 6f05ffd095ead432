"""Incremental device voxel map (ops/voxel_map) vs the host merge oracle.

The equality target: streaming scans through the hash-scatter store one
frame at a time must yield EXACTLY the centroid set of the reference's
accumulate-then-voxel-grid merge (map_data_save_node.cpp:60-99 +
global_map_frames_manager.cpp:143-146, host twin
ops/cloud.voxel_downsample_numpy) when both bin against the same anchor.

Test points are quantized to binary-exact fractions (1/32 grid, off-cell
offset) so f32 device binning and f64 host binning can never disagree on
a boundary — the equality is then bit-meaningful, not tolerance-fuzzed.
"""

import numpy as np
import jax.numpy as jnp

from slam_sensor_fusion_tpu.ops.cloud import voxel_downsample_numpy
from slam_sensor_fusion_tpu.ops.voxel_map import (
    VoxelMapConfig,
    voxel_map_centroids,
    voxel_map_centroids_numpy,
    voxel_map_init,
    voxel_map_insert,
    voxel_map_insert_chunk,
)

CFG = VoxelMapConfig(voxel_size=0.25, table_size=1 << 14, dim_xy=256, dim_z=128)


def _quantized_points(rng, n, extent=30.0):
    """Random points on a 1/32 grid + 1/64 offset: exactly representable
    in f32 and f64, never within an ulp of a 0.25-voxel boundary."""
    p = rng.integers(0, int(extent * 32), (n, 3)).astype(np.float64) / 32.0
    return (p + 1.0 / 64.0).astype(np.float32)


def _sorted_rows(a):
    a = np.asarray(a, np.float64)
    return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]


def _pad(pts, cap):
    buf = np.zeros((cap, 3), np.float32)
    buf[: len(pts)] = pts
    msk = np.zeros(cap, bool)
    msk[: len(pts)] = True
    return jnp.asarray(buf), jnp.asarray(msk)


def test_incremental_equals_host_merge(rng):
    frames = [_quantized_points(rng, n) for n in (900, 1300, 700, 1100)]
    origin = np.zeros(3, np.float32)
    state = voxel_map_init(CFG, origin)
    for f in frames:
        p, m = _pad(f, 2048)
        state = voxel_map_insert(state, p, m, CFG)
    assert int(state.n_dropped) == 0 and int(state.n_oob) == 0

    got = voxel_map_centroids_numpy(state)
    want = voxel_downsample_numpy(
        np.concatenate(frames), CFG.voxel_size, origin=origin
    )
    assert len(got) == len(want)
    np.testing.assert_allclose(
        _sorted_rows(got), _sorted_rows(want), atol=2e-5
    )


def test_chunked_scan_matches_stepwise(rng):
    frames = [_quantized_points(rng, 800) for _ in range(5)]
    origin = np.zeros(3, np.float32)
    padded = [_pad(f, 1024) for f in frames]
    sp = jnp.stack([p for p, _ in padded])
    sm = jnp.stack([m for _, m in padded])

    st_a = voxel_map_init(CFG, origin)
    for p, m in padded:
        st_a = voxel_map_insert(st_a, p, m, CFG)
    st_b = voxel_map_insert_chunk(voxel_map_init(CFG, origin), sp, sm, CFG)

    np.testing.assert_array_equal(np.asarray(st_a.keys), np.asarray(st_b.keys))
    np.testing.assert_allclose(
        np.asarray(st_a.sums), np.asarray(st_b.sums), atol=1e-5
    )


def test_device_centroid_extraction(rng):
    pts = _quantized_points(rng, 1200)
    origin = np.zeros(3, np.float32)
    p, m = _pad(pts, 2048)
    state = voxel_map_insert(voxel_map_init(CFG, origin), p, m, CFG)
    dev = voxel_map_centroids(state, CFG, out_capacity=4096)
    host = voxel_map_centroids_numpy(state)
    n = int(dev.count())
    assert n == len(host)
    np.testing.assert_allclose(
        np.asarray(dev.points)[:n], host, atol=1e-6
    )
    assert not np.asarray(dev.mask)[n:].any()


def test_out_of_bounds_and_overflow_are_counted(rng):
    origin = np.zeros(3, np.float32)
    # out-of-extent points: counted, never binned
    pts = np.array([[-1.0, 5.0, 5.0], [5.0, 5.0, 100.0], [5.0, 5.0, 5.0]],
                   np.float32)
    p, m = _pad(pts, 8)
    state = voxel_map_insert(voxel_map_init(CFG, origin), p, m, CFG)
    assert int(state.n_oob) == 2
    assert int(state.n_cells()) == 1

    # probe-budget exhaustion: a table far smaller than the live cell set
    tiny = VoxelMapConfig(voxel_size=0.25, table_size=64, max_probes=2,
                          dim_xy=256, dim_z=128)
    pts = _quantized_points(rng, 2000)
    p, m = _pad(pts, 2048)
    st = voxel_map_insert(voxel_map_init(tiny, origin), p, m, tiny)
    assert int(st.n_dropped) > 0


def test_streaming_mapper_device_path_matches_host(rng):
    """StreamingMapper's device fast path == its host merge (same anchor)."""
    from slam_sensor_fusion_tpu.models.mapping import StreamingMapper
    from slam_sensor_fusion_tpu.utils.config import MappingConfig

    cfg = MappingConfig(map_voxel_size=0.25, cloud_save_rate=2)
    origin = np.zeros(3, np.float32)
    m_host = StreamingMapper(cfg)
    m_dev = StreamingMapper(
        cfg, device_origin=origin,
        device_config=CFG, device_scan_capacity=2048,
    )
    # grouped inserts (2 frames per device launch, padded tail group)
    # must be cell-identical: sums/counts are associative
    m_grp = StreamingMapper(
        cfg, device_origin=origin,
        device_config=CFG, device_scan_capacity=2048, device_group=2,
    )
    for k in range(5):
        pts = _quantized_points(rng, 600 + 50 * k)
        for m in (m_host, m_dev, m_grp):
            m.add_frame(pts, np.zeros(3), 47.5, 9.0, 120.0, 0.1)
    host_map = voxel_downsample_numpy(
        np.concatenate(m_host.tiles + m_host._accum), cfg.map_voxel_size,
        origin=origin,
    )
    dev_data = m_dev.finalize(use_device=True)
    assert len(dev_data.map_points) == len(host_map)
    np.testing.assert_allclose(
        _sorted_rows(dev_data.map_points), _sorted_rows(host_map), atol=2e-5
    )
    grp_data = m_grp.finalize(use_device=True)
    np.testing.assert_allclose(
        _sorted_rows(grp_data.map_points), _sorted_rows(host_map), atol=2e-5
    )
    # the host artifacts (tiles, logs) are still recorded on the fast path
    # (5 frames at save_rate 2 = 2 full tiles + the finalize-flushed tail)
    assert len(m_dev.tiles) == 3
    assert len(m_dev.gps_rows) == 5


def test_sharded_voxel_map_matches_single_device(rng):
    """parallel/voxel_map_shard: the union of the 8 shards' cells must
    equal the single-device store cell-exactly, with per-shard tables
    deliberately too small to hold the whole map (the capacity-scaling
    claim), and the same zero dropped/oob observability."""
    import jax.numpy as jnp

    from slam_sensor_fusion_tpu.parallel.mesh import make_mesh
    from slam_sensor_fusion_tpu.parallel.voxel_map_shard import (
        sp_voxel_map_centroids_numpy,
        sp_voxel_map_flags,
        sp_voxel_map_init,
        sp_voxel_map_insert_chunk,
    )

    frames = [_quantized_points(rng, n) for n in (1500, 1100, 1400, 1300)]
    origin = np.zeros(3, np.float32)

    single = voxel_map_init(CFG, origin)
    for f in frames:
        p, m = _pad(f, 2048)
        single = voxel_map_insert(single, p, m, CFG)
    want = voxel_map_centroids_numpy(single)
    n_total = len(want)

    mesh = make_mesh(8)
    # per-shard table SMALLER than the total live cell set: only the
    # sharded union can hold this map
    small = CFG._replace(table_size=1 << 11)
    assert small.table_size < n_total
    state = sp_voxel_map_init(small, origin, mesh)
    padded = [_pad(f, 2048) for f in frames]
    state = sp_voxel_map_insert_chunk(
        state,
        jnp.stack([p for p, _ in padded]),
        jnp.stack([m for _, m in padded]),
        small,
        mesh,
    )
    dropped, oob, per_shard = sp_voxel_map_flags(state)
    assert dropped == 0 and oob == 0
    assert per_shard.sum() == n_total
    assert (per_shard < n_total).all()  # no shard holds the whole map

    got = sp_voxel_map_centroids_numpy(state)
    np.testing.assert_allclose(
        _sorted_rows(got), _sorted_rows(want), atol=2e-5
    )


def test_sharded_voxel_map_counts_oob_once(rng):
    """An out-of-extent point must be counted by exactly ONE shard."""
    import jax.numpy as jnp

    from slam_sensor_fusion_tpu.parallel.mesh import make_mesh
    from slam_sensor_fusion_tpu.parallel.voxel_map_shard import (
        sp_voxel_map_flags,
        sp_voxel_map_init,
        sp_voxel_map_insert_chunk,
    )

    origin = np.zeros(3, np.float32)
    pts = np.array(
        [[-1.0, 5.0, 5.0], [5.0, 5.0, 100.0], [5.0, 5.0, 5.0]], np.float32
    )
    p, m = _pad(pts, 8)
    mesh = make_mesh(8)
    state = sp_voxel_map_init(CFG, origin, mesh)
    state = sp_voxel_map_insert_chunk(
        state, p[None], m[None], CFG, mesh
    )
    dropped, oob, per_shard = sp_voxel_map_flags(state)
    assert dropped == 0 and oob == 2 and per_shard.sum() == 1
