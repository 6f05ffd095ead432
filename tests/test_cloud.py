import numpy as np
import jax.numpy as jnp

from slam_sensor_fusion_tpu.ops import cloud as cl


def make_cloud(rng, n=100, capacity=128, scale=10.0):
    pts = rng.normal(size=(n, 3)).astype(np.float32) * scale
    return pts, cl.from_numpy(pts, capacity)


def test_pack_roundtrip(rng):
    pts, c = make_cloud(rng)
    assert c.capacity == 128
    assert int(c.count()) == 100
    np.testing.assert_array_equal(cl.to_numpy(c), pts)


def test_uniform_subsample_matches_reference_semantics(rng):
    pts, c = make_cloud(rng, n=101)
    sub = cl.uniform_subsample(c, 3)
    expected = pts[::3]
    np.testing.assert_array_equal(cl.to_numpy(sub), expected)


def test_uniform_subsample_tiny_cloud_passthrough(rng):
    pts, c = make_cloud(rng, n=2, capacity=16)
    sub = cl.uniform_subsample(c, 3)
    # reference: if size < step the cloud is returned untouched
    np.testing.assert_array_equal(cl.to_numpy(sub), pts)


def test_crop_radius(rng):
    pts, c = make_cloud(rng, n=100, scale=5.0)
    center = np.array([1.0, 2.0, 3.0], np.float32)
    cropped = cl.crop_radius(c, jnp.asarray(center), 4.0)
    expected = pts[np.linalg.norm(pts - center, axis=1) <= 4.0]
    np.testing.assert_array_equal(cl.to_numpy(cropped), expected)


def test_remove_floor(rng):
    pts, c = make_cloud(rng)
    out = cl.to_numpy(cl.remove_floor(c))
    np.testing.assert_array_equal(out, pts[pts[:, 2] > 0])


def test_compact_preserves_order(rng):
    pts, c = make_cloud(rng)
    cropped = cl.crop_radius(c, jnp.zeros(3), 8.0)
    packed = cl.compact(cropped)
    n = int(cropped.count())
    assert bool(packed.mask[:n].all()) and not bool(packed.mask[n:].any())
    np.testing.assert_array_equal(cl.to_numpy(packed), cl.to_numpy(cropped))


def test_crop_then_subsample_matches_dynamic(rng):
    # the coarse-alignment path: crop -> compact -> subsample(15)
    pts, c = make_cloud(rng, n=1000, capacity=1024)
    cropped_dyn = pts[np.linalg.norm(pts, axis=1) <= 12.0]
    expected = cropped_dyn[::15]
    got = cl.to_numpy(
        cl.uniform_subsample(cl.compact(cl.crop_radius(c, jnp.zeros(3), 12.0)), 15)
    )
    np.testing.assert_array_equal(got, expected)


def test_voxel_downsample_centroids(rng):
    pts = np.array(
        [
            [0.01, 0.01, 0.01],
            [0.05, 0.05, 0.05],  # same voxel as above at 0.1 leaf
            [0.15, 0.01, 0.01],  # next voxel in x
            [1.0, 1.0, 1.0],
        ],
        dtype=np.float32,
    )
    c = cl.from_numpy(pts, 8)
    out = cl.voxel_downsample(c, 0.1, out_capacity=8)
    got = cl.to_numpy(out)
    assert got.shape[0] == 3
    centroid0 = pts[:2].mean(0)
    assert any(np.allclose(g, centroid0, atol=1e-6) for g in got)


def test_voxel_downsample_matches_numpy_host(rng):
    pts = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    c = cl.from_numpy(pts, 512)
    dev = cl.to_numpy(cl.voxel_downsample(c, 0.5, out_capacity=2048))
    host = cl.voxel_downsample_numpy(pts, 0.5)
    # same voxel centroids as sets (order may differ)
    dev_sorted = dev[np.lexsort(dev.T)]
    host_sorted = host[np.lexsort(host.T)]
    np.testing.assert_allclose(dev_sorted, host_sorted, atol=1e-4)


def test_masked_points_fill(rng):
    pts, c = make_cloud(rng, n=10, capacity=16)
    mp = np.asarray(cl.masked_points(c))
    assert np.isinf(mp[10:]).all()
    np.testing.assert_array_equal(mp[:10], pts)


def test_sample_to_capacity_lossless_when_fits(rng):
    pts, c = make_cloud(rng, n=50, capacity=128)
    out = cl.sample_to_capacity(c, 64)
    np.testing.assert_array_equal(cl.to_numpy(out), pts)


def test_sample_to_capacity_even_stride(rng):
    pts, c = make_cloud(rng, n=100, capacity=128)
    out = cl.sample_to_capacity(c, 25)
    got = cl.to_numpy(out)
    assert got.shape[0] == 25
    np.testing.assert_array_equal(got, pts[(np.arange(25) * 100) // 25])


def test_compact_by_distance_matches_pcl_order(rng):
    """compact_by_distance == PCL radiusSearch ordering: valid points
    sorted by distance from the query (stable on ties), invalid dropped
    (point_cloud_processing.hpp:37-49)."""
    pts, c = make_cloud(rng, n=100, capacity=128)
    center = np.asarray([1.0, -2.0, 0.5], np.float32)
    out = cl.compact_by_distance(c, jnp.asarray(center))
    d2 = ((pts - center) ** 2).sum(1)
    expect = pts[np.argsort(d2, kind="stable")]
    assert int(out.count()) == 100
    np.testing.assert_array_equal(cl.to_numpy(out), expect)


def test_bf_map_selection_is_range_stratified(rng):
    """The coarse brute-force map staging (distance-ordered crop ->
    every-kth -> removeFloor) selects EXACTLY the points the reference's
    distance-sorted radiusSearch + applyUniformSubsample(15) would
    (localization_node.cpp:207-213) — the round-2 crop-ordering parity
    gap. Oracle in plain NumPy."""
    n = 600
    pts = rng.uniform(-20, 20, size=(n, 3)).astype(np.float32)
    c = cl.from_numpy(pts, 1024)
    center = np.zeros(3, np.float32)
    step = 7

    staged = cl.sample_to_capacity(
        cl.remove_floor(
            cl.uniform_subsample(
                cl.compact_by_distance(c, jnp.asarray(center)), step
            )
        ),
        256,
    )

    d2 = (pts ** 2).sum(1)
    ordered = pts[np.argsort(d2, kind="stable")]  # PCL: sorted hits
    sub = ordered[::step]  # applyUniformSubsample
    expect = sub[sub[:, 2] > 0.0]  # removeFloor
    got = cl.to_numpy(staged)
    assert len(got) == len(expect)
    np.testing.assert_array_equal(got, expect)
