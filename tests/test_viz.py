import numpy as np

from slam_sensor_fusion_tpu.utils import viz, kitti


def test_write_ply_roundtrippable(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    p = str(tmp_path / "c.ply")
    viz.write_ply(p, pts)
    lines = open(p).read().splitlines()
    assert lines[0] == "ply"
    assert f"element vertex 50" in "\n".join(lines[:6])
    body = np.array(
        [list(map(float, ln.split()[:3])) for ln in lines[lines.index("end_header") + 1 :]]
    )
    np.testing.assert_allclose(body, pts, atol=1e-3)


def test_plot_topdown_svg(tmp_path, rng):
    poses = np.tile(np.eye(4, dtype=np.float32), (20, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 10, 20)
    gt = poses.copy()
    gt[:, 1, 3] += 0.5
    p = str(tmp_path / "t.svg")
    viz.plot_topdown(p, poses, gt, rng.uniform(-5, 15, (100, 3)))
    s = open(p).read()
    assert s.startswith("<svg") and s.endswith("</svg>")
    assert "polyline" in s


def test_kitti_bin_and_poses(tmp_path, rng):
    # synthesize the KITTI layout and check the loader glue
    root = tmp_path
    seq = root / "sequences" / "00"
    velo = seq / "velodyne"
    velo.mkdir(parents=True)
    (root / "poses").mkdir()
    pts = rng.normal(size=(100, 4)).astype(np.float32)
    pts.tofile(str(velo / "000000.bin"))
    pts2 = rng.normal(size=(80, 4)).astype(np.float32)
    pts2.tofile(str(velo / "000001.bin"))
    poses34 = np.tile(np.eye(4)[:3].reshape(-1), (2, 1))
    poses34[1, 3] = 1.5  # x translation
    np.savetxt(str(root / "poses" / "00.txt"), poses34)
    with open(str(seq / "calib.txt"), "w") as f:
        f.write("P0: " + " ".join(["0"] * 12) + "\n")
        f.write("Tr: " + " ".join(map(str, np.eye(4)[:3].reshape(-1))) + "\n")

    ks = kitti.load_sequence(str(root), "00")
    assert len(ks.scans) == 2
    np.testing.assert_allclose(ks.scans[0], pts[:, :3])
    np.testing.assert_allclose(ks.poses[1, 0, 3], 1.5)


def test_html_viewer_export(tmp_path, rng):
    from slam_sensor_fusion_tpu.utils.viz import write_html_viewer

    map_pts = rng.uniform(-20, 20, (5000, 3)).astype(np.float32)
    n = 30
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 10, n)
    p = tmp_path / "viewer.html"
    write_html_viewer(
        str(p), map_points=map_pts, est_poses=poses, gt_poses=poses,
        gps_poses=poses, odom_poses=poses,
        scan_points=map_pts[:500], max_points=2000,
    )
    html = p.read_text()
    # self-contained: data embedded, no external resources
    assert "map_T_sensor (fine)" in html
    assert "ground truth" in html and "odom_T_sensor" in html
    assert "http" not in html.split("xmlns")[0]  # no external fetches
    assert len(html) < 3_000_000  # decimation bounds the payload
    # degenerate call still writes a valid file
    p2 = tmp_path / "empty.html"
    write_html_viewer(str(p2))
    assert "clouds" in p2.read_text()
