"""IO: PCD roundtrip, reference sample-data compatibility, artifact formats,
map merger, session resume."""

import os

import numpy as np
import pytest

from scaloam_tpu.io import artifacts, kitti, pcd
from scaloam_tpu.utils import mapmerge

SAMPLE = "/root/reference/utils/sample_data/KAIST03"


def test_pcd_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 4)).astype(np.float32)
    p = str(tmp_path / "a.pcd")
    pcd.write_pcd(p, pts, binary=True)
    got = pcd.read_pcd(p)
    np.testing.assert_allclose(got, pts, atol=1e-6)
    p2 = str(tmp_path / "b.pcd")
    pcd.write_pcd(p2, pts[:, :3], binary=False)
    got2 = pcd.read_pcd(p2)
    np.testing.assert_allclose(got2, pts[:, :3], atol=1e-5)


@pytest.mark.skipif(not os.path.exists(SAMPLE), reason="sample data absent")
def test_read_reference_sample_pcd():
    cloud = pcd.read_pcd(os.path.join(SAMPLE, "Scans", "000000.pcd"))
    assert cloud.shape == (37101, 4)
    r = np.linalg.norm(cloud[:, :3], axis=-1)
    assert 0.1 < np.median(r) < 100.0  # plausible lidar ranges


@pytest.mark.skipif(not os.path.exists(SAMPLE), reason="sample data absent")
def test_read_reference_sample_poses():
    poses = artifacts.load_kitti_poses(os.path.join(SAMPLE, "optimized_poses.txt"))
    assert poses.shape[1:] == (4, 4)
    # the sample ships the full pose log but only the first 21 scans
    assert len(poses) == 3179
    RtR = np.einsum("nij,nik->njk", poses[:, :3, :3], poses[:, :3, :3])
    np.testing.assert_allclose(
        RtR, np.tile(np.eye(3), (len(poses), 1, 1)), atol=1e-4
    )


def test_kitti_pose_roundtrip(tmp_path, rng):
    from scipy.spatial.transform import Rotation

    n = 7
    T = np.tile(np.eye(4), (n, 1, 1))
    T[:, :3, :3] = Rotation.random(n, rng).as_matrix()
    T[:, :3, 3] = rng.normal(size=(n, 3))
    p = str(tmp_path / "poses.txt")
    artifacts.save_kitti_poses(p, T)
    got = artifacts.load_kitti_poses(p)
    np.testing.assert_allclose(got, T, atol=1e-6)


def test_scd_roundtrip(tmp_path, rng):
    sc = np.abs(rng.normal(size=(20, 60))).astype(np.float32)
    p = str(tmp_path / "000000.scd")
    artifacts.save_scd(p, sc)
    got = artifacts.load_scd(p)
    assert got.shape == (20, 60)
    np.testing.assert_allclose(got, sc, rtol=6e-3, atol=1e-3)  # 3 sig digits


def test_session_writer_and_merge(tmp_path, rng):
    from scipy.spatial.transform import Rotation

    d = str(tmp_path / "session")
    w = artifacts.SessionWriter(d)
    n = 4
    poses = np.tile(np.eye(4), (n, 1, 1))
    for k in range(n):
        poses[k, :3, 3] = [k * 2.0, 0, 0]
        cloud = rng.normal(size=(200, 3)).astype(np.float32) * 5
        scd = np.abs(rng.normal(size=(20, 60)))
        w.save_keyframe(k, cloud, scd, time=0.1 * k)
    w.save_poses(poses, poses, loop_edges=[(3, 0, np.eye(4))])

    # resume
    p2, times, scans, scds = artifacts.load_session(d)
    np.testing.assert_allclose(p2, poses, atol=1e-6)
    assert len(times) == n and len(scans) == n and len(scds) == n

    # g2o content sanity
    g2o = open(os.path.join(d, "singlesession_posegraph.g2o")).read()
    assert g2o.count("VERTEX_SE3:QUAT") == n
    assert g2o.count("EDGE_SE3:QUAT") == n  # n-1 odom + 1 loop

    merged = mapmerge.merge_map(d, voxel_size=0.5,
                                output_path=str(tmp_path / "map.pcd"))
    assert merged.shape[1] == 3 and len(merged) > 100
    assert os.path.exists(str(tmp_path / "map.pcd"))


@pytest.mark.skipif(not os.path.exists(SAMPLE), reason="sample data absent")
def test_merge_reference_sample():
    """C12 parity: merge the 21-keyframe KAIST03 sample session."""
    merged = mapmerge.merge_map(SAMPLE, node_skip=5, min_range=2.0)
    assert len(merged) > 10000
    # the reference scans are PointXYZI; the merge carries the intensity
    # channel (makeMergedMap.py:100-132 colors by it)
    assert merged.shape[1] == 4
    # global spread should reflect vehicle motion over 21 keyframes
    span = merged[:, :3].max(0) - merged[:, :3].min(0)
    assert span[:2].max() > 50.0
    # intensity = ring + 0.1*relTime in the reference's convention
    assert 0.0 <= merged[:, 3].min() and merged[:, 3].max() < 64.2


def test_kitti_bin_reader(tmp_path, rng):
    pts = rng.normal(size=(1000, 4)).astype(np.float32)
    p = str(tmp_path / "000000.bin")
    pts.tofile(p)
    got = kitti.read_velodyne_bin(p)
    np.testing.assert_allclose(got, pts)
