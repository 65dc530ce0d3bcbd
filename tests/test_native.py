"""Native IO library (ctypes) vs numpy fallbacks."""

import os

import numpy as np
import pytest

from scaloam_tpu.io import native_loader as nl
from scaloam_tpu.io import pcd as pcd_io


def test_read_bin_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(3000, 4)).astype(np.float32)
    p = str(tmp_path / "scan.bin")
    pts.tofile(p)
    got = nl.read_bin(p)
    np.testing.assert_allclose(got, pts)


def test_native_pcd_matches_python(tmp_path, rng):
    pts = rng.normal(size=(500, 4)).astype(np.float32)
    p = str(tmp_path / "x.pcd")
    pcd_io.write_pcd(p, pts, binary=True)
    got = nl.read_pcd(p)
    np.testing.assert_allclose(got, pts, atol=1e-6)


def test_native_voxel_filter_centroids(rng):
    pts = rng.uniform(-5, 5, size=(2000, 3)).astype(np.float32)
    got = nl.voxel_filter(pts, 1.0)
    # numpy reference
    keys = np.floor(pts / 1.0).astype(np.int64)
    uniq = np.unique(keys, axis=0)
    assert len(got) == len(uniq)
    # every centroid lies inside its voxel
    cell = np.floor(got / 1.0).astype(np.int64)
    keyset = {tuple(k) for k in uniq}
    assert all(tuple(c) in keyset for c in cell)


def test_native_range_filter(rng):
    pts = rng.normal(size=(1000, 3)).astype(np.float32) * 10
    pts[0] = [np.nan, 0, 0]
    got = nl.range_filter(pts, 5.0)
    r = np.linalg.norm(pts[1:], axis=-1)
    assert len(got) == int((r >= 5.0).sum())


def test_prefetch_loader(tmp_path, rng):
    paths = []
    for i in range(5):
        pts = rng.normal(size=(100, 4)).astype(np.float32)
        p = str(tmp_path / f"{i:06d}.bin")
        pts.tofile(p)
        paths.append(p)
    seen = list(nl.PrefetchLoader(paths, depth=2))
    assert len(seen) == 5
    assert [p for p, _ in seen] == paths
