"""Disk cache for the synthetic benchmark scans.

Every profiling tool regenerates the same HDL-64-density course with
identical parameters (~6 min of single-threaded numpy per run on this
2-core host — more than the measurement itself). Cache the padded arrays
once per parameter set under /tmp and mmap them back.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np


def get_scans(n_frames: int, seed_world=3, n_boxes=60, extent=70.0,
              speed=1.2, radius=40.0, n_scans=64, n_azimuth=2048, seed=7):
    # Cache a superset once (the frame sequence is a prefix-stable
    # trajectory walk) and slice — the tools ask for 27/43/93/243 frames
    # of the SAME course.
    n_gen = max(n_frames, 243)
    key = hashlib.md5(
        repr((n_gen, seed_world, n_boxes, extent, speed, radius,
              n_scans, n_azimuth, seed, "v1")).encode()
    ).hexdigest()[:16]
    path = f"/tmp/scan_cache_{key}.npz"
    if os.path.exists(path):
        z = np.load(path)
        return [z[f"s{i}"] for i in range(n_frames)]
    n_frames, n_frames_req = n_gen, n_frames
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scaloam_tpu.utils import synthetic

    world = synthetic.make_world(seed=seed_world, n_boxes=n_boxes,
                                 extent=extent)
    scans, _ = synthetic.simulate_trajectory(
        world, n_frames=n_frames, speed=speed, radius=radius,
        n_scans=n_scans, n_azimuth=n_azimuth, seed=seed,
    )
    tmp = path + f".tmp{os.getpid()}.npz"  # savez keeps .npz suffixes as-is
    np.savez(tmp, **{f"s{i}": s for i, s in enumerate(scans)})
    os.replace(tmp, path)
    return scans[:n_frames_req]
