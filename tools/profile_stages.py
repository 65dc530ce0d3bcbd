"""Per-stage TPU latency breakdown for the front-end (features / odometry /
mapping) plus key sub-kernels. Run on the real chip:

    python tools/profile_stages.py

Prints per-stage steady-state ms/frame so optimization effort goes to the
actual hot spot (CLAUDE.md perf rules).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, n=20, warmup=3, block):
    for _ in range(warmup):
        out = fn(*args)
    block(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    block(out)
    return (time.time() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scaloam_tpu import config
    from scaloam_tpu.models import mapping as mapping_mod
    from scaloam_tpu.models import odometry as odometry_mod
    from scaloam_tpu.ops import features
    from scaloam_tpu.types import LidarScan
    from scaloam_tpu.utils import synthetic

    cfg = config.kitti_hdl64()
    print("devices:", jax.devices())

    world = synthetic.make_world(seed=3, n_boxes=60, extent=70.0)
    scans, _ = synthetic.simulate_trajectory(
        world, n_frames=6, speed=1.2, radius=40.0,
        n_scans=64, n_azimuth=2048, seed=7,
    )
    device_scans = [
        LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans
    ]

    o_state = odometry_mod.init_state(cfg)
    m_state = mapping_mod.init_state(cfg)

    # Prime states (so odometry/mapping run their real branches).
    feats = None
    for s in device_scans[:3]:
        feats = features.extract_features(s, cfg)
        o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
        m_state, m_out = mapping_mod.mapping_step(
            m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
        )
    jax.block_until_ready(m_out.pose.trans)

    s = device_scans[3]
    blk = lambda o: jax.block_until_ready(jax.tree.leaves(o)[0])

    t_feat = timeit(
        lambda: features.extract_features(s, cfg), block=blk
    )
    print(f"features:  {t_feat:7.2f} ms")

    feats = features.extract_features(s, cfg)
    jax.block_until_ready(feats.sharp.xyz)

    t_odo = timeit(
        lambda: odometry_mod.odometry_step(o_state, feats, cfg), block=blk
    )
    print(f"odometry:  {t_odo:7.2f} ms")

    o_state2, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
    jax.block_until_ready(o_out.world.trans)

    # mapping_step donates state; keep a copy for repeat timing.
    def map_once():
        st = jax.tree.map(lambda x: x + 0 if hasattr(x, "dtype") else x, m_state)
        return mapping_mod.mapping_step(
            st, o_out.world, feats.less_sharp, feats.less_flat, cfg
        )

    t_map = timeit(map_once, block=blk)
    print(f"mapping:   {t_map:7.2f} ms (incl. state copy)")

    # --- sub-kernels ---------------------------------------------------
    from scaloam_tpu.ops import gridmap, se3, voxel

    m = cfg.mapping
    sin_xyz, sin_mask, _ = voxel.voxel_downsample_packed(
        feats.less_flat.xyz, feats.less_flat.mask, m.plane_resolution,
        m.max_surf_input, xy_bits=10, z_bits=9,
    )
    cin_xyz, cin_mask, _ = voxel.voxel_downsample_packed(
        feats.less_sharp.xyz, feats.less_sharp.mask, m.line_resolution,
        m.max_corner_input, xy_bits=10, z_bits=9,
    )
    jax.block_until_ready(sin_xyz)

    t = timeit(
        lambda: voxel.voxel_downsample_packed(
            feats.less_flat.xyz, feats.less_flat.mask, m.plane_resolution,
            m.max_surf_input, xy_bits=10, z_bits=9,
        ),
        block=blk,
    )
    print(f"  map in-downsample surf [{feats.less_flat.xyz.shape[0]}]: {t:6.2f} ms")

    pw = se3.apply(o_out.world, sin_xyz)
    t = timeit(
        lambda: gridmap.knn_grid(
            m_state.surf_grid, pw, sin_mask, m.grid_xy, m.grid_xy, m.grid_z,
            m.cell_size, reach=1.0, k=m.knn,
        ),
        block=blk,
    )
    print(f"  knn_grid surf [{pw.shape[0]} q]: {t:6.2f} ms  (x{2} per frame)")

    pwc = se3.apply(o_out.world, cin_xyz)
    t = timeit(
        lambda: gridmap.knn_grid(
            m_state.corner_grid, pwc, cin_mask, m.grid_xy, m.grid_xy, m.grid_z,
            m.cell_size, reach=1.0, k=m.knn,
        ),
        block=blk,
    )
    print(f"  knn_grid corner [{pwc.shape[0]} q]: {t:6.2f} ms  (x{2} per frame)")

    t = timeit(
        lambda: gridmap.insert(
            m_state.surf_grid, pw, sin_mask, m.grid_xy, m.grid_xy, m.grid_z,
            m.cell_size, m.plane_resolution,
        ),
        block=blk,
    )
    print(f"  grid insert surf: {t:6.2f} ms")

    # odometry sub-kernels
    tc = o_state.last_corner
    ts_ = o_state.last_surf
    sh = feats.sharp
    fl = feats.flat
    t = timeit(lambda: voxel.nn1(sh.xyz, sh.mask, tc.xyz, tc.mask), block=blk)
    print(f"  odo nn1 corner [{sh.xyz.shape[0]}x{tc.xyz.shape[0]}]: {t:6.2f} ms")
    t = timeit(lambda: voxel.nn1(fl.xyz, fl.mask, ts_.xyz, ts_.mask), block=blk)
    print(f"  odo nn1 surf [{fl.xyz.shape[0]}x{ts_.xyz.shape[0]}]: {t:6.2f} ms")

    from scaloam_tpu.ops import correspond
    dj, ij = voxel.nn1(sh.xyz, sh.mask, tc.xyz, tc.mask)
    t = timeit(
        lambda: correspond.ring_constrained_nn(
            sh.xyz, sh.mask, tc.ring[ij], ij, tc.xyz, tc.mask, tc.ring,
            cfg.odometry.nearby_scan,
        ),
        block=blk,
    )
    print(f"  odo ring_nn corner: {t:6.2f} ms")
    sdj, sij = voxel.nn1(fl.xyz, fl.mask, ts_.xyz, ts_.mask)
    t = timeit(
        lambda: correspond.ring_constrained_nn(
            fl.xyz, fl.mask, ts_.ring[sij], sij, ts_.xyz, ts_.mask, ts_.ring,
            cfg.odometry.nearby_scan,
        ),
        block=blk,
    )
    print(f"  odo ring_nn surf: {t:6.2f} ms")

    print(f"TOTAL front-end: {t_feat + t_odo + t_map:7.2f} ms/frame")


if __name__ == "__main__":
    main()
