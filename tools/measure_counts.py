"""Report actual occupancy of the fixed-capacity arrays on synthetic
HDL-64-density scans, to right-size capacities (CPU)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from scaloam_tpu import config
    from scaloam_tpu.ops import features, voxel
    from scaloam_tpu.types import LidarScan
    from scaloam_tpu.utils import synthetic

    cfg = config.kitti_hdl64()
    world = synthetic.make_world(seed=3, n_boxes=60, extent=70.0)
    scans, _ = synthetic.simulate_trajectory(
        world, n_frames=3, speed=1.2, radius=40.0,
        n_scans=64, n_azimuth=2048, seed=7,
    )
    m = cfg.mapping
    for s in scans:
        scan = LidarScan.from_numpy(s, cfg.sensor.max_points)
        feats = features.extract_features(scan, cfg)
        print(f"raw={len(s)}")
        print("  ring max count:", int(jnp.max(feats.full.count)))
        for name, fc, cap in [
            ("sharp", feats.sharp, cfg.features.max_sharp),
            ("less_sharp", feats.less_sharp, cfg.features.max_less_sharp),
            ("flat", feats.flat, cfg.features.max_flat),
            ("less_flat", feats.less_flat, cfg.features.max_less_flat),
        ]:
            n = int(jnp.sum(fc.mask))
            print(f"  {name:11s} {n:7d} / {cap}")
        cin_xyz, cin_mask, _ = voxel.voxel_downsample_packed(
            feats.less_sharp.xyz, feats.less_sharp.mask, m.line_resolution,
            m.max_corner_input, xy_bits=10, z_bits=9,
        )
        sin_xyz, sin_mask, _ = voxel.voxel_downsample_packed(
            feats.less_flat.xyz, feats.less_flat.mask, m.plane_resolution,
            m.max_surf_input, xy_bits=10, z_bits=9,
        )
        print(f"  map corner in {int(jnp.sum(cin_mask)):6d} / {m.max_corner_input}")
        print(f"  map surf   in {int(jnp.sum(sin_mask)):6d} / {m.max_surf_input}")


if __name__ == "__main__":
    main()
