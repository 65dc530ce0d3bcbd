"""CLI runner smoke test (synthetic, CPU)."""

import json
import os

import pytest

from scaloam_tpu import run as cli


@pytest.mark.slow
def test_cli_synthetic(tmp_path, capsys):
    out = str(tmp_path / "sess")
    rc = cli.main([
        "--preset", "kitti_hdl64",
        "--synthetic", "6",
        "--keyframe-gap", "1.0",
        "--synthetic-radius", "25",
        "--out", out,
    ])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(line)
    assert result["frames"] == 6
    assert result["keyframes"] >= 1
    assert os.path.exists(os.path.join(out, "optimized_poses.txt"))
    assert os.path.exists(os.path.join(out, "Scans", "000000.pcd"))
    assert "ate_rmse_optimized" in result
