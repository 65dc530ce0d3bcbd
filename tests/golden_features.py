"""Sequential numpy golden model of the scanRegistration feature semantics.

Written from the behavioral spec (SURVEY.md C1; src/scanRegistration.cpp) as
straight-line numpy: sequential halfPassed unwrap, per-ring bucketing,
11-point curvature, per-subregion sort-and-scan greedy selection with
neighbor suppression. Curvature/suppression windows are per-ring (same
documented deviation as the JAX kernel). Used to validate the vectorized
TPU kernel's equivalence claims (iterated argmax == greedy sorted scan;
exclusive cummax == sticky halfPassed flip).
"""

import numpy as np


def golden_extract(
    pts: np.ndarray,
    lidar_type: str = "HDL64",
    n_scans: int = 64,
    minimum_range: float = 5.0,
    curvature_threshold: float = 0.1,
):
    pts = pts[np.all(np.isfinite(pts), axis=1)]
    pts = pts[np.linalg.norm(pts, axis=1) >= minimum_range]
    n = len(pts)

    start_ori = -np.arctan2(pts[0, 1], pts[0, 0])
    end_ori = -np.arctan2(pts[-1, 1], pts[-1, 0]) + 2 * np.pi
    if end_ori - start_ori > 3 * np.pi:
        end_ori -= 2 * np.pi
    elif end_ori - start_ori < np.pi:
        end_ori += 2 * np.pi

    rings = [[] for _ in range(n_scans)]
    half_passed = False
    for i in range(n):
        x, y, z = pts[i]
        angle = np.degrees(np.arctan(z / np.sqrt(x * x + y * y)))
        if lidar_type == "HDL64":
            if angle >= -8.83:
                sid = int((2 - angle) * 3.0 + 0.5)
            else:
                sid = n_scans // 2 + int((-8.83 - angle) * 2.0 + 0.5)
            if angle > 2 or angle < -24.33 or sid > 50 or sid < 0:
                continue
        elif lidar_type == "VLP16":
            sid = int((angle + 15) / 2 + 0.5)
            if sid < 0 or sid > n_scans - 1:
                continue
        elif lidar_type == "OS1-64":
            sid = int((angle + 22.5) / 2 + 0.5)
            if sid < 0 or sid > n_scans - 1:
                continue
        else:
            raise ValueError(lidar_type)

        ori = -np.arctan2(y, x)
        if not half_passed:
            if ori < start_ori - np.pi / 2:
                ori += 2 * np.pi
            elif ori > start_ori + 3 * np.pi / 2:
                ori -= 2 * np.pi
            if ori - start_ori > np.pi:
                half_passed = True
        else:
            ori += 2 * np.pi
            if ori < end_ori - 3 * np.pi / 2:
                ori += 2 * np.pi
            elif ori > end_ori + np.pi / 2:
                ori -= 2 * np.pi
        rel = (ori - start_ori) / (end_ori - start_ori)
        rings[sid].append((x, y, z, rel))

    sharp, less_sharp, flat, less_flat = [], [], [], []
    for r in range(n_scans):
        ring = np.array(rings[r], dtype=np.float64).reshape(-1, 4)
        cnt = len(ring)
        if cnt < 17:  # L = cnt - 11 < 6 -> skipped by the subregion loop
            # curvature needs 11 points; selection needs L >= 6
            if cnt == 0:
                continue
        xyz = ring[:, :3]
        curv = np.zeros(cnt)
        for j in range(5, cnt - 5):
            d = xyz[j - 5 : j + 6].sum(axis=0) - 11 * xyz[j]
            curv[j] = d @ d
        picked = np.zeros(cnt, bool)
        label = np.zeros(cnt, np.int32)

        def suppress(ind):
            picked[ind] = True
            for l in range(1, 6):
                if ind + l >= cnt:
                    break
                g = xyz[ind + l] - xyz[ind + l - 1]
                if g @ g > 0.05:
                    break
                picked[ind + l] = True
            for l in range(1, 6):
                if ind - l < 0:
                    break
                g = xyz[ind - l] - xyz[ind - l + 1]
                if g @ g > 0.05:
                    break
                picked[ind - l] = True

        L = cnt - 11
        if L >= 6:
            for s in range(6):
                sp = 5 + L * s // 6
                ep = 5 + L * (s + 1) // 6 - 1
                order = np.argsort(curv[sp : ep + 1], kind="stable") + sp
                # corners: descending curvature
                n_picked = 0
                for ind in order[::-1]:
                    if picked[ind] or curv[ind] <= curvature_threshold:
                        continue
                    n_picked += 1
                    if n_picked <= 2:
                        label[ind] = 2
                        sharp.append(ring[ind])
                        less_sharp.append(ring[ind])
                    elif n_picked <= 20:
                        label[ind] = 1
                        less_sharp.append(ring[ind])
                    else:
                        break
                    suppress(ind)
                # flats: ascending curvature
                n_flat = 0
                for ind in order:
                    if picked[ind] or curv[ind] >= curvature_threshold:
                        continue
                    flat.append(ring[ind])
                    n_flat += 1
                    if n_flat >= 4:
                        break
                    suppress(ind)
                for k in range(sp, ep + 1):
                    if label[k] <= 0:
                        less_flat.append(ring[k])

    def arr(lst):
        return np.array(lst, dtype=np.float64).reshape(-1, 4)

    return arr(sharp), arr(less_sharp), arr(flat), arr(less_flat)
