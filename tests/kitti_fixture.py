"""Synthetic KITTI-format fixture generator + independent NumPy
golden implementation of the reference semantics (FIXTURES.md §A).

The golden code below is written from the *semantics* documented in
SURVEY.md §2/§3 (not copied from the reference): transforms are
composed into single matrices and applied vectorized over whole
frames/label sets, which is also how correctness is easiest to audit.
Reference behaviors replicated: float32 I/O with float64 compute,
exact linear-interpolation percentile, DontCare exclusion from
extrema folds, z-rescale applied to points, corner z (3rd axis after
remap) and location index 2.
"""

from __future__ import annotations

import os

import numpy as np

LABEL_CLASSES = [
    "Car",
    "Van",
    "Truck",
    "Pedestrian",
    "Person_sitting",
    "Cyclist",
    "Tram",
    "Misc",
    "DontCare",
]

# Axis remap used throughout: 90-deg rotation about X (X->X, Y->Z,
# Z->-Y), i.e. p' = (p_x, p_z, -p_y).
AXIS_REMAP = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, -1.0, 0.0]])


def make_fixture(root: str, n_frames: int = 4, seed: int = 1234) -> dict:
    """Write velodyne/*.bin, label_2/*.txt, calib/*.txt under root.
    Returns the in-memory frames for golden computation."""
    rng = np.random.default_rng(seed)
    for sub in ("velodyne", "label_2", "calib"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    frames = {}
    for k in range(n_frames):
        fid = f"{k:06d}"
        n_pts = int(rng.integers(300, 900))
        pts = np.empty((n_pts, 4), dtype=np.float32)
        pts[:, 0] = rng.uniform(-40, 40, n_pts)
        pts[:, 1] = rng.uniform(-30, 30, n_pts)
        pts[:, 2] = rng.uniform(-2.5, 4.0, n_pts)
        pts[:, 3] = rng.uniform(0, 1, n_pts)
        pts.tofile(os.path.join(root, "velodyne", f"{fid}.bin"))

        n_lbl = int(rng.integers(1, 6))
        lines = []
        labels = []
        for j in range(n_lbl):
            cls = LABEL_CLASSES[int(rng.integers(0, len(LABEL_CLASSES)))]
            if j == n_lbl - 1 and k == 0:
                cls = "DontCare"  # exercise the exclusion filter
            rec = {
                "label": cls,
                "truncated": float(np.float32(rng.uniform(0, 1))),
                "occluded": int(rng.integers(0, 4)),
                "alpha": float(np.float32(rng.uniform(-np.pi, np.pi))),
                "bbox": np.float32(rng.uniform(0, 400, 4)),
                "dimensions": np.float32(rng.uniform(0.5, 4.5, 3)),  # h, w, l
                "location": np.float32(rng.uniform(-20, 20, 3)),
                "rotation_y": float(np.float32(rng.uniform(-np.pi, np.pi))),
            }
            labels.append(rec)
            lines.append(
                " ".join(
                    [rec["label"], repr(rec["truncated"]), str(rec["occluded"]),
                     repr(rec["alpha"])]
                    + [repr(float(v)) for v in rec["bbox"]]
                    + [repr(float(v)) for v in rec["dimensions"]]
                    + [repr(float(v)) for v in rec["location"]]
                    + [repr(rec["rotation_y"])]
                )
            )
        with open(os.path.join(root, "label_2", f"{fid}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")

        # Calibration: Tr = small rotation about z + translation;
        # R0 = small rotation about x. P2 + an extra passthrough key
        # included per FIXTURES.md A3.
        ang_t = float(rng.uniform(-0.2, 0.2))
        ct, st = np.cos(ang_t), np.sin(ang_t)
        tr = np.array(
            [[ct, -st, 0.0, 0.3], [st, ct, 0.0, -0.1], [0.0, 0.0, 1.0, 0.2]]
        )
        ang_r = float(rng.uniform(-0.1, 0.1))
        cr, sr = np.cos(ang_r), np.sin(ang_r)
        r0 = np.array([[1.0, 0.0, 0.0], [0.0, cr, -sr], [0.0, sr, cr]])
        p2 = np.hstack([np.eye(3) * 700.0, np.array([[600.0], [180.0], [1.0]])])
        with open(os.path.join(root, "calib", f"{fid}.txt"), "w") as f:
            f.write("P2: " + " ".join(repr(v) for v in p2.ravel()) + "\n")
            f.write("R0_rect: " + " ".join(repr(v) for v in r0.ravel()) + "\n")
            f.write(
                "Tr_velo_to_cam: " + " ".join(repr(v) for v in tr.ravel()) + "\n"
            )
            f.write("\n")  # skipped (no colon)
            f.write("Tr_imu_to_velo: 0.0 0.0 0.0 0.0\n")  # passthrough key

        frames[fid] = {"points": pts, "labels": labels, "Tr": tr, "R0": r0}
    return frames


# ------------------------------------------------------------------
# Golden (NumPy, vectorized, float64 compute over float32 inputs)
# ------------------------------------------------------------------


def transform_points(pts_f32: np.ndarray, tr: np.ndarray, r0: np.ndarray) -> np.ndarray:
    """Compose calib (R0 @ Tr) with the axis remap into one 3x4
    matrix and apply it in a single pass; intensity untouched."""
    m = AXIS_REMAP @ (r0 @ tr)  # 3x4
    xyz = pts_f32[:, :3].astype(np.float64)
    out = xyz @ m[:, :3].T + m[:, 3]
    return np.column_stack([out, pts_f32[:, 3].astype(np.float64)])


def label_corners(rec: dict) -> np.ndarray:
    """8 corners of one label box after Y-rotation, translation, and
    axis remap (8x3, float64)."""
    h, w, l = (float(v) for v in rec["dimensions"])
    sx = np.array([-1, 1, 1, -1, -1, 1, 1, -1], dtype=np.float64) * (l / 2)
    sy = np.array([0, 0, 0, 0, -1, -1, -1, -1], dtype=np.float64) * h
    sz = np.array([-1, -1, 1, 1, -1, -1, 1, 1], dtype=np.float64) * (w / 2)
    ry = float(rec["rotation_y"])
    c, s = np.cos(ry), np.sin(ry)
    bx = c * sx + s * sz + float(rec["location"][0])
    by = sy + float(rec["location"][1])
    bz = -s * sx + c * sz + float(rec["location"][2])
    return np.column_stack([bx, by, bz]) @ AXIS_REMAP.T


def golden_analysis(frames: dict) -> dict:
    """Reference E1 semantics, whole-dataset: returns raw extrema and
    the rounded minimal/maximal areas."""
    pt_lo = np.full(4, np.inf)
    pt_hi = np.full(4, -np.inf)
    dim_lo = np.full(3, np.inf)
    dim_hi = np.full(3, -np.inf)
    loc_lo = np.full(3, np.inf)
    loc_hi = np.full(3, -np.inf)
    oc_lo = np.full(3, np.inf)
    oc_hi = np.full(3, -np.inf)

    for fid, fr in sorted(frames.items()):
        pts = transform_points(fr["points"], fr["Tr"], fr["R0"])
        z_scale = np.percentile(pts[:, 2], 5)
        pts[:, 2] -= z_scale
        pt_lo = np.minimum(pt_lo, pts.min(axis=0))
        pt_hi = np.maximum(pt_hi, pts.max(axis=0))

        for rec in fr["labels"]:
            if rec["label"] == "DontCare":
                continue
            corners = label_corners(rec)
            corners[:, 2] -= z_scale
            oc_lo = np.minimum(oc_lo, corners.min(axis=0))
            oc_hi = np.maximum(oc_hi, corners.max(axis=0))
            dims = np.asarray(rec["dimensions"], dtype=np.float64)
            dim_lo = np.minimum(dim_lo, dims)
            dim_hi = np.maximum(dim_hi, dims)
            loc = np.asarray(rec["location"], dtype=np.float64).copy()
            loc[2] -= z_scale
            loc_lo = np.minimum(loc_lo, loc)
            loc_hi = np.maximum(loc_hi, loc)

    # Postprocess (reference P14): locations (x,y,z)->(x,z,y);
    # dims (h,w,l)->(l,w,h).
    loc_lo_r = loc_lo[[0, 2, 1]]
    loc_hi_r = loc_hi[[0, 2, 1]]
    dim_lo_r = dim_lo[[2, 1, 0]]
    dim_hi_r = dim_hi[[2, 1, 0]]

    r2 = lambda a: [round(float(v), 2) for v in a]  # noqa: E731
    minimal = (
        r2(np.maximum(pt_lo[:3], np.maximum(oc_lo, loc_lo_r - dim_hi_r))),
        r2(np.minimum(pt_hi[:3], np.minimum(oc_hi, loc_hi_r + dim_hi_r))),
    )
    maximal = (
        r2(np.maximum(pt_lo[:3], np.minimum(oc_lo, loc_lo_r - dim_hi_r))),
        r2(np.minimum(pt_hi[:3], np.maximum(oc_hi, loc_hi_r + dim_hi_r))),
    )
    return {
        "min_point": pt_lo,
        "max_point": pt_hi,
        "min_dim": dim_lo_r,
        "max_dim": dim_hi_r,
        "min_loc": loc_lo_r,
        "max_loc": loc_hi_r,
        "min_obj_corner": oc_lo,
        "max_obj_corner": oc_hi,
        "minimal_area": minimal,
        "maximal_area": maximal,
    }


def golden_cutout(frames: dict, lo: np.ndarray, hi: np.ndarray) -> dict:
    """Reference E2 semantics: per-frame surviving points after
    calibrate + remap + box filter (no z-rescale in E2)."""
    out = {}
    for fid, fr in sorted(frames.items()):
        pts = transform_points(fr["points"], fr["Tr"], fr["R0"])
        keep = (
            (pts[:, 0] > lo[0])
            & (pts[:, 1] > lo[1])
            & (pts[:, 2] > lo[2])
            & (pts[:, 0] < hi[0])
            & (pts[:, 1] < hi[1])
            & (pts[:, 2] < hi[2])
        )
        out[fid] = pts[keep]
    return out
