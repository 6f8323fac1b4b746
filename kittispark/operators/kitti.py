"""KITTI geometry operators, Spark-first (SURVEY.md §2.2-§2.4).

Every kernel the reference runs as NumPy matmul per frame is
re-expressed as closed-form column expressions over a broadcast
calibration row — whole-stage-codegen'd JVM arithmetic, no Python on
the hot path. Parity is golden-tested against NumPy reference
semantics in tests/test_kitti_golden.py.

Reference call sites (for parity audit):
- apply_calibration: data_utils.py:59-92 (velo->cam 3x4 then
  rectification 3x3, intensity pass-through)
- axis_align: data_utils.py:95-108 (constant 90-deg X rotation ->
  pure column remap (x, z, -y); SURVEY P6 constant-folding)
- rescale_z: data_pipeline.py:29-30 (per-frame 5th-percentile ground
  plane shift; SURVEY P7/A5/J2)
- bbox_corners: data_utils.py:111-137 (8 canonical corners, Y-axis
  rotation, translation, X-axis remap; SURVEY P11 — 1 label row ->
  8 corner rows)
- analysis envelope: data_pipeline.py:8-64 (A1-A4 extrema folds,
  P13/P14 postprocess)
- cutout: data_pipeline.py:67-84 (P8 box filter + S5 sink + A6
  count stats)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# Calibration: tall (frame_id, key, values) -> wide broadcastable row
# --------------------------------------------------------------------------


def calib_matrices(calib_tall: DataFrame) -> DataFrame:
    """Wide per-frame calibration row: Tr_velo_to_cam cells t00..t23
    (3x4, row-major) and R0_rect cells r00..r22 (3x3).

    One row per frame, a dozen doubles — the canonical broadcast side
    of every geometry join (reference keeps these as an in-process
    dict, SURVEY §4 'manual broadcast')."""
    tr = calib_tall.filter(F.col("key") == "Tr_velo_to_cam").select(
        "frame_id",
        *[
            F.element_at("values", i + 1).alias(f"t{i // 4}{i % 4}")
            for i in range(12)
        ],
    )
    r0 = calib_tall.filter(F.col("key") == "R0_rect").select(
        "frame_id",
        *[
            F.element_at("values", i + 1).alias(f"r{i // 3}{i % 3}")
            for i in range(9)
        ],
    )
    return tr.join(r0, "frame_id")


def apply_calibration(points: DataFrame, calib_wide: DataFrame) -> DataFrame:
    """velo->cam affine + rectification as composed column
    expressions (reference data_utils.py:59-92).

    cam_k = Tr[k,:] . (x, y, z, 1);  rect_i = R0[i,:] . cam
    Intensity passes through untouched (data_utils.py:76-79). The
    calib side is broadcast — the only wide data movement is the
    points scan itself."""
    j = points.join(F.broadcast(calib_wide), "frame_id")
    cam = [
        F.col(f"t{k}0") * F.col("x")
        + F.col(f"t{k}1") * F.col("y")
        + F.col(f"t{k}2") * F.col("z")
        + F.col(f"t{k}3")
        for k in range(3)
    ]
    rect = [
        F.col(f"r{i}0") * cam[0] + F.col(f"r{i}1") * cam[1] + F.col(f"r{i}2") * cam[2]
        for i in range(3)
    ]
    return j.select(
        "frame_id",
        rect[0].alias("x"),
        rect[1].alias("y"),
        rect[2].alias("z"),
        "intensity",
    )


def axis_align(df: DataFrame, x: str = "x", y: str = "y", z: str = "z") -> DataFrame:
    """Constant 90-deg X-rotation (X->X, Y->Z, Z->-Y) as a pure
    column remap — the rotation matrix of data_utils.py:95-108
    constant-folds to select(x, z, -y); no matmul at runtime
    (SURVEY §4)."""
    others = [c for c in df.columns if c not in (x, y, z)]
    return df.select(
        *others,
        F.col(x).alias(x),
        F.col(z).alias(y),
        (-F.col(y)).alias(z),
    ).select(*df.columns)


def frame_z_scale(
    points: DataFrame,
    percentage: float = 0.05,
    approx: bool = False,
    accuracy: int = 10000,
    z: str = "z",
) -> DataFrame:
    """Per-frame percentile of z (reference np.percentile(z, 5),
    data_pipeline.py:29). Exact `percentile` (default) for golden
    parity; `approx=True` IS the documented 100 TB switch — the
    single-pass mergeable percentile_approx sketch at the same call
    site (SURVEY §7.4). The switch itself is driver-verified by the
    rescale_by_percentile_approx query's error-bounded oracle."""
    agg = (
        F.percentile_approx(z, percentage, accuracy)
        if approx
        else F.percentile(z, percentage)
    )
    return points.groupBy("frame_id").agg(agg.alias("z_scale"))


def rescale_z(
    points: DataFrame, z_scales: DataFrame | None = None, z: str = "z"
) -> DataFrame:
    """Ground-plane normalization: z -= per-frame 5th percentile
    (reference P7/J2, data_pipeline.py:29-30). Aggregate-to-detail
    rejoin with the tiny per-frame stats broadcast."""
    if z_scales is None:
        # derive the default percentile from the SAME column being
        # rescaled — frame_z_scale("z") on a df whose height column is
        # named differently would silently scale by an unrelated column
        z_scales = frame_z_scale(points, z=z)
    out_cols = [
        (F.col(z) - F.col("z_scale")).alias(z) if c == z else c
        for c in points.columns
    ]
    return points.join(F.broadcast(z_scales), "frame_id").select(*out_cols)


# --------------------------------------------------------------------------
# 3-D bbox corners: 1 label row -> 8 corner rows (SURVEY P11)
# --------------------------------------------------------------------------

# Canonical corner offsets in units of (l, h, w) halves, matching the
# layout at data_utils.py:117-119: index i -> (x_sign*l/2, y in
# {0, -h}, z_sign*w/2).
_X_SIGNS = (-1, 1, 1, -1, -1, 1, 1, -1)
_Y_TOP = (0, 0, 0, 0, 1, 1, 1, 1)  # 1 -> -h
_Z_SIGNS = (-1, -1, 1, 1, -1, -1, 1, 1)


def corner_structs() -> list:
    """The 8 rotated+translated+axis-remapped corner expressions of a
    3-D label box as struct columns (corner_idx, cx, cy, cz) — the
    ONE definition of the box geometry, shared by bbox_corners (the
    P11 explode) and viz.bbox_wireframe (the 12-edge expansion), so
    the corner layout can never drift between analysis and rendering.

    Closed form per corner (cos/sin of rotation_y once per row;
    reference get_3d_bbox, data_utils.py:111-137: Y-rotation
    :124-131, translation :132-134, X-remap :135-136):
        bx = cos*sx*l/2 + sin*sz*w/2 + loc_x
        by = {0|-h} + loc_y
        bz = -sin*sx*l/2 + cos*sz*w/2 + loc_z
    then the X-axis remap (bx, bz, -by)."""
    c, s = F.cos("rotation_y"), F.sin("rotation_y")
    corners = []
    for i in range(8):
        xo = F.lit(_X_SIGNS[i]) * F.col("dim_l") / 2
        yo = F.lit(-_Y_TOP[i]) * F.col("dim_h")
        zo = F.lit(_Z_SIGNS[i]) * F.col("dim_w") / 2
        bx = c * xo + s * zo + F.col("loc_x")
        by = yo + F.col("loc_y")
        bz = -s * xo + c * zo + F.col("loc_z")
        corners.append(
            F.struct(
                F.lit(i).alias("corner_idx"),
                bx.alias("cx"),
                bz.alias("cy"),  # X-axis remap: (x, z, -y)
                (-by).alias("cz"),
            )
        )
    return corners


def bbox_corners(labels: DataFrame) -> DataFrame:
    """Explode each label into its 8 rotated+translated 3-D box
    corners, already axis-aligned (reference get_3d_bbox,
    data_utils.py:111-137). Emitted as explode(array(struct x8)) —
    generator expressions, no UDF; geometry lives in
    corner_structs()."""
    return labels.select(
        "frame_id",
        "label",
        F.explode(F.array(*corner_structs())).alias("c"),
    ).select("frame_id", "label", "c.corner_idx", "c.cx", "c.cy", "c.cz")


# --------------------------------------------------------------------------
# E1 analysis: extrema folds + envelope postprocess
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class AnalysisResult:
    """Driver-side envelope (few dozen scalars — the only data that
    ever reaches the driver, matching the reference's printed stats,
    data_pipeline.py:50-63)."""

    min_point: tuple[float, float, float, float]
    max_point: tuple[float, float, float, float]
    min_dim: tuple[float, float, float]
    max_dim: tuple[float, float, float]
    min_loc: tuple[float, float, float]
    max_loc: tuple[float, float, float]
    min_obj_corner: tuple[float, float, float]
    max_obj_corner: tuple[float, float, float]
    minimal_area: tuple[tuple[float, ...], tuple[float, ...]]
    maximal_area: tuple[tuple[float, ...], tuple[float, ...]]


def _minmax(cols: list[str]) -> list[Column]:
    out = []
    for c in cols:
        out += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return out


def analyze(
    points: DataFrame, labels: DataFrame, calib_wide: DataFrame
) -> AnalysisResult:
    """Full E1 analysis (reference get_analysis, data_pipeline.py:8-64)
    as one lazy DAG with three aggregate branches sharing the same
    per-frame z-scale:

      points -> calibrate -> axis-align -> rescale -> global min/max      (A1)
      labels (non-DontCare) -> dims/locations extrema (z rescaled)       (A2,A3)
      labels -> corner explode -> rescale -> global min/max              (A4)

    then the P13/P14 driver-side postprocess on the 1-row envelopes.
    Reference prints round-2 values; rounding applied here identically
    (data_pipeline.py:50-63)."""
    pts = axis_align(apply_calibration(points, calib_wide))
    scales = frame_z_scale(pts)
    pts_rescaled = rescale_z(pts, scales)

    p_agg = pts_rescaled.agg(*_minmax(["x", "y", "z", "intensity"]))

    real = labels.filter(F.col("label") != "DontCare")
    # Locations with z rescale on index 2 only (data_pipeline.py:40-41)
    loc = (
        real.join(F.broadcast(scales), "frame_id")
        .select(
            F.col("loc_x").alias("lx"),
            F.col("loc_y").alias("ly"),
            (F.col("loc_z") - F.col("z_scale")).alias("lz"),
            "dim_h",
            "dim_w",
            "dim_l",
        )
    )
    d_agg = loc.agg(*_minmax(["dim_h", "dim_w", "dim_l", "lx", "ly", "lz"]))

    corners = bbox_corners(real).join(F.broadcast(scales), "frame_id").select(
        "cx", "cy", (F.col("cz") - F.col("z_scale")).alias("cz")
    )
    oc_agg = corners.agg(*_minmax(["cx", "cy", "cz"]))

    # ONE action for the whole envelope: the three 1-row aggregates
    # are cross-joined (1x1x1 — broadcast nested loop over single
    # rows, no data movement) and collected together, so the driver
    # launches one job instead of three. Column names are disjoint
    # across the branches, so the row exposes all ~40 scalars at once.
    p = d = oc = p_agg.crossJoin(d_agg).crossJoin(oc_agg).collect()[0]

    # --- driver-side postprocess on ~40 scalars (P13/P14) ---
    min_point = (p["min_x"], p["min_y"], p["min_z"], p["min_intensity"])
    max_point = (p["max_x"], p["max_y"], p["max_z"], p["max_intensity"])
    min_obj = (oc["min_cx"], oc["min_cy"], oc["min_cz"])
    max_obj = (oc["max_cx"], oc["max_cy"], oc["max_cz"])

    # P14 inverse rotation: flipped-last-row X-matrix applied to
    # (x, y, z) -> (x, z, y); dims reordered (l, h, w) -> same map
    # (data_pipeline.py:45-49).
    min_loc = (d["min_lx"], d["min_lz"], d["min_ly"])
    max_loc = (d["max_lx"], d["max_lz"], d["max_ly"])
    min_dim = (d["min_dim_l"], d["min_dim_w"], d["min_dim_h"])
    max_dim = (d["max_dim_l"], d["max_dim_w"], d["max_dim_h"])

    r2 = lambda v: round(float(v), 2)  # noqa: E731 — reference rounds at print
    lo = [
        r2(max(min_point[i], max(min_obj[i], min_loc[i] - max_dim[i])))
        for i in range(3)
    ]
    hi = [
        r2(min(max_point[i], min(max_obj[i], max_loc[i] + max_dim[i])))
        for i in range(3)
    ]
    lo_x = [
        r2(max(min_point[i], min(min_obj[i], min_loc[i] - max_dim[i])))
        for i in range(3)
    ]
    hi_x = [
        r2(min(max_point[i], max(max_obj[i], max_loc[i] + max_dim[i])))
        for i in range(3)
    ]
    return AnalysisResult(
        min_point=tuple(map(float, min_point)),
        max_point=tuple(map(float, max_point)),
        min_dim=tuple(map(float, min_dim)),
        max_dim=tuple(map(float, max_dim)),
        min_loc=tuple(map(float, min_loc)),
        max_loc=tuple(map(float, max_loc)),
        min_obj_corner=tuple(map(float, min_obj)),
        max_obj_corner=tuple(map(float, max_obj)),
        minimal_area=(tuple(lo), tuple(hi)),
        maximal_area=(tuple(lo_x), tuple(hi_x)),
    )


# --------------------------------------------------------------------------
# E2 cut-out: box filter + count stats
# --------------------------------------------------------------------------


def cutout_filter(
    points: DataFrame, lo: tuple[float, float, float], hi: tuple[float, float, float]
) -> DataFrame:
    """Conjunctive 3-D box containment (reference P8,
    data_pipeline.py:77-79) — six pushdown-friendly range predicates."""
    return points.filter(
        (F.col("x") > lo[0])
        & (F.col("y") > lo[1])
        & (F.col("z") > lo[2])
        & (F.col("x") < hi[0])
        & (F.col("y") < hi[1])
        & (F.col("z") < hi[2])
    )


def frame_count_stats(points: DataFrame) -> DataFrame:
    """Per-frame row counts folded to global min/avg/max (reference
    A6, data_pipeline.py:80-84; avg rounded like the print at :83)."""
    per_frame = points.groupBy("frame_id").agg(F.count(F.lit(1)).alias("n"))
    return per_frame.agg(
        F.min("n").alias("min_points"),
        F.round(F.avg("n"), 0).cast("long").alias("avg_points"),
        F.max("n").alias("max_points"),
        F.count(F.lit(1)).alias("n_frames"),
    )


def cutout_pipeline(
    points: DataFrame,
    calib_wide: DataFrame,
    lo: tuple[float, float, float],
    hi: tuple[float, float, float],
) -> DataFrame:
    """E2 end-to-end transform (reference gen_cut_out_dataset,
    data_pipeline.py:67-84): calibrate -> axis-align -> box filter.
    Sink + stats are separate calls (kittispark.sinks.write_frames /
    frame_count_stats) so the filtered frame is written once and the
    stats can reuse it."""
    return cutout_filter(axis_align(apply_calibration(points, calib_wide)), lo, hi)


def center_area_borders(
    minimal_area: tuple[tuple[float, ...], tuple[float, ...]],
    factor: float = 1.0 / 8.0,
) -> tuple[tuple[float, float, float], tuple[float, float, float]]:
    """Borders of the reference's SECOND cut-out dataset
    (lbl_center_area_PoCls, data_pipeline.py:92-95): the minimal
    analysis area shrunk toward the origin by ``factor`` —
    lo' = lo * f and hi' = (lo + (hi - lo)) * f = hi * f, written in
    the reference's two-step form (area_dims then lo + dims) to make
    the parity line-for-line auditable. Feed the result to
    cutout_pipeline exactly like the primary minimal_area borders
    (the .gitignore's two output dirs are these two datasets)."""
    lo = tuple(float(v) for v in minimal_area[0])
    hi = tuple(float(v) for v in minimal_area[1])
    area_dims = tuple(h - l for l, h in zip(lo, hi))
    return (
        tuple(l * factor for l in lo),
        tuple((l + d) * factor for l, d in zip(lo, area_dims)),
    )
