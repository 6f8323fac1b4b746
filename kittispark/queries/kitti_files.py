"""Driver-adjudicated KITTI FILE-PATH queries (SURVEY §2.1 S1-S5, S7
+ §2.2 P1-P6).

The driver's sf dirs hold no KITTI files, so these queries use the
synth-roundtrip pattern proven by media_feature_extract: a bounded,
deterministic KITTI-format directory tree (label .txt, calib .txt,
velodyne .bin) is synthesized from the `documents` table in closed
form, written through the engine's own sink (S5), and read back
through the engine's own sources (S1-S4) and geometry chain (P1-P6).
The DuckDB oracle recomputes the same closed form straight from
`documents` — a hash match proves the byte-level writers, the file
parsers, and the calibration arithmetic end to end, not just that
rows came back.

Exactness: every synthesized value is a DYADIC rational (multiples of
0.25/0.5) with small magnitude, so text round-trip, float32 .bin
round-trip, and all double arithmetic (affine calibration products /
sums) are EXACT in both engines — no rounding tolerance is needed and
hash comparison is safe regardless of evaluation order.

The fixture is a test vector, not a data path: ~160 docs -> 8 frames,
built once per (process, sf_dir) via one bounded collect of the ids
(same contract as the documented IVF training sample). The operators
under test — read_points/read_labels/read_calib/write_kitti_bins/
apply_calibration/axis_align — are the production path and stay fully
distributed.

Reference parity: data_utils.py:4-56 (parsers), data_utils.py:59-108
(calibration + axis remap), data_pipeline.py:81 (.bin sink).
"""

from __future__ import annotations

import atexit
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kittispark.registry import register
from kittispark.queries._util import t
from kittispark.operators.kitti import (
    apply_calibration,
    axis_align,
    calib_matrices,
)
from kittispark.sinks import write_kitti_bins
from kittispark.sources.kitti import read_calib, read_labels, read_points

_N_DOCS = 160  # fixture bound: docs 0..159 -> 8 frames of 20 docs
_N_FRAMES = 8
_LABELS = ("Car", "Pedestrian", "Cyclist", "DontCare")

# The registered queries bind the fixed (160 docs, 8 frames) fixture;
# every closed form, SQL builder, and fixture writer below is
# parameterized on (n_docs, n_frames) so scripts/oracle_sweep.py can
# run the SAME parsers and geometry chain against 10x/100x fixtures
# (more frames, more label lines per file, bigger point clouds) and
# catch scale-revealed divergences the 160-doc gate cannot (VERDICT
# r3 #7). KITTI_SCALE_CHECKS at the bottom exposes the (df_builder,
# sql_builder) pairs.


# --------------------------------------------------------------------------
# Closed forms (Python mirror == Spark columns == DuckDB SQL)
# --------------------------------------------------------------------------


def _label_fields(d: int) -> dict:
    """Per-doc label-line values — all dyadic (quarters/halves)."""
    return {
        "label": _LABELS[d % 4],
        "truncated": (d % 4) * 0.25,
        "occluded": d % 3,
        "alpha": ((d % 16) - 8) * 0.25,
        "bx1": (d % 30) * 0.5,
        "by1": (d % 20) * 0.5,
        "bx2": (d % 30) * 0.5 + 4.0,
        "by2": (d % 20) * 0.5 + 3.0,
        "dim_h": 1.0 + (d % 8) * 0.25,
        "dim_w": 0.5 + (d % 6) * 0.25,
        "dim_l": 2.0 + (d % 12) * 0.25,
        "loc_x": ((d * 3) % 40 - 20) * 0.5,
        "loc_y": ((d * 5) % 12 - 6) * 0.25,
        "loc_z": (d % 50) * 0.5 + 2.0,
        "rotation_y": ((d % 13) - 6) * 0.25,
    }


def _tr(f: int, k: int, j: int) -> float:
    """Tr_velo_to_cam[k][j] for frame f — quarters in [-2, 2]."""
    return ((f * 7 + k * 5 + j * 3) % 17 - 8) * 0.25


def _r0(f: int, i: int, j: int) -> float:
    """R0_rect[i][j] for frame f — halves in [-3.5, 3.5]."""
    return ((f * 3 + i * 7 + j * 5) % 15 - 7) * 0.5


def _synth_points(docs: DataFrame, n_frames: int = _N_FRAMES) -> DataFrame:
    """Deterministic per-doc point rows, pure column expressions:
    doc d -> frame d % n_frames, m = 2 + d%3 points; point i coords
    are quarter-steps in [-8, 8); intensity carries the unique point
    key d*8+i (the calibration chain passes intensity through
    untouched, so the key survives to the output for oracle
    alignment)."""
    d, i = F.col("doc_id"), F.col("i")
    exploded = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), (d % 3) + 1)).alias("i")
    )
    return exploded.select(
        F.format_string("%06d", (d % n_frames).cast("int")).alias("frame_id"),
        (((d * 7 + i * 13) % 64 - 32) * 0.25).alias("x"),
        (((d * 11 + i * 5) % 64 - 32) * 0.25).alias("y"),
        (((d * 3 + i * 17) % 32) * 0.25).alias("z"),
        (d * 8 + i).cast("double").alias("intensity"),
    )


def _pts_cte(n_docs: int = _N_DOCS, n_frames: int = _N_FRAMES) -> str:
    return f"""
    pts AS (
        SELECT doc_id % {n_frames} AS f,
               lpad(CAST(doc_id % {n_frames} AS VARCHAR), 6, '0') AS frame_id,
               doc_id * 8 + i AS pt_key,
               CAST((doc_id * 7 + i * 13) % 64 - 32 AS DOUBLE) * 0.25 AS x,
               CAST((doc_id * 11 + i * 5) % 64 - 32 AS DOUBLE) * 0.25 AS y,
               CAST((doc_id * 3 + i * 17) % 32 AS DOUBLE) * 0.25 AS z
        FROM documents,
             LATERAL (SELECT unnest(generate_series(0, doc_id % 3 + 1)) AS i) g
        WHERE doc_id < {n_docs}
    )
"""


# --------------------------------------------------------------------------
# Fixture builder (once per process+sf_dir)
# --------------------------------------------------------------------------

_FIXTURE_ROOT: dict[tuple[str, int, int], str] = {}


def _cleanup_fixture_roots() -> None:
    import shutil

    for root in _FIXTURE_ROOT.values():
        shutil.rmtree(root, ignore_errors=True)


atexit.register(_cleanup_fixture_roots)


def _docs(spark: SparkSession, sf_dir: str, n_docs: int) -> DataFrame:
    """The fixture's id universe — ONE definition shared by the
    builder and every query that recomputes from doc ids, so the
    bound/cast can never silently diverge between them."""
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < n_docs)
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )


def kitti_fixture_root(
    spark: SparkSession,
    sf_dir: str,
    n_docs: int = _N_DOCS,
    n_frames: int = _N_FRAMES,
) -> str:
    """Synthesize the KITTI directory tree for sf_dir:

      root/label_2/NNNNNN.txt   one 15-field line per doc (S3 format)
      root/calib/NNNNNN.txt     P2 + Tr_velo_to_cam + R0_rect + noise
      root/velodyne/NNNNNN.bin  float32 (x,y,z,intensity) rows,
                                written by the S5 sink itself

    Content depends only on the doc ids present, so reruns (and the
    driver's separate oracle pass) agree on every VALUE. (Label and
    calib text files are byte-identical across runs; the .bin files
    are written by the applyInPandas sink, whose within-frame row
    order follows shuffle delivery — so .bin bytes may be permuted
    between runs. The registered queries compare row sets, which is
    the contract; don't hash the .bin files themselves.)"""
    cached = _FIXTURE_ROOT.get((sf_dir, n_docs, n_frames))
    if cached is not None and os.path.isdir(cached):
        return cached

    # The builder writes label/calib on the DRIVER's filesystem while
    # the .bin sink writes from EXECUTORS — coherent only when both
    # see the same filesystem (local master, or a shared mount).
    master = spark.sparkContext.master
    if not master.startswith("local") and "SPARK_GRAFT_SHARED_FS" not in os.environ:
        raise RuntimeError(
            f"kitti fixture builder needs a filesystem shared between "
            f"driver and executors; master={master!r}. Set "
            "SPARK_GRAFT_SHARED_FS=1 if /tmp really is shared."
        )

    docs = _docs(spark, sf_dir, n_docs)
    ids = sorted(r[0] for r in docs.collect())  # bounded: <= n_docs ints
    if not ids:
        raise ValueError(
            f"no documents with doc_id < {n_docs} in {sf_dir} — cannot "
            "build the KITTI fixture"
        )

    root = tempfile.mkdtemp(prefix="kittispark-kitti-")
    label_dir = os.path.join(root, "label_2")
    calib_dir = os.path.join(root, "calib")
    os.makedirs(label_dir)
    os.makedirs(calib_dir)
    os.makedirs(os.path.join(root, "velodyne"), exist_ok=True)

    frames = sorted({d % n_frames for d in ids})
    by_frame: dict[int, list[int]] = {f: [] for f in frames}
    for d in ids:
        by_frame[d % n_frames].append(d)

    for f in frames:
        with open(os.path.join(label_dir, f"{f:06d}.txt"), "w") as fh:
            for d in by_frame[f]:
                v = _label_fields(d)
                fh.write(
                    "{label} {truncated:.2f} {occluded} {alpha:.2f} "
                    "{bx1:.2f} {by1:.2f} {bx2:.2f} {by2:.2f} "
                    "{dim_h:.2f} {dim_w:.2f} {dim_l:.2f} "
                    "{loc_x:.2f} {loc_y:.2f} {loc_z:.2f} "
                    "{rotation_y:.2f}\n".format(**v)
                )
        with open(os.path.join(calib_dir, f"{f:06d}.txt"), "w") as fh:
            # P2 is present-but-unused (the parser must not trip on
            # extra keys); the bare line exercises the no-colon skip.
            fh.write("P2: " + " ".join("0.00" for _ in range(12)) + "\n")
            fh.write(
                "Tr_velo_to_cam: "
                + " ".join(
                    f"{_tr(f, k, j):.2f}" for k in range(3) for j in range(4)
                )
                + "\n"
            )
            fh.write("calibration_time 2011\n")
            fh.write(
                "R0_rect: "
                + " ".join(
                    f"{_r0(f, i, j):.2f}" for i in range(3) for j in range(3)
                )
                + "\n"
            )

    # S5 sink writes the .bin files (the sink under test IS the
    # fixture writer — the roundtrip query then re-reads via S1+S2).
    write_kitti_bins(
        _synth_points(docs, n_frames), os.path.join(root, "velodyne")
    ).collect()

    _FIXTURE_ROOT[(sf_dir, n_docs, n_frames)] = root
    return root


# --------------------------------------------------------------------------
# Registered queries
# --------------------------------------------------------------------------


def _label_scan_sql(n_docs: int = _N_DOCS, n_frames: int = _N_FRAMES) -> str:
    return f"""
    SELECT lpad(CAST(doc_id % {n_frames} AS VARCHAR), 6, '0') AS frame_id,
           CASE doc_id % 4 WHEN 0 THEN 'Car' WHEN 1 THEN 'Pedestrian'
                WHEN 2 THEN 'Cyclist' ELSE 'DontCare' END AS label,
           CAST(doc_id % 4 AS DOUBLE) * 0.25 AS truncated,
           CAST(doc_id % 3 AS INT) AS occluded,
           CAST((doc_id % 16) - 8 AS DOUBLE) * 0.25 AS alpha,
           CAST(doc_id % 30 AS DOUBLE) * 0.5 AS bx1,
           CAST(doc_id % 20 AS DOUBLE) * 0.5 AS by1,
           CAST(doc_id % 30 AS DOUBLE) * 0.5 + 4.0 AS bx2,
           CAST(doc_id % 20 AS DOUBLE) * 0.5 + 3.0 AS by2,
           1.0 + CAST(doc_id % 8 AS DOUBLE) * 0.25 AS dim_h,
           0.5 + CAST(doc_id % 6 AS DOUBLE) * 0.25 AS dim_w,
           2.0 + CAST(doc_id % 12 AS DOUBLE) * 0.25 AS dim_l,
           CAST((doc_id * 3) % 40 - 20 AS DOUBLE) * 0.5 AS loc_x,
           CAST((doc_id * 5) % 12 - 6 AS DOUBLE) * 0.25 AS loc_y,
           CAST(doc_id % 50 AS DOUBLE) * 0.5 + 2.0 AS loc_z,
           CAST((doc_id % 13) - 6 AS DOUBLE) * 0.25 AS rotation_y
    FROM documents WHERE doc_id < {n_docs}
    """


@register(
    "kitti_label_file_scan",
    oracle=_label_scan_sql(),
    doc="S1+S3 driver-adjudicated: synthesized 15-field KITTI label "
    "files are scanned by the real directory source (suffix filter + "
    "frame key from file name, sources/kitti.py:88; reference "
    "data_utils.py:17-33) and positionally parsed/cast; the oracle "
    "recomputes every field in closed form from doc_id — hash match "
    "proves the text scan and positional schema bit-exactly (all "
    "values dyadic, so parse and arithmetic are exact).",
    tags=("kitti-files",),
)
def kitti_label_file_scan(
    spark: SparkSession,
    sf_dir: str,
    n_docs: int = _N_DOCS,
    n_frames: int = _N_FRAMES,
) -> DataFrame:
    root = kitti_fixture_root(spark, sf_dir, n_docs, n_frames)
    labels = read_labels(spark, os.path.join(root, "label_2"))
    return labels.select(
        "frame_id",
        "label",
        "truncated",
        "occluded",
        "alpha",
        F.element_at("bbox", 1).alias("bx1"),
        F.element_at("bbox", 2).alias("by1"),
        F.element_at("bbox", 3).alias("bx2"),
        F.element_at("bbox", 4).alias("by2"),
        "dim_h",
        "dim_w",
        "dim_l",
        "loc_x",
        "loc_y",
        "loc_z",
        "rotation_y",
    )


def _points_sql(n_docs: int = _N_DOCS, n_frames: int = _N_FRAMES) -> str:
    return f"""
    WITH {_pts_cte(n_docs, n_frames)}
    SELECT frame_id, pt_key, x, y, z FROM pts
    """


@register(
    "kitti_points_bin_roundtrip",
    oracle=_points_sql(),
    doc="S5+S1+S2 driver-adjudicated roundtrip: deterministic points "
    "are written as per-frame float32 .bin files by the engine's own "
    "partitioned binary sink (sinks.write_kitti_bins, applyInPandas; "
    "reference data_pipeline.py:81), then re-read by the binaryFile "
    "scan + 1->N mapInPandas decoder (sources/kitti.py:44; reference "
    "np.fromfile at data_utils.py:11-14). The oracle recomputes the "
    "points in closed form — hash match proves writer AND reader are "
    "byte-exact (dyadic quarter-step coords survive float32 exactly).",
    tags=("kitti-files", "udf"),
)
def kitti_points_bin_roundtrip(
    spark: SparkSession,
    sf_dir: str,
    n_docs: int = _N_DOCS,
    n_frames: int = _N_FRAMES,
) -> DataFrame:
    root = kitti_fixture_root(spark, sf_dir, n_docs, n_frames)
    pts = read_points(spark, os.path.join(root, "velodyne"))
    return pts.select(
        "frame_id",
        F.col("intensity").cast("long").alias("pt_key"),
        "x",
        "y",
        "z",
    )


def _rect_exprs() -> tuple[str, str, str]:
    """DuckDB expressions for the P1-P5 chain + P6 axis remap over a
    `pts` row (f, x, y, z): cam = Tr[3x4] . (x,y,z,1); rect =
    R0[3x3] . cam; out = (rect0, rect2, -rect1). Matrix cells are
    inlined closed forms of (frame, row, col) — the same dyadic
    values the calib files carry."""

    def tr(k: int, j: int) -> str:
        return f"(CAST((f*7 + {k}*5 + {j}*3) % 17 - 8 AS DOUBLE) * 0.25)"

    def r0(i: int, j: int) -> str:
        return f"(CAST((f*3 + {i}*7 + {j}*5) % 15 - 7 AS DOUBLE) * 0.5)"

    cam = [
        f"({tr(k, 0)}*x + {tr(k, 1)}*y + {tr(k, 2)}*z + {tr(k, 3)})"
        for k in range(3)
    ]
    rect = [
        f"({r0(i, 0)}*{cam[0]} + {r0(i, 1)}*{cam[1]} + {r0(i, 2)}*{cam[2]})"
        for i in range(3)
    ]
    return rect[0], rect[2], f"-{rect[1]}"


def _calib_chain_sql(n_docs: int = _N_DOCS, n_frames: int = _N_FRAMES) -> str:
    x, y, z = _rect_exprs()
    return f"""
    WITH {_pts_cte(n_docs, n_frames)}
    SELECT frame_id, pt_key,
           {x} AS x,
           {y} AS y,
           {z} AS z
    FROM pts
    """


@register(
    "kitti_calib_chain",
    oracle=_calib_chain_sql(),
    doc="S4+P1-P6 driver-adjudicated: synthesized `key: v v ...` calib "
    "files (with extra keys and a colon-less line the parser must "
    "skip) are read by the real key-value source (sources/kitti.py:120) "
    "and reshaped to the broadcast matrix row (operators/kitti.py:38); "
    "points then run the full homogeneous-extension -> velo-to-cam -> "
    "rectification -> constant-axis-remap chain "
    "(operators/kitti.py:62-102; reference data_utils.py:36-108). The "
    "oracle inlines the same matrices as closed forms and recomputes "
    "the affine chain — hash match value-proves P1-P5 end to end "
    "(dyadic cells/coords keep every product and sum exact in double).",
    tags=("kitti-files",),
)
def kitti_calib_chain(
    spark: SparkSession,
    sf_dir: str,
    n_docs: int = _N_DOCS,
    n_frames: int = _N_FRAMES,
) -> DataFrame:
    root = kitti_fixture_root(spark, sf_dir, n_docs, n_frames)
    docs = _docs(spark, sf_dir, n_docs)
    calib_wide = calib_matrices(read_calib(spark, os.path.join(root, "calib")))
    out = axis_align(apply_calibration(_synth_points(docs, n_frames), calib_wide))
    return out.select(
        "frame_id",
        F.col("intensity").cast("long").alias("pt_key"),
        "x",
        "y",
        "z",
    )


def _frame_lookup_sql(n_docs: int = _N_DOCS, n_frames: int = _N_FRAMES) -> str:
    return f"""
    WITH {_pts_cte(n_docs, n_frames)}
    SELECT x, y, z, CAST(pt_key AS DOUBLE) AS intensity
    FROM pts WHERE frame_id = '000003'
    ORDER BY x, y, z, intensity LIMIT 40
    """


@register(
    "kitti_frame_lookup",
    oracle=_frame_lookup_sql(),
    doc="S7 driver-adjudicated: the single-frame visualization data "
    "path (viz.frame_points_df) — partition-pruned frame lookup over "
    "the .bin-roundtrip points with a deterministic driver-transfer "
    "cap (lowest (x,y,z,intensity) first, limit 40). The oracle "
    "reproduces filter+order+limit in closed form; the unique "
    "intensity key makes the capped row set deterministic.",
    tags=("kitti-files",),
)
def kitti_frame_lookup(
    spark: SparkSession,
    sf_dir: str,
    n_docs: int = _N_DOCS,
    n_frames: int = _N_FRAMES,
) -> DataFrame:
    from kittispark.viz import frame_points_df

    root = kitti_fixture_root(spark, sf_dir, n_docs, n_frames)
    pts = read_points(spark, os.path.join(root, "velodyne"))
    return frame_points_df(pts, "000003", max_points=40)


def _cutout_sql(n_docs: int = _N_DOCS, n_frames: int = _N_FRAMES) -> str:
    x, y, z = _rect_exprs()
    return f"""
    WITH {_pts_cte(n_docs, n_frames)},
    tr AS (
        SELECT frame_id, {x} AS x, {y} AS y, {z} AS z FROM pts
    ),
    filtered AS (
        SELECT frame_id FROM tr
        WHERE x > -50 AND y > -50 AND z > -50
          AND x <  50 AND y <  50 AND z <  50
    ),
    per_frame AS (
        SELECT frame_id, count(*) AS n FROM filtered GROUP BY frame_id
    )
    SELECT min(n) AS min_points,
           CAST(round(avg(n), 0) AS BIGINT) AS avg_points,
           max(n) AS max_points,
           count(*) AS n_frames
    FROM per_frame
    """


@register(
    "kitti_cutout_roundtrip",
    oracle=_cutout_sql(),
    doc="E2 end to end ON THE REAL FILE PATH (reference "
    "gen_cut_out_dataset, data_pipeline.py:67-84): .bin fixture "
    "files -> binary scan -> calib-file parse -> P1-P5 chain -> P6 "
    "remap -> 6-way box containment -> per-frame counts folded to "
    "the exact min/round(avg)/max stats the reference prints. The "
    "oracle recomputes the whole chain in closed form (dyadic, so "
    "exact); previously E2 was driver-verified only via relational "
    "analogs (cutout_count_stats).",
    tags=("kitti-files",),
)
def kitti_cutout_roundtrip(
    spark: SparkSession,
    sf_dir: str,
    n_docs: int = _N_DOCS,
    n_frames: int = _N_FRAMES,
) -> DataFrame:
    from kittispark.operators.kitti import cutout_pipeline, frame_count_stats

    root = kitti_fixture_root(spark, sf_dir, n_docs, n_frames)
    points = read_points(spark, os.path.join(root, "velodyne"))
    calib_wide = calib_matrices(read_calib(spark, os.path.join(root, "calib")))
    cut = cutout_pipeline(
        points, calib_wide, lo=(-50.0, -50.0, -50.0), hi=(50.0, 50.0, 50.0)
    )
    return frame_count_stats(cut).select(
        "min_points", "avg_points", "max_points", "n_frames"
    )


def _envelope_sql(n_docs: int = _N_DOCS, n_frames: int = _N_FRAMES) -> str:
    x, y, z = _rect_exprs()
    return f"""
    WITH {_pts_cte(n_docs, n_frames)},
    tr AS (
        SELECT frame_id, {x} AS x, {y} AS y, {z} AS z FROM pts
    ),
    zs AS (
        SELECT frame_id, quantile_cont(z, 0.05) AS z5 FROM tr GROUP BY frame_id
    ),
    penv AS (
        SELECT min(t.x) AS min_x, max(t.x) AS max_x,
               min(t.y) AS min_y, max(t.y) AS max_y,
               min(t.z - s.z5) AS min_z, max(t.z - s.z5) AS max_z
        FROM tr t JOIN zs s ON t.frame_id = s.frame_id
    ),
    lbl AS (
        SELECT lpad(CAST(doc_id % {n_frames} AS VARCHAR), 6, '0') AS frame_id,
               2.0 + CAST(doc_id % 12 AS DOUBLE) * 0.25 AS dim_l,
               CAST((doc_id * 3) % 40 - 20 AS DOUBLE) * 0.5 AS loc_x,
               CAST((doc_id * 5) % 12 - 6 AS DOUBLE) * 0.25 AS loc_y,
               CAST(doc_id % 50 AS DOUBLE) * 0.5 + 2.0 AS loc_z
        FROM documents
        WHERE doc_id < {n_docs} AND doc_id % 4 <> 3
    ),
    lenv AS (
        SELECT max(l.dim_l) AS max_dim_l,
               min(l.loc_x) AS min_lx, max(l.loc_x) AS max_lx,
               min(l.loc_z - s.z5) AS min_lz, max(l.loc_z - s.z5) AS max_lz
        FROM lbl l JOIN zs s ON l.frame_id = s.frame_id
    )
    SELECT round(greatest(p.min_x, e.min_lx - e.max_dim_l), 6) AS env_lo_x,
           round(least(p.max_x, e.max_lx + e.max_dim_l), 6)    AS env_hi_x,
           round(greatest(p.min_z, e.min_lz - e.max_dim_l), 6) AS env_lo_z,
           round(least(p.max_z, e.max_lz + e.max_dim_l), 6)    AS env_hi_z
    FROM penv p, lenv e
    """


@register(
    "kitti_analysis_envelope",
    oracle=_envelope_sql(),
    doc="E1 analysis ON THE REAL FILE PATH (reference get_analysis, "
    "data_pipeline.py:8-64): .bin + calib + label fixture files "
    "through scan -> calibration chain -> per-frame 5th-percentile "
    "ground-plane rescale (A5/P7, applied to points AND the labels' "
    "z locations — the J2 cross-relation rejoin) -> two extrema "
    "branches (A1 points, A2/A3 label dims/locations, DontCare "
    "filtered per P9) -> P13 greatest/least envelope combine on the "
    "1-row cross join. The oracle recomputes everything in closed "
    "form incl. the interpolated percentile (quantile_cont == "
    "Spark's exact percentile, proven by percentile_per_group).",
    tags=("kitti-files",),
)
def kitti_analysis_envelope(
    spark: SparkSession,
    sf_dir: str,
    n_docs: int = _N_DOCS,
    n_frames: int = _N_FRAMES,
) -> DataFrame:
    from kittispark.operators.kitti import frame_z_scale, rescale_z

    from kittispark.operators.util import materialize

    root = kitti_fixture_root(spark, sf_dir, n_docs, n_frames)
    points = read_points(spark, os.path.join(root, "velodyne"))
    calib_wide = calib_matrices(read_calib(spark, os.path.join(root, "calib")))
    # Pin the decoded+calibrated cloud: it feeds BOTH the z-scale
    # aggregation and the rescale join, and without the pin each
    # consumer re-runs the binaryFile scan + Arrow decode (the plan
    # showed 3 decode passes). At real KITTI volume the decode is the
    # dominant cost; one pinned pass is the shared-frontier idiom.
    tr = materialize(axis_align(apply_calibration(points, calib_wide)))
    # zs (per-frame scalars, bounded rows) is itself consumed twice —
    # by the point rescale and the label rescale — so pin it too.
    zs = materialize(frame_z_scale(tr))
    # the P7/J2 operator itself, not a hand-rolled twin (zs is shared
    # with the label rescale below, so it is passed in explicitly)
    resc = rescale_z(tr, zs).select("x", "y", "z")
    penv = resc.agg(
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("z").alias("min_z"),
        F.max("z").alias("max_z"),
    )
    labels = read_labels(spark, os.path.join(root, "label_2")).filter(
        F.col("label") != "DontCare"
    )
    lenv = (
        labels.join(F.broadcast(zs), "frame_id")
        .select(
            "dim_l",
            "loc_x",
            (F.col("loc_z") - F.col("z_scale")).alias("loc_z_resc"),
        )
        .agg(
            F.max("dim_l").alias("max_dim_l"),
            F.min("loc_x").alias("min_lx"),
            F.max("loc_x").alias("max_lx"),
            F.min("loc_z_resc").alias("min_lz"),
            F.max("loc_z_resc").alias("max_lz"),
        )
    )
    return penv.crossJoin(lenv).select(
        F.round(
            F.greatest("min_x", F.col("min_lx") - F.col("max_dim_l")), 6
        ).alias("env_lo_x"),
        F.round(
            F.least("max_x", F.col("max_lx") + F.col("max_dim_l")), 6
        ).alias("env_hi_x"),
        F.round(
            F.greatest("min_z", F.col("min_lz") - F.col("max_dim_l")), 6
        ).alias("env_lo_z"),
        F.round(
            F.least("max_z", F.col("max_lz") + F.col("max_dim_l")), 6
        ).alias("env_hi_z"),
    )


@register(
    "kitti_datasource_scan",
    oracle=_points_sql(),
    doc="S2 via the Spark 4 Python Data Source (the engine-native "
    "scan, sources/datasource.py): format('kitti_points') plans "
    "bounded file groups on the driver and decodes float32 .bin "
    "bytes straight into Arrow RecordBatches on executors — the "
    "long-term scan form SURVEY §2.1 S2 names. Same closed-form "
    "oracle as kitti_points_bin_roundtrip, so BOTH scan "
    "implementations (binaryFile+mapInPandas and the DataSource) "
    "carry independent driver verdicts against identical bytes.",
    tags=("kitti-files", "datasource"),
)
def kitti_datasource_scan(
    spark: SparkSession,
    sf_dir: str,
    n_docs: int = _N_DOCS,
    n_frames: int = _N_FRAMES,
) -> DataFrame:
    from kittispark.sources.datasource import register as register_ds

    root = kitti_fixture_root(spark, sf_dir, n_docs, n_frames)
    register_ds(spark)
    pts = (
        spark.read.format("kitti_points")
        .option("files_per_partition", "4")
        .load(os.path.join(root, "velodyne"))
    )
    return pts.select(
        "frame_id",
        F.col("intensity").cast("long").alias("pt_key"),
        "x",
        "y",
        "z",
    )


# --------------------------------------------------------------------------
# Scale-sweep hooks (scripts/oracle_sweep.py --kitti-scale)
# --------------------------------------------------------------------------

# name -> (df_builder(spark, sf_dir, n_docs, n_frames),
#          sql_builder(n_docs, n_frames)); the registered queries are
# these same builders bound to (160, 8). The sf dir must hold at
# least n_docs documents rows for the fixture to reach the bound.
KITTI_SCALE_CHECKS = {
    "kitti_label_file_scan": (kitti_label_file_scan, _label_scan_sql),
    "kitti_points_bin_roundtrip": (kitti_points_bin_roundtrip, _points_sql),
    "kitti_calib_chain": (kitti_calib_chain, _calib_chain_sql),
    "kitti_frame_lookup": (kitti_frame_lookup, _frame_lookup_sql),
    "kitti_cutout_roundtrip": (kitti_cutout_roundtrip, _cutout_sql),
    "kitti_analysis_envelope": (kitti_analysis_envelope, _envelope_sql),
    "kitti_datasource_scan": (kitti_datasource_scan, _points_sql),
}
