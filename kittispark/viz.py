"""Presentation sink (SURVEY §2.1 S7, §3 E3): single-frame
visualization data served by a point-lookup query.

The reference renders one frame at a time in Plotly with an
ipywidgets slider (visualize.py:106-128). Rendering is presentation,
not query semantics — what the ENGINE owes the feature is the
single-frame query path: `filter(frame_id == k)` prunes to one
partition of the frame-partitioned layout, and only that frame's rows
cross to the driver via Arrow `toPandas`. Plotly itself is an
optional import (not installed in this container); the figure builder
raises NotImplementedError without it while the data path stays
testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Class colors from the reference's BBOX_COLORS table
# (visualize.py:10-20) — a literal presentation dimension.
BBOX_COLORS = {
    "Car": "red",
    "Van": "orange",
    "Truck": "yellow",
    "Pedestrian": "blue",
    "Person_sitting": "cyan",
    "Cyclist": "green",
    "Tram": "purple",
    "Misc": "magenta",
    "DontCare": "gray",
}

DEFAULT_CLASSES = tuple(c for c in BBOX_COLORS if c != "DontCare")


def frame_points_df(
    points: DataFrame, frame_id: str, max_points: int | None = None
) -> DataFrame:
    """The E3 query plan: partition-pruned single-frame lookup.
    `max_points` caps driver transfer for huge frames —
    deterministic even under coordinate ties because intensity joins
    the sort key (lowest (x, y, z, intensity) first)."""
    df = points.filter(F.col("frame_id") == frame_id).select(
        "x", "y", "z", "intensity"
    )
    if max_points is not None:
        df = df.orderBy("x", "y", "z", "intensity").limit(max_points)
    return df


def frame_points_pdf(points: DataFrame, frame_id: str, max_points: int | None = None):
    """The E3 data path: frame_points_df -> Arrow toPandas."""
    return frame_points_df(points, frame_id, max_points).toPandas()


def frame_labels_pdf(
    points_labels: DataFrame,
    frame_id: str,
    include_classes: tuple[str, ...] = DEFAULT_CLASSES,
):
    """Label rows for one frame, class-filtered (reference P10
    include-list, visualize.py:68-70,81)."""
    return (
        points_labels.filter(
            (F.col("frame_id") == frame_id) & F.col("label").isin(*include_classes)
        )
    ).toPandas()


def frame_figure(
    points: DataFrame,
    frame_id: str,
    max_points: int | None = 200_000,
):
    """Plotly 3-D scatter of one frame. Requires plotly (optional);
    the Spark-side query runs regardless via frame_points_pdf."""
    pdf = frame_points_pdf(points, frame_id, max_points)
    try:
        import plotly.graph_objects as go
    except ImportError as e:  # pragma: no cover - plotly not in container
        raise NotImplementedError(
            "plotly not installed; frame_points_pdf() already returns the "
            "frame's data — render it with any plotting library"
        ) from e
    fig = go.Figure(
        data=[
            go.Scatter3d(
                x=pdf["x"],
                y=pdf["y"],
                z=pdf["z"],
                mode="markers",
                marker={"size": 1, "color": pdf["intensity"]},
            )
        ]
    )
    return fig
