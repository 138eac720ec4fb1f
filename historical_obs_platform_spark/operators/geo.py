"""Geospatial operators (P4/P6): bounding-box prefilter and
point-in-polygon containment.

The reference tests each station's (lon, lat) against WECC
terrestrial/marine shapefiles with shapely
(``qaqc_wholestation.py:231-267``). Neither shapely nor Sedona is in
this environment, so containment is a self-contained ray-casting
test (public computational-geometry algorithm) run as an Arrow-batched
pandas UDF over the DISTINCT station coordinates — cardinality is
stations (15k), not observations (billions), so the Python island is
negligible at any scale; the result is broadcast-joined back."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def _ray_cast(lon: float, lat: float, poly: list[tuple[float, float]]) -> bool:
    """Even-odd rule point-in-polygon; poly = [(lon, lat), ...]."""
    inside = False
    n = len(poly)
    j = n - 1
    for i in range(n):
        xi, yi = poly[i]
        xj, yj = poly[j]
        if (yi > lat) != (yj > lat):
            x_cross = (xj - xi) * (lat - yi) / (yj - yi) + xi
            if lon < x_cross:
                inside = not inside
        j = i
    return inside


def bbox_filter(
    df: DataFrame,
    latmin: float,
    latmax: float,
    lonmin: float,
    lonmax: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """P6: plain predicate — pushed to the scan by Catalyst."""
    return df.where(
        F.col(lat_col).between(latmin, latmax)
        & F.col(lon_col).between(lonmin, lonmax)
    )


def within_polygon(
    df: DataFrame,
    polygons: list[list[tuple[float, float]]],
    lat_col: str = "lat",
    lon_col: str = "lon",
    out: str = "in_region",
) -> DataFrame:
    """P4: containment in the union of ``polygons``, evaluated once
    per distinct coordinate and broadcast back (the reference checks
    per station; same cost model, distributed).
    """
    polys = [list(p) for p in polygons]

    @F.pandas_udf(BooleanType())
    def _contains(lon: pd.Series, lat: pd.Series) -> pd.Series:
        out_ = np.zeros(len(lon), dtype=bool)
        for i, (x, y) in enumerate(zip(lon.values, lat.values)):
            if x is None or y is None or np.isnan(x) or np.isnan(y):
                continue
            out_[i] = any(_ray_cast(float(x), float(y), p) for p in polys)
        return pd.Series(out_)

    coords = (
        df.select(lat_col, lon_col)
        .distinct()
        .withColumn(out, _contains(F.col(lon_col), F.col(lat_col)))
    )
    return df.join(F.broadcast(coords), [lat_col, lon_col], "left")


def parse_wkt(text: str) -> list[list[list[tuple[float, float]]]]:
    """Parse POLYGON / MULTIPOLYGON WKT into ``[polygon][ring][(x, y)]``.

    The reference loads WECC terrestrial/marine region shapes from
    shapefiles on the driver (qaqc_utils.py:506-530); WKT text is this
    engine's portable equivalent — any GIS tool can export it, and a
    (region, wkt) table becomes a first-class input (S10). Rings after
    the first are holes; containment below applies the even-odd rule
    across a polygon's rings, so holes are handled."""
    t = text.strip()
    up = t.upper()

    def rings_of(body: str) -> list[list[tuple[float, float]]]:
        import re

        rings = []
        for raw in re.findall(r"\(([^()]+)\)", body):
            pts = []
            for pair in raw.split(","):
                x, y = pair.split()
                pts.append((float(x), float(y)))
            rings.append(pts)
        return rings

    if up.startswith("MULTIPOLYGON"):
        body = t[t.index("(") :]
        polys, depth, start = [], 0, 0
        for i, ch in enumerate(body):
            if ch == "(":
                depth += 1
                if depth == 2:
                    start = i
            elif ch == ")":
                if depth == 2:
                    polys.append(body[start : i + 1])
                depth -= 1
        return [rings_of(p) for p in polys]
    if up.startswith("POLYGON"):
        return [rings_of(t[t.index("(") :])]
    raise ValueError(f"unsupported WKT geometry: {t[:30]}...")


def within_polygon_table(
    df: DataFrame,
    polygons: DataFrame,
    wkt_col: str = "wkt",
    lat_col: str = "lat",
    lon_col: str = "lon",
    out: str = "in_region",
    max_polygons: int = 100_000,
) -> DataFrame:
    """P4 with the region shapes supplied as a (…, wkt) TABLE instead
    of literals — the user-facing entry point for "my own region
    file". The polygon table is dimension-sized (the reference has
    two shapefiles), so it is collected once on the driver — exactly
    where the reference reads its shapefiles — with a size guard, and
    containment runs as the same distinct-coordinate pandas UDF."""
    rows = polygons.select(wkt_col).limit(max_polygons + 1).collect()
    if len(rows) > max_polygons:
        raise ValueError(
            f"polygon table exceeds {max_polygons} rows — not a "
            "dimension table; pre-dissolve the regions"
        )
    geoms = [g for r in rows for g in parse_wkt(r[wkt_col])]

    @F.pandas_udf(BooleanType())
    def _contains(lon: pd.Series, lat: pd.Series) -> pd.Series:
        out_ = np.zeros(len(lon), dtype=bool)
        for i, (x, y) in enumerate(zip(lon.values, lat.values)):
            if x is None or y is None or np.isnan(x) or np.isnan(y):
                continue
            hit = False
            for poly in geoms:
                inside = False
                for ring in poly:  # even-odd across rings => holes ok
                    if _ray_cast(float(x), float(y), ring):
                        inside = not inside
                if inside:
                    hit = True
                    break
            out_[i] = hit
        return pd.Series(out_)

    coords = (
        df.select(lat_col, lon_col)
        .distinct()
        .withColumn(out, _contains(F.col(lon_col), F.col(lat_col)))
    )
    return df.join(F.broadcast(coords), [lat_col, lon_col], "left")


def tag_polygons(
    df: DataFrame,
    polygons: DataFrame,
    wkt_col: str = "wkt",
    tag_col: str = "tag",
    lat_col: str = "lat",
    lon_col: str = "lon",
    out: str = "region_tag",
    max_polygons: int = 100_000,
) -> DataFrame:
    """Label each point with the name of the containing polygon —
    the state/region assignment step of the reference's public
    station list (``public_facing_stationlist_cleanup.py``: geopandas
    sjoin against the Tiger states shapefile). Same shape as
    ``within_polygon_table``: the dimension-sized polygon table
    collects on the driver (size-guarded), containment evaluates as a
    vectorized pandas UDF over DISTINCT coordinates only, and the
    labels broadcast-join back — the corpus never shuffles.

    A point inside several polygons takes the first containing tag in
    ASCENDING TAG ORDER (deterministic regardless of the polygon
    table's row order); a point inside none gets NULL.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StringType

    rows = (
        polygons.select(tag_col, wkt_col)
        .limit(max_polygons + 1)
        .collect()
    )
    if len(rows) > max_polygons:
        raise ValueError(
            f"polygon table exceeds {max_polygons} rows — not a "
            "dimension table; pre-dissolve the regions"
        )
    if any(r[tag_col] is None for r in rows):
        raise ValueError(
            "tag_polygons: NULL tag in polygon table — every region "
            "needs a label for the first-containing-tag order to be "
            "well-defined"
        )
    # key on the tag alone: tuple sort would fall through to comparing
    # parsed coordinate lists on equal tags (wasted work, and fragile
    # if geometry representations ever differ)
    tagged = sorted(
        ((r[tag_col], parse_wkt(r[wkt_col])) for r in rows),
        key=lambda t: t[0],
    )

    @F.pandas_udf(StringType())
    def _tag(lon: pd.Series, lat: pd.Series) -> pd.Series:
        out_ = [None] * len(lon)
        for i, (x, y) in enumerate(zip(lon.values, lat.values)):
            if x is None or y is None or np.isnan(x) or np.isnan(y):
                continue
            for tag, polys in tagged:
                hit = False
                for poly in polys:
                    inside = False
                    for ring in poly:  # even-odd: holes supported
                        if _ray_cast(float(x), float(y), ring):
                            inside = not inside
                    if inside:
                        hit = True
                        break
                if hit:
                    out_[i] = tag
                    break
        return pd.Series(out_, dtype="object")

    coords = (
        df.select(lat_col, lon_col)
        .distinct()
        .withColumn(out, _tag(F.col(lon_col), F.col(lat_col)))
    )
    return df.join(F.broadcast(coords), [lat_col, lon_col], "left")


def station_region_gate(
    df: DataFrame,
    polygons: list[list[tuple[float, float]]],
    station_col: str = "station",
) -> DataFrame:
    """Whole-station region gate (qaqc_within_wecc): stations whose
    representative coordinate falls outside every polygon are listed
    for rejection."""
    reps = (
        df.groupBy(station_col)
        .agg(F.first("lat", ignorenulls=True).alias("lat"),
             F.first("lon", ignorenulls=True).alias("lon"))
    )
    checked = within_polygon(reps, polygons)
    return checked.where(~F.coalesce(F.col("in_region"), F.lit(False))).select(
        station_col, F.lit("outside_region").alias("reject_reason")
    )


def station_region_gate_wkt(
    df: DataFrame,
    polygons: DataFrame,
    wkt_col: str = "wkt",
    station_col: str = "station",
) -> DataFrame:
    """S10/P4 table-driven region gate: like ``station_region_gate``
    but the region shapes come from a (region, wkt) table — the entry
    point for a user-supplied region file (the reference's WECC
    shapefiles, qaqc_utils.py:506-530)."""
    reps = df.groupBy(station_col).agg(
        F.first("lat", ignorenulls=True).alias("lat"),
        F.first("lon", ignorenulls=True).alias("lon"),
    )
    checked = within_polygon_table(reps, polygons, wkt_col=wkt_col)
    return checked.where(
        ~F.coalesce(F.col("in_region"), F.lit(False))
    ).select(station_col, F.lit("outside_region").alias("reject_reason"))


def radius_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
) -> DataFrame:
    """All point pairs within planar ``radius`` — grid-cell bucketed,
    never all-pairs.

    Each point hashes to cell (floor(x/r), floor(y/r)); the right
    side additionally explodes into its 3x3 cell neighborhood, so any
    pair within r shares exactly one (left-home, right-neighbor) cell
    and the join is a plain equi-join on the cell key. The exact
    squared-distance predicate then trims corner candidates. Output:
    (a, b, dist_sq) with a < b, each pair exactly once — no distinct
    needed, because a given orientation matches on precisely one
    cell. Cost is sum of per-cell products (9x the home-cell
    density), not n² — the standard spatial-join decomposition for
    cluster-scale nearest-neighbor workloads.
    """
    r = float(radius)
    cell = lambda c: F.floor(F.col(c) / F.lit(r)).cast("long")  # noqa: E731
    left = points.select(
        F.col(id_col).alias("a"),
        F.col(x_col).alias("ax"),
        F.col(y_col).alias("ay"),
        cell(x_col).alias("cx"),
        cell(y_col).alias("cy"),
    )
    off = F.expr("explode(flatten(transform(sequence(-1, 1), "
                 "dx -> transform(sequence(-1, 1), "
                 "dy -> struct(dx, dy)))))")
    right = points.select(
        F.col(id_col).alias("b"),
        F.col(x_col).alias("bx"),
        F.col(y_col).alias("by"),
        cell(x_col).alias("bcx"),
        cell(y_col).alias("bcy"),
        off.alias("__o"),
    ).select(
        "b", "bx", "by",
        (F.col("bcx") + F.col("__o.dx")).alias("cx"),
        (F.col("bcy") + F.col("__o.dy")).alias("cy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        left.join(right, ["cx", "cy"])
        .where(F.col("a") < F.col("b"))
        .where(d2 <= F.lit(r * r))
        .select("a", "b", d2.alias("dist_sq"))
    )
