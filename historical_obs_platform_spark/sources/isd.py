"""NOAA ISD fixed-width record parser (S4) — declarative re-expression
of the reference's per-row imperative parser
(``scripts/2_clean_data/ASOSAWOS_clean.py:254-493``).

The reference streams each gzipped file through Python, slicing every
record string in a loop; here the whole network prefix is one
``spark.read.text`` scan (gzip handled natively, splittable layout
permitting) and every field is a ``substring`` / ``regexp_extract``
column expression — the per-station loop disappears and the parse runs
inside whole-stage codegen.

Field layout (ISD mandatory section; positions are 0-based Python
slices in the reference, converted to 1-based SQL substring):

- station id: USAF [4:10] + WBAN [10:15]
- time:       [15:27]  ``yyyyMMddHHmm`` UTC
- lat/lon:    [28:34]/1000, [34:41]/1000 degrees
- elevation:  [46:51] m
- wind dir:   [60:63] degrees (sentinel 999)
- wind speed: [65:69]/10 m/s (sentinel 9999)
- tas:        [87:92]/10 °C (sentinel +9999)
- tdps:       [93:98]/10 °C (sentinel +9999)
- psl:        [99:104]/10 hPa (sentinel 99999)

Optional sections located by tag regex (lookahead instead of the
reference's lookbehind — same match):

- ``AA1``: precip — duration [0:2] h, depth [2:6]/10 mm (9999)
- ``CH1``: humidity — hurs [9:13]/10 % (9999)
- ``GM1``: solar — rsds [4:8] W/m² (9999)
- ``MA1``: pressure — altimeter [0:5]/10 hPa, station [6:11]/10 hPa

Units are standardized on the way out (K / Pa / mm / m/s) with the
scalar kernels, so the emitted frame is the canonical observations
schema (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.kernels import degc_to_k, hpa_to_pa

WECC_BBOX = {"latmin": 26.0, "latmax": 60.0, "lonmin": -140.0, "lonmax": -100.0}


def _slice(col: Column, start: int, end: int) -> Column:
    """Python slice [start:end] → SQL substring (1-based)."""
    return F.substring(col, start + 1, end - start)


def _num(col: Column, sentinels: tuple[float, ...], scale: float = 1.0) -> Column:
    v = col.cast("double")
    out = F.when(v.isin(*[float(s) for s in sentinels]), F.lit(None)).otherwise(v)
    return out / F.lit(scale) if scale != 1.0 else out


def parse_isd_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse raw ISD record lines (one string column) into the
    standard observations schema. Works on ``spark.read.text`` output;
    malformed/short lines yield nulls rather than errors."""
    s = F.col(value_col)

    tas_c = _num(_slice(s, 87, 92), (9999.0,), 10.0)
    tdps_c = _num(_slice(s, 93, 98), (9999.0,), 10.0)
    psl_hpa = _num(_slice(s, 99, 104), (99999.0,), 10.0)

    aa1 = F.regexp_extract(s, r"AA[1-4]([0-9a-zA-Z]{8})", 1)
    ch1 = F.regexp_extract(s, r"CH[12]([0-9a-zA-Z]{15})", 1)
    gm1 = F.regexp_extract(s, r"GM1([0-9a-zA-Z]{11})", 1)
    ma1 = F.regexp_extract(s, r"MA1([0-9a-zA-Z]{12})", 1)

    return lines.select(
        F.concat(
            F.lit("ASOSAWOS_"), _slice(s, 4, 10), _slice(s, 10, 15)
        ).alias("station"),
        F.to_timestamp(_slice(s, 15, 27), "yyyyMMddHHmm").alias("time"),
        _num(_slice(s, 28, 34), (99999.0,), 1000.0).alias("lat"),
        _num(_slice(s, 34, 41), (999999.0,), 1000.0).alias("lon"),
        _num(_slice(s, 46, 51), (9999.0, 99999.0)).alias("elevation"),
        _num(_slice(s, 60, 63), (999.0,)).alias("sfcWind_dir"),
        _slice(s, 63, 64).alias("sfcWind_dir_qc"),
        _num(_slice(s, 65, 69), (9999.0,), 10.0).alias("sfcWind"),
        _slice(s, 69, 70).alias("sfcWind_qc"),
        degc_to_k(tas_c).alias("tas"),
        _slice(s, 92, 93).alias("tas_qc"),
        degc_to_k(tdps_c).alias("tdps"),
        _slice(s, 98, 99).alias("tdps_qc"),
        hpa_to_pa(psl_hpa).alias("psl"),
        _slice(s, 104, 105).alias("psl_qc"),
        # optional sections — empty extract → null field
        F.when(
            aa1 != "",
            _num(F.substring(aa1, 3, 4), (9999.0,), 10.0),
        ).alias("pr"),
        F.when(aa1 != "", F.substring(aa1, 1, 2).cast("int")).alias(
            "pr_duration_h"
        ),
        F.when(
            ch1 != "",
            _num(F.substring(ch1, 10, 4), (9999.0,), 10.0),
        ).alias("hurs"),
        F.when(
            gm1 != "", _num(F.substring(gm1, 5, 4), (9999.0,))
        ).alias("rsds"),
        F.when(
            ma1 != "",
            hpa_to_pa(_num(F.substring(ma1, 1, 5), (99999.0,), 10.0)),
        ).alias("ps_altimeter"),
        F.when(
            ma1 != "",
            hpa_to_pa(_num(F.substring(ma1, 7, 5), (99999.0,), 10.0)),
        ).alias("ps"),
    )


def read_isd(
    spark: SparkSession, path: str, bbox: dict | None = WECC_BBOX
) -> DataFrame:
    """Scan an ISD file/prefix (plain or .gz — Spark decompresses
    natively) and parse. The bbox filter is applied during the parse
    like the reference's in-loop WECC gate (ASOSAWOS_clean.py:265-282)
    — expressed as a predicate so Catalyst can prune early."""
    parsed = parse_isd_lines(spark.read.text(path))
    if bbox:
        parsed = parsed.where(
            F.col("lat").between(bbox["latmin"], bbox["latmax"])
            & F.col("lon").between(bbox["lonmin"], bbox["lonmax"])
        )
    return parsed
