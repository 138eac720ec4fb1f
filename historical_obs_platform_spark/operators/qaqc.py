"""QA/QC flag-writer engine — the reference's test battery, Spark-first.

Design (SURVEY.md §7): one long-format observations table
``(station, time, <vars...>, <var>_eraqc...)``; every check is a pure
``DataFrame -> DataFrame`` transform that only adds/updates flag
columns; data is never deleted (flags 1-38, taxonomy mirrored from the
reference's ``data/era_qaqc_flag_meanings.csv``). The reference runs
one station per Python process; here every check runs on all stations
at once — per-station semantics become ``groupBy("station")`` /
``Window.partitionBy("station")``.

The universal sequencing rule (``grab_valid_obs``,
``scripts/3_qaqc_data/qaqc_utils.py:326-378``): a row already flagged
for ``var`` is excluded from later checks of ``var``. As a row mask:
``valid = eraqc IS NULL [OR eraqc IN (19,20)]``; the two-variable form
requires both flags strictly null.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .windows import flag_long_runs

# ------------------------------------------------------------- vocabulary
# Union variable vocabulary (qaqc_wholestation.py:800-821).
OBS_VARS = [
    "tas",
    "tdps",
    "tdps_derived",
    "ps",
    "psl",
    "ps_altimeter",
    "ps_derived",
    "pr",
    "pr_5min",
    "pr_15min",
    "pr_1h",
    "pr_24h",
    "pr_localmid",
    "accum_pr",
    "hurs",
    "hurs_derived",
    "rsds",
    "sfcWind",
    "sfcWind_dir",
    "elevation",
]

PRECIP_VARS = [
    "pr",
    "pr_5min",
    "pr_15min",
    "pr_1h",
    "pr_24h",
    "pr_localmid",
]

PRESSURE_VARS = ["ps", "psl", "ps_altimeter", "ps_derived"]

# World/regional record limits (qaqc_wholestation.py:720-798,
# North America). (min, max) per variable.
WORLD_RECORD_LIMITS: dict[str, tuple[float, float]] = {
    "tas": (210.15, 329.92),
    "tdps": (173.15, 329.85),
    "tdps_derived": (173.15, 329.85),
    "sfcWind": (0.0, 113.2),
    "sfcWind_dir": (0.0, 360.0),
    "psl": (87000.0, 108330.0),
    "ps": (45960.0, 108330.0),
    "ps_derived": (45960.0, 108330.0),
    "ps_altimeter": (45960.0, 108330.0),
    "rsds": (-5.0, 1500.0),
    "pr": (0.0, 656.0),
    "pr_5min": (0.0, 31.8),
    "pr_15min": (0.0, 25.4),
    "pr_1h": (0.0, 656.0),
    "pr_24h": (0.0, 656.0),
    "pr_localmid": (0.0, 656.0),
    "accum_pr": (0.0, 10000.0),
    "hurs": (0.0, 100.0),
    "elevation": (-100.0, 6210.0),
}

# Flag codes (era_qaqc_flag_meanings.csv).
FLAG_THERMOMETER_MISSING = 6
FLAG_THERMOMETER_HEIGHT = 7
FLAG_ANEMOMETER_MISSING = 8
FLAG_ANEMOMETER_HEIGHT = 9
FLAG_NEGATIVE_PRECIP = 10
FLAG_WORLD_RECORD = 11
FLAG_SUPERSATURATION = 12
FLAG_WETBULB_STREAK = 13
FLAG_CALM_WIND_DIR = 14
FLAG_WIND_DIR_RESET_360 = 15
FLAG_PRECIP_SHORT_GT_LONG = 16
FLAG_PRECIP_LONG_LT_SHORT = 17
FLAG_PRECIP_24H_LT_LOCALMID = 18
FLAG_YELLOW_STATION = 19
FLAG_YELLOW_VARIABLE = 20
FLAG_SPIKE = 23
FLAG_FREQUENT_ANNUAL = 24
FLAG_FREQUENT_SEASONAL = 25
FLAG_CLIM_OUTLIER = 26
FLAG_STREAK_SAME_HOUR = 27
FLAG_STREAK_CONSECUTIVE = 28
FLAG_STREAK_WHOLE_DAY = 29
FLAG_DEACCUM_RINGING = 34
FLAG_DEACCUM_ORIGINAL = 35
FLAG_ELEV_RANGE = 36
FLAG_DERIVED_SYNERGISTIC = 38


def eraqc(var: str) -> str:
    return f"{var}_eraqc"


def present_vars(df: DataFrame, candidates=None) -> list[str]:
    """Column-presence introspection — every reference check starts by
    asking which variables this frame carries (qaqc_unusual_gaps.py:63-76)."""
    cands = candidates if candidates is not None else OBS_VARS
    return [v for v in cands if v in df.columns]


def ensure_flag_columns(df: DataFrame, variables=None) -> DataFrame:
    """Manufacture null ``<var>_eraqc`` columns for every present
    variable (QAQC_pipeline.py:446-456)."""
    out = df
    for v in present_vars(df, variables):
        if eraqc(v) not in out.columns:
            out = out.withColumn(eraqc(v), F.lit(None).cast("double"))
    return out


def valid_mask(var: str, keep_yellow: bool = True, var2: str | None = None) -> Column:
    """grab_valid_obs as a row predicate (qaqc_utils.py:326-378).

    - single-variable: unflagged rows, optionally keeping yellow
      (19/20) record-too-short warnings;
    - two-variable: both flags strictly null (the reference's var2
      branch ignores yellow).
    """
    if var2 is not None:
        return F.col(eraqc(var)).isNull() & F.col(eraqc(var2)).isNull()
    m = F.col(eraqc(var)).isNull()
    if keep_yellow:
        m = m | F.col(eraqc(var)).isin(
            FLAG_YELLOW_STATION, FLAG_YELLOW_VARIABLE
        )
    return m


def write_flag(
    df: DataFrame,
    var: str,
    condition: Column,
    flag: int,
    keep_yellow: bool = True,
    var2: str | None = None,
    flag_var: str | None = None,
) -> DataFrame:
    """Set ``<flag_var or var>_eraqc = flag`` where the row is valid
    for checking AND ``condition`` holds; leave other rows untouched.
    Data is never deleted — only flagged."""
    target = eraqc(flag_var or var)
    mask = valid_mask(var, keep_yellow, var2) & condition
    return df.withColumn(
        target, F.when(mask, F.lit(float(flag))).otherwise(F.col(target))
    )


# ------------------------------------------------------------ P2 sentinels
def normalize_sentinels(
    df: DataFrame, sentinels: dict[str, list[str]]
) -> DataFrame:
    """Replace network sentinel codes ('-999', '9999', 'M', ...) with
    null per variable (qaqc_wholestation.py:113-196 +
    data/missing_data_flags.csv). ``sentinels`` maps var -> codes;
    comparison is on the string form so '-999', '-999.0' etc. can be
    enumerated explicitly like the lookup table does."""
    out = df
    for v, codes in sentinels.items():
        if v in out.columns:
            out = out.withColumn(
                v,
                F.when(
                    F.col(v).cast("string").isin([str(c) for c in codes]),
                    F.lit(None),
                ).otherwise(F.col(v)),
            )
    return out


# --------------------------------------------------------------- L6 records
def world_record_check(df: DataFrame) -> DataFrame:
    """Flag 11: outside per-variable world/regional record range
    (qaqc_wholestation.py:689-842)."""
    out = df
    for v in present_vars(df, list(WORLD_RECORD_LIMITS)):
        lo, hi = WORLD_RECORD_LIMITS[v]
        out = write_flag(
            out,
            v,
            (F.col(v) < F.lit(lo)) | (F.col(v) > F.lit(hi)),
            FLAG_WORLD_RECORD,
        )
    return out


# ----------------------------------------------------------- L1 supersat
def supersaturation_check(df: DataFrame) -> DataFrame:
    """Flag 12 on dewpoint where tdps > tas
    (qaqc_logic_checks.py:28-77); only rows valid for BOTH vars."""
    out = df
    if "tas" not in df.columns:
        return out
    for dew in present_vars(df, ["tdps", "tdps_derived"]):
        out = write_flag(
            out,
            "tas",
            F.col(dew) > F.col("tas"),
            FLAG_SUPERSATURATION,
            var2=dew,
            flag_var=dew,
        )
    return out


# ----------------------------------------------------------- L2 wet bulb
def wetbulb_streak_check(
    df: DataFrame, min_span_hours: int = 24
) -> DataFrame:
    """Flag 13 on tdps across any window where the dewpoint depression
    (tas − tdps) is exactly 0 continuously for ≥ 24 h — instrument
    failure (qaqc_logic_checks.py:80-151). O(n) sessionization replaces
    the reference's candidate-start loop; same rows flagged."""
    out = df
    if "tas" not in df.columns:
        return out
    for dew in present_vars(df, ["tdps", "tdps_derived"]):
        valid = valid_mask("tas", var2=dew)
        pred = valid & (F.col("tas") - F.col(dew) == 0)
        marked = flag_long_runs(
            out,
            "station",
            "time",
            predicate=pred,
            min_span_seconds=min_span_hours * 3600,
            flag_col="__wb_flag",
            flag_value=FLAG_WETBULB_STREAK,
        )
        out = marked.withColumn(
            eraqc(dew),
            F.when(
                F.col("__wb_flag") == FLAG_WETBULB_STREAK,
                F.lit(float(FLAG_WETBULB_STREAK)),
            ).otherwise(F.col(eraqc(dew))),
        ).drop("__wb_flag")
    return out


# ------------------------------------------------------- L3 negative precip
def negative_precip_check(df: DataFrame) -> DataFrame:
    """Flag 10: pr < 0, all precip variants
    (qaqc_logic_checks.py:154-208)."""
    out = df
    for v in present_vars(df, PRECIP_VARS + ["accum_pr"]):
        out = write_flag(out, v, F.col(v) < 0, FLAG_NEGATIVE_PRECIP)
    return out


# ------------------------------------------------- L4 precip accumulation
def precip_accum_ordering_check(df: DataFrame) -> DataFrame:
    """Flags 16/17/18: interval-precip ordering violations — a shorter
    accumulation window must not exceed a longer one
    (qaqc_logic_checks.py:211-308).

    DELIBERATE DEVIATIONS (documented per SURVEY.md §7):
    - the reference flags the *entire valid index* when the check runs
      (``(cond).index`` instead of ``cond[cond].index``,
      qaqc_logic_checks.py:269+); this engine flags only violating rows.
    - every pair is evaluated against the flag state at entry (the
      reference mutates sequentially, so its later pairs see earlier
      16s; with only violating rows flagged, entry-state evaluation is
      the order-independent fixed semantics: both sides of a violated
      pair get flagged).
    """
    # (flagged_var, other_var, violation, flag)
    rules = [
        ("pr_5min", "pr_1h", F.col("pr_5min") > F.col("pr_1h"), FLAG_PRECIP_SHORT_GT_LONG),
        ("pr_5min", "pr_24h", F.col("pr_5min") > F.col("pr_24h"), FLAG_PRECIP_SHORT_GT_LONG),
        ("pr_1h", "pr_5min", F.col("pr_1h") < F.col("pr_5min"), FLAG_PRECIP_LONG_LT_SHORT),
        ("pr_1h", "pr_24h", F.col("pr_1h") > F.col("pr_24h"), FLAG_PRECIP_LONG_LT_SHORT),
        ("pr_24h", "pr_5min", F.col("pr_24h") < F.col("pr_5min"), FLAG_PRECIP_LONG_LT_SHORT),
        ("pr_24h", "pr_1h", F.col("pr_24h") < F.col("pr_1h"), FLAG_PRECIP_LONG_LT_SHORT),
        ("pr_24h", "pr_localmid", F.col("pr_24h") < F.col("pr_localmid"), FLAG_PRECIP_24H_LT_LOCALMID),
    ]
    # Materialize every pair's (valid-at-entry AND violated) predicate
    # before any flag write, then apply — order-independent.
    out = df
    applicable = [
        (i, var, cond, flag)
        for i, (var, other, cond, flag) in enumerate(rules)
        if var in df.columns and other in df.columns
    ]
    for i, var, cond, flag in applicable:
        other = rules[i][1]
        out = out.withColumn(
            f"__pr_viol_{i}", valid_mask(var, var2=other) & cond
        )
    for i, var, _cond, flag in applicable:
        out = out.withColumn(
            eraqc(var),
            F.when(F.col(f"__pr_viol_{i}"), F.lit(float(flag))).otherwise(
                F.col(eraqc(var))
            ),
        )
    return out.drop(*[f"__pr_viol_{i}" for i, *_ in applicable])


# ----------------------------------------------------------- L5 calm wind
def calm_wind_dir_check(df: DataFrame) -> DataFrame:
    """Flags 14/15 (qaqc_logic_checks.py:311-373). The ONLY check that
    rewrites data besides de-accumulation: non-zero wind with dir 0 is
    recoded to 360 (true northerly) and flagged 15."""
    if "sfcWind_dir" not in df.columns or "sfcWind" not in df.columns:
        return df
    valid = valid_mask("sfcWind", var2="sfcWind_dir")
    bad_calm = (
        valid
        & (F.col("sfcWind") == 0)
        & (F.col("sfcWind_dir") != 0)
        & F.col("sfcWind_dir").isNotNull()
    )
    bad_north = valid & (F.col("sfcWind") != 0) & (F.col("sfcWind_dir") == 0)
    # Materialize the predicates before mutating the columns they read
    # (a later withColumn would otherwise re-evaluate them against the
    # already-flagged/rewritten values).
    out = df.withColumn("__bad_calm", bad_calm).withColumn(
        "__bad_north", bad_north
    )
    out = out.withColumn(
        eraqc("sfcWind_dir"),
        F.when(F.col("__bad_calm"), F.lit(float(FLAG_CALM_WIND_DIR)))
        .when(F.col("__bad_north"), F.lit(float(FLAG_WIND_DIR_RESET_360)))
        .otherwise(F.col(eraqc("sfcWind_dir"))),
    )
    return out.withColumn(
        "sfcWind_dir",
        F.when(F.col("__bad_north"), F.lit(360.0)).otherwise(
            F.col("sfcWind_dir")
        ),
    ).drop("__bad_calm", "__bad_north")


# ------------------------------------------------------ pressure units fix
def pressure_units_fix(df: DataFrame) -> DataFrame:
    """Per-station heuristic: a pressure column whose station mean is
    < 10000 is in hPa, not Pa — multiply by 100
    (qaqc_logic_checks.py:376-414). Per-station aggregate broadcast
    back as a join (the reference does one station per process; same
    decision, distributed)."""
    ps_vars = present_vars(df, PRESSURE_VARS)
    if not ps_vars:
        return df
    means = df.groupBy("station").agg(
        *[F.avg(v).alias(f"__mean_{v}") for v in ps_vars]
    )
    out = df.join(F.broadcast(means), "station", "left")
    for v in ps_vars:
        out = out.withColumn(
            v,
            F.when(
                F.col(f"__mean_{v}") < 10000, F.col(v) * F.lit(100.0)
            ).otherwise(F.col(v)),
        ).drop(f"__mean_{v}")
    return out


# --------------------------------------------------- L8 elevation consistency
def elevation_consistency_check(df: DataFrame, tolerance_m: float = 50.0) -> DataFrame:
    """Flag 36: a station reporting > 2 distinct elevations whose range
    exceeds 50 m gets values beyond median±50 m flagged; exactly 2
    distinct values flags the minority value
    (qaqc_wholestation.py:318-392)."""
    if "elevation" not in df.columns:
        return df
    stats = df.groupBy("station").agg(
        F.countDistinct("elevation").alias("__n_elev"),
        (F.max("elevation") - F.min("elevation")).alias("__elev_range"),
        F.expr("percentile(elevation, 0.5)").alias("__elev_median"),
    )
    # minority value for the ==2 case: the less frequent elevation
    counts = (
        df.where(F.col("elevation").isNotNull())
        .groupBy("station", "elevation")
        .count()
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("station").orderBy(F.asc("count"), F.desc("elevation"))
    minority = (
        counts.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select("station", F.col("elevation").alias("__minority_elev"))
    )
    out = (
        df.join(F.broadcast(stats), "station", "left")
        .join(F.broadcast(minority), "station", "left")
    )
    many = (
        (F.col("__n_elev") > 2)
        & (F.col("__elev_range") > tolerance_m)
        & (
            F.abs(F.col("elevation") - F.col("__elev_median"))
            > F.lit(tolerance_m)
        )
    )
    two = (
        (F.col("__n_elev") == 2)
        & (F.col("__elev_range") > tolerance_m)
        & (F.col("elevation") == F.col("__minority_elev"))
    )
    out = write_flag(out, "elevation", many | two, FLAG_ELEV_RANGE)
    return out.drop("__n_elev", "__elev_range", "__elev_median", "__minority_elev")


# ------------------------------------------------- sensor-height gates
def sensor_height_check(
    df: DataFrame,
    thermometer_col: str = "thermometer_height_m",
    anemometer_col: str = "anemometer_height_m",
    tolerance_m: float = 1.0 / 3.0,
) -> DataFrame:
    """Flags 6/7/8/9 (qaqc_sensor_height_t / qaqc_sensor_height_w,
    qaqc_wholestation.py:579-689): whole-station gates on instrument
    mounting height —

    - thermometer height missing anywhere → every tas row flags 6;
      present but not all within 2 m ± ⅓ m → 7;
    - anemometer height missing anywhere → sfcWind AND sfcWind_dir
      flag 8; present but outside 10 m ± ⅓ m → 9 on both.

    The reference runs one station per process and assigns the scalar
    flag to the whole column; here one per-station aggregate (any-null
    + min/max within band) broadcasts back onto the observations —
    same decision, one shuffle, no per-row height comparison repeated
    after the join.
    """
    checks = []  # (height_col, lo, hi, missing_flag, range_flag, targets)
    if thermometer_col in df.columns and "tas" in df.columns:
        checks.append(
            (
                thermometer_col,
                2.0 - tolerance_m,
                2.0 + tolerance_m,
                FLAG_THERMOMETER_MISSING,
                FLAG_THERMOMETER_HEIGHT,
                ["tas"],
            )
        )
    wind_targets = [
        v for v in ("sfcWind", "sfcWind_dir") if v in df.columns
    ]
    if anemometer_col in df.columns and wind_targets:
        checks.append(
            (
                anemometer_col,
                10.0 - tolerance_m,
                10.0 + tolerance_m,
                FLAG_ANEMOMETER_MISSING,
                FLAG_ANEMOMETER_HEIGHT,
                wind_targets,
            )
        )
    if not checks:
        return df

    out = ensure_flag_columns(
        df, [t for _c, _l, _h, _m, _r, ts in checks for t in ts]
    )
    aggs = []
    for col, lo, hi, *_ in checks:
        aggs.append(
            (F.count(F.lit(1)) > F.count(col)).alias(f"__miss_{col}")
        )
        aggs.append(
            ((F.min(col) >= lo) & (F.max(col) <= hi)).alias(
                f"__within_{col}"
            )
        )
    gates = df.groupBy("station").agg(*aggs)
    out = out.join(F.broadcast(gates), "station", "left")
    for col, _lo, _hi, missing_flag, range_flag, targets in checks:
        for t in targets:
            # two write_flag compositions: missing-height first, then
            # out-of-band — the second call's valid_mask sees the
            # first flag and skips those rows, so missing keeps
            # precedence (write_flag owns the valid-mask/precedence
            # semantics in one place)
            out = write_flag(
                out, t, F.col(f"__miss_{col}"), missing_flag
            )
            out = write_flag(
                out, t, ~F.col(f"__within_{col}"), range_flag
            )
    return out.drop(
        *[f"__miss_{c}" for c, *_ in checks],
        *[f"__within_{c}" for c, *_ in checks],
    )


# ------------------------------------------------------- P3 station gates
def station_gates(
    df: DataFrame,
    elev_range: tuple[float, float] = (-95.0, 6210.0),
) -> DataFrame:
    """Whole-station eligibility gates (qaqc_wholestation.py:56-110,
    199-228, 537-574): a station is rejected when it has no data
    variables, all-null lat/lon, or median elevation outside
    [-95, 6210] m. Returns (station, reject_reason); gating the obs
    table is a broadcast anti-join against the rejects."""
    data_vars = present_vars(df)
    any_data = F.greatest(
        *[F.count(v) for v in data_vars] if data_vars else [F.lit(0)]
    )
    gates = df.groupBy("station").agg(
        any_data.alias("__n_any"),
        F.count("lat").alias("__n_lat"),
        F.count("lon").alias("__n_lon"),
        F.expr("percentile(elevation, 0.5)").alias("__elev_med")
        if "elevation" in df.columns
        else F.lit(None).alias("__elev_med"),
    )
    return gates.select(
        "station",
        F.when(F.col("__n_any") == 0, "no_data_vars")
        .when((F.col("__n_lat") == 0) | (F.col("__n_lon") == 0), "missing_latlon")
        .when(
            F.col("__elev_med").isNotNull()
            & (
                (F.col("__elev_med") < elev_range[0])
                | (F.col("__elev_med") > elev_range[1])
            ),
            "elevation_out_of_range",
        )
        .alias("reject_reason"),
    ).where(F.col("reject_reason").isNotNull())


def apply_station_gates(df: DataFrame, gates: DataFrame) -> DataFrame:
    """Drop rejected stations via broadcast anti-join."""
    return df.join(F.broadcast(gates.select("station")), "station", "left_anti")
