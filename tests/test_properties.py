"""Property-based tests (hypothesis) for the core operator library —
Spark results vs straightforward pandas reference implementations on
arbitrary small inputs. The reference repo has no property tests
(SURVEY.md §5); these pin the invariants the QA/QC battery relies on."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from historical_obs_platform_spark.operators.dedup import exact_dedup
from historical_obs_platform_spark.operators.windows import (
    deaccumulate,
    sessionize_runs,
)

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

frames = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # key
        st.integers(min_value=0, max_value=50),     # minute offset
        st.integers(min_value=-3, max_value=3),     # small value domain
    ),
    min_size=1,
    max_size=40,
)


def _to_pdf(rows):
    base = pd.Timestamp("2020-01-01")
    pdf = pd.DataFrame(rows, columns=["key", "mins", "value"])
    pdf = pdf.drop_duplicates(["key", "mins"])
    pdf["time"] = base + pd.to_timedelta(pdf["mins"], unit="min")
    pdf["value"] = pdf["value"].astype(float)
    pdf["key"] = pdf["key"].astype(str)
    return pdf[["key", "time", "value"]]


@given(frames)
@settings(**SETTINGS)
def test_sessionize_runs_matches_pandas(spark, rows):
    pdf = _to_pdf(rows)
    got = (
        sessionize_runs(
            spark.createDataFrame(pdf), "key", "time", "value", out="run"
        )
        .toPandas()
        .sort_values(["key", "time"], ignore_index=True)
    )
    want = pdf.sort_values(["key", "time"], ignore_index=True)
    runs = want.groupby("key")["value"].transform(
        lambda s: (s != s.shift()).cumsum()
    )
    assert got["run"].astype(int).tolist() == runs.astype(int).tolist()


@given(frames)
@settings(**SETTINGS)
def test_deaccumulate_properties(spark, rows):
    pdf = _to_pdf(rows)
    got = (
        deaccumulate(spark.createDataFrame(pdf), "key", "time", "value")
        .toPandas()
        .sort_values(["key", "time"], ignore_index=True)
    )
    # first row of each key is null; everything else >= 0
    firsts = got.groupby("key").head(1)["deaccumulated"]
    assert firsts.isna().all()
    rest = got.groupby("key").apply(lambda g: g.iloc[1:], include_groups=False)
    if len(rest):
        assert (rest["deaccumulated"].dropna() >= 0).all()
    # where the gauge is nondecreasing, diff is recovered exactly
    want = pdf.sort_values(["key", "time"], ignore_index=True)
    diffs = want.groupby("key")["value"].diff()
    mask = diffs.notna() & (diffs >= 0)
    assert (
        got.loc[mask[mask].index, "deaccumulated"].to_numpy()
        == diffs[mask].to_numpy()
    ).all()


texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab X"),
        min_size=0,
        max_size=12,
    ),
    min_size=1,
    max_size=20,
)


@given(texts)
@settings(**SETTINGS)
def test_exact_dedup_properties(spark, docs):
    pdf = pd.DataFrame(
        {"doc_id": range(len(docs)), "text": docs}
    )
    sdf = spark.createDataFrame(pdf)
    out = exact_dedup(sdf, "doc_id", "text").toPandas()
    # one survivor per normalized text; survivor is the min id
    norm = (
        pdf["text"].str.lower().str.strip().str.replace(r"\s+", " ", regex=True)
    )
    groups = pdf.groupby(norm)["doc_id"].min()
    assert sorted(out["doc_id"]) == sorted(groups.tolist())
    # idempotent
    again = exact_dedup(
        spark.createDataFrame(out[["doc_id", "text"]]), "doc_id", "text"
    ).toPandas()
    assert sorted(again["doc_id"]) == sorted(out["doc_id"])


# ------------------------------------------------------- round-2 ops
points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # id (dedup below)
        st.integers(min_value=-20, max_value=20),  # x * 0.25
        st.integers(min_value=-20, max_value=20),  # y * 0.25
    ),
    min_size=1,
    max_size=25,
)


@given(points)
@settings(**SETTINGS)
def test_radius_join_matches_bruteforce(spark, rows):
    from historical_obs_platform_spark.operators.geo import radius_join

    pdf = pd.DataFrame(rows, columns=["id", "xi", "yi"]).drop_duplicates(
        "id"
    )
    pdf["x"] = pdf["xi"] * 0.25
    pdf["y"] = pdf["yi"] * 0.25
    df = spark.createDataFrame(pdf[["id", "x", "y"]])
    r = 0.6
    got = {
        (row["a"], row["b"])
        for row in radius_join(df, "id", "x", "y", r).collect()
    }
    want = set()
    recs = pdf.to_dict("records")
    for i, p in enumerate(recs):
        for q in recs[i + 1 :]:
            a, b = sorted((p["id"], q["id"]))
            if (p["x"] - q["x"]) ** 2 + (p["y"] - q["y"]) ** 2 <= r * r:
                want.add((a, b))
    assert got == want


keysets = st.tuples(
    st.sets(st.integers(min_value=0, max_value=500), min_size=1, max_size=30),
    st.sets(st.integers(min_value=0, max_value=500), min_size=1, max_size=60),
)


@given(keysets)
@settings(**SETTINGS)
def test_bloom_never_false_negative(spark, ks):
    from historical_obs_platform_spark.operators.sketches import (
        bloom_build,
        bloom_member,
    )

    dim_keys, probe_keys = ks
    dim = spark.createDataFrame([(k,) for k in dim_keys], "k long")
    probe = spark.createDataFrame([(k,) for k in probe_keys], "k long")
    bloom = bloom_build(dim, "k")
    passed = {
        r["k"]
        for r in probe.crossJoin(F.broadcast(bloom))
        .where(bloom_member("k"))
        .collect()
    }
    # every true member must pass (bloom filters have no false negatives)
    assert (dim_keys & probe_keys) <= passed


changesets = st.tuples(
    st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=0, max_value=9),
        min_size=1,
        max_size=15,
    ),
    st.dictionaries(
        st.integers(min_value=0, max_value=25),
        st.tuples(st.integers(min_value=10, max_value=19), st.booleans()),
        min_size=1,
        max_size=15,
    ),
)


@given(changesets)
@settings(**SETTINGS)
def test_merge_changeset_matches_dict_semantics(spark, data):
    from historical_obs_platform_spark.plans.incremental import (
        merge_changeset,
    )

    base, chg = data
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()], "k long, v long"
    )
    chg_df = spark.createDataFrame(
        [
            (k, v, "upsert" if up else "delete")
            for k, (v, up) in chg.items()
        ],
        "k long, v long, op string",
    )
    got = {
        r["k"]: r["v"]
        for r in merge_changeset(base_df, chg_df, keys=("k",)).collect()
    }
    want = dict(base)
    for k, (v, up) in chg.items():
        if up:
            want[k] = v
        else:
            want.pop(k, None)
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    shingles=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="'\x00"
            ),
            min_size=1,
            max_size=24,
        ),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
def test_minhash_hash_engine_parity(spark, shingles):
    """minhash_hash_col (Spark conv) and minhash_hash_sql (DuckDB 0x
    cast) compute identical 40-bit values for arbitrary unicode
    shingles — the cross-engine contract the LSH oracles rest on."""
    import duckdb

    from historical_obs_platform_spark.operators.dedup import (
        minhash_hash_col,
        minhash_hash_sql,
    )

    df = spark.createDataFrame(
        [(s,) for s in shingles], ["shingle"]
    )
    got = {
        (r["shingle"], i): r[f"h{i}"]
        for r in df.select(
            "shingle",
            *[minhash_hash_col(i).alias(f"h{i}") for i in (0, 7, 15)],
        ).collect()
        for i in (0, 7, 15)
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(shingle VARCHAR)"
    )
    con.executemany(
        "INSERT INTO t VALUES (?)", [(s,) for s in shingles]
    )
    want = {
        (r[0], i): r[j + 1]
        for r in con.sql(
            "SELECT shingle, "
            + ", ".join(minhash_hash_sql(i) for i in (0, 7, 15))
            + " FROM t"
        ).fetchall()
        for j, i in enumerate((0, 7, 15))
    }
    assert got == want


# ---------------------------------------------- round-3 operator props
station_lists = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),    # WBAN
        st.integers(min_value=0, max_value=3),    # lat bucket
        st.booleans(),                            # coords agree?
        st.booleans(),                            # null STARTDATE?
    ),
    min_size=0,
    max_size=12,
)


@given(station_lists, station_lists)
@settings(**SETTINGS)
def test_merge_station_lists_preserves_isd_rows(spark, isd_rows, asos_rows):
    """Every ISD row appears exactly once in the merge output (the
    two join tiers partition the ISD side, never duplicate or drop),
    regardless of how messy the ASOSAWOS side is."""
    from historical_obs_platform_spark.sources.networks import (
        merge_station_lists,
    )

    isd_pdf = pd.DataFrame(
        [
            (w, float(lb) + 0.125, -10.25, f"isd{i}")
            for i, (w, lb, _, _) in enumerate(isd_rows)
        ],
        columns=["WBAN", "LAT", "LON", "isd_name"],
    )
    # ISD side is unique per station in the reference; dedup WBAN
    isd_pdf = isd_pdf.drop_duplicates(["WBAN", "LAT", "LON"])
    asos_pdf = pd.DataFrame(
        [
            (
                w,
                (float(lb) + 0.125) if agree else 99.5,
                -10.25,
                w * 100 + i,
                None if null_sd else f"200{i % 10}-01-15",
                f"a{i}",
            )
            for i, (w, lb, agree, null_sd) in enumerate(asos_rows)
        ],
        columns=["WBAN", "LAT", "LON", "NCDCID", "STARTDATE", "asos_name"],
    )
    isd = spark.createDataFrame(
        isd_pdf.astype({"WBAN": "int64"})
        if len(isd_pdf)
        else pd.DataFrame(
            {"WBAN": pd.Series(dtype="int64"),
             "LAT": pd.Series(dtype="float64"),
             "LON": pd.Series(dtype="float64"),
             "isd_name": pd.Series(dtype="object")}
        ),
        "WBAN long, LAT double, LON double, isd_name string",
    )
    asos = spark.createDataFrame(
        asos_pdf
        if len(asos_pdf)
        else pd.DataFrame(
            {"WBAN": pd.Series(dtype="int64"),
             "LAT": pd.Series(dtype="float64"),
             "LON": pd.Series(dtype="float64"),
             "NCDCID": pd.Series(dtype="int64"),
             "STARTDATE": pd.Series(dtype="object"),
             "asos_name": pd.Series(dtype="object")}
        ),
        "WBAN long, LAT double, LON double, NCDCID long, "
        "STARTDATE string, asos_name string",
    )
    out = merge_station_lists(isd, asos).toPandas()
    assert len(out) == len(isd_pdf)
    assert sorted(out["WBAN"].tolist()) == sorted(isd_pdf["WBAN"].tolist())
    # metadata, when attached, must come from a row with that WBAN
    hit = out[out["NCDCID"].notna()]
    assert (hit["NCDCID"] // 100 == hit["WBAN"]).all()


zkey_points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=255),
        st.integers(min_value=0, max_value=255),
        st.integers(min_value=0, max_value=255),
    ),
    min_size=1,
    max_size=20,
    unique=True,
)


@given(zkey_points)
@settings(**SETTINGS)
def test_zorder_key_n_bijective_on_domain(spark, pts):
    """Distinct (a,b,c) triples always get distinct Morton keys, and
    de-interleaving the key recovers the point exactly."""
    from historical_obs_platform_spark.operators.layout import zorder_key_n

    df = spark.createDataFrame(pts, "a long, b long, c long")
    rows = df.select(
        "a", "b", "c",
        zorder_key_n([F.col("a"), F.col("b"), F.col("c")], 8).alias("k"),
    ).collect()
    seen = set()
    for r in rows:
        assert 0 <= r.k < 1 << 24
        assert r.k not in seen
        seen.add(r.k)
        a = b = c = 0
        for i in range(8):
            a |= ((r.k >> (3 * i)) & 1) << i
            b |= ((r.k >> (3 * i + 1)) & 1) << i
            c |= ((r.k >> (3 * i + 2)) & 1) << i
        assert (a, b, c) == (r.a, r.b, r.c)
