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
