"""Custom stateful streaming operators (SURVEY.md §2.9, §2.10).

Two reference behaviors need per-key state that outlives a micro-batch,
which tumbling-window aggregation cannot express:

- **gap detection** (the streaming analog of the grid-infill marking,
  ``merge_hourly_standardization.py:46-94`` / ``VALLEYWATER_clean.py:
  115-134``): a missing observation is only visible by comparing each
  arrival with the *previous* arrival of the same station — across
  micro-batch boundaries.
- **run sessionization** (streaming W3, ``qaqc_unusual_streaks.py:
  573-694``): a constant-value streak may span many micro-batches; the
  open run must be carried forward, and only closed runs emitted.

Both are ``applyInPandasWithState`` islands: state is a single scalar
tuple per station (bounded — no history retained), batches arrive
Arrow-encoded, and the emitted rows are append-mode facts.

Timestamps cross the state boundary as epoch microseconds (int) —
GroupState tuples cannot hold pandas timestamps.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


def _to_us(series: pd.Series) -> pd.Series:
    """datetime64[ns] -> int64 epoch microseconds (floor, like Spark)."""
    return series.astype("int64") // 1_000


def gap_detect_stream(
    stream: DataFrame,
    key: str = "station",
    time_col: str = "time",
    cadence_seconds: int = 3600,
) -> DataFrame:
    """Emit one row per cadence gap: consecutive observations of a
    station more than ``cadence_seconds`` apart, including pairs split
    across micro-batches (state = last-seen timestamp)."""
    out_schema = (
        f"{key} string, gap_start timestamp, gap_end timestamp, "
        "n_missing int"
    )
    state_schema = "last_us long"
    cad_us = int(cadence_seconds) * 1_000_000

    def fn(k, pdfs, state):
        parts = [pdf[[time_col]] for pdf in pdfs]
        t = pd.concat(parts)[time_col].sort_values(ignore_index=True)
        us = _to_us(t)
        if state.exists:
            (last,) = state.get
            us = pd.concat([pd.Series([last]), us], ignore_index=True)
        state.update((int(us.iloc[-1]),))
        # int64 throughout: a float detour (e.g. via shift's NaN) at
        # 1e18-ns scale rounds off sub-microsecond digits and Arrow
        # refuses the lossy ns->us cast on output.
        arr = us.to_numpy()
        prev, cur = arr[:-1], arr[1:]
        diff = cur - prev
        m = diff > cad_us
        if m.any():
            yield pd.DataFrame(
                {
                    key: k[0],
                    "gap_start": pd.to_datetime(prev[m] * 1_000),
                    "gap_end": pd.to_datetime(cur[m] * 1_000),
                    "n_missing": (
                        (diff[m] + cad_us - 1) // cad_us - 1
                    ).astype("int32"),
                }
            )

    return stream.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def value_runs_stream(
    stream: DataFrame,
    key: str = "station",
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """Emit closed constant-value runs (streaming W3). The open run per
    station is carried in state — (value, start, end, count) — so a
    streak spanning micro-batches is reported once, with its full
    extent, when the value finally changes."""
    out_schema = (
        f"{key} string, run_value double, run_start timestamp, "
        "run_end timestamp, n_obs int"
    )
    state_schema = "cur double, start_us long, end_us long, n int"

    def fn(k, pdfs, state):
        rows = pd.concat(list(pdfs)).sort_values(time_col, ignore_index=True)
        us = _to_us(rows[time_col])
        vals = rows[value_col]
        if state.exists:
            cur, start, end, n = state.get
        else:
            cur, start, end, n = None, 0, 0, 0
        closed = []
        for v, t in zip(vals, us):
            if cur is not None and v == cur:
                n += 1
                end = int(t)
            else:
                if cur is not None:
                    closed.append((k[0], cur, start, end, n))
                cur, start, end, n = float(v), int(t), int(t), 1
        state.update((float(cur), int(start), int(end), int(n)))
        if closed:
            out = pd.DataFrame(
                closed,
                columns=[key, "run_value", "run_start", "run_end", "n_obs"],
            )
            out["run_start"] = pd.to_datetime(out["run_start"] * 1_000)
            out["run_end"] = pd.to_datetime(out["run_end"] * 1_000)
            out["n_obs"] = out["n_obs"].astype("int32")
            yield out

    return stream.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


# ----------------------------------------------------------------------
# Streaming W7: de-accumulation with cross-batch state, in BOTH
# stateful APIs — ``deaccumulate_stream`` (applyInPandasWithState, the
# working path in this environment) and ``deaccumulate_stream_tws``
# (transformWithStateInPandas, Spark 4.x's successor API with typed
# state handles; requires protobuf in the Python worker, absent here,
# so it is import-gated and covered by a skippable test).
# ----------------------------------------------------------------------
def deaccumulate_stream(
    stream: DataFrame,
    key: str = "station",
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """Streaming W7 analog (``qaqc_deaccumulate.py:74-234``): emit the
    first difference of each station's value series — increments of an
    accumulated gauge — with the last (time, value) carried across
    micro-batches, so the first row of batch N+1 differences against
    the last row of batch N, not against null. int64 microseconds
    throughout the state seam."""
    out_schema = (
        f"{key} string, {time_col} timestamp, {value_col} double, "
        "incr double"
    )
    state_schema = "last_us long, last_val double"

    def fn(k, pdfs, state):
        pdf = pd.concat(
            [p[[key, time_col, value_col]] for p in pdfs],
            ignore_index=True,
        )
        pdf["__us"] = _to_us(pdf[time_col])
        pdf = pdf.sort_values("__us", ignore_index=True)
        prev_val = None
        if state.exists:
            _, prev_val = state.get
        vals = pdf[value_col].astype("float64")
        incr = vals - vals.shift(1)
        if prev_val is not None:
            incr.iloc[0] = vals.iloc[0] - prev_val
        state.update(
            (int(pdf["__us"].iloc[-1]), float(vals.iloc[-1]))
        )
        yield pd.DataFrame(
            {
                key: pdf[key],
                time_col: pd.to_datetime(pdf["__us"], unit="us"),
                value_col: vals,
                "incr": incr,
            }
        )

    return stream.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="Append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def deaccumulate_stream_tws(
    stream: DataFrame,
    key: str = "station",
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """Streaming W7 analog (``qaqc_deaccumulate.py:74-234``): emit the
    first difference of each station's value series — increments of an
    accumulated gauge — with the last (time, value) carried across
    micro-batches in a ValueState, so the first row of batch N+1
    differences against the last row of batch N, not against null.

    Built on ``transformWithStateInPandas`` (typed ValueState handle);
    semantics identical to ``deaccumulate_stream``. Requires protobuf
    in the Python worker (STREAMING_PYTHON_RUNNER init imports
    google.protobuf) — absent in this container, so tests skip it."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Deacc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState(
                "last", "last_us long, last_val double"
            )

        def handleInputRows(self, key_tuple, rows, timer_values):
            pdf = pd.concat(list(rows), ignore_index=True)
            pdf["__us"] = _to_us(pdf[time_col])
            pdf = pdf.sort_values("__us", ignore_index=True)
            prev_val = None
            if self._last.exists():
                _, prev_val = self._last.get()
            vals = pdf[value_col].astype("float64")
            prevs = vals.shift(1)
            incr = vals - prevs
            if prev_val is not None:
                incr.iloc[0] = vals.iloc[0] - prev_val
            self._last.update(
                (int(pdf["__us"].iloc[-1]), float(vals.iloc[-1]))
            )
            yield pd.DataFrame(
                {
                    key: pdf[key],
                    time_col: pd.to_datetime(pdf["__us"], unit="us"),
                    value_col: vals,
                    "incr": incr,
                }
            )

        def close(self) -> None:
            pass

    out_schema = (
        f"{key} string, {time_col} timestamp, {value_col} double, "
        "incr double"
    )
    return stream.groupBy(key).transformWithStateInPandas(
        statefulProcessor=_Deacc(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="None",
    )
