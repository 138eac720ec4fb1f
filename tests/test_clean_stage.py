"""Clean stage end-to-end: ISD lines → clean table → partitioned
parquet roundtrip → station list."""

import os

from tests.test_isd import _record


def test_clean_isd_roundtrip(spark, tmp_path):
    src = tmp_path / "isd.txt"
    lines = []
    for hh in range(10, 14):
        lines.append(_record(ts=f"20200115{hh}30"))
        lines.append(_record(ts=f"20200115{hh}30"))  # duplicate delivery
        lines.append(
            _record(usaf="999999", wban="00001", ts=f"20200115{hh}30")
        )
    src.write_text("\n".join(lines) + "\n")

    from historical_obs_platform_spark.plans.clean import (
        clean_isd,
        station_list,
        write_stage,
        write_station_list_csv,
    )

    obs = clean_isd(spark, str(src))
    assert obs.count() == 8  # dupes dropped, 2 stations x 4 hours
    assert set(r.network for r in obs.select("network").distinct().collect()) == {
        "ASOSAWOS"
    }

    out = tmp_path / "stage"
    write_stage(obs, str(out))
    assert any(
        p.startswith("network=") for p in os.listdir(out)
    )  # partitioned layout
    back = spark.read.parquet(str(out))
    assert back.count() == 8

    stations = station_list(obs)
    rows = {r.era_id: r for r in stations.collect()}
    assert set(rows) == {"ASOSAWOS_72290023188", "ASOSAWOS_99999900001"}
    r = rows["ASOSAWOS_72290023188"]
    assert r.total_nobs == 4
    assert r.tas_nobs == 4
    assert r.cleaned == "Y"
    assert r.network == "ASOSAWOS"

    csv_out = tmp_path / "stations_csv"
    write_station_list_csv(stations, str(csv_out))
    files = [f for f in os.listdir(csv_out) if f.endswith(".csv")]
    assert len(files) == 1
