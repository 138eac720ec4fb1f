"""Scalar kernel tests — known-value and property checks for the unit
conversions and met derivations (model: the reference's
scripts/tests/test_unit_conversions.py / test_derived_variables.py,
but with independently computed goldens rather than restating the
implementation formula)."""

import math

import pytest
from pyspark.sql import functions as F

from historical_obs_platform_spark.functions import kernels as K


def _eval(spark, col):
    return spark.range(1).select(col.alias("x")).collect()[0]["x"]


CASES = [
    (lambda: K.degc_to_k(F.lit(25.0)), 298.15),
    (lambda: K.degc_to_k(F.lit(-40.0)), 233.15),
    (lambda: K.degf_to_k(F.lit(32.0)), 273.15),
    (lambda: K.degf_to_k(F.lit(212.0)), 373.15),
    (lambda: K.degf_to_k(F.lit(-40.0)), 233.15),  # F == C at -40
    (lambda: K.hpa_to_pa(F.lit(1013.25)), 101325.0),
    (lambda: K.kpa_to_pa(F.lit(101.325)), 101325.0),
    (lambda: K.inhg_to_pa(F.lit(1.0)), 3386.39),
    (lambda: K.kts_to_ms(F.lit(1.94)), 1.0),
    (lambda: K.mph_to_ms(F.lit(2.237)), 1.0),
    (lambda: K.gkg_to_kgkg(F.lit(1000.0)), 1.0),
    (lambda: K.in_to_mm(F.lit(1.0)), 25.4),
    (lambda: K.ft_to_m(F.lit(1.0)), 0.3048),
    (lambda: K.wind_magnitude(F.lit(3.0), F.lit(4.0)), 5.0),
    # "DD.MM.SS": 30°30'00" = 30.5°
    (lambda: K.lat_dms_to_dd(F.lit("30.30.00")), 30.5),
    (lambda: K.lon_dms_to_dd(F.lit("120.15.00")), -120.25),
    # LORAN DDMM.mm: 3730.00 = 37°30' = 37.5
    (lambda: K.lat_dmm_to_dd(F.lit("3730.00")), 37.5),
    (lambda: K.lon_dmm_to_dd(F.lit("12230.00")), -122.5),
]


@pytest.mark.parametrize("make_col,expected", CASES, ids=range(len(CASES)))
def test_known_values(spark, make_col, expected):
    assert _eval(spark, make_col()) == pytest.approx(expected, abs=1e-9)


def test_dewpoint_saturated_air_equals_airtemp(spark):
    """At RH=100%, dewpoint ≈ air temperature (the formula's constants
    273 / 0.0001844·5423 ≈ 1 make it near-exact)."""
    for t in (250.0, 273.15, 300.0, 320.0):
        td = _eval(spark, K.dewpoint_from_rh(F.lit(t), F.lit(100.0)))
        assert td == pytest.approx(t, abs=0.05)


def test_dewpoint_below_airtemp_when_unsaturated(spark):
    td = _eval(spark, K.dewpoint_from_rh(F.lit(300.0), F.lit(50.0)))
    assert td < 300.0
    assert 270.0 < td < 295.0


def test_relhumid_roundtrip(spark):
    """RH(T, dewpoint(T, RH)) ≈ RH."""
    for rh in (20.0, 50.0, 90.0):
        td = K.dewpoint_from_rh(F.lit(290.0), F.lit(rh))
        got = _eval(spark, K.relhumid_from_dewpoint(F.lit(290.0), td))
        assert got == pytest.approx(rh, rel=1e-3)


def test_relhumid_saturated_is_100(spark):
    got = _eval(spark, K.relhumid_from_dewpoint(F.lit(285.0), F.lit(285.0)))
    assert got == pytest.approx(100.0, abs=1e-9)


def test_airtemp_from_rh_dewpoint_roundtrip(spark):
    """T(RH(T, Td), Td) ≈ T for the Magnus-form inversion."""
    t, td = 295.0, 285.0
    # Magnus RH consistent with the inversion's own constants
    b, c = 17.625, 243.04
    tc, tdc = t - 273.15, td - 273.15
    rh = 100.0 * math.exp(b * tdc / (c + tdc) - b * tc / (c + tc))
    got = _eval(spark, K.airtemp_from_rh_dewpoint(F.lit(rh), F.lit(td)))
    assert got == pytest.approx(t, abs=1e-6)


def test_ps_from_psl_sea_level_identity(spark):
    """At elevation 0, station pressure equals sea-level pressure."""
    got = _eval(spark, K.ps_from_psl(F.lit(101325.0), F.lit(0.0), F.lit(288.0)))
    assert got == pytest.approx(101325.0, abs=1e-9)


def test_ps_from_psl_decreases_with_elevation(spark):
    got = _eval(
        spark, K.ps_from_psl(F.lit(101325.0), F.lit(1000.0), F.lit(288.0))
    )
    # ~11-12 kPa per 1000 m near sea level
    assert 88000.0 < got < 92000.0


def test_ps_from_altimeter_sea_level_identity(spark):
    got = _eval(spark, K.ps_from_altimeter(F.lit(101325.0), F.lit(0.0)))
    assert got == pytest.approx(101325.0, abs=1e-6)


def test_ps_from_altimeter_elevation(spark):
    """1000 m at standard altimeter ≈ 89.9 kPa (NWS table)."""
    got = _eval(spark, K.ps_from_altimeter(F.lit(101325.0), F.lit(1000.0)))
    assert 88500.0 < got < 91000.0
