"""Scalar kernels — unit conversions and meteorological derivations.

Pure Catalyst column expressions (no UDFs): every kernel the reference
implements in ``scripts/2_clean_data/calc_clean.py:68-462`` and
``scripts/4_merge_data/merge_derive_missing.py:299-391``, expressed so
whole-stage codegen fuses them into scans.

Units convention (same as the reference): temperatures K, pressures
Pa, wind m/s, precip mm, humidity % (0-100), radiation W/m²,
elevation m, moisture kg/kg.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------- units
def degc_to_k(x) -> Column:
    """°C → K (calc_clean.py:68-82)."""
    return _c(x) + F.lit(273.15)


def degf_to_k(x) -> Column:
    """°F → K (calc_clean.py:85-98)."""
    return (F.lit(5.0) / F.lit(9.0)) * (_c(x) - F.lit(32.0)) + F.lit(273.15)


def hpa_to_pa(x) -> Column:
    """hPa (or mb) → Pa (calc_clean.py:101-119)."""
    return _c(x) * F.lit(100.0)


def kpa_to_pa(x) -> Column:
    """kPa → Pa (calc_clean.py:122-136)."""
    return _c(x) * F.lit(1000.0)


def inhg_to_pa(x) -> Column:
    """inHg → Pa (calc_clean.py:139-153)."""
    return _c(x) * F.lit(3386.39)


def kts_to_ms(x) -> Column:
    """knots → m/s (calc_clean.py:156-170)."""
    return _c(x) / F.lit(1.94)


def mph_to_ms(x) -> Column:
    """mph → m/s (calc_clean.py:173-187)."""
    return _c(x) / F.lit(2.237)


def gkg_to_kgkg(x) -> Column:
    """g/kg → kg/kg (calc_clean.py:190-204)."""
    return _c(x) / F.lit(1000.0)


def in_to_mm(x) -> Column:
    """inches → mm (calc_clean.py:207-221)."""
    return _c(x) * F.lit(25.4)


def ft_to_m(x) -> Column:
    """feet → m (calc_clean.py:224-238)."""
    return _c(x) * F.lit(0.3048)


# ----------------------------------------------------- coordinate parsing
def lat_dms_to_dd(s) -> Column:
    """'DD.MM.SS' string → decimal degrees (calc_clean.py:241-262)."""
    p = F.split(_c(s), r"\.")
    return (
        p.getItem(0).cast("double")
        + p.getItem(1).cast("double") / F.lit(60.0)
        + p.getItem(2).cast("double") / F.lit(3600.0)
    )


def lon_dms_to_dd(s) -> Column:
    """'DD.MM.SS' west-hemisphere longitude string → negative decimal
    degrees (calc_clean.py:264-284)."""
    p = F.split(_c(s), r"\.")
    dd = (
        F.abs(p.getItem(0).cast("double"))
        + p.getItem(1).cast("double") / F.lit(60.0)
        + p.getItem(2).cast("double") / F.lit(3600.0)
    )
    return -dd


def lat_dmm_to_dd(s) -> Column:
    """LORAN 'DDMM.mm' → decimal degrees (calc_clean.py:287-303)."""
    v = _c(s).cast("double")
    deg = F.floor(v / F.lit(100.0)).cast("double")
    minutes = v - deg * F.lit(100.0)
    return deg + minutes / F.lit(60.0)


def lon_dmm_to_dd(s) -> Column:
    """LORAN 'DDDMM.mm' west longitude → negative decimal degrees
    (calc_clean.py:306-322)."""
    v = F.abs(_c(s).cast("double"))
    deg = F.floor(v / F.lit(100.0)).cast("double")
    minutes = v - deg * F.lit(100.0)
    return -(deg + minutes / F.lit(60.0))


# ------------------------------------------------------- met derivations
def saturation_vapor_pressure_kpa(tas_k) -> Column:
    """Tetens-style es in kPa from temperature in K
    (calc_clean.py:341: ``0.611 * exp(5423 * (1/273 - 1/T))``)."""
    return F.lit(0.611) * F.exp(
        F.lit(5423.0) * (F.lit(1.0 / 273.0) - F.lit(1.0) / _c(tas_k))
    )


def dewpoint_from_rh(tas_k, hurs) -> Column:
    """Dewpoint (K) from air temperature (K) + relative humidity (%)
    — method 1 (calc_clean.py:325-347)."""
    e_vap = saturation_vapor_pressure_kpa(tas_k) * _c(hurs) / F.lit(100.0)
    return F.lit(1.0) / (
        F.lit(1.0 / 273.0) - F.lit(0.0001844) * F.log(e_vap / F.lit(0.611))
    )


def dewpoint_from_vapor_pressure(e_vap_kpa) -> Column:
    """Dewpoint (K) from vapor pressure (kPa) — method 2
    (calc_clean.py:350-364)."""
    return F.lit(1.0) / (
        F.lit(1.0 / 273.0)
        - F.lit(0.0001844) * F.log(_c(e_vap_kpa) / F.lit(0.611))
    )


def relhumid_from_dewpoint(tas_k, tdps_k) -> Column:
    """Relative humidity (%) from air + dewpoint temperatures (K)
    (calc_clean.py:367-387)."""
    return F.lit(100.0) * (
        saturation_vapor_pressure_kpa(tdps_k)
        / saturation_vapor_pressure_kpa(tas_k)
    )


def airtemp_from_rh_dewpoint(hurs, tdps_k) -> Column:
    """Air temperature (K) from RH (%) + dewpoint (K) — inversion of
    the August-Roche-Magnus form used by merge_derive_missing.py:327-364
    (°C internally): T = c·γ/(b−γ), γ = b·Td/(c+Td) − ln(RH/100)."""
    b = F.lit(17.625)
    c = F.lit(243.04)
    td_c = _c(tdps_k) - F.lit(273.15)
    gamma = b * td_c / (c + td_c) - F.log(_c(hurs) / F.lit(100.0))
    return c * gamma / (b - gamma) + F.lit(273.15)


def wind_magnitude(u, v) -> Column:
    """sqrt(u² + v²) (calc_clean.py:390-411)."""
    return F.sqrt(F.pow(_c(u), 2) + F.pow(_c(v), 2))


def ps_from_psl(psl, elev, tas_k) -> Column:
    """Station pressure (Pa) from sea-level pressure, elevation (m),
    temperature (K) (calc_clean.py:414-437)."""
    ratio = F.lit(1.0) - (
        (F.lit(0.0065) * _c(elev)) / (_c(tas_k) + F.lit(0.0065) * _c(elev))
    )
    return _c(psl) / F.pow(ratio, F.lit(-5.257))


def ps_from_altimeter(alt_pa, elev) -> Column:
    """Station pressure (Pa) from altimeter setting (Pa) + elevation
    (m) — NWS formula via inHg (calc_clean.py:440-462)."""
    alt_inhg = _c(alt_pa) / F.lit(3386.39)
    ps_inhg = alt_inhg * F.pow(
        (F.lit(288.0) - F.lit(0.0065) * _c(elev)) / F.lit(288.0),
        F.lit(5.2561),
    )
    return inhg_to_pa(ps_inhg)
