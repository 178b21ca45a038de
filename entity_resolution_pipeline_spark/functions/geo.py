"""Geo parsing — location strings and country standardization (P14/P15).

Reference semantics: split "City, Region, Country[, Continent]" with a
backward scan, map country names to ISO-2, normalize city names
(/root/reference/src/geo.py:80-162, vectorized :278-323, maps :20-73).
Here the whole chain is native Column expressions; the country-name map is a
literal `create_map` (a broadcast dim table at production scale).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# name → ISO-2 (subset in the spirit of /root/reference/src/geo.py:20-56)
COUNTRY_TO_ISO = {
    "united states": "US", "usa": "US", "united kingdom": "GB", "uk": "GB",
    "germany": "DE", "france": "FR", "italy": "IT", "spain": "ES",
    "netherlands": "NL", "belgium": "BE", "switzerland": "CH", "austria": "AT",
    "sweden": "SE", "norway": "NO", "denmark": "DK", "finland": "FI",
    "ireland": "IE", "portugal": "PT", "poland": "PL", "romania": "RO",
    "brazil": "BR", "canada": "CA", "china": "CN", "india": "IN",
    "japan": "JP", "russia": "RU", "argentina": "AR", "australia": "AU",
    "egypt": "EG", "ethiopia": "ET", "kenya": "KE", "morocco": "MA",
    "mozambique": "MZ", "peru": "PE", "vietnam": "VN", "indonesia": "ID",
    "iran": "IR", "iraq": "IQ", "jordan": "JO", "saudi arabia": "SA",
    "algeria": "DZ", "united arab emirates": "AE",
}


def _iso_map() -> Column:
    return F.create_map(*[
        x for k, v in COUNTRY_TO_ISO.items() for x in (F.lit(k), F.lit(v))
    ])


def parse_location_col(loc: Column) -> Column:
    """"City, Region, Country" → struct(city, region, country_iso).

    Positional split like the reference's vectorized path
    (src/geo.py:278-323): part 1 = city, part 2 = region (when ≥3 parts),
    last part = country. Country resolves via ISO map, else a valid 2-letter
    code passes through uppercased, else null.
    """
    parts = F.transform(F.split(F.coalesce(loc, F.lit("")), ","), lambda p: F.trim(p))
    parts = F.filter(parts, lambda p: p != "")
    n = F.size(parts)
    city = F.when(n >= 1, F.element_at(parts, 1))
    region = F.when(n >= 3, F.element_at(parts, 2))
    raw_country = F.when(n >= 2, F.lower(F.element_at(parts, -1)))
    iso = _iso_map()[raw_country]
    country = F.coalesce(
        iso,
        F.when(raw_country.rlike("^[a-z]{2}$"), F.upper(raw_country)),
    )
    return F.struct(
        city.alias("city"), region.alias("region"), country.alias("country_iso"),
    )


def standardize_country_col(c: Column) -> Column:
    """2-letter validate / name lookup (P15; src/geo.py:231-257)."""
    low = F.lower(F.trim(F.coalesce(c, F.lit(""))))
    return F.coalesce(
        _iso_map()[low],
        F.when(low.rlike("^[a-z]{2}$"), F.upper(low)),
    )


# --- pair-level geo features (F7) ---------------------------------------------


def country_match_col(a: Column, b: Column) -> Column:
    """Country equality after upper/trim; 0.0 when either side is missing
    or blank (reference: /root/reference/src/features.py:232-238).
    Native comparison — stays in codegen."""
    ta, tb = F.trim(a), F.trim(b)
    return (
        F.when(a.isNull() | b.isNull() | (ta == "") | (tb == ""), F.lit(0.0))
        .when(F.upper(ta) == F.upper(tb), F.lit(1.0))
        .otherwise(F.lit(0.0))
    )


def city_similarity_col(a: Column, b: Column) -> Column:
    """City-name similarity in [0,1]: 1.0 on exact lower/trim equality,
    else whitespace-token Jaccard overlap/union (reference:
    /root/reference/src/features.py:241-260). All-native array arithmetic."""
    la, lb = F.lower(F.trim(a)), F.lower(F.trim(b))
    toks = lambda c: F.array_distinct(  # noqa: E731
        F.filter(F.split(c, r"\s+"), lambda t: t != ""))
    ta, tb = toks(la), toks(lb)
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    union = F.size(F.array_union(ta, tb)).cast("double")
    return (
        F.when(a.isNull() | b.isNull() | (la == "") | (lb == ""), F.lit(0.0))
        .when(la == lb, F.lit(1.0))
        .when(union > 0, inter / union)
        .otherwise(F.lit(0.0))
    )
