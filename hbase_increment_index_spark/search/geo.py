"""Solr spatial search (SURVEY.md §2.2 [IMPLIED]) — ``{!geofilt}``,
``{!bbox}`` and ``geodist()`` sorting, the spatial query surface a
Solr 5.x deployment exposes (LatLonType + geofilt/bbox filters and
geodist sort are core Solr since 3.x; the reference delegates all
query-time features to Solr, README.md:9-10,33).

Spark-first shape:

- ``haversine_km`` is a pure column expression (JVM trig inside
  whole-stage codegen — no UDF).
- ``geofilt`` applies the BBOX PRE-FILTER first: a rectangle test on
  raw lat/lon columns is sargable (pushed to parquet min/max and
  evaluated before any trig), then the exact great-circle test runs
  only on rectangle survivors. At 100 TB that ordering — cheap
  separable predicate prunes, expensive exact predicate confirms —
  is the entire game; Solr's own geofilt does the same dance with
  its spatial prefix-tree.
- ``geodist_topk`` is distance sort + limit = TakeOrderedAndProject:
  fixed driver-side k, full scan parallelism, no global sort.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius
KM_PER_DEG_LAT = 111.045


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine), as a single codegen'd
    column expression."""
    # explicit products (not pow) so the expression text — and thus the
    # float result — is reproducible verbatim in the DuckDB oracle
    s1 = F.sin(F.radians(lat2 - lat1) / 2)
    s2 = F.sin(F.radians(lon2 - lon1) / 2)
    a = s1 * s1 + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * s2 * s2
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def bbox_predicate(
    lat_col: Column, lon_col: Column, lat: float, lon: float, d_km: float
) -> Column:
    """Solr ``{!bbox}``: a rectangle circumscribing the d_km circle.
    Pure comparisons on the raw columns — sargable, scan-prunable.

    Superset guarantee: the circle's longitude extent is widest at the
    band edge farthest from the equator, so the width uses the MINIMUM
    cosine over [lat-dlat, lat+dlat] (not the center's), with a 5%
    margin for the spherical-vs-planar approximation. Bands touching a
    pole keep the full longitude range. Over-widening only costs a few
    extra exact-distance evaluations — never a missed result."""
    lat_lo, lat_hi, lon_lo, lon_hi = bbox_bounds(lat, lon, d_km)
    cond = lat_col.between(lat_lo, lat_hi)
    if lon_lo is not None:
        # antimeridian wrap: an interval crossing ±180 splits into
        # an OR of two in-range intervals (still sargable — parquet
        # evaluates both rectangles against min/max stats)
        if lon_lo < -180.0:
            lon_pred = lon_col.between(-180.0, lon_hi) | lon_col.between(
                lon_lo + 360.0, 180.0
            )
        elif lon_hi > 180.0:
            lon_pred = lon_col.between(lon_lo, 180.0) | lon_col.between(
                -180.0, lon_hi - 360.0
            )
        else:
            lon_pred = lon_col.between(lon_lo, lon_hi)
        cond = cond & lon_pred
    return cond


def bbox_bounds(
    lat: float, lon: float, d_km: float
) -> tuple[float, float, float | None, float | None]:
    """Numeric rectangle bounds behind :func:`bbox_predicate`, exposed
    so an external oracle (or a pushdown layer) reproduces the IDENTICAL
    constants the predicate compiles in. ``(lon_lo, lon_hi)`` are None
    when the band touches a pole or the circle spans every longitude
    (the predicate then keeps the full longitude range); a returned
    lon interval may extend past ±180 — the predicate handles the wrap."""
    dlat = d_km / KM_PER_DEG_LAT
    lat_lo, lat_hi = lat - dlat, lat + dlat
    if lat_lo <= -89.9 or lat_hi >= 89.9:
        return lat_lo, lat_hi, None, None
    cos_min = min(math.cos(math.radians(lat_lo)), math.cos(math.radians(lat_hi)))
    dlon = 1.05 * d_km / (KM_PER_DEG_LAT * cos_min)
    if dlon >= 180.0:
        return lat_lo, lat_hi, None, None
    return lat_lo, lat_hi, lon - dlon, lon + dlon


def geofilt(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    lat: float,
    lon: float,
    d_km: float,
    dist_alias: str = "dist_km",
    dist_decimals: int = 6,
) -> DataFrame:
    """Solr ``{!geofilt pt=lat,lon d=km}``: exact great-circle radius
    filter, annotated with the distance. The bbox pre-filter is a
    strict superset of the circle, so it never changes the result —
    it only keeps the trig off the pruned rows."""
    la, lo = F.col(lat_col), F.col(lon_col)
    dist = F.round(
        haversine_km(la, lo, F.lit(float(lat)), F.lit(float(lon))), dist_decimals
    )
    return (
        df.filter(bbox_predicate(la, lo, lat, lon, d_km))
        .withColumn(dist_alias, dist)
        .filter(F.col(dist_alias) <= d_km)
    )


def geodist_topk(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    lat: float,
    lon: float,
    k: int,
    id_col: str,
    dist_alias: str = "dist_km",
    dist_decimals: int = 6,
) -> DataFrame:
    """Solr ``sort=geodist() asc`` + ``rows=k``: nearest-k by
    great-circle distance, deterministic tie-break on the id."""
    la, lo = F.col(lat_col), F.col(lon_col)
    dist = F.round(
        haversine_km(la, lo, F.lit(float(lat)), F.lit(float(lon))), dist_decimals
    )
    return (
        df.withColumn(dist_alias, dist)
        .orderBy(F.col(dist_alias).asc(), F.col(id_col).asc())
        .limit(k)
    )


def parse_wkt_polygon(wkt: str) -> list[tuple[float, float]]:
    """Parse a WKT ``POLYGON((lon lat, lon lat, ...))`` outer ring into
    (lat, lon) vertex tuples — the literal syntax Solr's RPT spatial
    field accepts in ``{!field f=geo}Intersects(POLYGON((...)))``.
    Only the outer ring is supported (no holes, no MULTIPOLYGON); the
    closing vertex (WKT repeats the first) is dropped."""
    import re as _re

    m = _re.match(r"^\s*POLYGON\s*\(\(\s*(?P<ring>[^)]*?)\s*\)\)\s*$", wkt, _re.I)
    if not m:
        raise ValueError(f"not a WKT POLYGON: {wkt!r}")
    verts: list[tuple[float, float]] = []
    for part in m.group("ring").split(","):
        bits = part.split()
        if len(bits) != 2:
            raise ValueError(f"bad WKT vertex {part!r}")
        lon, lat = float(bits[0]), float(bits[1])
        verts.append((lat, lon))
    if len(verts) >= 2 and verts[0] == verts[-1]:
        verts = verts[:-1]
    if len(verts) < 3:
        raise ValueError("polygon needs at least 3 distinct vertices")
    return verts


def _polygon_edges(vertices: list[tuple[float, float]]):
    n = len(vertices)
    return [(vertices[i], vertices[(i + 1) % n]) for i in range(n)]


def polygon_intersects(
    lat_col: Column, lon_col: Column, vertices: list[tuple[float, float]]
) -> Column:
    """Point-in-polygon as a pure projection: even-odd ray casting
    (count edges whose segment crosses the eastward horizontal ray
    from the point; odd → inside), guarded by the polygon's sargable
    bounding box so the parquet scan prunes on lat/lon min/max before
    any edge arithmetic runs — the same prune-then-exact shape as
    geofilt's bbox+haversine (q47/q47b). Vertices enter as double
    literals and every edge term keeps the identical operand order in
    the SQL twin (:func:`polygon_sql`), so membership is
    engine-portable bit for bit. Horizontal edges are skipped by the
    crossing guard itself ((vlat_i > lat) != (vlat_j > lat) is false),
    matching the classic even-odd algorithm."""
    lat_lo = min(v[0] for v in vertices)
    lat_hi = max(v[0] for v in vertices)
    lon_lo = min(v[1] for v in vertices)
    lon_hi = max(v[1] for v in vertices)
    bbox = lat_col.between(lat_lo, lat_hi) & lon_col.between(lon_lo, lon_hi)
    crossings = None
    for (alat, alon), (blat, blon) in _polygon_edges(vertices):
        guard = (F.lit(alat) > lat_col) != (F.lit(blat) > lat_col)
        xing = lon_col < (
            (F.lit(blon) - F.lit(alon))
            * (lat_col - F.lit(alat))
            / (F.lit(blat) - F.lit(alat))
            + F.lit(alon)
        )
        term = F.when(guard & xing, F.lit(1)).otherwise(F.lit(0))
        crossings = term if crossings is None else crossings + term
    return bbox & (crossings % 2 == 1)


def polygon_sql(lat_expr: str, lon_expr: str, vertices: list[tuple[float, float]]) -> str:
    """The SAME ray-cast as ANSI SQL — identical literals and operand
    order, so the DuckDB oracle replays the exact double arithmetic."""
    lat_lo = min(v[0] for v in vertices)
    lat_hi = max(v[0] for v in vertices)
    lon_lo = min(v[1] for v in vertices)
    lon_hi = max(v[1] for v in vertices)
    terms = []
    for (alat, alon), (blat, blon) in _polygon_edges(vertices):
        terms.append(
            f"(CASE WHEN (({alat!r} > {lat_expr}) <> ({blat!r} > {lat_expr})) "
            f"AND {lon_expr} < ({blon!r} - {alon!r}) * ({lat_expr} - {alat!r}) "
            f"/ ({blat!r} - {alat!r}) + {alon!r} THEN 1 ELSE 0 END)"
        )
    return (
        f"({lat_expr} BETWEEN {lat_lo!r} AND {lat_hi!r} "
        f"AND {lon_expr} BETWEEN {lon_lo!r} AND {lon_hi!r} "
        f"AND (({' + '.join(terms)}) % 2 = 1))"
    )
