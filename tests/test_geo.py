"""Unit tests for Solr spatial (search.geo): haversine correctness,
bbox superset property, geofilt equivalence with and without the
bbox pre-filter, nearest-k determinism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hbase_increment_index_spark.search.geo import (
    bbox_predicate,
    geodist_topk,
    geofilt,
    haversine_km,
)


@pytest.fixture(scope="module")
def pts(spark):
    # deterministic scatter incl. high latitudes (the bbox trap zone)
    rows = [
        (i, ((i * 37) % 17000) / 100.0 - 85.0, ((i * 91) % 36000) / 100.0 - 180.0)
        for i in range(3000)
    ]
    return spark.createDataFrame(rows, "id long, lat double, lon double")


def test_haversine_known_distance(spark):
    # Paris -> London ≈ 344 km (great circle)
    df = spark.range(1).select(
        haversine_km(F.lit(48.8566), F.lit(2.3522), F.lit(51.5074), F.lit(-0.1278)).alias("d")
    )
    assert abs(df.head()["d"] - 343.9) < 1.0


def test_haversine_zero_and_antipode(spark):
    d0 = spark.range(1).select(
        haversine_km(F.lit(10.0), F.lit(20.0), F.lit(10.0), F.lit(20.0)).alias("d")
    ).head()["d"]
    assert d0 == 0.0
    dmax = spark.range(1).select(
        haversine_km(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(180.0)).alias("d")
    ).head()["d"]
    assert abs(dmax - math.pi * 6371.0088) < 0.1


@pytest.mark.parametrize("lat,lon,d", [(40.0, -74.0, 3000.0), (70.0, 10.0, 2000.0), (0.0, 180.0 - 0.5, 500.0)])
def test_bbox_is_superset_of_circle(pts, lat, lon, d):
    # every point inside the exact circle must satisfy the bbox predicate
    la, lo = F.col("lat"), F.col("lon")
    exact = pts.filter(haversine_km(la, lo, F.lit(lat), F.lit(lon)) <= d)
    pruned = exact.filter(~bbox_predicate(la, lo, lat, lon, d))
    assert pruned.count() == 0


def test_bbox_wraps_antimeridian(spark):
    # a point just across the date line is ~67 km away from the center
    # at lon 179.5 — it must survive the bbox despite lon sign flip
    df = spark.createDataFrame([(1, 0.0, -179.9), (2, 0.0, 170.0)], "id long, lat double, lon double")
    got = {r["id"] for r in geofilt(df, "lat", "lon", 0.0, 179.5, 500.0).collect()}
    assert got == {1}


def test_geofilt_matches_unfiltered_haversine(pts):
    la, lo = F.col("lat"), F.col("lon")
    expected = set(
        r["id"]
        for r in pts.filter(
            F.round(haversine_km(la, lo, F.lit(40.0), F.lit(-74.0)), 6) <= 3000.0
        ).collect()
    )
    got = set(r["id"] for r in geofilt(pts, "lat", "lon", 40.0, -74.0, 3000.0).collect())
    assert got == expected and got


def test_geodist_topk_ordered_and_k(pts):
    out = geodist_topk(pts, "lat", "lon", 48.86, 2.35, k=5, id_col="id").collect()
    assert len(out) == 5
    dists = [r["dist_km"] for r in out]
    assert dists == sorted(dists)
