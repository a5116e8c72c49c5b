"""Adaptive exact kNN: matches brute force even when the initial cell
ring is too fine for sparse regions."""

import pytest
from pyspark.sql import functions as F

from tilemaker_spark.operators.geocode import derive_lat, derive_lon
from tilemaker_spark.operators.spatial_join import knn_points_exact


def _brute(spark, pts, k):
    a = pts.select(F.col("pid").alias("probe_id"), "lon", "lat")
    b = pts.select(F.col("pid").alias("target_id"),
                   F.col("lon").alias("t_lon"), F.col("lat").alias("t_lat"))
    cand = a.crossJoin(b)
    rlat1 = F.radians("lat")
    rlat2 = F.radians("t_lat")
    aa = (F.pow(F.sin((rlat2 - rlat1) / 2), 2)
          + F.cos(rlat1) * F.cos(rlat2)
          * F.pow(F.sin((F.radians("t_lon") - F.radians("lon")) / 2), 2))
    d = F.lit(2.0 * 6371000.0) * F.asin(F.sqrt(aa))
    from pyspark.sql import Window
    w = Window.partitionBy("probe_id").orderBy(F.col("dist_m"),
                                               F.col("target_id"))
    return (cand.withColumn("dist_m", d)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", "target_id", "rank"))


def test_adaptive_knn_matches_brute_force(spark):
    """World-spread sparse points: z10 cells are far smaller than NN
    distances, so the naive cell join would miss true neighbors; the
    adaptive variant must escalate and still be exact."""
    pts = (spark.range(120).withColumnRenamed("id", "pid")
           .withColumn("lon", derive_lon(F.col("pid")))
           .withColumn("lat", derive_lat(F.col("pid")))
           .filter(F.col("pid") % 5 != 0)  # exclude the dense hot cluster
           .cache())
    probes = pts.select(F.col("pid").alias("probe_id"), "lon", "lat")
    targets = pts.select(F.col("pid").alias("target_id"),
                         F.col("lon").alias("lon"), F.col("lat").alias("lat"))
    got = knn_points_exact(probes, targets, 3, cell_zoom=10)
    exp = _brute(spark, pts, 3)
    g = {(r.probe_id, r.rank): r.target_id for r in got.collect()}
    e = {(r.probe_id, r.rank): r.target_id for r in exp.collect()}
    assert g == e
    assert len(g) == pts.count() * 3


def test_knn_exact_empty_probes(spark):
    """Empty probe set returns an empty, correctly-typed DataFrame
    (regression: round-2 code crashed with IndexError on pieces[0])."""
    pts = (spark.range(20).withColumnRenamed("id", "pid")
           .withColumn("lon", derive_lon(F.col("pid")))
           .withColumn("lat", derive_lat(F.col("pid"))))
    probes = (pts.select(F.col("pid").alias("probe_id"), "lon", "lat")
              .filter(F.lit(False)))
    targets = pts.select(F.col("pid").alias("target_id"), "lon", "lat")
    out = knn_points_exact(probes, targets, 3, cell_zoom=10)
    assert out.columns == ["probe_id", "target_id", "dist_m", "rank"]
    assert out.count() == 0


def test_knn_exact_driver_action_budget(spark, monkeypatch):
    """At most ONE driver action (count) per escalation round during plan
    construction, and no isEmpty calls (round-2 fired 2+ per round)."""
    from pyspark.sql import DataFrame

    calls = {"count": 0, "isEmpty": 0}
    orig_count = DataFrame.count

    def counting_count(self):
        calls["count"] += 1
        return orig_count(self)

    def banned_isempty(self):
        calls["isEmpty"] += 1
        raise AssertionError("isEmpty used in knn_points_exact")

    monkeypatch.setattr(DataFrame, "count", counting_count)
    monkeypatch.setattr(DataFrame, "isEmpty", banned_isempty)

    pts = (spark.range(60).withColumnRenamed("id", "pid")
           .withColumn("lon", derive_lon(F.col("pid")))
           .withColumn("lat", derive_lat(F.col("pid"))))
    probes = pts.select(F.col("pid").alias("probe_id"), "lon", "lat")
    targets = pts.select(F.col("pid").alias("target_id"), "lon", "lat")
    out = knn_points_exact(probes, targets, 3, cell_zoom=10, max_rounds=3)
    assert calls["count"] <= 3  # <= 1 per escalation round
    assert calls["isEmpty"] == 0
    monkeypatch.setattr(DataFrame, "count", orig_count)
    assert out.count() > 0


def test_auto_cell_zoom_exactness(spark):
    """cell_zoom='auto' (density-derived start) must stay exact on the
    mixed world-sparse fixture, matching brute force."""
    pts = (spark.range(120).withColumnRenamed("id", "pid")
           .withColumn("lon", derive_lon(F.col("pid")))
           .withColumn("lat", derive_lat(F.col("pid")))
           .cache())
    probes = pts.select(F.col("pid").alias("probe_id"), "lon", "lat")
    targets = pts.select(F.col("pid").alias("target_id"), "lon", "lat")
    got = knn_points_exact(probes, targets, 3, cell_zoom="auto",
                           max_rounds=5)
    exp = _brute(spark, pts, 3)
    g = {(r.probe_id, r.rank): r.target_id for r in got.collect()}
    e = {(r.probe_id, r.rank): r.target_id for r in exp.collect()}
    assert g == e


def test_antimeridian_neighbors_exact(spark):
    """Probes at lon≈180 with true nearest neighbors across the date
    line: the cell join cannot wrap x, so the guarantee must refuse
    boundary columns and route these probes to the complete round
    (round-3 fix; the old latitude-local guarantee silently returned
    the wrong, same-side neighbor)."""
    rows = [(1, 179.95, 10.0), (2, -179.95, 10.0),   # 11 km apart
            (3, 179.80, 10.0), (4, -179.80, 10.0),
            (5, 170.0, 10.0), (6, -170.0, 10.0)]     # same-side decoys
    pts = spark.createDataFrame(rows, "pid long, lon double, lat double")
    probes = pts.select(F.col("pid").alias("probe_id"), "lon", "lat")
    targets = pts.select(F.col("pid").alias("target_id"), "lon", "lat")
    got = {(r.probe_id, r.rank): r.target_id
           for r in knn_points_exact(probes, targets, 2,
                                     cell_zoom=10).collect()}
    # rank 1 is self (matches the oracle convention); the true
    # cross-line neighbor must win rank 2 over the same-side decoy
    assert got[(1, 2)] == 2   # 11 km across the line, NOT 3 (16 km)
    assert got[(2, 2)] == 1
