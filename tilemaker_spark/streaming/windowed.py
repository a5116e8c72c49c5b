"""Watermarked windowed aggregation over the streaming pages feed.

The canonical Structured Streaming pattern the engine's scale contract
calls for (readStream → event-time window + watermark → writeStream):
per-tile page counts per event-time window, with late arrivals beyond
the watermark dropped by Spark's state store rather than by hand-rolled
bookkeeping. No reference analog (the reference is batch-only); this is
the streaming face of the J6 tile-assignment operator.

State sizing at 100 TB: the aggregation state is bounded by
|windows in watermark horizon| x |occupied tiles|, NOT by input rows —
the watermark lets Spark evict finalized windows, so state stays
O(active keys) on an unbounded feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tilemaker_spark.functions.coords import (
    lat2latp_col,
    latp2tiley_col,
    lon2tilex_col,
)
from tilemaker_spark.operators.geocode import derive_lat, derive_lon


def windowed_tile_counts(pages_stream: DataFrame, zoom: int = 8,
                         window: str = "10 minutes",
                         watermark: str = "20 minutes") -> DataFrame:
    """Streaming per-(window, tile) page counts.

    pages_stream: a streaming DataFrame with (doc_id, warc_ts, ...).
    Returns a streaming aggregation keyed on (window, z, x, y) suitable
    for append/update-mode sinks; works identically on a batch frame
    (Spark's unified API), which is how the oracle checks it.
    """
    did = F.col("doc_id")
    geo = (pages_stream
           .withColumn("lon", derive_lon(did))
           .withColumn("lat", derive_lat(did)))
    tiled = (geo
             .withColumn("x", lon2tilex_col(F.col("lon"), zoom))
             .withColumn("y", latp2tiley_col(lat2latp_col(F.col("lat")), zoom)))
    if tiled.isStreaming:
        tiled = tiled.withWatermark("warc_ts", watermark)
    return (tiled
            .groupBy(F.window("warc_ts", window).alias("w"),
                     F.col("x"), F.col("y"))
            .agg(F.count("*").alias("n_pages"),
                 F.min("doc_id").alias("min_doc"))
            .select(F.col("w.start").alias("win_start"),
                    F.lit(zoom).alias("z"), "x", "y", "n_pages", "min_doc"))
