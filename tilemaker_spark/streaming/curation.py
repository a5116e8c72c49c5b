"""Continuous web-curation screen via Structured Streaming — the
funnel (`tilemaker_spark.operators.webtext.curation_funnel`) run as a
file-source stream with DECISION-AT-ARRIVAL semantics: every page gets
its reason when its batch arrives, judged against the accumulated
state, and output is append-only.

Stages per batch (same order as the batch funnel):

1. ``blocked``  — stateless rule join;
2. ``stale``    — a snapshot of this url with a GREATER
   (warc_ts, doc_id) exists in committed state or earlier in this
   batch. A later batch's newer snapshot does NOT retract an earlier
   'kept' row — the batch funnel's global-latest view is recovered by
   compacting the output per url (documented divergence; the batch
   operator stays the oracle for the global view);
3. ``dup``      — the extracted text's md5 is in the committed hash
   ledger, or an earlier (lower doc_id) batch survivor has it;
4. ``quality``  — stateless Gopher rule battery;
5. ``kept``.

State model = the streaming.dedup ledger shape: per batch, idempotent
overwrite-mode parquet deltas (``urls/batch_i``: per-url max
(warc_ts, doc_id) among unblocked pages; ``hashes/batch_i``: hashes
first seen by this batch's survivors; ``out/batch_i``: reason rows),
then an atomic COMMITTED append keyed on (batch_id, content
fingerprint) — exactly-once on top of the stream checkpoint, with
checkpoint-wipe id collisions detected and refused.

At crawl scale the url and hash deltas are slim projections (never
page bodies); both unions stay partial-agg reducible, and a compacted
snapshot (groupBy url / h over the committed union) can replace the
delta list whenever it grows long — the streaming.incremental
snapshot-pointer pattern applies verbatim.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tilemaker_spark.streaming.dedup import (_commit, _ledger,
                                             _union_committed)

PAGES_SCHEMA = ("doc_id long, url string, warc_ts timestamp, "
                "html binary")
_URLS_SCHEMA = "url string, max_ts timestamp, max_doc long"
_HASH_SCHEMA = "h string, first_doc long"
OUT_SCHEMA = ("doc_id long, host string, reason string, kept boolean, "
              "batch_id long")


def _page_fingerprint(batch_df: DataFrame) -> str:
    from pyspark.sql import functions as F
    r = batch_df.agg(
        F.count("*").alias("n"),
        F.sum(F.crc32(F.concat_ws(
            ":", F.col("doc_id").cast("string"),
            F.col("url")))).alias("s")).first()
    return f"{r['n']}:{r['s']}"


def read_curation_decisions(spark: SparkSession, workdir: str) -> DataFrame:
    """All committed per-page decisions:
    (doc_id, host, reason, kept, batch_id)."""
    return _union_committed(spark, workdir, "out", OUT_SCHEMA)


def start_streaming_curation(spark: SparkSession, pages_dir: str,
                             workdir: str, rules: DataFrame,
                             max_files_per_trigger: int = 1,
                             available_now: bool = True,
                             **gopher_kwargs):
    """Start the continuous curation stream over a pages parquet
    directory (PAGES_SCHEMA files). Returns the StreamingQuery."""
    from tilemaker_spark.operators.text_analysis import (
        extract_text_from_html, gopher_rules)
    from tilemaker_spark.operators.webtext import filter_blocked_urls

    os.makedirs(workdir, exist_ok=True)
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(pages_dir))

    def process_batch(batch_df: DataFrame, batch_id: int):
        pages = batch_df.select("doc_id", "url", "warc_ts", "html")
        if pages.isEmpty():
            return
        fp = _page_fingerprint(pages)
        led = _ledger(workdir)
        if batch_id in led["batches"]:
            stored = led["fingerprints"].get(str(batch_id))
            if stored is None or stored == fp:
                return
            raise RuntimeError(
                f"streaming-curation ledger conflict: batch_id "
                f"{batch_id} committed with fingerprint {stored}, "
                f"stream delivered {fp}; checkpoint likely recreated "
                f"with files pending — refusing to skip or overwrite.")

        b = filter_blocked_urls(
            pages.select("doc_id", "url", "warc_ts"), rules) \
            .select("doc_id", "url", "warc_ts", "host", "blocked")
        unb = b.filter(~F.col("blocked"))

        # stale: committed state beats, or an earlier-in-batch newer
        # snapshot beats, by (warc_ts, doc_id)
        state_urls = (_union_committed(spark, workdir, "urls",
                                       _URLS_SCHEMA)
                      .groupBy("url")
                      .agg(F.max(F.struct("max_ts", "max_doc"))
                            .alias("m"))
                      .select("url", F.col("m.max_ts").alias("s_ts"),
                              F.col("m.max_doc").alias("s_doc")))
        w = Window.partitionBy("url").orderBy(F.desc("warc_ts"),
                                              F.desc("doc_id"))
        fresh = (unb.withColumn("_rn", F.row_number().over(w))
                 .join(state_urls, "url", "left")
                 .select("doc_id",
                         ((F.col("_rn") > 1) |
                          F.coalesce(
                              F.struct("s_ts", "s_doc") >
                              F.struct(F.col("warc_ts").alias("s_ts"),
                                       F.col("doc_id").alias("s_doc")),
                              F.lit(False))).alias("stale")))

        ext = extract_text_from_html(pages.select("doc_id", "html"))
        hashes = ext.select("doc_id",
                            F.md5("text_extracted").alias("h"))
        g = (gopher_rules(ext.select(
                 "doc_id", F.col("text_extracted").alias("text")),
                 **gopher_kwargs)
             .select("doc_id", F.col("keep").alias("_q_keep")))

        state_h = (_union_committed(spark, workdir, "hashes",
                                    _HASH_SCHEMA)
                   .groupBy("h").agg(F.min("first_doc").alias("s_doc")))
        surv = (hashes
                .join(fresh.filter(~F.col("stale")).select("doc_id"),
                      "doc_id")
                .join(state_h, "h", "left"))
        batch_first = surv.groupBy("h").agg(
            F.min("doc_id").alias("b_doc"))
        dup = (surv.join(batch_first, "h")
               .select("doc_id",
                       (F.col("s_doc").isNotNull() |
                        (F.col("doc_id") != F.col("b_doc")))
                       .alias("is_dup")))

        reason = (F.when(F.col("blocked"), "blocked")
                  .when(F.col("stale"), "stale")
                  .when(F.col("is_dup"), "dup")
                  .when(~F.col("_q_keep"), "quality")
                  .otherwise("kept"))
        out = (b.select("doc_id", "host", "blocked")
               .join(fresh, "doc_id", "left")
               .join(dup, "doc_id", "left")
               .join(g, "doc_id")
               .withColumn("reason", reason)
               .select("doc_id", "host", "reason",
                       (F.col("reason") == "kept").alias("kept"),
                       F.lit(batch_id).cast("long").alias("batch_id")))
        out.write.mode("overwrite").parquet(
            os.path.join(workdir, "out", f"batch_{batch_id}"))

        # state deltas: url watermarks from unblocked pages; hashes
        # first seen by this batch's kept/quality-judged survivors
        (unb.groupBy("url")
            .agg(F.max(F.struct(F.col("warc_ts").alias("max_ts"),
                                F.col("doc_id").alias("max_doc")))
                  .alias("m"))
            .select("url", "m.max_ts", "m.max_doc")
            .write.mode("overwrite")
            .parquet(os.path.join(workdir, "urls", f"batch_{batch_id}")))
        (surv.filter(F.col("s_doc").isNull())
             .groupBy("h").agg(F.min("doc_id").alias("first_doc"))
             .write.mode("overwrite")
             .parquet(os.path.join(workdir, "hashes",
                                   f"batch_{batch_id}")))
        _commit(workdir, batch_id, fp)

    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation",
                      os.path.join(workdir, "checkpoint")))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
