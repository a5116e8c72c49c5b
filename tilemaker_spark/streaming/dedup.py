"""Continuous-ingestion near-duplicate detection via Structured
Streaming — the production shape of cross-snapshot dedup: a file
source watches for new document parquet, and each micro-batch is
deduped against the ACCUMULATED corpus through the stored LSH band
index (:func:`tilemaker_spark.operators.dedup.incremental_lsh_pairs`),
so per-batch cost is O(batch + band collisions), independent of corpus
size — the corpus is never re-shingled.

State model (the streaming.incremental snapshot pattern): each batch
writes three idempotent per-batch parquet dirs —

* ``{workdir}/bands/batch_{id}``  — the batch's band-index delta,
* ``{workdir}/docs/batch_{id}``   — the batch's docs (verify text),
* ``{workdir}/pairs/batch_{id}``  — verified (new_id, dup_id, jaccard),

then appends the batch id to ``{workdir}/COMMITTED`` atomically
(write-tmp + rename). A crash mid-batch replays the SAME deterministic
writes (overwrite mode) before the pointer moves; a crash AFTER the
pointer moved but before the stream checkpoint committed re-delivers
the batch_id, which the processor detects against COMMITTED and skips
(otherwise the batch would dedup against its own docs). Readers union
only committed batch dirs — exactly-once end to end on top of the
stream's checkpointLocation.

At cluster scale the band dirs are parquet partitioned by (band_id) so
a new batch's band join prunes to colliding partitions; the doc store
is only ever read through a candidate semi-join.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

DOCS_SCHEMA = "doc_id long, text string, lang string"
_BANDS_SCHEMA = "doc_id long, band_id int, band_hash long"


def _ledger(workdir: str) -> dict:
    ptr = os.path.join(workdir, "COMMITTED")
    if not os.path.exists(ptr):
        return {"batches": [], "fingerprints": {}}
    with open(ptr) as f:
        led = json.load(f)
    led.setdefault("fingerprints", {})  # pre-round-5 ledgers
    return led


def _committed(workdir: str) -> list[int]:
    return _ledger(workdir)["batches"]


def _commit(workdir: str, batch_id: int, fingerprint: str) -> None:
    led = _ledger(workdir)
    if batch_id not in led["batches"]:
        led["batches"].append(batch_id)
        led["batches"].sort()
    led["fingerprints"][str(batch_id)] = fingerprint
    ptr = os.path.join(workdir, "COMMITTED")
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        json.dump(led, f)
    os.replace(tmp, ptr)


def _batch_fingerprint(batch_df: DataFrame) -> str:
    """Order-independent content identity of a micro-batch: row count
    plus a commutative crc32 sum over (doc_id, text) — the TEXT itself,
    not its length, so a re-crawl that regenerates same-length records
    under reused doc_ids still reads as new data. Cheap (one
    column-pruned agg) and stable across replays of the same files —
    used to distinguish a TRUE replay of a committed batch_id from a
    checkpoint-wipe id collision (batch ids restart at 0 when the
    stream checkpoint is recreated; skipping a genuinely-new batch on
    the bare id would be silent data loss)."""
    from pyspark.sql import functions as F
    r = batch_df.agg(
        F.count("*").alias("n"),
        F.sum(F.crc32(F.concat_ws(
            ":", F.col("doc_id").cast("string"),
            F.col("text")))).alias("s")).first()
    return f"{r['n']}:{r['s']}"


def _union_committed(spark: SparkSession, workdir: str, sub: str,
                     schema: str) -> DataFrame:
    paths = [os.path.join(workdir, sub, f"batch_{i}")
             for i in _committed(workdir)]
    paths = [p for p in paths if os.path.exists(p)]
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)


def read_dedup_pairs(spark: SparkSession, workdir: str) -> DataFrame:
    """All verified near-dup pairs committed so far:
    (new_id, dup_id, jaccard)."""
    return _union_committed(spark, workdir, "pairs",
                            "new_id long, dup_id long, jaccard double")


def start_streaming_dedup(spark: SparkSession, docs_dir: str, workdir: str,
                          n: int = 2, k: int = 16, rows_per_band: int = 2,
                          threshold: float = 0.35,
                          max_files_per_trigger: int = 1,
                          available_now: bool = True):
    """Start the continuous dedup stream over a docs parquet directory.

    available_now=True drains pending files then stops (the testable
    trigger); False runs per micro-batch indefinitely. Returns the
    StreamingQuery."""
    from tilemaker_spark.operators.dedup import (incremental_lsh_pairs,
                                                 minhash_band_table)

    os.makedirs(workdir, exist_ok=True)
    stream = (spark.readStream.schema(DOCS_SCHEMA)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(docs_dir))

    def process_batch(batch_df: DataFrame, batch_id: int):
        # Replay guard: a crash AFTER _commit but before the stream's
        # own checkpoint commit re-delivers this batch_id; without the
        # guard the batch's own docs would already be in the committed
        # corpus and every doc would match itself (self-pairs at
        # jaccard 1.0), permanently corrupting the pairs delta.
        # The skip requires a FULL match — committed id AND content
        # fingerprint. A committed id with a DIFFERENT fingerprint
        # means the stream checkpoint was wiped/recreated while new
        # files were pending (batch ids restart at 0): processing
        # would overwrite the old batch's delta dirs, skipping would
        # silently drop the new data — so fail fast instead.
        batch_docs = batch_df.select("doc_id", "text")
        if batch_docs.isEmpty():
            return
        fp = _batch_fingerprint(batch_docs)
        led = _ledger(workdir)
        if batch_id in led["batches"]:
            stored = led["fingerprints"].get(str(batch_id))
            if stored is None or stored == fp:
                return  # true replay (or pre-fingerprint ledger)
            raise RuntimeError(
                f"streaming-dedup ledger conflict: batch_id {batch_id} "
                f"is committed with fingerprint {stored} but the stream "
                f"delivered different content ({fp}). The checkpoint at "
                f"{workdir}/checkpoint was likely deleted/recreated with "
                f"input files pending; refusing to skip or overwrite. "
                f"Recover by moving the old workdir aside or restoring "
                f"the checkpoint.")
        corpus_docs = _union_committed(
            spark, workdir, "docs", "doc_id long, text string")
        corpus_bands = _union_committed(
            spark, workdir, "bands", _BANDS_SCHEMA)
        # Band the batch ONCE: write the index delta (partitioned by
        # band_id so corpus-side band joins can prune), read it back,
        # and feed it to the pair search as precomputed new bands.
        bands_path = os.path.join(workdir, "bands", f"batch_{batch_id}")
        minhash_band_table(batch_docs, n=n, k=k,
                           rows_per_band=rows_per_band) \
            .write.mode("overwrite").partitionBy("band_id") \
            .parquet(bands_path)
        new_bands = spark.read.schema(_BANDS_SCHEMA).parquet(bands_path)
        pairs = incremental_lsh_pairs(
            batch_docs, corpus_docs, n=n, k=k,
            rows_per_band=rows_per_band, threshold=threshold,
            corpus_bands=corpus_bands, new_bands=new_bands)
        try:
            pairs.write.mode("overwrite").parquet(
                os.path.join(workdir, "pairs", f"batch_{batch_id}"))
        finally:
            for h in getattr(pairs, "_internal_persists", []):
                h.unpersist()
        batch_docs.write.mode("overwrite").parquet(
            os.path.join(workdir, "docs", f"batch_{batch_id}"))
        _commit(workdir, batch_id, fp)

    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation",
                      os.path.join(workdir, "checkpoint")))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
