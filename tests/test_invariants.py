"""Pipeline invariants: payload byte-identity and deterministic output."""

import hashlib

import pytest
from pyspark.sql import functions as F

from tilemaker_spark.config import default_config
from tilemaker_spark.fixtures import make_pages, pages_from_documents
from tilemaker_spark.operators.profile import features_from_pages
from tilemaker_spark.operators.tile_assembly import assemble_tiles
from tilemaker_spark.operators.tiling import ancestor_rollup, cover_explode


def test_text_byte_identity_per_url(spark):
    """The per-row invariant (BASELINE.json input_hint): text passes
    through the profile byte-identical per url."""
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    feats = features_from_pages(pages)  # keeps url, text passthrough
    joined = pages.select("url", F.sha2("text", 256).alias("h_in")).join(
        feats.select("url", F.sha2("text", 256).alias("h_out")), "url")
    n_total = joined.count()
    n_match = joined.filter(F.col("h_in") == F.col("h_out")).count()
    assert n_total == pages.count()
    assert n_match == n_total


def test_extracted_text_byte_identity_per_url(spark):
    """North-rule phrasing verbatim: EXTRACTED text (html binary ->
    extractor, not the stored column) is byte-identical per url."""
    from tilemaker_spark.operators.text_analysis import extract_text_from_html

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    ext = extract_text_from_html(pages)
    n_total = ext.count()
    n_match = ext.filter(F.col("text_extracted") == F.col("text")).count()
    assert n_total == pages.count()
    assert n_match == n_total


def test_extract_text_edge_cases(spark):
    """Extractor semantics on script/style blocks (raw '<' inside),
    inline vs block tags, entity order (&amp; last), and whitespace
    collapse — Spark side; the DuckDB twin is hash-checked by the
    html_extract contract query."""
    from tilemaker_spark.operators.text_analysis import extract_text_from_html

    cases = [
        ('<html><head><script>var x = 1 < 2;</script>'
         '<style>.a{color:red}</style></head>'
         '<body><h1>A</h1><p>b c</p></body></html>', "A b c"),
        ("<p>a</p>\n\n<p>b</p>", "a b"),
        ("plain", "plain"),
        ("<br/>x<b>y</b>z", "x y z"),
        ("&amp;lt;esc&amp;gt; &quot;q&#39;s&quot; &amp; done",
         "&lt;esc&gt; \"q's\" & done"),
        ("  lots\t of\n whitespace  ", "lots of whitespace"),
    ]
    df = spark.createDataFrame(
        [(i, h.encode()) for i, (h, _) in enumerate(cases)],
        "doc_id long, html binary")
    got = {r.doc_id: r.text_extracted
           for r in extract_text_from_html(df).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def _tile_hashes(spark, seed_pages):
    cfg = default_config()
    cfg.basezoom = 11  # pages min_zoom is 10 for the synthetic text length
    feats = features_from_pages(seed_pages).drop("url", "text")
    ft = ancestor_rollup(cover_explode(feats, 11), 0, 11)
    ft = ft.filter(F.col("z") >= F.col("min_zoom"))
    tiles = assemble_tiles(ft, cfg)
    return sorted((r.z, r.x, r.y, hashlib.sha256(bytes(r.tile)).hexdigest())
                  for r in tiles.collect())


def test_tile_bytes_deterministic(spark):
    """Same input -> byte-identical MVT tiles across independent runs
    (gzip mtime pinned, float64 quantization, stable sort keys)."""
    a = _tile_hashes(spark, make_pages(spark, 400))
    b = _tile_hashes(spark, make_pages(spark, 400))
    assert a == b
    assert len(a) > 0


def test_embedding_neardup_nonvacuous(spark):
    """The near-dup oracle row must be structurally non-empty at every
    sf — a 0-row hash match cannot distinguish a broken cosine/bucket
    computation from a correct one (round-2 verdict)."""
    import __spark_entry__ as entry

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        df = entry.queries()["embedding_neardup"](spark, sf_dir)
        assert df.count() > 0, f"vacuous neardup at {sf_dir}"
