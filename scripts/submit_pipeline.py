"""spark-submit entry point for the pages -> tiles pipeline.

Usage (the north-rule submission mode):

    PYSPARK_PYTHON=python spark-submit \
        --master local[32] \
        --py-files /tmp/tilemaker_spark.zip \
        scripts/submit_pipeline.py \
        --input /root/testdata/sf0.01 --workdir /tmp/tiles_run \
        [--pages N] [--mbtiles out.mbtiles] [--pmtiles out.pmtiles]

Build the --py-files zip with:

    python -c "import shutil; shutil.make_archive(
        '/tmp/tilemaker_spark', 'zip', root_dir='.',
        base_dir='tilemaker_spark')"

(When run via plain `python`, the script self-ships the package with
addPyFile — same effect, used by tests and bench.)

The job is checkpoint-resumable: re-submitting with the same --workdir
resumes from the last completed stage (parquet _SUCCESS markers), and
per-partition lineage + tiles/sec metrics land in
{workdir}/metrics.json + {workdir}/*.lineage.json.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.01",
                    help="sf dir with documents.parquet (pages source)")
    ap.add_argument("--pages", type=int, default=0,
                    help="if > 0, generate a synthetic pages table of this "
                         "size instead of reading documents.parquet")
    ap.add_argument("--workdir", default="/tmp/tilemaker_spark_submit")
    ap.add_argument("--mbtiles", default=None)
    ap.add_argument("--pmtiles", default=None)
    ap.add_argument("--force", action="store_true",
                    help="ignore existing checkpoints")
    args = ap.parse_args()

    try:
        import tilemaker_spark  # noqa: F401  (shipped via --py-files?)
        from tilemaker_spark.session import get_spark
        spark = get_spark("tilemaker-submit")
    except ImportError:
        # plain python launch from repo root
        sys.path.insert(0, ".")
        from tilemaker_spark.session import get_spark
        spark = get_spark("tilemaker-submit")

    from tilemaker_spark import sinks
    from tilemaker_spark.config import default_config
    from tilemaker_spark.fixtures import make_pages, pages_from_documents
    from tilemaker_spark.operators.profile import features_from_pages
    from tilemaker_spark.plans.pipeline import TilePipeline

    cfg = default_config()
    if args.pages > 0:
        pages = make_pages(spark, args.pages)
    else:
        pages = pages_from_documents(spark, args.input)

    pipe = TilePipeline(spark, cfg, workdir=args.workdir)
    tiles = pipe.run(pages, force=args.force)

    md = sinks.tileset_metadata(
        cfg, sinks.discover_layer_attrs(features_from_pages(pages)))
    if args.mbtiles:
        n = sinks.write_mbtiles(tiles, args.mbtiles, md)
        print(f"mbtiles: {args.mbtiles} ({n} tiles)")
    if args.pmtiles:
        n = sinks.write_pmtiles(tiles, args.pmtiles, md)
        print(f"pmtiles: {args.pmtiles} ({n} tiles)")

    print(json.dumps(pipe.metrics))


if __name__ == "__main__":
    main()
