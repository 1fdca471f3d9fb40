"""Corpus-pipeline CLI: run the end-to-end shard build (quality gate → exact
dedup → embedding join → weighted selection; queries/curation.py:
llm_pipeline_e2e) and write the shard manifest.

Usage:
    python -m ksql_spark.pipeline [--sf-dir DIR] [--out PATH]
        [--format parquet|json|csv]

The manifest (doc_id, n_tokens, quality, emb_norm) is what a downstream
tokenizer/packer consumes. The whole pipeline is one Catalyst plan (no
intermediate materialization) — at 100 TB the identical code runs with the
output partitioned by shard (see llm_shard_assign).
"""

from __future__ import annotations

import argparse
import sys

from ksql_spark.session import get_spark
from ksql_spark.tables import default_sf_dir


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf-dir", default=default_sf_dir())
    ap.add_argument("--out", default="/tmp/ksql_spark_shard_manifest")
    ap.add_argument("--format", default="parquet",
                    choices=("parquet", "json", "csv"))
    args = ap.parse_args(argv)

    spark = get_spark(app_name="ksql-spark-pipeline")
    from ksql_spark.registry import all_specs

    df = all_specs()["llm_pipeline_e2e"].builder(spark, args.sf_dir)
    writer = df.write.mode("overwrite").format(args.format)
    if args.format == "csv":
        writer = writer.option("header", "true")
    writer.save(args.out)
    # count from the WRITTEN files (validates the output exists and is
    # readable; re-counting df would re-execute the whole pipeline)
    reader = spark.read.format(args.format)
    if args.format == "csv":
        reader = reader.option("header", "true")
    n = reader.load(args.out).count()
    print(f"shard manifest: {n} docs -> {args.out} ({args.format})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
