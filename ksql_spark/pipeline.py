"""Corpus-pipeline CLI: run the end-to-end shard build (default) or ANY
registry operator, writing the result to files.

Usage:
    python -m ksql_spark.pipeline [--sf-dir DIR] [--out PATH]
        [--format parquet|json|csv] [--op KEY] [--list]

Default --op is llm_pipeline_e2e (quality gate → exact dedup → embedding
join → weighted selection); its manifest (doc_id, n_tokens, quality,
emb_norm) is what a downstream tokenizer/packer consumes. `--list` prints
every runnable key (the SURVEY §2 inventory). The whole job is one Catalyst
plan (no intermediate materialization) — at 100 TB the identical code runs
with the output partitioned by shard (see llm_shard_assign).
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
    ap.add_argument("--op", default="llm_pipeline_e2e",
                    help="registry key to run (see --list)")
    ap.add_argument("--list", action="store_true",
                    help="print all runnable registry keys and exit")
    args = ap.parse_args(argv)

    from ksql_spark.registry import all_specs

    if args.list:
        for name in all_specs():
            print(name)
        return 0
    specs = all_specs()
    if args.op not in specs:
        print(f"unknown op {args.op!r}; --list shows the {len(specs)} keys",
              file=sys.stderr)
        return 2
    spark = get_spark(app_name="ksql-spark-pipeline")
    df = specs[args.op].builder(spark, args.sf_dir)
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
    print(f"{args.op}: {n} rows -> {args.out} ({args.format})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
