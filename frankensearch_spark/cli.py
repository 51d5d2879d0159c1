"""spark-submit entry points: build / search / maintain from the shell.

Deployment shape per the north rule: every stage runs as a DataFrame +
Arrow-UDF pipeline submitted via ``spark-submit --py-files fs.zip`` (zip
the package: ``cd /root/repo && zip -qr fs.zip frankensearch_spark -i
'*.py'``) with ``scripts/fs_submit.py`` as the primary application file
(spark-submit has no ``-m`` module mode):

    spark-submit --master <cluster> --py-files fs.zip scripts/fs_submit.py \\
        build --input s3://transcripts --index s3://index --segments 4096
    spark-submit ... search --index s3://index --query "error AND handling"
    spark-submit ... bulk-load --input ... --index ... --batches 64
    spark-submit ... compact --index s3://index
    spark-submit ... merge --index s3://index
    spark-submit ... gc --index s3://index

Under spark-submit, ``get_spark`` defers to the submit command's
``--master``/``--conf`` (see ``session._submitted_externally``); locally
the same commands work as ``python -m frankensearch_spark.cli``.
``tests/test_spark_submit.py`` runs the real binary end-to-end.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="frankensearch_spark")
    p.add_argument("--cores", type=int, default=None, help="local[N] cores")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="bulk-build a transcript index")
    b.add_argument("--input", required=True, help="transcript parquet path")
    b.add_argument("--index", required=True, help="index directory")
    b.add_argument("--segments", type=int, default=None)
    b.add_argument("--buckets", type=int, default=16)

    bl = sub.add_parser("bulk-load", help="checkpointed, resumable build")
    bl.add_argument("--input", required=True)
    bl.add_argument("--index", required=True)
    bl.add_argument("--batches", type=int, default=4)
    bl.add_argument("--segments-per-batch", type=int, default=4)

    s = sub.add_parser("search", help="top-k BM25 query")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--limit", type=int, default=10)
    s.add_argument("--offset", type=int, default=0)
    s.add_argument("--count", action="store_true", help="exact match count")
    s.add_argument("--prune", action="store_true", help="block-max pruned plan")
    s.add_argument("--snippets", action="store_true")
    s.add_argument(
        "--hydrate", default=None,
        help="comma-separated stored columns to return with each hit",
    )
    s.add_argument("--grammar", choices=["default", "cass"], default="default")

    for name, _help in (
        ("compact", "fold tombstones into fresh segments"),
        ("merge", "concat-merge planned segment tiers"),
        ("gc", "delete unreferenced segment directories"),
    ):
        m = sub.add_parser(name, help=_help)
        m.add_argument("--index", required=True)

    u = sub.add_parser("upsert", help="upsert a parquet batch of documents")
    u.add_argument("--input", required=True)
    u.add_argument("--index", required=True)

    d = sub.add_parser("delete", help="tombstone docs by id (or a parquet of ids)")
    d.add_argument("--index", required=True)
    d.add_argument("--ids", default=None, help="comma-separated doc_ids")
    d.add_argument("--ids-parquet", default=None, help="parquet with a doc_id column")
    d.add_argument("--all", action="store_true", help="delete every live doc")

    args = p.parse_args(argv)

    from .index import LexicalIndex
    from .session import get_spark

    spark = get_spark(app_name=f"fs-{args.cmd}", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")
    try:
        if args.cmd == "build":
            transcripts = spark.read.parquet(args.input)
            LexicalIndex.build_transcripts(
                spark, transcripts, args.index,
                num_segments=args.segments, num_buckets=args.buckets,
            )
            print(json.dumps({"built": args.index}))
        elif args.cmd == "bulk-load":
            from .operators.bulk import bulk_load
            from .streaming.ingest import transcript_batch_to_docs

            docs = transcript_batch_to_docs(spark.read.parquet(args.input))
            bulk_load(
                spark, docs, args.index,
                n_batches=args.batches,
                segments_per_batch=args.segments_per_batch,
                keyword_fields=("conv_id", "role", "tool"),
                i64_fields=("turn_idx",),
            )
            print(json.dumps({"built": args.index, "batches": args.batches}))
        elif args.cmd == "search":
            index = LexicalIndex(spark, args.index)
            if args.grammar == "cass":
                from .plans.cass import CassQueryParser

                query = CassQueryParser().parse(args.query).query
            else:
                query = args.query
            if args.snippets:
                res = index.search_with_snippets(
                    query, limit=args.limit, offset=args.offset
                )
            else:
                res = index.search(
                    query,
                    limit=args.limit,
                    offset=args.offset,
                    exact_count=args.count,
                    prune=args.prune,
                    hydrate_fields=(
                        [c for c in args.hydrate.split(",") if c]
                        if args.hydrate
                        else None
                    ),
                )
            out = {"hits": res.hits.to_dict(orient="records")}
            if res.total_count is not None:
                out["total_count"] = res.total_count
            print(json.dumps(out, default=str))
        elif args.cmd == "compact":
            mapping = LexicalIndex(spark, args.index).maintenance.compact()
            print(json.dumps({"compacted": mapping}))
        elif args.cmd == "merge":
            maint = LexicalIndex(spark, args.index).maintenance
            merged = [maint.concat_merge(plan) for plan in maint.plan_tier_merge()]
            print(json.dumps({"merged_into": merged}))
        elif args.cmd == "gc":
            removed = LexicalIndex(spark, args.index).maintenance.gc()
            print(json.dumps({"removed": removed}))
        elif args.cmd == "upsert":
            LexicalIndex(spark, args.index).upsert(spark.read.parquet(args.input))
            print(json.dumps({"upserted": args.input}))
        elif args.cmd == "delete":
            index = LexicalIndex(spark, args.index)
            if args.all:
                n = index.delete_all()
            elif args.ids_parquet:
                n = index.delete_frame(spark.read.parquet(args.ids_parquet))
            elif args.ids:
                n = index.delete([i for i in args.ids.split(",") if i])
            else:
                raise SystemExit("delete: pass --ids, --ids-parquet, or --all")
            print(json.dumps({"tombstoned": n}))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
