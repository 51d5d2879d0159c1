"""10x scale check for the round-6 late query-plan changes (dev tool).

Builds a 1M-turn transcript index (10x the bench's sf0.1) and, for each
query class whose plan the phrase-aggregation (#2b) and hand-rolled
pivot (#2c) rewrites touched, verifies the engine's exact_count against
an INDEPENDENT duckdb regex count over the raw corpus text (words are
single-space-joined "wN" tokens, so whole-token adjacency in the token
stream equals string adjacency), and records warm top-10 latency.

Usage: python scripts/scale_probe_r06.py [n_turns]
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from frankensearch_spark.index import LexicalIndex  # noqa: E402
from frankensearch_spark.session import get_spark  # noqa: E402
from frankensearch_spark.sources.transcripts import synthetic_transcripts  # noqa: E402

# (name, engine query, duckdb predicate over text)
T = "(^| ){}( |$)"
CASES = [
    ("phrase", '"w3 w3"', f"regexp_matches(text, '{T.format('w3 w3')}')"),
    (
        "multi_term_or",
        "w3 w47 w200 w1150",
        f"regexp_matches(text, '{T.format('(w3|w47|w200|w1150)')}')",
    ),
    (
        "boolean_and",
        "w12 AND w47",
        f"regexp_matches(text, '{T.format('w12')}') and "
        f"regexp_matches(text, '{T.format('w47')}')",
    ),
    (
        "boolean_not",
        "w3 -w47",
        f"regexp_matches(text, '{T.format('w3')}') and not "
        f"regexp_matches(text, '{T.format('w47')}')",
    ),
]


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="scale-probe-r06", cores=cpus, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    work = "/tmp/scale_probe_r06"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    out: dict = {"n_turns": n_turns}
    try:
        corpus = synthetic_transcripts(spark, n_turns, partitions=64)
        corpus.select("conv_id", "turn_idx", "text").write.parquet(
            os.path.join(work, "corpus")
        )
        t0 = time.time()
        idx = LexicalIndex.build_transcripts(
            spark, corpus, os.path.join(work, "ix"), num_segments=16, num_buckets=16
        )
        out["build_sec"] = round(time.time() - t0, 1)
        con = duckdb.connect()
        glob_path = os.path.join(work, "corpus", "*.parquet")
        for name, qstr, pred in CASES:
            t0 = time.time()
            got = idx.search(qstr, exact_count=True).total_count
            out[f"{name}_count_sec"] = round(time.time() - t0, 2)
            exp = con.execute(
                f"select count(*) from '{glob_path}' where {pred}"
            ).fetchone()[0]
            out[f"{name}_count"] = int(got)
            out[f"{name}_match"] = bool(got == exp)
            idx.search(qstr, limit=10)  # warm
            t0 = time.time()
            idx.engine._query_cache.clear()
            idx.search(qstr, limit=10)
            out[f"{name}_top10_sec"] = round(time.time() - t0, 3)
        out["ok"] = all(out[f"{n}_match"] for n, _, _ in CASES)
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
