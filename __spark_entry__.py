"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k through the real engine at
sf0.001.  ``queries()`` exposes one entry per implemented operator family
(BM25 search, index structures, training-data ops); ``oracle_sql()`` gives
the DuckDB-equivalent SQL — the BM25 oracles replicate the engine's
float32 scoring bit-exactly via CAST-to-REAL arithmetic (see
``frankensearch_spark/sources/duckdb_oracle.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from frankensearch_spark.index import LexicalIndex  # noqa: E402
from frankensearch_spark.operators import dedup, simsearch, textops  # noqa: E402
from frankensearch_spark.sources import duckdb_oracle as dsql  # noqa: E402

_CACHE_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".entry_cache")
_INDEXES: dict[str, LexicalIndex] = {}

#: probe terms for dictionary queries (all present in the synthetic corpus)
PROBE_TERMS = ["spark", "merge", "sort", "window", "table", "agg", "scan", "query"]
FLAGSHIP_QUERY = "spark merge sort window"


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("text"),
    )


def _index(spark: SparkSession, sf_dir: str) -> LexicalIndex:
    key = os.path.abspath(sf_dir)
    if key in _INDEXES:
        return _INDEXES[key]
    # layout tag: bump when the physical postings layout changes so a
    # cached index is rebuilt in the current layout instead of being read
    # through the legacy-schema branch (gap1 = gap-encoded entry docids)
    index_dir = os.path.join(
        _CACHE_ROOT, os.path.basename(key.rstrip("/")) + "_index_gap1"
    )
    idx = LexicalIndex(spark, index_dir)
    if not idx.engine_exists():
        df = _documents(spark, sf_dir).withColumnRenamed("text", "content")
        idx.build(
            df,
            text_fields=("content",),
            stored_fields=("content",),
            sort_cols=("doc_id",),
            num_segments=4,
            num_buckets=8,
        )
    _INDEXES[key] = idx
    return idx


def _hits_df(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10, offset: int = 0
) -> DataFrame:
    hits = _index(spark, sf_dir).search(query, limit=k, offset=offset).hits
    pdf = hits[["doc_id", "score", "rank"]].copy()
    pdf["rank"] = pdf["rank"].astype("int32")
    return spark.createDataFrame(pdf, schema="doc_id string, score float, rank int")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 through the full engine at sf0.001."""
    return _hits_df(spark, "/root/testdata/sf0.001", FLAGSHIP_QUERY)


# ── engine-side query implementations ───────────────────────────────────────


def _q_bm25_single(spark, sf_dir):
    return _hits_df(spark, sf_dir, "spark")


def _q_bm25_multi(spark, sf_dir):
    return _hits_df(spark, sf_dir, FLAGSHIP_QUERY)


def _q_bm25_and(spark, sf_dir):
    return _hits_df(spark, sf_dir, "spark AND merge")


def _q_bm25_not(spark, sf_dir):
    return _hits_df(spark, sf_dir, "spark -merge")


def _q_bm25_phrase(spark, sf_dir):
    return _hits_df(spark, sf_dir, '"value table"')


def _q_bm25_cass(spark, sf_dir):
    """CASS grammar through the engine: 'spark AND merge OR sort' with
    CASS precedence (OR binds tighter) = spark AND (merge OR sort) — the
    nested eval tree's f32 grouping f32(s_a + f32(s_b + s_c)) differs in
    binary32 rounding from the default grammar's flat left-fold, so the
    oracle checks the precedence-implied grouping, not just the match
    set."""
    from frankensearch_spark.plans.cass import CassQueryParser

    parser = CassQueryParser(
        searchable=("content",), regex_fields=("content",),
        phrase_fields=("content",),
    )
    query = parser.parse("spark AND merge OR sort").query
    hits = _index(spark, sf_dir).search(query, limit=10).hits
    pdf = hits[["doc_id", "score", "rank"]].copy()
    pdf["rank"] = pdf["rank"].astype("int32")
    return spark.createDataFrame(pdf, schema="doc_id string, score float, rank int")


def _q_bm25_glob_mix(spark, sf_dir):
    """Glob + term union: glob leaves are ConstScorers (1.0f), f32-summed
    with the term's BM25 score in parse order (glob clause first)."""
    return _hits_df(spark, sf_dir, "mer* spark")


def _q_bm25_pruned(spark, sf_dir):
    """The flagship disjunction through the FORCED pruned plan (MaxScore
    split + BMW block filter): the rank-safety contract says it must be
    hash-exact against the same independent SQL oracle as the exhaustive
    plan — an external check, not just the internal differential."""
    hits = _index(spark, sf_dir).search(FLAGSHIP_QUERY, limit=10, prune=True).hits
    pdf = hits[["doc_id", "score", "rank"]].copy()
    pdf["rank"] = pdf["rank"].astype("int32")
    return spark.createDataFrame(pdf, schema="doc_id string, score float, rank int")


def _q_bm25_range(spark, sf_dir):
    """Range leaf through the full parser+engine: KEYWORD range over the
    primary key (string compare), MUST-combined with a scored term —
    score = f32(bm25(spark) + 1.0f const)."""
    return _hits_df(spark, sf_dir, "spark AND id:[100 TO 299]")


def _q_bm25_set(spark, sf_dir):
    """Set leaf (``id:IN [...]``) through the full parser+engine."""
    return _hits_df(spark, sf_dir, "spark AND id:IN [101 202 303 404]")


def _q_bm25_count(spark, sf_dir):
    res = _index(spark, sf_dir).search("spark merge", limit=1, exact_count=True)
    return spark.createDataFrame([(int(res.total_count),)], "n_matches bigint")


def _q_bm25_offset(spark, sf_dir):
    """Pagination: page 2 (offset 10) of the flagship query, page-local rank."""
    return _hits_df(spark, sf_dir, FLAGSHIP_QUERY, k=10, offset=10)


def _q_bm25_hydrated(spark, sf_dir):
    """Stored-field hydration: winners carry the stored content column."""
    hits = (
        _index(spark, sf_dir)
        .search("spark", limit=10, hydrate_fields=["content"])
        .hits[["doc_id", "score", "rank", "content"]]
        .copy()
    )
    hits["rank"] = hits["rank"].astype("int32")
    return spark.createDataFrame(
        hits, schema="doc_id string, score float, rank int, content string"
    )


def _q_docid_assignment(spark, sf_dir):
    storage = _index(spark, sf_dir).storage
    return storage.read("docs").select(
        F.col("docid").cast("long").alias("docid"), "doc_id"
    )


def _q_doclens(spark, sf_dir):
    storage = _index(spark, sf_dir).storage
    doclens = storage.read("doclens")
    docs = storage.read("docs").select("docid", "doc_id")
    return doclens.join(docs, "docid").select(
        "doc_id",
        F.col("len_content").cast("int").alias("doclen"),
        F.col("fnid_content").cast("int").alias("fnid"),
    )


def _q_term_dictionary(spark, sf_dir):
    # dictionary rows are per-segment; snapshot df/cf = sum over segments
    storage = _index(spark, sf_dir).storage
    return (
        storage.read("terms")
        .where(F.col("term").isin(PROBE_TERMS))
        .groupBy("term")
        .agg(
            F.sum("df").cast("long").alias("df"),
            F.sum("cf").cast("long").alias("cf"),
        )
    )


def _q_top_terms(spark, sf_dir):
    storage = _index(spark, sf_dir).storage
    return (
        storage.read("terms")
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(20)
    )


def _q_field_stats(spark, sf_dir):
    storage = _index(spark, sf_dir).storage
    return (
        storage.read("field_stats")
        .groupBy("field")
        .agg(
            F.sum("doc_count").cast("long").alias("doc_count"),
            F.sum("total_tokens").cast("long").alias("total_tokens"),
        )
    )


def _q_index_metrics(spark, sf_dir):
    """Per-partition lineage + metrics rollup (segment_metrics), reduced to
    its segment-independent sums so an engine-blind oracle can check it:
    every doc lives in exactly one segment, so summed doc/token/posting
    counts must equal the corpus-level quantities."""
    m = _index(spark, sf_dir).segment_metrics()
    return m.agg(
        F.sum("doc_count").cast("long").alias("n_docs"),
        F.sum("total_tokens").cast("long").alias("total_tokens"),
        F.sum("posting_entries").cast("long").alias("posting_entries"),
        F.sum("tombstoned_docs").cast("long").alias("tombstoned_docs"),
    )


def _q_dedup_exact(spark, sf_dir):
    return textops.dedup_exact(_documents(spark, sf_dir))


def _q_token_counts(spark, sf_dir):
    return textops.token_counts(_documents(spark, sf_dir))


def _q_langid(spark, sf_dir):
    return textops.langid_stopword(_documents(spark, sf_dir))


def _q_quality(spark, sf_dir):
    return textops.quality_signals(_documents(spark, sf_dir))


def _q_fingerprint(spark, sf_dir):
    return textops.doc_fingerprint(_documents(spark, sf_dir))


def _query_vec(sf_dir: str) -> list[float]:
    import duckdb

    path = os.path.join(sf_dir, "embeddings.parquet")
    row = duckdb.sql(f"SELECT embedding FROM '{path}' WHERE vec_id = 0").fetchone()
    return [float(v) for v in row[0]]


def _q_embedding_cosine(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return simsearch.cosine_topk(emb, _query_vec(sf_dir), k=10)


def _q_dedup_minhash(spark, sf_dir):
    return dedup.minhash_lsh_pairs(_documents(spark, sf_dir), threshold=0.2)


def _q_dedup_simhash(spark, sf_dir):
    return dedup.simhash(_documents(spark, sf_dir))


def _q_dedup_ngram(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_documents(spark, sf_dir), threshold=0.2)


def _q_embedding_near_dup(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return dedup.embedding_near_dup_pairs(emb, threshold=0.3, n_bands=2, n_rows=2)


def _q_embedding_lsh_topk(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return dedup.cosine_topk_lsh(emb, _query_vec(sf_dir), k=10, n_planes=4)


def _q_multimodal_meta(spark, sf_dir):
    """Binary media plumbing (deterministic FAKE container; rows-only check)."""
    from frankensearch_spark.operators import multimodal

    docs = _documents(spark, sf_dir)
    media = multimodal.attach_fake_media(docs)
    return multimodal.decode_media_meta(media)


def _q_events_rollup(spark, sf_dir):
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return textops.events_hourly_rollup(events)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_top10_single_term": _q_bm25_single,
        "bm25_top10_multi_term": _q_bm25_multi,
        "bm25_top10_boolean_and": _q_bm25_and,
        "bm25_top10_boolean_not": _q_bm25_not,
        "bm25_top10_phrase": _q_bm25_phrase,
        "bm25_top10_cass_nested": _q_bm25_cass,
        "bm25_top10_glob_mix": _q_bm25_glob_mix,
        "bm25_top10_pruned": _q_bm25_pruned,
        "bm25_top10_range_filter": _q_bm25_range,
        "bm25_top10_set_filter": _q_bm25_set,
        "bm25_match_count": _q_bm25_count,
        "bm25_top10_offset": _q_bm25_offset,
        "bm25_top10_hydrated": _q_bm25_hydrated,
        "docid_assignment": _q_docid_assignment,
        "doclens_fieldnorms": _q_doclens,
        "term_dictionary": _q_term_dictionary,
        "top_terms_by_df": _q_top_terms,
        "field_stats": _q_field_stats,
        "index_metrics_rollup": _q_index_metrics,
        "dedup_exact": _q_dedup_exact,
        "token_counts": _q_token_counts,
        "langid_stopword": _q_langid,
        "quality_signals": _q_quality,
        "doc_fingerprint": _q_fingerprint,
        "embedding_cosine_top10": _q_embedding_cosine,
        "dedup_minhash_lsh": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_ngram_jaccard": _q_dedup_ngram,
        "embedding_near_dup": _q_embedding_near_dup,
        "embedding_lsh_top10": _q_embedding_lsh_topk,
        "multimodal_decode_meta": _q_multimodal_meta,
        "events_hourly_rollup": _q_events_rollup,
    }


def oracle_sql() -> dict[str, str]:
    out = {
        "bm25_top10_single_term": dsql.bm25_topk_sql(should=["spark"]),
        "bm25_top10_multi_term": dsql.bm25_topk_sql(
            should=["spark", "merge", "sort", "window"]
        ),
        "bm25_top10_boolean_and": dsql.bm25_topk_sql(should=[], must=["spark", "merge"]),
        "bm25_top10_boolean_not": dsql.bm25_topk_sql(
            should=["spark"], must_not=["merge"]
        ),
        "bm25_top10_phrase": dsql.bm25_phrase_sql(["value", "table"]),
        "bm25_top10_cass_nested": dsql.bm25_cass_nested_sql(
            "spark", "merge", "sort"
        ),
        "bm25_top10_glob_mix": dsql.bm25_glob_mix_sql("mer", "spark"),
        "bm25_top10_pruned": dsql.bm25_topk_sql(
            should=["spark", "merge", "sort", "window"]
        ),
        "bm25_top10_range_filter": dsql.bm25_range_filter_sql("spark", "100", "299"),
        "bm25_top10_set_filter": dsql.bm25_set_filter_sql(
            "spark", ["101", "202", "303", "404"]
        ),
        "bm25_match_count": dsql.bm25_count_sql(["spark", "merge"]),
        "bm25_top10_offset": dsql.bm25_topk_sql(
            should=["spark", "merge", "sort", "window"], k=10, offset=10
        ),
        "bm25_top10_hydrated": dsql.bm25_topk_sql(
            should=["spark"], k=10, hydrate_content=True
        ),
        "docid_assignment": dsql.docid_assignment_sql(),
        "doclens_fieldnorms": dsql.doclens_fieldnorms_sql(),
        "term_dictionary": dsql.term_dictionary_sql(PROBE_TERMS),
        "top_terms_by_df": dsql.top_terms_sql(20),
        "field_stats": dsql.field_stats_sql(),
        "index_metrics_rollup": dsql.index_metrics_rollup_sql(),
        "dedup_exact": dsql.dedup_exact_sql(),
        "token_counts": dsql.token_counts_sql(),
        "langid_stopword": dsql.langid_stopword_sql(textops.EN_STOPWORDS),
        "quality_signals": dsql.quality_signals_sql(),
        "doc_fingerprint": dsql.doc_fingerprint_sql(),
        "dedup_minhash_lsh": dsql.minhash_lsh_pairs_sql(0.2),
        "dedup_simhash": dsql.simhash_sql(),
        "dedup_ngram_jaccard": dsql.ngram_jaccard_pairs_sql(0.2),
        "embedding_near_dup": dsql.embedding_near_dup_sql(0.3, n_bands=2, n_rows=2),
        "events_hourly_rollup": dsql.events_hourly_rollup_sql(),
    }
    try:
        qv = _query_vec("/root/testdata/sf0.01")
        out["embedding_cosine_top10"] = dsql.embedding_cosine_topk_sql(qv)
        out["embedding_lsh_top10"] = dsql.embedding_cosine_lsh_topk_sql(
            qv, 10, n_planes=4
        )
    except Exception:
        pass  # embeddings unavailable -> rows-only check for these queries
    try:
        out["multimodal_decode_meta"] = _multimodal_meta_oracle_sql(
            "/root/testdata/sf0.01"
        )
    except Exception:
        pass  # documents unavailable -> rows-only check
    return out


def _multimodal_meta_oracle_sql(sf_dir: str) -> str:
    """DuckDB oracle for the media decode stage.

    The FAKE-container dims are a pure function of doc_id
    (blake2b-derived, ``multimodal.media_dims_for_id``), which SQL cannot
    express — so the oracle reads a parquet of expected rows precomputed
    WITHOUT Spark (pure-python hashlib over the corpus doc_ids) and
    materialized under the repo.  The Spark query must reproduce it via
    the real attach -> binary column -> mapInPandas decode pipeline.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from frankensearch_spark.operators.multimodal import expected_media_meta

    src = os.path.join(sf_dir, "documents.parquet")
    doc_ids = [str(v) for v in pq.read_table(src, columns=["doc_id"])["doc_id"].to_pylist()]
    rows = expected_media_meta(doc_ids)
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".oracle_cache")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, "multimodal_meta_sf001.parquet")
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "width": pa.array([r[1] for r in rows], pa.int32()),
            "height": pa.array([r[2] for r in rows], pa.int32()),
            "channels": pa.array([r[3] for r in rows], pa.int32()),
            "n_bytes": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, path)
    return (
        "SELECT doc_id, width, height, channels, n_bytes "
        f"FROM read_parquet('{path}')"
    )
