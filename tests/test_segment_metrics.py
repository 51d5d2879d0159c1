"""Per-partition lineage + metrics rollup (north-rule observability).

One row per live segment: manifest lineage (docid range, status,
built_at) joined with metrics derived from the segment's own tables.
Report-time computation only — the build path writes nothing extra."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frankensearch_spark.index import LexicalIndex


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("metrics_index"))
    rows = [
        {"doc_id": f"d{i:04d}", "content": f"alpha beta w{i % 7} tail{i}"}
        for i in range(300)
    ]
    index = LexicalIndex(spark, index_dir).build(
        spark.createDataFrame(rows),
        text_fields=("content",),
        sort_cols=("doc_id",),
        num_segments=3,
        num_buckets=4,
    )
    return index


def test_one_row_per_live_segment_with_lineage(built):
    pdf = built.segment_metrics().toPandas()
    assert sorted(pdf["segment_id"]) == built.engine.live_segments
    assert int(pdf["doc_count"].sum()) == 300
    assert (pdf["status"] == "sealed").all()
    assert (pdf["docid_hi"] > pdf["docid_lo"]).all()
    assert (pdf["built_at"] > 0).all()


def test_metrics_match_independent_table_rollups(built):
    pdf = built.segment_metrics().toPandas().set_index("segment_id")
    postings = built.storage.read("postings")
    expect = (
        postings.groupBy("segment_id")
        .agg(
            F.count(F.lit(1)).alias("blocks"),
            F.sum(F.size("entries")).alias("entries"),
        )
        .toPandas()
        .set_index("segment_id")
    )
    for seg, row in expect.iterrows():
        assert pdf.loc[seg, "posting_blocks"] == row["blocks"]
        assert pdf.loc[seg, "posting_entries"] == row["entries"]
    # every doc contributes its token count exactly once
    assert int(pdf["total_tokens"].sum()) == 300 * 4
    # distinct terms per segment: alpha, beta, 7 w-words, plus uniques
    assert (pdf["terms"] >= 9).all()
    assert (pdf["tombstoned_docs"] == 0).all()


def test_tombstoned_docs_appear_after_delete(built):
    n = built.delete([f"d{i:04d}" for i in range(10)])
    assert n == 10
    pdf = built.reopen().segment_metrics().toPandas()
    assert int(pdf["tombstoned_docs"].sum()) == 10
    # lineage is immutable: manifest doc_count still counts the sealed
    # segment contents; tombstones are the delta until compaction
    assert int(pdf["doc_count"].sum()) == 300
