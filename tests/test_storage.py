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
