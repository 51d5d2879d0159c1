"""Driver-literal DataFrames that stay LocalRelations.

``spark.createDataFrame(rows, schema)`` routes tiny driver-side row lists
through ``sc.parallelize`` + ``applySchemaToPythonRDD``: the result is an
RDD-backed plan, so broadcasting it (the query-term frames joined against
postings on every search) schedules a real scan job and a Python->JVM
round-trip per query.  A parameterized ``VALUES`` query instead resolves to
an inline table -> ``LocalRelation``, which the broadcast exchange collects
driver-side without touching the cluster.  Parameter markers (not string
interpolation) carry the values, so arbitrary term bytes are safe.

Only for SMALL frames (query terms, phrase members, block keys): the SQL
text grows with the row count, so callers past ``MAX_VALUES_ROWS`` fall
back to ``createDataFrame``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

#: Above this many rows the VALUES text/parameter overhead stops paying for
#: itself; fall back to the RDD path (distributed anyway at that size).
MAX_VALUES_ROWS = 256


def values_frame(spark: SparkSession, rows: Sequence[tuple], schema: str) -> DataFrame:
    """Build a DataFrame from driver rows as a LocalRelation.

    ``schema`` uses the same DDL shorthand ``createDataFrame`` accepts
    (``"leaf_id int, term string, weight float"``); every column is cast to
    its declared type so float32 weights survive the double-typed parameter
    binding exactly (an f64 that is exactly an f32 casts losslessly).
    """
    cols = [c.strip() for c in schema.split(",")]
    names = [c.split()[0] for c in cols]
    types = [" ".join(c.split()[1:]) for c in cols]
    if not rows or len(rows) > MAX_VALUES_ROWS:
        return spark.createDataFrame(rows, schema)
    args: dict[str, object] = {}
    tuples = []
    for i, row in enumerate(rows):
        ph = []
        for j, v in enumerate(row):
            key = f"p{i}_{j}"
            # numpy scalars -> native python for the parameter codec
            args[key] = v.item() if hasattr(v, "item") else v
            ph.append(f":{key}")
        tuples.append("(" + ", ".join(ph) + ")")
    # casts ride in the SQL text (one py4j round-trip total); the cast
    # Project folds into the LocalRelation (ConvertToLocalRelation)
    proj = ", ".join(
        f"CAST({n} AS {t}) AS {n}" for n, t in zip(names, types)
    )
    sql = (
        f"SELECT {proj} FROM VALUES {', '.join(tuples)} AS t({', '.join(names)})"
    )
    return spark.sql(sql, args=args)
