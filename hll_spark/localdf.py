"""Arrow-path construction of small driver-local DataFrames.

``SparkSession.createDataFrame(list_of_tuples)`` parallelizes the rows
as pickled Python objects over ``defaultParallelism`` slices; EVERY scan
of the resulting frame then launches that many Python-worker tasks just
to unpickle a handful of rows (r6 measurement: 0.25-0.33 s per scan of
a 32-slice local frame vs 0.04-0.09 s via Arrow — and frames like an LM
vocabulary are scanned by several joins per query). Routing the same
rows through a pandas DataFrame engages the Arrow conversion: the data
crosses into the JVM once as Arrow batches and scans run as plain JVM
tasks with no Python workers (guide §4 — keep the Python boundary out
of hot paths; §6 — Arrow for driver transfers).

Values are unchanged — the declared schema is applied either way — and
any failure of the fast path (exotic row shapes, Arrow disabled AND a
pandas-incompatible payload) falls back to the classic builder.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def fast_local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for list-of-tuples rows,
    via the Arrow/pandas path when possible (see module docstring)."""
    try:
        if isinstance(schema, str):
            from pyspark.sql.types import _parse_datatype_string

            stype = spark._jsparkSession  # probe the classic backend first
            stype = _parse_datatype_string(schema)
        elif isinstance(schema, StructType):
            stype = schema
        else:
            raise TypeError("fast path needs a DDL string or StructType")
        rows = list(rows)
        if rows:
            pdf = pd.DataFrame.from_records(rows, columns=stype.names)
        else:
            pdf = pd.DataFrame(columns=stype.names)
        return spark.createDataFrame(pdf, schema=stype)
    except Exception:
        return spark.createDataFrame(rows, schema)
