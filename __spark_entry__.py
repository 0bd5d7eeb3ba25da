"""Driver contract for the spark-graft builder (PySpark target).

Delegates to ``arcane_stream_sqlserver_change_tracking_spark.entry_queries``:
one ``queries()`` entry per implemented operator from SURVEY.md §2 (plus
the training-data-pipeline operators), each with a DuckDB-runnable
oracle in ``oracle_sql()``. ``entry`` runs the flagship end-to-end CDC
replay (the actual engine, not a mock) at sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from arcane_stream_sqlserver_change_tracking_spark import entry_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC engine replay of the transcripts changelog
    (bootstrap → micro-batches with pandas-UDF normalization → merge
    commits → read replicated state) on sf0.001."""
    return entry_queries.q_transcripts_cdc_e2e(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.queries()


def oracle_sql() -> dict[str, str]:
    return entry_queries.oracle_sql()
