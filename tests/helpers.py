"""Shared test helpers: payload schema, oracle replay in DuckDB."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def oracle_final_state(changelog_pdf: pd.DataFrame, payload_cols: list[str]) -> pd.DataFrame:
    """Independent replay: per (conv_id, turn_idx) keep the row with max
    sys_change_version; drop if it is a delete. Mirrors the reference's
    golden final-state assertions (StreamRunner.scala:155-161)."""
    con = duckdb.connect()
    con.register("log", changelog_pdf)
    cols = ", ".join(payload_cols)
    out = con.execute(
        f"""
        with ranked as (
          select *, row_number() over (
            partition by conv_id, turn_idx
            order by sys_change_version desc) as rn
          from log)
        select {cols}, sys_change_version
        from ranked where rn = 1 and sys_change_operation <> 'D'
        order by conv_id, turn_idx
        """
    ).fetchdf()
    con.close()
    return out.reset_index(drop=True)


def sorted_pdf(df: DataFrame, cols: list[str]) -> pd.DataFrame:
    return df.select(*cols).orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)


def assert_tables_equal(got: pd.DataFrame, want: pd.DataFrame) -> None:
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )
