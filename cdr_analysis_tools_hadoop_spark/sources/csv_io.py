"""CSV/TSV sources and sinks (reference S1/S2/S6/S7 parity).

Reference parity (SURVEY.md §2.1):
- S1  raw CSV scan, all-string columns, header skip, configurable
      delimiter (reference queries/cdr_and_mapping/create_raw_cdr.sql:1-5
      TEXTFILE + ``skip.header.line.count``, driven by
      Common/hive_create_tables.py:117-124).
- S2  multi-file bulk load (hive_create_tables.py:79-97,131-147 LOAD
      DATA LOCAL INPATH) — in Spark simply a multi-path read; no file
      moves.
- S6  local TSV export (queries/origin_destination/od_to_csv.sql:1-7
      INSERT OVERWRITE LOCAL DIRECTORY ... FIELDS TERMINATED BY tab).
- S7  driver-side CSV report writer (Common/cdr_statistics.py:47-53
      fetchall -> csv.writer) — for SMALL aggregate results only.
"""

from __future__ import annotations

import csv

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


def read_csv_all_string(
    spark: SparkSession,
    paths: str | list[str],
    columns: list[str],
    delimiter: str = ",",
    header: bool = True,
) -> DataFrame:
    """S1/S2: scan one or many CSV files with a fixed all-string schema
    (the reference declares every raw column String — SURVEY.md §1.2;
    typing happens in the projection layer, operators/prepare.py).

    Quote handling is DISABLED to match Hive TEXTFILE /
    LazySimpleSerDe, which splits on the delimiter only: with Spark's
    default '\"' quote a raw line ``1,\"a,b\",2`` would parse as three
    columns where the reference sees four."""
    schema = StructType([StructField(c, StringType()) for c in columns])
    if isinstance(paths, str):
        paths = [paths]
    return (
        spark.read.option("sep", delimiter)
        .option("header", "true" if header else "false")
        .option("quote", "")
        .schema(schema)
        .csv(paths)
    )


def export_tsv(df: DataFrame, path: str, header: bool = False) -> None:
    """S6: distributed TSV export (the reference's OD/GPS result sink;
    od_to_csv.sql:1-7). One file per partition, like Hive's local
    directory insert; coalesce upstream if a single file is wanted.

    Quoting disabled (empty quote + emptyValue): Hive's INSERT
    OVERWRITE LOCAL DIRECTORY never wraps fields, so Spark's default
    quoting of fields containing tab/quote would diverge from the
    reference's byte layout."""
    (
        df.write.mode("overwrite")
        .option("sep", "\t")
        .option("header", "true" if header else "false")
        .option("quote", "")
        .option("emptyValue", "")
        .csv(path)
    )


def report_csv(df: DataFrame, path: str, max_rows: int = 1_000_000) -> int:
    """S7: driver-side report writer for small aggregate outputs.

    Guards against accidental full-fact collects (the reference
    fetches everything through the HiveServer2 cursor; here anything
    above ``max_rows`` is refused — use export_tsv for big results).
    Returns the number of data rows written.
    """
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"report_csv is for small results (> {max_rows} rows); "
            "use export_tsv for distributed export"
        )
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(df.columns)
        for r in rows:
            w.writerow([r[c] for c in df.columns])
    return len(rows)
