"""CSV result sink — the 36-column projection of gmaps/entry.go:235-315.

The reference's csvwriter streams ``CsvHeaders()`` + ``CsvRow()`` per entry
(runner/filerunner/filerunner.go:173-218).  Here the cells are rendered from
the canonical entry JSON by a vectorized pandas UDF (order-preserving parse →
Go-compatible re-serialization, see ``extract.canonical.csv_row_from_canonical``)
and written with Spark's distributed CSV writer, so the sink scales with the
results table instead of a single writer goroutine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..extract.canonical import entry_csv_headers

__all__ = ["results_to_csv_df", "write_results_csv"]


@pandas_udf(T.ArrayType(T.StringType()))
def _csv_cells_udf(canonical_json: pd.Series) -> pd.Series:
    from ..extract.canonical import csv_row_from_canonical

    return canonical_json.map(
        lambda cj: csv_row_from_canonical(cj) if cj else None
    )


def results_to_csv_df(results: DataFrame) -> DataFrame:
    """Project the results table onto the 36 named CSV columns."""
    headers = entry_csv_headers()
    cells = results.filter(F.col("canonical_json").isNotNull()).select(
        F.col("url"),
        _csv_cells_udf("canonical_json").alias("_cells"),
    )
    return cells.select(
        *[F.col("_cells")[i].alias(h) for i, h in enumerate(headers)],
        F.col("url").alias("_sort_url"),
    )


def write_results_csv(results: DataFrame, path: str) -> None:
    """Write the 36-column CSV (header row included, deterministic order)."""
    df = results_to_csv_df(results)
    (
        df.orderBy("input_id", "_sort_url")
        .drop("_sort_url")
        .write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')  # RFC-4180 doubled quotes (Go csv.Writer parity)
        .option("ignoreLeadingWhiteSpace", "false")   # Go csv.Writer writes
        .option("ignoreTrailingWhiteSpace", "false")  # cells verbatim
        .csv(path)
    )
