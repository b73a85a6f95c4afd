"""Result sinks — the ResultWriter surface of the reference.

The reference streams results through pluggable ``ResultWriter``s (csv/json
writers in runner/filerunner/filerunner.go:173-218, postgres batch writer in
postgres/resultwriter.go:34-68, and ``.so`` plugin writers loaded by symbol
in runner/jobs.go:267-303).  Here a writer is any callable
``(results_df, path) -> None``; the registry gives plugins the same
register-by-name surface without dynamic linking.

Built-ins:
  * ``csv``     — the 36-column projection (operators/csv_sink.py);
  * ``json``    — one canonical-JSON entry per line (byte-identical payloads,
                  ≙ the jsonwriter's encoded Entry stream);
  * ``parquet`` — the typed results table as-is (the Iceberg/warehouse path).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["register_writer", "get_writer", "writer_names", "write_results"]

_REGISTRY: dict[str, Callable[[DataFrame, str], None]] = {}


def register_writer(name: str):
    """Decorator: register a result writer under ``name``
    (≙ plugin writers, runner/jobs.go:267-303)."""

    def deco(fn: Callable[[DataFrame, str], None]):
        _REGISTRY[name] = fn
        return fn

    return deco


def get_writer(name: str) -> Callable[[DataFrame, str], None]:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown result writer {name!r}; known: {sorted(_REGISTRY)}"
        ) from None


def writer_names() -> list[str]:
    return sorted(_REGISTRY)


def write_results(results: DataFrame, path: str, fmt: str = "csv") -> None:
    get_writer(fmt)(results, path)


@register_writer("csv")
def _csv_writer(results: DataFrame, path: str) -> None:
    from .csv_sink import write_results_csv

    write_results_csv(results, path)


@register_writer("json")
def _json_writer(results: DataFrame, path: str) -> None:
    """One canonical Entry JSON per line — the payloads are the exact bytes
    of the reference's ``json.Marshal(Entry)`` (jsonwriter parity)."""
    (
        results.filter(F.col("canonical_json").isNotNull())
        .orderBy("input_id", "url")
        .select("canonical_json")
        .write.mode("overwrite")
        .text(path)
    )


@register_writer("parquet")
def _parquet_writer(results: DataFrame, path: str) -> None:
    results.write.mode("overwrite").parquet(path)
