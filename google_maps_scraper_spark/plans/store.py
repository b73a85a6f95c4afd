"""Snapshot-store seam: the table-format contract the crawl engine's durable
state sits behind, written so that swapping the parquet delta log for real
Apache Iceberg is configuration, not surgery.

``SnapshotStore`` is the abstract seam — every method's docstring names the
Iceberg API call it corresponds to, and ``tests/test_store_contract.py``
exercises the contract purely through this interface, so an Iceberg-backed
implementation can be dropped in and certified by the SAME suite.
``ParquetDeltaLogStore`` is the shipped implementation over the crawl
engine's workdir layout (``plans/crawl.py`` delta-log protocol:
``round=NNNN/`` dirs + ``manifest.json`` + ``LATEST`` + ``WRITER``).

Reference parity: the reference keeps durable job state behind the
``JobProvider``/``JobRepository`` interfaces (postgres/provider.go:23,
postgres/repository.go) and upgrades the backing store without touching the
runner — this module is the same interface discipline applied to the
snapshot store.

Mapping table (store call → parquet impl → Iceberg API) — the one-page swap
plan lives in COVERAGE.md:

=====================  ==================================  =========================================
SnapshotStore           parquet delta-log impl              Apache Iceberg
=====================  ==================================  =========================================
snapshots()             round=NNNN dirs with manifest.json  Table.snapshots()
current()               LATEST file                         Table.currentSnapshot().snapshotId()
manifest(at)            round=NNNN/manifest.json            Snapshot.summary() + manifest list
read(table, at)         union over the manifest chain       spark.read.option("snapshot-id", id)
totals(at)              manifest["totals"]                  summary "total-records" per table
is_resumable(at)        chain paths all present             snapshot not yet expired
rollback_to(at)         prune newer dirs + rewind LATEST    manageSnapshots().rollbackTo(id)
expire_snapshots(k)     delete unreferenced old round dirs  expireSnapshots().retainLast(k)
rewrite_data_files()    compacted full rewrite, new round   rewriteDataFiles() compaction action
take_over()/fencing     WRITER token + LATEST-regression    optimistic-concurrency commit conflict
=====================  ==================================  =========================================
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from abc import ABC, abstractmethod
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..schemas import FRONTIER_SCHEMA, RESULT_SCHEMA, SEEN_SCHEMA

_TABLE_SCHEMAS = {
    "seen": SEEN_SCHEMA,
    "results": RESULT_SCHEMA,
    "term": FRONTIER_SCHEMA,
    "frontier": FRONTIER_SCHEMA,
}


class SnapshotStore(ABC):
    """Abstract snapshot-store seam (see module docstring for the Iceberg
    mapping).  A snapshot id is the crawl round number that committed it —
    strictly increasing, like Iceberg's sequence numbers."""

    @abstractmethod
    def snapshots(self) -> list[int]:
        """All committed snapshot ids, ascending (≙ ``Table.snapshots()``)."""

    @abstractmethod
    def current(self) -> int | None:
        """The commit point (≙ ``Table.currentSnapshot()``); None if no
        snapshot has ever committed."""

    @abstractmethod
    def manifest(self, at: int) -> dict:
        """The snapshot's manifest: chain, totals, counters, commit_meta
        (≙ ``Snapshot.summary()`` + its manifest list)."""

    @abstractmethod
    def read(self, table: str, at: int | None = None) -> DataFrame:
        """Table contents AS OF snapshot ``at`` (default: current) —
        time-travel read (≙ ``spark.read.option("snapshot-id", id)``).
        ``table`` ∈ {seen, results, term, frontier}."""

    @abstractmethod
    def totals(self, at: int | None = None) -> dict:
        """Running row totals recorded by the snapshot (≙ the summary's
        ``total-records``); exact, maintained by riding Observations."""

    @abstractmethod
    def is_resumable(self, at: int) -> bool:
        """True iff the snapshot is committed and every chain leg it
        references still exists (≙ not expired)."""

    @abstractmethod
    def rollback_to(self, at: int) -> None:
        """Rewind the commit point to an older retained snapshot, discarding
        the now-divergent newer lineage
        (≙ ``table.manageSnapshots().rollbackTo(id)``)."""

    @abstractmethod
    def expire_snapshots(self, keep_last: int) -> list[int]:
        """Drop snapshots outside the keep-last-K window whose data no
        retained chain references; returns the ids dropped
        (≙ ``table.expireSnapshots().retainLast(k)``).  Refuses (raises
        ValueError) if a retained chain still references an expiring dir —
        run ``rewrite_data_files`` first (Iceberg likewise never deletes
        files a retained snapshot references)."""

    @abstractmethod
    def rewrite_data_files(self, expected_token: str | None = None) -> int:
        """Compact every table's chain into a single full rewrite, published
        as a NEW snapshot; returns its id (≙ the ``rewriteDataFiles``
        compaction action, which also commits a new snapshot).  With
        ``expected_token``, the commit is conditional on holding the writer
        lease (≙ Iceberg's optimistic-concurrency commit: conflict →
        ``CommitFailedException``)."""

    @abstractmethod
    def writer_token(self) -> str | None:
        """The active writer lease token, if any."""

    @abstractmethod
    def take_over(self) -> str:
        """Acquire the writer lease with a fresh token, fencing out any
        still-live previous writer (its next conditional commit fails)."""


class ParquetDeltaLogStore(SnapshotStore):
    """The shipped implementation over ``CrawlEngine``'s workdir delta log.

    Pure read/admin layer: the ENGINE is the only appender (its
    ``_write_snapshot_inner`` plays Iceberg's ``newAppend().commit()``);
    this class covers everything an operator or a resuming run does to the
    store between and after crawls.  ``CrawlEngine.resume(from_round=N)``
    delegates its rollback step here so the semantics exist exactly once."""

    def __init__(self, spark: SparkSession, workdir: str | os.PathLike):
        self.spark = spark
        self.workdir = Path(workdir)

    # -- helpers ------------------------------------------------------------

    def _round_dirs(self) -> list[tuple[int, Path]]:
        out = []
        for d in self.workdir.glob("round=*"):
            try:
                out.append((int(d.name.split("=")[1]), d))
            except ValueError:
                continue
        # sort by the PARSED round number: lexicographic glob order breaks
        # the ascending invariant at round 10000 ("round=10000" sorts
        # before "round=9999" — r5 ADVICE, low)
        return sorted(out)

    @staticmethod
    def _round_of(rel_path: str) -> int:
        return int(rel_path.split("/", 1)[0].split("=")[1])

    def _chain_df(self, rel_paths: list[str], schema) -> DataFrame:
        if not rel_paths:
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.schema(schema).parquet(
            str(self.workdir / rel_paths[0])
        )
        for p in rel_paths[1:]:
            df = df.unionByName(
                self.spark.read.schema(schema).parquet(str(self.workdir / p))
            )
        return df

    # -- contract -----------------------------------------------------------

    def snapshots(self) -> list[int]:
        return [r for r, d in self._round_dirs() if (d / "manifest.json").exists()]

    def current(self) -> int | None:
        latest = self.workdir / "LATEST"
        if not latest.exists():
            return None
        return int(latest.read_text().strip())

    def manifest(self, at: int) -> dict:
        p = self.workdir / f"round={at:04d}" / "manifest.json"
        if not p.exists():
            raise ValueError(f"no committed snapshot for round {at}")
        return json.loads(p.read_text())

    def read(self, table: str, at: int | None = None) -> DataFrame:
        if table not in _TABLE_SCHEMAS:
            raise ValueError(f"unknown table {table!r}")
        at = self.current() if at is None else at
        if at is None:
            raise ValueError("store has no committed snapshot")
        m = self.manifest(at)
        if table == "frontier":
            # the live frontier is stored full per snapshot, not chained
            return self.spark.read.schema(FRONTIER_SCHEMA).parquet(
                str(self.workdir / f"round={at:04d}" / "frontier")
            )
        return self._chain_df(m["chain"][table], _TABLE_SCHEMAS[table])

    def totals(self, at: int | None = None) -> dict:
        at = self.current() if at is None else at
        if at is None:
            raise ValueError("store has no committed snapshot")
        return self.manifest(at)["totals"]

    def is_resumable(self, at: int) -> bool:
        try:
            m = self.manifest(at)
        except ValueError:
            return False
        return all(
            (self.workdir / p).exists()
            for paths in m["chain"].values()
            for p in paths
        )

    def rollback_to(self, at: int) -> None:
        latest = self.current()
        if latest is None:
            raise ValueError("store has no committed snapshot")
        if at > latest:
            raise ValueError(
                f"from_round={at} is ahead of the commit point (LATEST={latest})"
            )
        if not (self.workdir / f"round={at:04d}" / "manifest.json").exists():
            raise ValueError(
                f"round {at} has no committed snapshot in {self.workdir} "
                "(pruned by retention, or never durable with "
                "checkpoint_every > 1)"
            )
        # newer rounds are a now-divergent lineage: prune, then rewind LATEST
        # (order matters for kill-safety — a crash between the two leaves
        # LATEST pointing at a pruned dir only if the prune half-finished,
        # and re-running rollback_to is idempotent)
        for r_old, d in self._round_dirs():
            if r_old > at:
                shutil.rmtree(d, ignore_errors=True)
        latest_tmp = self.workdir / ".LATEST.tmp"
        latest_tmp.write_text(str(at))
        os.replace(latest_tmp, self.workdir / "LATEST")

    def expire_snapshots(self, keep_last: int) -> list[int]:
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        committed = self.snapshots()
        retained = committed[-keep_last:]
        cutoff = retained[0] if retained else None
        if cutoff is None:
            return []
        referenced = {
            self._round_of(p)
            for r in retained
            for paths in self.manifest(r)["chain"].values()
            for p in paths
        }
        doomed = [r for r, _ in self._round_dirs() if r < cutoff]
        blocking = sorted(referenced & set(doomed))
        if blocking:
            raise ValueError(
                f"retained snapshots still reference round dirs {blocking}; "
                "run rewrite_data_files() first so the retained chain is "
                "self-contained (Iceberg never expires referenced files)"
            )
        for r, d in self._round_dirs():
            if r < cutoff:
                shutil.rmtree(d, ignore_errors=True)
        return doomed

    def rewrite_data_files(self, expected_token: str | None = None) -> int:
        cur = self.current()
        if cur is None:
            raise ValueError("store has no committed snapshot")
        if expected_token is not None and self.writer_token() != expected_token:
            from .crawl import ConcurrentWriterError

            raise ConcurrentWriterError(
                "writer lease changed under this compaction (WRITER token "
                f"!= {expected_token!r}); refusing to commit"
            )
        m = self.manifest(cur)
        rnd = cur + 1
        rd = self.workdir / f"round={rnd:04d}"
        tmp = self.workdir / f".tmp.round={rnd:04d}"
        # our own tmp dir is always safe to clean; an EXISTING round dir is
        # not — a concurrent writer may have committed round `rnd` since
        # current() was read above, in which case removing it would destroy
        # committed snapshot data while LATEST still points at it (r5
        # ADVICE, medium).  Re-check the lease and LATEST immediately
        # before the destructive step and refuse instead.
        if tmp.exists():
            shutil.rmtree(tmp)
        if rd.exists():
            if expected_token is not None and self.writer_token() != expected_token:
                from .crawl import ConcurrentWriterError

                raise ConcurrentWriterError(
                    "writer lease changed under this compaction; refusing to "
                    f"remove existing {rd.name}"
                )
            committed = self.current()
            if committed is not None and committed >= rnd:
                from .crawl import ConcurrentWriterError

                raise ConcurrentWriterError(
                    f"LATEST={committed} already covers round {rnd}; another "
                    f"writer committed {rd.name} — refusing to remove it"
                )
            shutil.rmtree(rd)
        tmp.mkdir(parents=True)
        chain: dict[str, list[str]] = {}
        for t in ("seen", "results", "term"):
            legs = m["chain"][t]
            if not legs:
                chain[t] = []
                continue
            # admin-path compaction: small fixed writer parallelism is fine
            # (the engine's in-run compaction sizes by state; this runs
            # between crawls)
            self._chain_df(legs, _TABLE_SCHEMAS[t]).coalesce(8).write.mode(
                "overwrite"
            ).parquet(str(tmp / t))
            chain[t] = [f"round={rnd:04d}/{t}"]
        src = self.workdir / f"round={cur:04d}"
        shutil.copytree(src / "frontier", tmp / "frontier")
        if (src / "bloom.bin").exists():
            shutil.copy2(src / "bloom.bin", tmp / "bloom.bin")
        manifest = dict(
            m,
            round=rnd,
            parent_round=cur,
            chain=chain,
            counters={**m.get("counters", {}), "round": rnd},
            commit_meta={
                "actions": {t: "compact" for t in ("seen", "results", "term")},
                "appended": {"seen": 0, "results": 0, "term": {}},
                "chain_len": {t: len(chain[t]) for t in chain},
                "live_rows": m.get("commit_meta", {}).get("live_rows"),
            },
        )
        (tmp / "manifest.json").write_text(json.dumps(manifest, indent=2))
        if expected_token is not None and self.writer_token() != expected_token:
            from .crawl import ConcurrentWriterError

            shutil.rmtree(tmp, ignore_errors=True)
            raise ConcurrentWriterError(
                "writer lease changed while compacting; refusing to commit"
            )
        # LATEST-regression guard, same as the engine's append path
        committed = self.current()
        if committed is not None and committed >= rnd:
            from .crawl import ConcurrentWriterError

            shutil.rmtree(tmp, ignore_errors=True)
            raise ConcurrentWriterError(
                f"LATEST={committed} already covers round {rnd}; another "
                "writer committed a divergent lineage"
            )
        os.replace(tmp, rd)
        latest_tmp = self.workdir / ".LATEST.tmp"
        latest_tmp.write_text(str(rnd))
        os.replace(latest_tmp, self.workdir / "LATEST")
        return rnd

    def writer_token(self) -> str | None:
        marker = self.workdir / "WRITER"
        if not marker.exists():
            return None
        return marker.read_text().strip()

    def take_over(self) -> str:
        token = uuid.uuid4().hex
        tmp = self.workdir / ".WRITER.tmp"
        tmp.write_text(token)
        os.replace(tmp, self.workdir / "WRITER")
        return token
