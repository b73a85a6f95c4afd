"""The applyInPandasWithState sessionizer drained over MULTIPLE micro-batches
must reconcile exactly with the batch events_sessionize window dataflow and
with an independent Python replay — state carried across batches, sessions
spanning batch boundaries re-emitted with updated summaries."""

from __future__ import annotations

from collections import defaultdict
from datetime import timezone

import pytest

from google_maps_scraper_spark.operators.analytics import events_sessionize, load
from google_maps_scraper_spark.streaming.stream import (
    _SESSION_GAP_US,
    stream_sessionize_stateful,
)

SF = "/root/testdata/sf0.001"


def _python_sessions(rows):
    """Independent oracle: strict 30-min-gap sessionization per user over
    (ts, event_id)-sorted events -> {(user, idx): (start, end, n)}."""
    by_user = defaultdict(list)
    for r in rows:
        us = int(r["ts"].replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
        by_user[r["user_id"]].append((us, r["event_id"]))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        idx = -1
        start = last = None
        n = 0
        for us, _ in evs:
            if last is None or us - last > _SESSION_GAP_US:
                if idx >= 0:
                    out[(u, idx)] = (start, last, n)
                idx += 1
                start, n = us, 0
            n += 1
            last = us
        out[(u, idx)] = (start, last, n)
    return out


def test_stateful_sessionizer_reconciles_with_batch(spark, tmp_path):
    ev = load(spark, SF, "events").select("event_id", "ts", "user_id")
    rows = ev.collect()
    expect = _python_sessions(rows)

    # three contiguous time slices -> per-user in-order arrival across
    # micro-batches (the operator's documented Kafka-partition contract)
    src = tmp_path / "slices"
    ordered = sorted(rows, key=lambda r: (r["ts"], r["event_id"]))
    k = len(ordered) // 3
    for i, chunk in enumerate(
        (ordered[:k], ordered[k : 2 * k], ordered[2 * k :])
    ):
        spark.createDataFrame(chunk, schema=ev.schema).coalesce(1).write.parquet(
            str(src / f"slice={i}")
        )
    paths = sorted(str(p) for p in src.glob("slice=*/*.parquet"))
    one_dir = tmp_path / "stream_in"
    one_dir.mkdir()
    import shutil

    import os
    import time

    base = time.time() - 1000
    for i, p in enumerate(paths):
        dst = one_dir / f"{i:02d}.parquet"
        shutil.copy(p, dst)
        # FileStreamSource orders batches by mtime: pin slice order explicitly
        os.utime(dst, (base + 100 * i, base + 100 * i))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(one_dir))
    )
    q = (
        stream_sessionize_stateful(stream)
        .writeStream.format("memory")
        .queryName("sess_updates")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    n_batches = len(
        [p for p in q.recentProgress if p["numInputRows"] > 0]
    )
    updates = spark.table("sess_updates").collect()

    # last update per session key wins (n_events is monotone within a key)
    final = {}
    for r in updates:
        key = (r["user_id"], r["session_idx"])
        cur = final.get(key)
        if cur is None or r["n_events"] > cur[2]:
            final[key] = (
                r["session_start_us"],
                r["session_end_us"],
                r["n_events"],
            )
    assert final == expect

    # state persistence genuinely exercised: >1 micro-batch ran, and at
    # least one session was re-emitted (extended across a batch boundary)
    assert n_batches >= 3
    per_key = defaultdict(int)
    for r in updates:
        per_key[(r["user_id"], r["session_idx"])] += 1
    assert any(v > 1 for v in per_key.values()), "no session spanned batches"

    # and the drained stream reconciles with the batch window dataflow
    batch = {
        r["user_id"]: r["n_sessions"]
        for r in events_sessionize(spark, SF).collect()
    }
    stream_sessions = defaultdict(int)
    for u, _ in final:
        stream_sessions[u] += 1
    assert dict(stream_sessions) == batch
