"""The crawl engine: driver-coordinated BFS rounds over DataFrames.

Round shape (≙ the reference's scrapemate loop, re-expressed as dataflow):

    claim      — window-rank round selection per politeness bucket
                 (≙ ``ORDER BY priority ASC, created_at ASC ... LIMIT``
                 claim of postgres/provider.go:148-244, plus the per-host
                 politeness budget the north_rule adds);
    fetch      — equi-join frontier×pages on url (replaces the live fetch,
                 gmaps/job.go:189-261);
    process    — branch by job kind, vectorized extraction UDFs;
    admit      — first-wins dedup of SERP-discovered hrefs: window rank on
                 (parent created_path, pos) then left-anti join against the
                 seen table (≙ deduper.AddIfNotExists under sequential DOM
                 iteration, gmaps/job.go:159-176 + deduper/hashmap.go:16-35);
    commit     — union results/children, flip statuses, checkpoint parquet
                 tables + a JSON manifest (resume ≙ the DB modes' natural
                 resumability, postgres/provider.go:17-21).

Termination: fixpoint — no ``new`` frontier rows (≙ exiter's
seedCompleted>=seedCount && placesCompleted>=placesFound,
exiter/exiter.go:49-93; with stored pages, queue-empty is equivalent).

Scale notes (100 TB design):
  * every window is partitioned (politeness bucket / url hash) — no global
    windows, no driver-side collects of data rows (only counters);
  * the pages join uses a broadcast of the claimed round when it is small,
    else a shuffle hash join; AQE handles skew splits;
  * host skew is killed by salting the politeness bucket: bucket =
    (host, xxhash64(url) % salts); per-salt budgets sum to the host budget;
  * the html column is only referenced inside the fetch-extract stage, so
    Parquet/Iceberg column pruning keeps it out of every other scan;
  * per-round checkpointing truncates lineage and gives kill-resume.
"""

from __future__ import annotations

import json
import pathlib
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.extractors import (
    emails_udf,
    entry_extract_udf,
    finalize_email_entry_udf,
    serp_links_udf,
    url_host_udf,
)
from ..schemas import (
    FRONTIER_SCHEMA,
    KIND_EMAIL,
    KIND_PLACE,
    KIND_SEARCH,
    PENDING_ENTRY_SCHEMA,
    PRIORITY_HIGH,
    PRIORITY_LOW,
    PRIORITY_MEDIUM,
    RESULT_SCHEMA,
    SEEN_SCHEMA,
    STATUS_DONE,
    STATUS_FAILED,
    STATUS_NEW,
)

__all__ = ["CrawlConfig", "CrawlEngine"]

_RESULT_COLS = [f.name for f in RESULT_SCHEMA.fields]


@dataclass
class CrawlConfig:
    extract_email: bool = False
    max_depth: int = 10                  # ≙ -depth default, runner/runner.go:111
    max_rounds: int = 64
    now_micros: int = 1786838400000000   # pinned clock (determinism)
    host_budget: int | None = None       # per-eTLD+1 per-round claim budget
    politeness_salts: int = 4            # salt shards per host bucket
    lang: str = "en"
    robots: list[tuple[str, str]] = field(default_factory=list)
    # (host, path_prefix) deny rules; engine-new (north_rule), absent in ref.


def _jid(*cols):
    return F.sha2(F.concat_ws("\x1f", *cols), 256).substr(1, 32)


class CrawlEngine:
    """Iterative crawl over a pages DataFrame with parquet-backed state."""

    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        workdir: str,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.pages = pages
        self.workdir = pathlib.Path(workdir)
        self.cfg = config or CrawlConfig()
        self.round = 0
        self._frontier: DataFrame | None = None
        self._seen: DataFrame | None = None
        self._results: DataFrame | None = None
        self._pending: DataFrame | None = None

    # ---------------- seeding -------------------------------------------------

    def seed_from_queries(self, queries: list[tuple[str, str]]) -> None:
        """queries: ordered (query_text, custom_id).  Builds the search-URL
        frontier (≙ CreateSeedJobs, runner/jobs.go:21-133 + NewGmapJob,
        gmaps/job.go:34-84)."""
        from ..extract.urls import build_search_url

        import hashlib

        rows = []
        for i, (query, custom_id) in enumerate(queries):
            url = build_search_url(query)
            seed_id = custom_id or f"seed-{i}"
            path = f"{i:09d}"
            jid = hashlib.sha256(
                "\x1f".join((KIND_SEARCH, url, path)).encode()
            ).hexdigest()[:32]
            rows.append((
                jid, None, seed_id, KIND_SEARCH, url, 0, None, None,
                PRIORITY_LOW, path, 0, self.cfg.max_depth, 0, 3,
                STATUS_NEW, None, self.cfg.extract_email, self.cfg.lang,
            ))
        df = self.spark.createDataFrame(rows, FRONTIER_SCHEMA)
        self._frontier = self._stamp_url_cols(df)
        self._seen = self.spark.createDataFrame([], SEEN_SCHEMA)
        self._results = self.spark.createDataFrame([], RESULT_SCHEMA)
        self._pending = self.spark.createDataFrame([], PENDING_ENTRY_SCHEMA)
        self.round = 0
        if self.workdir.exists():
            shutil.rmtree(self.workdir)
        self._checkpoint()

    def seed_from_grid(
        self, queries: list[tuple[str, str]], bbox_str: str, cell_km: float, zoom: int
    ) -> None:
        """Grid mode (≙ CreateGridSeedJobs, runner/jobs.go:141-214): the
        queries×cells cross product, one search job per pair."""
        from ..extract.geo import cell_geo_coordinates, generate_cells, parse_bounding_box
        from ..extract.urls import build_search_url

        bbox = parse_bounding_box(bbox_str)
        cells = generate_cells(bbox, cell_km)
        expanded: list[tuple[str, str]] = []
        for qi, (query, custom_id) in enumerate(queries):
            for ci, (lat, lon) in enumerate(cells):
                cell_id = f"{custom_id or f'q{qi}'}-cell{ci:05d}"
                geo = cell_geo_coordinates(lat, lon)
                expanded.append((build_search_url(query, geo, zoom), cell_id))
        self.seed_from_queries(expanded)

    # ---------------- state helpers ------------------------------------------

    def _stamp_url_cols(self, df: DataFrame) -> DataFrame:
        return (
            df.withColumn("url_hash", F.xxhash64("url"))
            .withColumn("host", url_host_udf("url"))
            .withColumn(
                "politeness_bucket",
                F.pmod(F.xxhash64("url"), F.lit(self.cfg.politeness_salts)).cast("int"),
            )
        )

    def _checkpoint(self) -> None:
        rd = self.workdir / f"round={self.round:04d}"
        for name, df in (
            ("frontier", self._frontier),
            ("seen", self._seen),
            ("results", self._results),
            ("pending", self._pending),
        ):
            df.write.mode("overwrite").parquet(str(rd / name))
        counters = self.counters()
        manifest = {
            "round": self.round,
            "counters": counters,
            "tables": {n: str(rd / n) for n in ("frontier", "seen", "results", "pending")},
        }
        (rd / "manifest.json").write_text(json.dumps(manifest, indent=2))
        (self.workdir / "LATEST").write_text(str(self.round))
        # re-read: truncates lineage, makes state immutable on disk
        self._frontier = self.spark.read.schema(FRONTIER_SCHEMA).parquet(str(rd / "frontier"))
        self._seen = self.spark.read.schema(SEEN_SCHEMA).parquet(str(rd / "seen"))
        self._results = self.spark.read.schema(RESULT_SCHEMA).parquet(str(rd / "results"))
        self._pending = self.spark.read.schema(PENDING_ENTRY_SCHEMA).parquet(str(rd / "pending"))

    @classmethod
    def resume(
        cls,
        spark: SparkSession,
        pages: DataFrame,
        workdir: str,
        config: CrawlConfig | None = None,
    ) -> "CrawlEngine":
        """Resume from the latest committed round manifest (kill-safe: a
        partially written round directory is ignored until LATEST points at
        it, and LATEST is written last)."""
        eng = cls(spark, pages, workdir, config)
        latest = int((eng.workdir / "LATEST").read_text().strip())
        rd = eng.workdir / f"round={latest:04d}"
        manifest = json.loads((rd / "manifest.json").read_text())
        eng.round = manifest["round"]
        eng._frontier = spark.read.schema(FRONTIER_SCHEMA).parquet(str(rd / "frontier"))
        eng._seen = spark.read.schema(SEEN_SCHEMA).parquet(str(rd / "seen"))
        eng._results = spark.read.schema(RESULT_SCHEMA).parquet(str(rd / "results"))
        eng._pending = spark.read.schema(PENDING_ENTRY_SCHEMA).parquet(str(rd / "pending"))
        return eng

    # ---------------- round ---------------------------------------------------

    def _claim(self) -> tuple[DataFrame, DataFrame]:
        """Select this round's jobs.  Returns (claimed, skipped_robots)."""
        new = self._frontier.filter(F.col("status") == STATUS_NEW)

        # robots gating (engine-new): deny rows whose (host, path prefix) hits
        # a disallow rule; denied jobs fail terminally.
        if self.cfg.robots:
            robots_df = self.spark.createDataFrame(
                self.cfg.robots, "host string, path_prefix string"
            ).withColumnRenamed("host", "r_host")
            path = F.regexp_replace(F.col("url"), r"^https?://[^/]+", "")
            new = new.withColumn("_path", path)
            joined = new.join(
                F.broadcast(robots_df),
                (F.col("host") == F.col("r_host"))
                & F.col("_path").startswith(F.col("path_prefix")),
                "left",
            )
            denied = joined.filter(F.col("r_host").isNotNull()).drop(
                "r_host", "path_prefix", "_path"
            ).dropDuplicates(["job_id"])
            new = joined.filter(F.col("r_host").isNull()).drop(
                "r_host", "path_prefix", "_path"
            )
        else:
            denied = None

        if self.cfg.host_budget is None:
            return new, denied

        # politeness: exact per-host budget B distributed over S salt shards
        # (shard s gets B//S + (s < B%S)); rank windows are per (host, salt)
        # so one hot host never serializes into a single task.
        b, s = self.cfg.host_budget, self.cfg.politeness_salts
        w = Window.partitionBy("host", "politeness_bucket").orderBy(
            "priority", "created_path", "job_id"
        )
        shard_budget = F.lit(b // s) + (F.col("politeness_bucket") < F.lit(b % s)).cast("int")
        ranked = new.withColumn("_rk", F.row_number().over(w))
        claimed = ranked.filter(F.col("_rk") <= shard_budget).drop("_rk")
        return claimed, denied

    def run_round(self) -> dict:
        """Execute one round; returns per-round stats."""
        self.round += 1
        cfg = self.cfg
        claimed, denied = self._claim()
        claimed = claimed.localCheckpoint(eager=True)
        n_claimed = claimed.count()
        if n_claimed == 0:
            self.round -= 1
            return {"claimed": 0, "done": True}

        pages = self.pages.select("url", "html")
        # The claimed round is budget-bounded — broadcast it so the huge pages
        # table is never shuffled.  A right-outer join can't broadcast its
        # small (right) side, so: broadcast inner join + anti-join recovery of
        # fetch misses (html null ⇒ the fetch-error path, job.go:114-116).
        inner = pages.join(F.broadcast(claimed), "url", "inner")
        missing = claimed.join(
            F.broadcast(inner.select("job_id")), "job_id", "left_anti"
        ).withColumn("html", F.lit(None).cast("binary"))
        fetched = inner.select(*missing.columns).unionByName(missing)
        fetched = fetched.localCheckpoint(eager=True)

        # --- search jobs -----------------------------------------------------
        search = fetched.filter(F.col("kind") == KIND_SEARCH)
        # direct place URL → single place child, NOT deduped (job.go:145-157)
        direct = search.filter(F.col("url").contains("/maps/place/") & F.col("html").isNotNull())
        direct_children = direct.select(
            F.col("job_id").alias("parent_id"),
            F.col("seed_id"),
            F.col("url").alias("child_url"),
            F.col("created_path"),
            F.lit(0).alias("pos"),
            F.col("depth"),
            F.col("max_depth"),
            F.col("extract_email"),
            F.col("lang"),
            F.lit(False).alias("dedup"),
        )
        serp = search.filter(
            ~F.col("url").contains("/maps/place/") & F.col("html").isNotNull()
        )
        serp_children = (
            serp.withColumn("links", serp_links_udf("html"))
            .select(
                F.col("job_id").alias("parent_id"),
                "seed_id", "created_path", "depth", "max_depth",
                "extract_email", "lang",
                F.posexplode("links").alias("pos", "child_url"),
            )
            .withColumn("dedup", F.lit(True))
            .select(
                "parent_id", "seed_id", "child_url", "created_path", "pos",
                "depth", "max_depth", "extract_email", "lang", "dedup",
            )
        )
        place_children = direct_children.unionByName(serp_children)

        # first-wins admission: within the round, the earliest
        # (created_path, pos) occurrence wins (≙ sequential DOM iteration
        # order across SERPs); then exact left-anti vs the seen table.
        w_first = Window.partitionBy("child_url").orderBy("created_path", "pos")
        dd = place_children.filter("dedup")
        admitted_new = (
            dd.withColumn("_rn", F.row_number().over(w_first))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .join(
                self._seen.select(F.col("url").alias("child_url")),
                "child_url",
                "left_anti",
            )
        )
        admitted = admitted_new.unionByName(place_children.filter(~F.col("dedup")))

        new_seen = admitted_new.select(
            F.xxhash64("child_url").alias("url_hash"),
            F.col("child_url").alias("url"),
            F.col("seed_id").alias("admitting_parent"),
            F.lit(self.round).alias("round_admitted"),
        )

        place_jobs = admitted.filter(F.col("depth") < F.col("max_depth")).select(
            _jid(F.lit(KIND_PLACE), F.col("child_url"), F.col("parent_id")).alias("job_id"),
            F.col("parent_id"),
            F.col("seed_id"),
            F.lit(KIND_PLACE).alias("kind"),
            F.col("child_url").alias("url"),
            F.concat_ws(
                ".", F.col("created_path"), F.format_string("%06d", F.col("pos"))
            ).alias("created_path"),
            F.lit(PRIORITY_MEDIUM).alias("priority"),
            (F.col("depth") + 1).alias("depth"),
            F.col("max_depth"),
            F.lit(0).alias("retries"),
            F.lit(3).alias("max_retries"),
            F.lit(STATUS_NEW).alias("status"),
            F.lit(None).cast("int").alias("round_claimed"),
            F.col("extract_email"),
            F.col("lang"),
        )

        # --- place jobs ------------------------------------------------------
        place = fetched.filter(F.col("kind") == KIND_PLACE)
        extracted = place.withColumn(
            "e",
            entry_extract_udf(
                "html", "seed_id", "url", F.lit(cfg.now_micros).cast("long")
            ),
        ).localCheckpoint(eager=True)  # extraction runs once; reused 3×

        ok = extracted.filter(F.col("e.error").isNull())
        email_hop = ok.filter(
            F.lit(cfg.extract_email) & F.col("e.email_eligible")
        )
        emit_now = ok.join(email_hop.select("job_id"), "job_id", "left_anti")

        results_now = (
            emit_now.filter(F.col("e.valid"))
            .select(
                "job_id",
                F.col("e.input_id").alias("input_id"),
                F.col("url"),
                F.col("e.link").alias("link"),
                F.col("e.cid").alias("cid"),
                F.col("e.title").alias("title"),
                F.col("e.category").alias("category"),
                F.col("e.categories").alias("categories"),
                F.col("e.address").alias("address"),
                F.col("e.web_site").alias("web_site"),
                F.col("e.phone").alias("phone"),
                F.col("e.plus_code").alias("plus_code"),
                F.col("e.review_count").alias("review_count"),
                F.col("e.review_rating").alias("review_rating"),
                F.col("e.latitude").alias("latitude"),
                F.col("e.longitude").alias("longitude"),
                F.col("e.status").alias("status"),
                F.col("e.place_id").alias("place_id"),
                F.col("e.data_id").alias("data_id"),
                F.lit(None).cast("array<string>").alias("emails"),
                F.col("e.canonical_json").alias("canonical_json"),
                F.lit(self.round).alias("round_emitted"),
            )
        )

        email_jobs = email_hop.select(
            _jid(F.lit(KIND_EMAIL), F.col("e.web_site"), F.col("job_id")).alias("job_id"),
            F.col("job_id").alias("parent_id"),
            F.col("seed_id"),
            F.lit(KIND_EMAIL).alias("kind"),
            F.col("e.web_site").alias("_raw_site"),
            F.concat_ws(".", F.col("created_path"), F.lit("000000")).alias("created_path"),
            F.lit(PRIORITY_HIGH).alias("priority"),
            (F.col("depth") + 1).alias("depth"),
            F.col("max_depth"),
            F.lit(0).alias("retries"),
            F.lit(0).alias("max_retries"),  # emailjob.go:29
            F.lit(STATUS_NEW).alias("status"),
            F.lit(None).cast("int").alias("round_claimed"),
            F.col("extract_email"),
            F.col("lang"),
        )
        # normalize the website URL exactly as NewEmailJob does (emailjob.go:37)
        from pyspark.sql.functions import pandas_udf as _pu  # noqa: F401
        email_jobs = email_jobs.withColumn("url", _normalize_site_udf("_raw_site")).drop("_raw_site")
        email_jobs = email_jobs.select([f.name for f in FRONTIER_SCHEMA.fields
                                        if f.name not in ("url_hash", "host", "politeness_bucket")])

        pending_new = email_hop.select(
            F.col("job_id"),
            F.col("e.entry_json").alias("entry_json"),
        )

        # --- email jobs ------------------------------------------------------
        email = fetched.filter(F.col("kind") == KIND_EMAIL)
        email_done = email.join(self._pending.withColumnRenamed("job_id", "parent_id"),
                                "parent_id", "left")
        finalized = email_done.withColumn(
            "f", finalize_email_entry_udf("entry_json", "html")
        )
        email_results = (
            finalized.filter(F.col("f.valid") & F.col("entry_json").isNotNull())
            .select(
                "job_id",
                F.get_json_object("entry_json", "$.input_id").alias("input_id"),
                F.col("url"),
                F.get_json_object("entry_json", "$.link").alias("link"),
                F.get_json_object("entry_json", "$.cid").alias("cid"),
                F.get_json_object("entry_json", "$.title").alias("title"),
                F.get_json_object("entry_json", "$.category").alias("category"),
                F.from_json(
                    F.get_json_object("entry_json", "$.categories"), "array<string>"
                ).alias("categories"),
                F.get_json_object("entry_json", "$.address").alias("address"),
                F.get_json_object("entry_json", "$.web_site").alias("web_site"),
                F.get_json_object("entry_json", "$.phone").alias("phone"),
                F.get_json_object("entry_json", "$.plus_code").alias("plus_code"),
                F.get_json_object("entry_json", "$.review_count").cast("int").alias("review_count"),
                F.get_json_object("entry_json", "$.review_rating").cast("double").alias("review_rating"),
                F.get_json_object("entry_json", "$.latitude").cast("double").alias("latitude"),
                F.get_json_object("entry_json", "$.longtitude").cast("double").alias("longitude"),
                F.get_json_object("entry_json", "$.status").alias("status"),
                F.get_json_object("entry_json", "$.place_id").alias("place_id"),
                F.get_json_object("entry_json", "$.data_id").alias("data_id"),
                F.col("f.emails").alias("emails"),
                F.col("f.canonical_json").alias("canonical_json"),
                F.lit(self.round).alias("round_emitted"),
            )
        )

        # --- status flips ----------------------------------------------------
        # search: done if page present (or direct-place), failed if missing
        # place: done if extracted ok, failed otherwise; email: always done.
        status_of_claimed = fetched.select(
            "job_id",
            F.when(F.col("kind") == KIND_EMAIL, F.lit(STATUS_DONE))
            .when(
                (F.col("kind") == KIND_SEARCH) & F.col("html").isNotNull(),
                F.lit(STATUS_DONE),
            )
            .when(F.col("kind") == KIND_SEARCH, F.lit(STATUS_FAILED))
            .otherwise(F.lit(None))
            .alias("_new_status"),
        )
        place_status = extracted.select(
            "job_id",
            F.when(F.col("e.error").isNull(), F.lit(STATUS_DONE))
            .otherwise(F.lit(STATUS_FAILED))
            .alias("_new_status2"),
        )
        status_of_claimed = status_of_claimed.join(place_status, "job_id", "left").select(
            "job_id",
            F.coalesce("_new_status2", "_new_status").alias("new_status"),
        )
        if denied is not None:
            status_of_claimed = status_of_claimed.unionByName(
                denied.select("job_id", F.lit(STATUS_FAILED).alias("new_status"))
            )

        new_children = place_jobs.unionByName(email_jobs.select(place_jobs.columns))
        new_children = self._stamp_url_cols(new_children)

        updated_frontier = (
            self._frontier.join(status_of_claimed, "job_id", "left")
            .withColumn(
                "status", F.coalesce(F.col("new_status"), F.col("status"))
            )
            .withColumn(
                "round_claimed",
                F.when(F.col("new_status").isNotNull(), F.lit(self.round)).otherwise(
                    F.col("round_claimed")
                ),
            )
            .drop("new_status")
            .unionByName(new_children)
        )

        stats = {
            "round": self.round,
            "claimed": n_claimed,
            "done": False,
        }

        self._frontier = updated_frontier
        self._seen = self._seen.unionByName(new_seen)
        self._results = self._results.unionByName(
            results_now.unionByName(email_results)
        )
        self._pending = self._pending.unionByName(pending_new)
        self._checkpoint()
        return stats

    def run(self) -> dict:
        """Run rounds to fixpoint; returns final counters."""
        for _ in range(self.cfg.max_rounds):
            stats = self.run_round()
            if stats.get("done"):
                break
        return self.counters()

    # ---------------- outputs -------------------------------------------------

    def counters(self) -> dict:
        """≙ exiter counters (exiter/exiter.go:17-26) from status aggregates."""
        if self._frontier is None:
            return {}
        rows = (
            self._frontier.groupBy("kind", "status").count().collect()
        )
        c: dict[str, int] = {}
        for r in rows:
            c[f"{r['kind']}_{r['status']}"] = r["count"]
        c["results"] = self._results.count() if self._results is not None else 0
        c["seen"] = self._seen.count() if self._seen is not None else 0
        c["round"] = self.round
        return c

    @property
    def results(self) -> DataFrame:
        return self._results

    @property
    def seen(self) -> DataFrame:
        return self._seen

    @property
    def frontier(self) -> DataFrame:
        return self._frontier

    def results_csv(self, path: str) -> None:
        """36-column CSV projection (entry.go:235-315) from canonical JSON."""
        from ..operators.csv_sink import write_results_csv

        write_results_csv(self._results, path)


from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T


@pandas_udf(T.StringType())
def _normalize_site_udf(site):
    from ..extract.urls import normalize_google_url

    return site.map(lambda s: normalize_google_url(s or ""))
