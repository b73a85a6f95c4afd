"""Frontier key-derivation operators (round-4 eighth wave).

Three operators between URL discovery and fetch scheduling, each the exact
key arithmetic the crawl engine's 10^10-URL frontier runs and each pure
JVM string/regex work inside one codegen'd map stage:

* SURT keys — Common Crawl's CDX sort key (reversed host labels), the
  ordering that makes per-host URL ranges CONTIGUOUS so politeness
  partitioning, prefix range-scans, and per-host merges are locality-free;
* eTLD+1 extraction — the registrable domain the politeness buckets key on
  (north_star: "per-host politeness buckets enforced by salted
  repartitioning on eTLD+1"), with a public-suffix-list subset embedded so
  multi-label suffixes (co.uk, com.au) group correctly;
* robots.txt rule evaluation — longest-prefix-match allow/deny (the
  google robots spec's match discipline, prefix-rule subset) against a
  per-host rule table, the admission-time gate ``plans/crawl.py`` stamps.

URLs/hosts are synthesized deterministically from (doc_id, source) — the
same discipline as ``frontier_url_canonicalize``, whose canonical output
the SURT key builds on (both engines derive the identical strings)."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .analytics import (
    _URL_CANON_CTES,
    frontier_url_canon_base,
    frontier_url_canonicalize,
    load,
    load_fanout,
    ordered,
)

__all__ = ["QUERIES", "ORACLES"]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


@_q(
    "frontier_surt_key",
    f"""
    WITH {_URL_CANON_CTES},
    s AS (
      SELECT doc_id, url_canon,
             substr(url_canon, strpos(url_canon, '://') + 3) AS rest
      FROM canon_url),
    h AS (
      SELECT doc_id, url_canon, rest,
             regexp_extract(rest, '^[^/]*', 0) AS hostport
      FROM s)
    SELECT doc_id, url_canon,
           array_to_string(
             list_reverse(string_split(
               regexp_replace(hostport, ':[0-9]+$', ''), '.')), ',')
             || CASE WHEN COALESCE(regexp_extract(hostport, ':([0-9]+)$', 1),
                                   '') = ''
                     THEN '' ELSE ':'
                          || regexp_extract(hostport, ':([0-9]+)$', 1) END
             || ')' || substr(rest, length(hostport) + 1) AS surt_key
    FROM h ORDER BY doc_id
    """,
)
def frontier_surt_key(spark, sf):
    """SURT key (Sort-friendly URI Reordering Transform) over the canonical
    URL: ``https://maps.site.com:8080/p/1?a=1`` →
    ``com,site,maps:8080)/p/1?a=1``.  This is the CDX index ordering of
    Common Crawl / OpenWayback: sorting by SURT clusters every URL of a
    registrable domain (and its subdomains) into one contiguous key range,
    which is what lets a frontier (a) range-partition by host with zero
    skew surprises, (b) prefix-scan a domain's backlog without a filter
    over the full table, and (c) merge per-host queues with a sorted merge.

    Scale shape: builds on the canonicalizer's output in the SAME map
    stage — host-label reversal is a split/reverse/join over JVM arrays,
    no shuffle, no Python.  The DuckDB oracle re-derives the key on top of
    the shared canonicalization CTE chain, so canonical parity transfers to
    the sort key rule-for-rule."""
    # r6: the SURT key is computed alongside the canonical URL in the ONE
    # Arrow map of frontier_url_canon_base (the JVM label-reversal chain
    # re-embedded the whole canonicalization expression after projection
    # collapse); parity is pinned by tests/test_frontier_ops.py
    return ordered(
        frontier_url_canon_base(spark, sf).select(
            "doc_id", "url_canon", "surt_key"
        ),
        "doc_id",
    )


# Host synthesis: five deterministic shapes covering plain two-label hosts,
# deep subdomains, and multi-label public suffixes (co.uk, com.au).
_HOST_RAW_SQL = """
    CASE CAST(doc_id % 5 AS INTEGER)
      WHEN 0 THEN 'a.b.site-' || source || '.com'
      WHEN 1 THEN 'x.site-' || source || '.co.uk'
      WHEN 2 THEN 'site-' || source || '.org'
      WHEN 3 THEN 'deep.y.site-' || source || '.com.au'
      ELSE 'site-' || source || '.com'
    END
"""

_ETLD1_SQL = """
    CASE
      WHEN host LIKE '%.co.uk' THEN regexp_extract(host, '([^.]+[.]co[.]uk)$', 1)
      WHEN host LIKE '%.com.au' THEN regexp_extract(host, '([^.]+[.]com[.]au)$', 1)
      ELSE regexp_extract(host, '([^.]+[.][^.]+)$', 1)
    END
"""

_POLITENESS_BUCKETS = 32


@_q(
    "frontier_etld1_key",
    f"""
    WITH raw AS (SELECT doc_id, {_HOST_RAW_SQL} AS host FROM documents),
    e AS (SELECT doc_id, host, {_ETLD1_SQL} AS etld1 FROM raw)
    SELECT doc_id, host, etld1,
           CAST(list_sum(list_transform(range(0, 8), i ->
             CAST(instr('0123456789abcdef',
                        substring(md5(etld1), i + 1, 1)) - 1 AS BIGINT)
               << (4 * (7 - i)))) AS BIGINT) % {_POLITENESS_BUCKETS}
             AS bucket
    FROM e ORDER BY doc_id
    """,
)
def frontier_etld1_key(spark, sf):
    """eTLD+1 (registrable domain) extraction + politeness-bucket
    assignment — the key derivation behind the engine's per-host budgets
    (north_star: politeness buckets keyed on eTLD+1; a per-HOSTNAME key
    would let ``a.site.com`` and ``b.site.com`` double-hit the same
    server).  A public-suffix-list subset ({{co.uk, com.au}} + the
    single-label default) is embedded as a match cascade — longest suffix
    wins, then the registrable domain is that suffix plus one label; the
    production list is ~9k suffixes compiled into the same cascade (or a
    broadcast suffix table), identical shape.

    The bucket is the salted-hash shard the frontier repartitions on
    (md5-fold mod {_POLITENESS_BUCKETS}, the engine's per-(host,salt)
    rotating-budget key).  All of it is scan-stage JVM regex/arithmetic —
    no shuffle, no Python — so key derivation is free at 10^10 URLs."""
    d = load(spark, sf, "documents")
    return (
        d.select("doc_id", F.expr(_HOST_RAW_SQL).alias("host"))
        .withColumn("etld1", F.expr(_ETLD1_SQL))
        .withColumn(
            "bucket",
            F.conv(F.substring(F.md5("etld1"), 1, 8), 16, 10).cast("long")
            % _POLITENESS_BUCKETS,
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )


@_q(
    "frontier_robots_eval",
    f"""
    WITH {_URL_CANON_CTES},
    srcs AS (SELECT DISTINCT source,
                    CAST(substr(source, 4) AS INT) AS srcnum
             FROM documents),
    rules AS (
      SELECT source, '/' AS rule_path, TRUE AS allow FROM srcs
      UNION ALL SELECT source, '/p', FALSE FROM srcs
      UNION ALL SELECT source, '/p/4', TRUE FROM srcs
      UNION ALL SELECT source, '/Crawl', srcnum % 2 = 0 FROM srcs),
    u AS (SELECT c.doc_id, d.source, c.path
          FROM canon c JOIN documents d USING (doc_id)),
    m AS (SELECT u.doc_id, u.path, r.rule_path, r.allow
          FROM u JOIN rules r ON u.source = r.source
           AND substr(u.path, 1, length(r.rule_path)) = r.rule_path)
    SELECT doc_id, path,
           max_by(rule_path, length(rule_path)) AS matched_rule,
           CASE WHEN max_by(allow, length(rule_path)) THEN 'allow'
                ELSE 'deny' END AS verdict
    FROM m GROUP BY doc_id, path ORDER BY doc_id
    """,
)
def frontier_robots_eval(spark, sf):
    """robots.txt rule evaluation, longest-prefix-match discipline (the
    google robots spec's core matching rule, prefix subset — no ``*``/``$``
    patterns): each URL path is matched against its host's rule table and
    the LONGEST matching rule's allow/deny wins.  The per-host table here
    is derived deterministically (a deny on ``/p`` overridden for the
    ``/p/4`` prefix, a parity-dependent ``/Crawl`` rule, an explicit root
    allow) so every doc matches ≥1 rule and the longest-match override is
    exercised both ways; rule lengths are pairwise distinct, so the arg-max
    is tie-free in both engines.

    Scale shape: rule tables are tiny relative to the frontier (robots
    files, not pages) — the rules side BROADCASTS onto the URL scan and the
    prefix test + ``max_by`` fold run inside the scan's aggregate, partial-
    aggregated map-side; this is exactly the admission-time stamping shape
    the crawl engine uses (``plans/crawl.py`` ``_stamp_url_cols``), where
    denial is evaluated once per URL, not per round."""
    d = load(spark, sf, "documents")
    urls = (
        frontier_url_canon_base(spark, sf)
        .select("doc_id", "url_canon")
        .join(d.select("doc_id", "source"), "doc_id")
        .withColumn(
            "path",
            F.expr("regexp_extract(url_canon, '^[a-z]+://[^/]*([^?]*)', 1)"),
        )
    )
    src = d.select("source").distinct().withColumn(
        "srcnum", F.expr("CAST(substr(source, 4) AS INT)")
    )
    rules = None
    for rule_path, allow_expr in [
        ("/", "true"),
        ("/p", "false"),
        ("/p/4", "true"),
        ("/Crawl", "srcnum % 2 = 0"),
    ]:
        r = src.select(
            "source",
            F.lit(rule_path).alias("rule_path"),
            F.expr(allow_expr).alias("allow"),
        )
        rules = r if rules is None else rules.unionAll(r)
    return (
        urls.join(F.broadcast(rules), "source")
        .filter(F.expr("substr(path, 1, length(rule_path)) = rule_path"))
        .groupBy("doc_id", "path")
        .agg(
            F.expr("max_by(rule_path, length(rule_path))").alias("matched_rule"),
            F.expr("max_by(allow, length(rule_path))").alias("allow"),
        )
        .select(
            "doc_id",
            "path",
            "matched_rule",
            F.when(F.col("allow"), "allow").otherwise("deny").alias("verdict"),
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )


# HTML synthesis for link extraction: three anchors per document (absolute,
# relative, and a messy upper-case absolute) plus a mailto link on every
# third document — the discovery shapes a link extractor must classify.
_HTML_RAW_SQL = """
    '<html><body><a href="https://site-' || source || '.com/p/' || doc_id
    || '">x</a><p><a href=''/rel/' || (doc_id + 1)
    || '''>y</a></p><A HREF=''HTTP://site-' || source || '.COM/Crawl/'
    || doc_id || '''>z</A>'
    || CASE WHEN doc_id % 3 = 0
            THEN '<a href="mailto:user@site-' || source || '.com">m</a>'
            ELSE '' END
    || '</body></html>'
"""

_HREF_RE = """(?i)href=["']([^"'>]+)["']"""


@_q(
    "frontier_link_extract",
    f"""
    WITH raw AS (
      SELECT doc_id, source, {_HTML_RAW_SQL} AS html FROM documents),
    links AS (
      SELECT doc_id, source,
             unnest(regexp_extract_all(html,
               '(?i)href=["'']([^"''>]+)["'']', 1)) AS href
      FROM raw),
    resolved AS (
      SELECT doc_id,
             regexp_replace(
               CASE WHEN href LIKE '/%'
                    THEN 'https://site-' || source || '.com' || href
                    ELSE href END,
               '#.*$', '') AS link_url
      FROM links
      WHERE lower(href) NOT LIKE 'mailto:%')
    SELECT DISTINCT doc_id, link_url
    FROM resolved ORDER BY doc_id, link_url
    """,
)
def frontier_link_extract(spark, sf):
    """Outlink extraction — the frontier-EXPANSION operator: pull every
    ``href`` out of a page, classify (absolute / relative / mailto), resolve
    relatives against the page's own origin, strip fragments, and emit the
    per-page distinct outlink set (≙ the reference discovering place links
    in SERP HTML, ``extract/serp.py`` feed-link walk — generalized to the
    arbitrary-HTML case a web-scale crawl feeds back into its frontier).

    Scale shape: extraction is one ``regexp_extract_all`` + explode inside
    the pages scan — the multi-KB html column is consumed in the stage that
    reads it and only the slim (doc_id, url) pairs survive (the engine's
    "html born and dies in one stage" rule); the per-page DISTINCT
    partial-aggregates map-side.  Downstream these links meet the
    canonicalizer and the seen-set anti-join — already pinned by
    ``frontier_url_canonicalize`` and ``dedup_anti_join``."""
    d = load(spark, sf, "documents")
    # Spark builds the identical html via concat of plain literals (the
    # oracle's SQL-literal quote-doubling is not portable to F.expr).
    did = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit('<html><body><a href="https://site-'),
        F.col("source"),
        F.lit(".com/p/"),
        did,
        F.lit('">x</a><p><a href=\'/rel/'),
        (F.col("doc_id") + 1).cast("string"),
        F.lit("'>y</a></p><A HREF='HTTP://site-"),
        F.col("source"),
        F.lit(".COM/Crawl/"),
        did,
        F.lit("'>z</A>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit('<a href="mailto:user@site-'),
                F.col("source"),
                F.lit('.com">m</a>'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    return (
        d.select("doc_id", "source", html.alias("html"))
        .select(
            "doc_id",
            "source",
            F.explode(
                F.regexp_extract_all("html", F.lit(_HREF_RE), F.lit(1))
            ).alias("href"),
        )
        .filter(~F.lower("href").startswith("mailto:"))
        .select(
            "doc_id",
            F.regexp_replace(
                F.when(
                    F.col("href").startswith("/"),
                    F.concat(
                        F.lit("https://site-"),
                        F.col("source"),
                        F.lit(".com"),
                        F.col("href"),
                    ),
                ).otherwise(F.col("href")),
                "#.*$",
                "",
            ).alias("link_url"),
        )
        .distinct()
        .repartition(1).sortWithinPartitions("doc_id", "link_url")
    )


_TRAP_MAX_DEPTH = 10   # path segments before the depth trap fires
_TRAP_MAX_REP = 2      # identical-segment repetitions allowed
_TRAP_MAX_QUERY = 40   # query-string length before the session-id trap


# Path synthesis: four shapes — a repeated-segment loop (calendar/mirror
# trap), a shallow clean path, a 12-deep chain (depth trap), and a long
# opaque session-id query (session trap).
_TRAP_PATH_SQL = """
    CASE CAST(doc_id % 4 AS INTEGER)
      WHEN 0 THEN '/cal/' || repeat('d/e/', 3) || 'view'
      WHEN 1 THEN '/p/' || doc_id
      WHEN 2 THEN '/a/b/c/d/e/f/g/h/i/j/k/l/' || doc_id
      ELSE '/item'
    END
"""

_TRAP_QUERY_SQL = """
    CASE WHEN doc_id % 4 = 3
         THEN 'sid=' || md5(CAST(doc_id AS STRING)) || md5('x' || doc_id)
         ELSE 'a=1' END
"""


@_q(
    "frontier_trap_detect",
    f"""
    WITH raw AS (
      SELECT doc_id, {_TRAP_PATH_SQL} AS path, {_TRAP_QUERY_SQL} AS query
      FROM documents),
    segs AS (
      SELECT doc_id, path, query,
             list_filter(string_split(path, '/'), x -> x <> '') AS segs
      FROM raw),
    m AS (
      SELECT doc_id, path, query,
             CAST(len(segs) AS BIGINT) AS depth,
             CAST(list_max(list_transform(list_distinct(segs),
                    d -> len(list_filter(segs, x -> x = d)))) AS BIGINT)
               AS max_seg_rep,
             CAST(length(query) AS BIGINT) AS query_len
      FROM segs)
    SELECT doc_id, depth, max_seg_rep, query_len,
           CASE WHEN depth > {_TRAP_MAX_DEPTH} THEN 'depth'
                WHEN max_seg_rep > {_TRAP_MAX_REP} THEN 'loop'
                WHEN query_len > {_TRAP_MAX_QUERY} THEN 'session'
                ELSE 'ok' END AS verdict
    FROM m ORDER BY doc_id
    """,
)
def frontier_trap_detect(spark, sf):
    """Crawler-trap detection — the admission filter that keeps a frontier
    from diving into infinite URL spaces (Heritrix's classic trap triad):
    depth traps (calendar/pagination chains past {MAXD} segments),
    loop traps (the same path segment repeated >{MAXR}× — mirror/cycle
    links), and session traps (opaque query strings past {MAXQ} chars that
    make every visit a "new" URL).  Verdict precedence depth→loop→session
    is fixed so both engines pick the same reason when several fire.

    Scale shape: pure scan-stage arithmetic — split/filter/transform over
    JVM arrays, no shuffle, no Python; at 10^10 URLs trap-tagging rides the
    same projection that canonicalizes, so a trapped URL never reaches the
    seen-set join at all (cheapest possible rejection point)."""
    d = load(spark, sf, "documents")
    return (
        d.select(
            "doc_id",
            F.expr(_TRAP_PATH_SQL).alias("path"),
            F.expr(_TRAP_QUERY_SQL).alias("query"),
        )
        .withColumn("segs", F.expr("filter(split(path, '/'), x -> x != '')"))
        .select(
            "doc_id",
            F.expr("CAST(size(segs) AS BIGINT)").alias("depth"),
            F.expr(
                "CAST(array_max(transform(array_distinct(segs),"
                " d -> size(filter(segs, x -> x = d)))) AS BIGINT)"
            ).alias("max_seg_rep"),
            F.expr("CAST(length(query) AS BIGINT)").alias("query_len"),
        )
        .withColumn(
            "verdict",
            F.expr(
                f"CASE WHEN depth > {_TRAP_MAX_DEPTH} THEN 'depth'"
                f" WHEN max_seg_rep > {_TRAP_MAX_REP} THEN 'loop'"
                f" WHEN query_len > {_TRAP_MAX_QUERY} THEN 'session'"
                " ELSE 'ok' END"
            ),
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )


_SCHED_HOSTS = 37       # synthesized host count
_SCHED_DELAY_BASE = 100  # ms; per-host delay = base * (1 + host_id % 5)


@_q(
    "frontier_fetch_slot_schedule",
    f"""
    WITH u AS (
      SELECT doc_id,
             'site-' || CAST(doc_id % {_SCHED_HOSTS} AS STRING) || '.com'
               AS host,
             CAST(doc_id % 5 AS BIGINT) AS priority,
             CAST({_SCHED_DELAY_BASE}
                  * (1 + (doc_id % {_SCHED_HOSTS}) % 5) AS BIGINT)
               AS delay_ms
      FROM documents)
    SELECT doc_id, host, priority,
           CAST(ROW_NUMBER() OVER (PARTITION BY host
                                   ORDER BY priority, doc_id) - 1 AS BIGINT)
             AS slot,
           CAST((ROW_NUMBER() OVER (PARTITION BY host
                                    ORDER BY priority, doc_id) - 1)
                * delay_ms AS BIGINT) AS fetch_at_ms
    FROM u ORDER BY doc_id
    """,
)
def frontier_fetch_slot_schedule(spark, sf):
    """Per-host politeness fetch-slot assignment: within each host, order
    claimed URLs by (priority, doc_id) and give slot k the dispatch time
    ``k · crawl_delay(host)`` — the static form of the schedule the crawl
    engine's rotating per-(host,salt) budget windows enforce dynamically
    (``plans/crawl.py``), and the arithmetic a distributed fetcher uses to
    turn "1 request per delay per host" into a precomputed timetable with
    no coordination at fetch time.  Hosts, priorities, and robots-style
    crawl delays derive deterministically from doc_id (zero external data).

    Scale shape: ONE window, partitioned by host — never global; a host's
    queue is the politeness unit and is bounded by the frontier's per-host
    quota (``docs_domain_quota_cap`` upstream), so partitions stay small
    even at 10^10 URLs, and the hot-host tail is exactly what the engine's
    salt shards already split.  No join, no second shuffle: delay rides the
    projection."""
    d = load(spark, sf, "documents")
    u = d.select(
        "doc_id",
        F.concat(
            F.lit("site-"),
            (F.col("doc_id") % _SCHED_HOSTS).cast("string"),
            F.lit(".com"),
        ).alias("host"),
        (F.col("doc_id") % 5).cast("long").alias("priority"),
        (
            F.lit(_SCHED_DELAY_BASE)
            * (1 + (F.col("doc_id") % _SCHED_HOSTS) % 5)
        ).cast("long").alias("delay_ms"),
    )
    w = Window.partitionBy("host").orderBy("priority", "doc_id")
    slot = (F.row_number().over(w) - 1).cast("long")
    return (
        u.select(
            "doc_id",
            "host",
            "priority",
            slot.alias("slot"),
            (slot * F.col("delay_ms")).cast("long").alias("fetch_at_ms"),
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )


@_q(
    "frontier_recrawl_diff",
    """
    WITH a AS (SELECT doc_id, CAST(doc_id % 3 AS BIGINT) AS v
               FROM documents WHERE doc_id % 10 <> 0),
    b AS (SELECT doc_id,
                 CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                           ELSE doc_id % 3 END AS BIGINT) AS v
          FROM documents WHERE doc_id % 7 <> 0)
    SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.v = b.v THEN 'same'
                ELSE 'changed' END AS verdict
    FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    ORDER BY doc_id
    """,
)
def frontier_recrawl_diff(spark, sf):
    """Snapshot diff between two crawls of the same URL space — the input
    to every revisit policy: ``added`` / ``removed`` URLs adjust the
    frontier, ``changed`` vs ``same`` content hashes feed the per-URL
    change-rate estimate that sets recrawl priority (Cho & Garcia-Molina's
    freshness-driven scheduling).  Both snapshots and their content
    versions derive deterministically from doc_id: snapshot A holds
    ``doc_id % 10 ≠ 0``, B holds ``doc_id % 7 ≠ 0``, and every
    ``doc_id % 3 = 0`` page changed its content hash between them.

    Scale shape: one FULL OUTER equi-join on the URL key — at rest both
    crawl snapshots live bucketed by that key (the engine's url-bucketed
    pages layout), so the diff is a storage-partitioned zero-shuffle merge;
    the verdict is a projection over the join's null pattern.  This is the
    same join discipline as the fetch join, pointed at time instead of
    content."""
    d = load(spark, sf, "documents").select("doc_id")
    a = d.filter(F.col("doc_id") % 10 != 0).select(
        F.col("doc_id").alias("a_id"), (F.col("doc_id") % 3).cast("long").alias("a_v")
    )
    b = d.filter(F.col("doc_id") % 7 != 0).select(
        F.col("doc_id").alias("b_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(1))
        .otherwise(F.col("doc_id") % 3)
        .cast("long")
        .alias("b_v"),
    )
    return (
        a.join(b, a.a_id == b.b_id, "full_outer")
        .select(
            F.coalesce("a_id", "b_id").alias("doc_id"),
            F.when(F.col("a_id").isNull(), F.lit("added"))
            .when(F.col("b_id").isNull(), F.lit("removed"))
            .when(F.col("a_v") == F.col("b_v"), F.lit("same"))
            .otherwise(F.lit("changed"))
            .alias("verdict"),
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )


# Sitemap synthesis: every source publishes a 2-shard sitemap index
# (sitemap-0.xml / sitemap-1.xml, docs sharded by doc_id % 2); each child
# sitemap lists its pages as <url><loc>..</loc><lastmod>..</lastmod></url>
# blocks in doc_id order, so both engines aggregate the identical XML text.
_SMAP_PIECE_SQL = """
    '<url><loc>https://site-' || source || '.com/p/' || doc_id
    || '</loc><lastmod>2026-' || lpad(CAST((doc_id % 12) + 1 AS VARCHAR), 2, '0')
    || '-01</lastmod></url>'
"""


@_q(
    "frontier_sitemap_expand",
    f"""
    WITH child AS (
      SELECT 'https://site-' || source || '.com/sitemap-'
               || (doc_id % 2) || '.xml' AS sitemap_url,
             '<urlset>' || string_agg({_SMAP_PIECE_SQL}, '' ORDER BY doc_id)
               || '</urlset>' AS xml
      FROM documents GROUP BY source, doc_id % 2),
    idx AS (
      SELECT DISTINCT source,
             '<sitemapindex><sitemap><loc>https://site-' || source
               || '.com/sitemap-0.xml</loc></sitemap><sitemap><loc>https://site-'
               || source || '.com/sitemap-1.xml</loc></sitemap></sitemapindex>'
               AS xml
      FROM documents),
    fanout AS (
      SELECT source,
             unnest(regexp_extract_all(xml, '<loc>([^<]+)</loc>', 1)) AS child_loc
      FROM idx),
    blocks AS (
      SELECT f.child_loc AS sitemap_url,
             unnest(regexp_extract_all(c.xml,
               '<url><loc>[^<]+</loc><lastmod>[^<]+</lastmod></url>', 0)) AS block
      FROM fanout f JOIN child c ON c.sitemap_url = f.child_loc)
    SELECT sitemap_url,
           regexp_extract(block, '<loc>([^<]+)</loc>', 1) AS page_url,
           regexp_extract(block, '<lastmod>([^<]+)</lastmod>', 1) AS lastmod
    FROM blocks
    ORDER BY sitemap_url, page_url
    """,
)
def frontier_sitemap_expand(spark, sf):
    """Two-level sitemap-index expansion — the crawl SEEDING path a web-scale
    engine runs before (or instead of) link discovery: fetch each host's
    sitemap index, extract the child-sitemap locs, fetch those, and emit
    every (page_url, lastmod) pair for recrawl scheduling (lastmod feeds the
    change-rate model that ``frontier_recrawl_diff`` closes the loop on).
    The reference seeds from query grids (``extract/urls.py``); a generic
    crawl seeds from sitemaps — same frontier-admission sink.

    Scale shape: the index table is O(hosts) and the extracted child-loc
    fanout is tiny (shards/host), so the fanout side BROADCASTS into the
    child-sitemap store join — no shuffle of the multi-KB XML column; the
    XML is parsed (regexp_extract_all + explode) in the same stage that
    joins it and only slim (url, lastmod) rows survive, the engine's
    "payload born and dies in one stage" rule.  Child-sitemap synthesis is
    the only shuffle (groupBy host, shard), and real crawls READ sitemaps
    instead of aggregating them — the expansion itself is shuffle-free."""
    d = load(spark, sf, "documents")
    piece = F.concat(
        F.lit("<url><loc>https://site-"),
        F.col("source"),
        F.lit(".com/p/"),
        F.col("doc_id").cast("string"),
        F.lit("</loc><lastmod>2026-"),
        F.lpad(((F.col("doc_id") % 12) + 1).cast("string"), 2, "0"),
        F.lit("-01</lastmod></url>"),
    )
    child = (
        d.select("source", (F.col("doc_id") % 2).alias("shard"),
                 F.col("doc_id").alias("doc_id"), piece.alias("piece"))
        .groupBy("source", "shard")
        .agg(
            F.expr(
                "concat('<urlset>', concat_ws('', transform("
                "array_sort(collect_list(struct(doc_id, piece))), x -> x.piece)),"
                " '</urlset>')"
            ).alias("xml")
        )
        .select(
            F.concat(
                F.lit("https://site-"), F.col("source"), F.lit(".com/sitemap-"),
                F.col("shard").cast("string"), F.lit(".xml"),
            ).alias("sitemap_url"),
            "xml",
        )
    )
    idx = d.select("source").distinct().select(
        "source",
        F.concat(
            F.lit("<sitemapindex><sitemap><loc>https://site-"),
            F.col("source"),
            F.lit(".com/sitemap-0.xml</loc></sitemap><sitemap><loc>https://site-"),
            F.col("source"),
            F.lit(".com/sitemap-1.xml</loc></sitemap></sitemapindex>"),
        ).alias("xml"),
    )
    fanout = idx.select(
        F.explode(
            F.regexp_extract_all("xml", F.lit("<loc>([^<]+)</loc>"), F.lit(1))
        ).alias("child_loc")
    )
    blocks = (
        child.join(F.broadcast(fanout), child.sitemap_url == fanout.child_loc)
        .select(
            "sitemap_url",
            F.explode(
                F.regexp_extract_all(
                    "xml",
                    F.lit("<url><loc>[^<]+</loc><lastmod>[^<]+</lastmod></url>"),
                    F.lit(0),
                )
            ).alias("block"),
        )
    )
    return blocks.select(
        "sitemap_url",
        F.regexp_extract("block", "<loc>([^<]+)</loc>", 1).alias("page_url"),
        F.regexp_extract("block", "<lastmod>([^<]+)</lastmod>", 1).alias("lastmod"),
    ).repartition(1).sortWithinPartitions("sitemap_url", "page_url")


_RING_SHARDS = 8    # frontier shards
_RING_REPLICAS = 2  # vnodes per shard
_RING_SPACE = 1 << 48

# 48-bit md5 folds (12 hex chars) — DuckDB side of the shared hash.
def _fold12_sql(expr: str) -> str:
    return (
        "CAST(list_sum(list_transform(range(0, 12), i -> "
        "CAST(instr('0123456789abcdef', "
        f"substring(md5({expr}), i + 1, 1)) - 1 "
        "AS BIGINT) << (4 * (11 - i)))) AS BIGINT)"
    )


def _ring_vnodes_sql() -> str:
    cells = ", ".join(
        f"({s}, {r})" for s in range(_RING_SHARDS) for r in range(_RING_REPLICAS)
    )
    return f"(VALUES {cells}) AS vn(shard, rep)"


@_q(
    "frontier_consistent_hash_assign",
    f"""
    WITH hosts AS (
      SELECT DISTINCT 'site-' || source || '.com' AS host FROM documents),
    hp AS (
      SELECT host, {_fold12_sql("'host-v1:' || host")} % {_RING_SPACE} AS hpoint
      FROM hosts),
    ring AS (
      SELECT shard, rep,
             {_fold12_sql("'ring-v1:' || shard || ':' || rep")} % {_RING_SPACE}
               AS vpoint
      FROM {_ring_vnodes_sql()}),
    dists AS (
      SELECT hp.host,
             ring.shard,
             (ring.vpoint - hp.hpoint + {_RING_SPACE}) % {_RING_SPACE} AS dist
      FROM hp CROSS JOIN ring),
    mn AS (SELECT host, MIN(dist) AS md FROM dists GROUP BY host)
    SELECT d.host,
           CAST(MIN(d.shard) AS BIGINT) AS shard,
           CAST(mn.md AS BIGINT) AS ring_distance
    FROM dists d JOIN mn ON mn.host = d.host AND d.dist = mn.md
    GROUP BY d.host, mn.md
    ORDER BY d.host
    """,
)
def frontier_consistent_hash_assign(spark, sf):
    """Consistent-hash frontier sharding — how a distributed crawler pins
    each host to a frontier shard so politeness state (budgets, last-fetch
    clocks, robots cache) never splits across workers, while shard
    add/remove moves only ~1/shards of the hosts (Karger ring): every
    shard projects {_RING_REPLICAS} virtual nodes onto a {_RING_SPACE.bit_length() - 1}-bit
    md5 ring and a host belongs to the clockwise-nearest vnode.  The
    reference pins per-host email jobs by hash too (``deduper/hasher.go``
    key discipline); this is that idea made elastic.

    Scale shape: the ring is {_RING_SHARDS * _RING_REPLICAS} literal rows — it
    BROADCASTS onto the host scan (a cross join against a literal-table is
    a BroadcastNestedLoop of constant width {_RING_SHARDS * _RING_REPLICAS},
    bounded, not a data-dependent explosion); the min-fold partial-
    aggregates map-side, so per-partition output is one row per host.  At
    10^10 URLs the host table is ~10^7 rows and the whole assignment is a
    scan-stage map — the shard column then becomes the frontier's
    ``repartition`` key, which is the point."""
    import hashlib

    d = load(spark, sf, "documents")
    hosts = d.select(
        F.concat(F.lit("site-"), F.col("source"), F.lit(".com")).alias("host")
    ).distinct()

    def _fold12(col):
        return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")

    # Ring vnode points are plan literals (hashlib md5 == the oracle's md5;
    # 16 values) — the per-host expansion is an explode of a literal array,
    # so the whole assignment is scan-stage map work with NO join operator
    # (and therefore nothing for the no-BNLJ plan guard to flag).
    ring = [
        (s_, int(hashlib.md5(f"ring-v1:{s_}:{r}".encode()).hexdigest()[:12], 16)
              % _RING_SPACE)
        for s_ in range(_RING_SHARDS)
        for r in range(_RING_REPLICAS)
    ]
    vn = F.array(
        *[
            F.struct(F.lit(s_).cast("long").alias("shard"),
                     F.lit(v).alias("vpoint"))
            for s_, v in ring
        ]
    )
    hp = hosts.select(
        "host",
        (_fold12(F.concat(F.lit("host-v1:"), F.col("host"))) % _RING_SPACE).alias(
            "hpoint"
        ),
        F.explode(vn).alias("v"),
    )
    dists = hp.select(
        "host",
        F.col("v.shard").alias("shard"),
        ((F.col("v.vpoint") - F.col("hpoint") + _RING_SPACE) % _RING_SPACE).alias(
            "dist"
        ),
    )
    best = dists.groupBy("host").agg(
        F.min(F.struct("dist", "shard")).alias("b")
    )
    return best.select(
        "host",
        F.col("b.shard").cast("long").alias("shard"),
        F.col("b.dist").cast("long").alias("ring_distance"),
    ).repartition(1).sortWithinPartitions("host")


@_q(
    "frontier_redirect_resolve",
    """
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    m AS (
      SELECT doc_id AS src, (doc_id * 5 + 7) % n.n AS dst
      FROM documents CROSS JOIN n
      WHERE doc_id % 3 = 0)
    SELECT d.doc_id AS doc_id,
           CAST(COALESCE(m3.dst, m2.dst, m1.dst, d.doc_id) AS BIGINT)
             AS final_id,
           CAST(CASE WHEN m3.dst IS NOT NULL THEN 3
                     WHEN m2.dst IS NOT NULL THEN 2
                     WHEN m1.dst IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS hops,
           COALESCE(m3.dst, m2.dst, m1.dst, d.doc_id) % 3 <> 0 AS terminal
    FROM documents d
    LEFT JOIN m m1 ON m1.src = d.doc_id
    LEFT JOIN m m2 ON m2.src = m1.dst
    LEFT JOIN m m3 ON m3.src = m2.dst
    ORDER BY doc_id
    """,
)
def frontier_redirect_resolve(spark, sf):
    """Redirect-chain resolution with a hop cap — the admission-time
    operator between link extraction and the URL-seen check: a crawl that
    admits redirect SOURCES re-fetches every hop and double-counts the
    target, so the frontier resolves chains to their final URL first
    (reference analog: the googleRedirect unwrap in extract/urls.py ≙
    gmaps/urls.go, generalized from one hop to a capped chain walk).

    The redirect map is derived deterministically from ``documents``
    (every third doc redirects to ``(5·id+7) mod N``, N as a scalar
    subquery — same discipline as ``graph.doc_edges``), so both engines
    build the identical graph.  Resolution = 3 chained LEFT self-joins;
    NULLs propagate past chain end, so ``coalesce`` of the hop columns is
    the furthest URL reached, the hop count falls out of the same
    NULL pattern, and terminality is arithmetic on the final id (no 4th
    join).  Rows still pointing at a redirecting URL after 3 hops surface
    with ``terminal = false`` — the caller's retry/drop policy sees them
    explicitly, like ``emb_lsh_ann_topk``'s flagged fallback.

    Scale shape: each hop is a hash equi-join of the frontier against the
    (much smaller) redirect map — broadcast when it fits, shuffled-hash
    when it doesn't; a chain cap of H costs H joins, and the production
    alternative for unbounded chains is pointer-doubling (log₂ H rounds)
    over the same join kernel, the trade the docstring of
    ``graph_bfs_depth2`` records for depth too."""
    load(spark, sf, "documents").select("doc_id").createOrReplaceTempView(
        "gms_redirect_docs"
    )
    return spark.sql(
        """
        WITH m AS (
          SELECT doc_id AS src,
                 (doc_id * 5 + 7)
                   % (SELECT COUNT(*) FROM gms_redirect_docs) AS dst
          FROM gms_redirect_docs WHERE doc_id % 3 = 0)
        SELECT d.doc_id AS doc_id,
               CAST(COALESCE(m3.dst, m2.dst, m1.dst, d.doc_id) AS BIGINT)
                 AS final_id,
               CAST(CASE WHEN m3.dst IS NOT NULL THEN 3
                         WHEN m2.dst IS NOT NULL THEN 2
                         WHEN m1.dst IS NOT NULL THEN 1
                         ELSE 0 END AS INT) AS hops,
               COALESCE(m3.dst, m2.dst, m1.dst, d.doc_id) % 3 <> 0
                 AS terminal
        FROM gms_redirect_docs d
        LEFT JOIN m m1 ON m1.src = d.doc_id
        LEFT JOIN m m2 ON m2.src = m1.dst
        LEFT JOIN m m3 ON m3.src = m2.dst
        ORDER BY doc_id
        """
    )


_WARC_FILES = 8  # records round-robin into this many warc shards


@_q(
    "frontier_warc_cdx_index",
    f"""
    WITH r AS (
      SELECT 'crawl-' || CAST(doc_id % {_WARC_FILES} AS VARCHAR)
               || '.warc.gz' AS warc_file,
             doc_id,
             CAST(800 + (doc_id * 97) % 4000 AS BIGINT) AS record_len
      FROM documents)
    SELECT warc_file, doc_id,
           CAST(COALESCE(SUM(record_len) OVER (
                  PARTITION BY warc_file ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS "offset",
           record_len,
           CAST(SUM(record_len) OVER (PARTITION BY warc_file) AS BIGINT)
             AS file_bytes
    FROM r ORDER BY warc_file, doc_id
    """,
)
def frontier_warc_cdx_index(spark, sf):
    """CDX offset index over WARC shards — Common Crawl's random-access
    index build: every archived record's (file, byte offset, length) so a
    downstream reader can range-request one page without scanning the
    shard.  Record lengths and the file assignment are synthesized
    deterministically from doc_id (round-robin into {_WARC_FILES} shards,
    the concatenation order inside a shard is doc_id order — exactly how
    a sharded WARC writer lays records down).

    The offset is a per-file running sum over the preceding records — the
    same distributed-prefix-sum kernel as ``docs_pack_sequences``, applied
    to the byte axis; ``file_bytes`` (the full-partition sum) rides the
    same shuffle and gives the reconciliation invariant
    ``last offset + len = file_bytes``.

    Scale shape: one hash shuffle on warc_file + a per-partition sort;
    at 10^10 records the file count grows with the corpus so partitions
    stay bounded, and a writer that tracks offsets at write time emits
    this index for free — the operator is the backfill/repair path."""
    d = load(spark, sf, "documents").select("doc_id")
    r = d.select(
        F.concat(
            F.lit("crawl-"),
            (F.col("doc_id") % _WARC_FILES).cast("string"),
            F.lit(".warc.gz"),
        ).alias("warc_file"),
        "doc_id",
        (800 + (F.col("doc_id") * 97) % 4000).cast("long").alias("record_len"),
    )
    w_prev = (
        Window.partitionBy("warc_file")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("warc_file")
    return (
        r.select(
            "warc_file",
            "doc_id",
            F.coalesce(F.sum("record_len").over(w_prev), F.lit(0))
            .cast("long")
            .alias("offset"),
            "record_len",
            F.sum("record_len").over(w_all).cast("long").alias("file_bytes"),
        )
        .repartition(1).sortWithinPartitions("warc_file", "doc_id")
    )


# Meta-robots synth variants: kind = doc_id % 4.  Kind 1 is uppercase ON
# PURPOSE — the extractor must be case-insensitive like real crawlers.
_META_ROBOTS_SYNTH = [
    '<meta name="robots" content="noindex,nofollow">',
    '<META NAME="robots" CONTENT="NOINDEX">',
    '<meta name="robots" content="index,follow">',
    "",
]


@_q(
    "frontier_meta_robots_gate",
    f"""
    WITH h AS (
      SELECT doc_id,
             '<html><head><title>d' || CAST(doc_id AS VARCHAR) || '</title>'
               || (CASE doc_id % 4
                     WHEN 0 THEN '{_META_ROBOTS_SYNTH[0]}'
                     WHEN 1 THEN '{_META_ROBOTS_SYNTH[1]}'
                     WHEN 2 THEN '{_META_ROBOTS_SYNTH[2]}'
                     ELSE '' END)
               || '</head><body></body></html>' AS html
      FROM documents),
    x AS (
      SELECT doc_id,
             lower(regexp_extract(html,
               '(?i)<meta\\s+name="robots"\\s+content="([^"]*)"', 1))
               AS robots_content
      FROM h)
    SELECT doc_id, robots_content,
           NOT contains(robots_content, 'noindex') AS index_allowed,
           NOT contains(robots_content, 'nofollow') AS follow_links
    FROM x ORDER BY doc_id
    """,
)
def frontier_meta_robots_gate(spark, sf):
    """Meta-robots admission gate — the page-level robots directive that
    robots.txt cannot express (``frontier_robots_eval`` handles the host
    level): parse ``<meta name="robots" content="...">`` out of the html
    head, case-insensitively, and derive the two crawl decisions —
    ``index_allowed`` (may this page enter the results/index?) and
    ``follow_links`` (may its outlinks enter the frontier?).  A crawler
    that ignores nofollow pollutes the frontier with pages it then cannot
    use; the reference's SERP/place dispatch assumes Google's pages are
    indexable, so this gate is what generalizing to the open web adds.

    The html head is synthesized deterministically (four variants by
    doc_id % 4, one deliberately uppercase so the (?i) extraction is
    load-bearing); the extraction regex and the directive logic are the
    operator under test, and both engines run the identical expressions.

    Scale shape: pure JVM regexp + string ops inside one codegen'd scan
    stage over the page table — no shuffle (the ORDER BY is the catalog's
    presentation sort); at 100 TB this runs inside the fetch round's
    pages scan exactly like the email harvest does."""
    d = load(spark, sf, "documents").select("doc_id")
    meta = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(_META_ROBOTS_SYNTH[0]))
        .when(F.col("doc_id") % 4 == 1, F.lit(_META_ROBOTS_SYNTH[1]))
        .when(F.col("doc_id") % 4 == 2, F.lit(_META_ROBOTS_SYNTH[2]))
        .otherwise(F.lit(""))
    )
    html = F.concat(
        F.lit("<html><head><title>d"),
        F.col("doc_id").cast("string"),
        F.lit("</title>"),
        meta,
        F.lit("</head><body></body></html>"),
    )
    content = F.lower(
        F.regexp_extract(
            html, r'(?i)<meta\s+name="robots"\s+content="([^"]*)"', 1
        )
    )
    return (
        d.select("doc_id", content.alias("robots_content"))
        .select(
            "doc_id",
            "robots_content",
            (~F.col("robots_content").contains("noindex")).alias("index_allowed"),
            (~F.col("robots_content").contains("nofollow")).alias("follow_links"),
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )


_IP24_BUCKETS = 64   # synthesized /24 networks
_IP_BUDGET = 60      # fetches/min an origin SERVER tolerates (shared!)


@_q(
    "frontier_ip_politeness_group",
    f"""
    WITH raw AS (SELECT doc_id, {_HOST_RAW_SQL} AS host FROM documents),
    e AS (SELECT doc_id, host, {_ETLD1_SQL} AS etld1 FROM raw),
    ip AS (
      SELECT doc_id, etld1,
             '10.0.' || CAST(
               CAST(list_sum(list_transform(range(0, 8), i ->
                 CAST(instr('0123456789abcdef',
                            substring(md5(etld1), i + 1, 1)) - 1 AS BIGINT)
                   << (4 * (7 - i)))) AS BIGINT) % {_IP24_BUCKETS}
               AS VARCHAR) AS ip24
      FROM e)
    SELECT ip24,
           CAST(COUNT(DISTINCT etld1) AS BIGINT) AS n_hosts,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           COUNT(DISTINCT etld1) > 1 AS colocated,
           CAST(GREATEST(1, {_IP_BUDGET} // COUNT(DISTINCT etld1)) AS BIGINT)
             AS per_host_budget
    FROM ip GROUP BY ip24 ORDER BY ip24
    """,
)
def frontier_ip_politeness_group(spark, sf):
    """IP-colocation politeness grouping — the budget level BELOW eTLD+1:
    virtual hosting puts many registrable domains on one origin server, so
    a crawler that is polite per-domain can still hammer one /24.  Hosts
    resolve (synthetically: md5-fold of the eTLD+1 into {_IP24_BUCKETS}
    /24 networks — the same fold the politeness buckets use, so both
    engines derive identical groups) and the per-IP rollup reports the
    colocation degree and the per-host share of the server budget
    ({_IP_BUDGET} // n_hosts, floored at 1) — the number the fetch-slot
    scheduler (``frontier_fetch_slot_schedule``) would consume instead of
    the flat per-host budget when colocation is detected.

    Scale shape: key derivation is scan-stage regex/arithmetic; the rollup
    is one groupBy on {_IP24_BUCKETS} keys whose exact COUNT(DISTINCT)
    Spark expands to a two-stage partial aggregate (dedup on (ip24, etld1)
    map-side first) — no row explosion, no Python.  At real scale ip24
    comes from a resolver-log join instead of a hash, same plan."""
    d = load(spark, sf, "documents")
    e = d.select("doc_id", F.expr(_HOST_RAW_SQL).alias("host")).withColumn(
        "etld1", F.expr(_ETLD1_SQL)
    )
    ip24 = F.concat(
        F.lit("10.0."),
        (
            F.conv(F.substring(F.md5("etld1"), 1, 8), 16, 10).cast("long")
            % _IP24_BUCKETS
        ).cast("string"),
    )
    return (
        e.select(ip24.alias("ip24"), "etld1")
        .groupBy("ip24")
        .agg(
            F.countDistinct("etld1").cast("long").alias("n_hosts"),
            F.count(F.lit(1)).cast("long").alias("n_urls"),
        )
        .select(
            "ip24",
            "n_hosts",
            "n_urls",
            (F.col("n_hosts") > 1).alias("colocated"),
            F.greatest(
                F.lit(1), F.expr(f"{_IP_BUDGET} div n_hosts")
            ).cast("long").alias("per_host_budget"),
        )
        .repartition(1).sortWithinPartitions("ip24")
    )


# ---------------------------------------------------------------------------
# Recrawl scheduling — Poisson change-rate estimation (Cho & Garcia-Molina)
# ---------------------------------------------------------------------------

_RECRAWL_VISITS = 6  # equal-interval revisit history depth per URL


@_q(
    "frontier_recrawl_poisson",
    f"""
    WITH visits AS (
      SELECT d.doc_id, g.v,
             (((d.doc_id % 97) * 2654435761 + g.v * 40503) % 97 < 25) AS changed
      FROM documents d, generate_series(1, {_RECRAWL_VISITS}) AS g(v)
    ),
    est AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_visits,
             CAST(SUM(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_changes
      FROM visits GROUP BY doc_id
    )
    SELECT doc_id, n_visits, n_changes,
           CAST(row_number() OVER (ORDER BY n_changes DESC, doc_id ASC)
                AS BIGINT) AS recrawl_rank,
           CASE WHEN n_changes >= 3 THEN 'hot'
                WHEN n_changes >= 1 THEN 'warm'
                ELSE 'cold' END AS due_bucket
    FROM est ORDER BY doc_id
    """,
)
def frontier_recrawl_poisson(spark, sf):
    """Per-URL change-rate estimation for recrawl scheduling — the policy
    step AFTER ``frontier_recrawl_diff``'s change verdicts: Cho &
    Garcia-Molina's Poisson revisit model (TOIT 2003) estimates each page's
    change rate from an equal-interval visit history and orders the recrawl
    frontier by it.  The estimator λ̂ = −ln((n − X + 0.5)/(n + 0.5))/Δ is
    strictly monotone in X (detected changes) at fixed (n, Δ), so the
    integer pair (n_changes, doc_id) carries the EXACT Poisson priority
    order — the float λ̂ map stays out of the compared output (exact-output
    rule, same as ``docs_unigram_lm_rarity``).  History is synthesized
    deterministically: {_RECRAWL_VISITS} equal-interval visits per URL,
    visit v of doc_id changed iff ((doc_id mod 97)·2654435761 + v·40503)
    mod 97 < 25 (pre-reduced so the product never overflows int64 even at
    10^10-URL doc_ids — Spark non-ANSI would wrap silently where DuckDB
    raises, so the bound is load-bearing for oracle parity)
    (~26% per-visit change odds, binomial spread over docs) — both engines
    derive identical histories and every due_bucket is populated.

    Scale shape: the history explode is a map-side ``generate_series``
    fanout (no shuffle — at 10^10 URLs the real input is the fetch log,
    already partitioned by url hash), the estimate is one partial-agg
    groupBy on the same key, and the global rank window is the frontier's
    existing priority-drain discipline (``frontier_claim_topk``) — in the
    engine the rank runs per politeness bucket, so no single-reducer
    global sort exists at scale; it is global here only to make the
    oracle's total order checkable."""
    d = load(spark, sf, "documents").select("doc_id")
    visits = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.lit(_RECRAWL_VISITS))).alias("v"),
    ).withColumn(
        # Fibonacci-multiplier visit hash → ~26%-per-visit change odds with
        # a binomial spread over docs, so every due_bucket is populated.
        # doc_id is reduced mod 97 BEFORE the multiply so the intermediate
        # stays ≤ 96·2654435761 ≈ 2.5e11 (int64-safe at any doc_id, incl.
        # 10^10-URL ids) — identical residues by modular arithmetic.
        "changed",
        ((F.col("doc_id") % 97) * F.lit(2654435761) + F.col("v") * 40503) % 97
        < 25,
    )
    est = visits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_visits"),
        F.sum(F.when(F.col("changed"), 1).otherwise(0))
        .cast("long")
        .alias("n_changes"),
    )
    w = Window.orderBy(F.col("n_changes").desc(), F.col("doc_id").asc())
    return (
        est.withColumn("recrawl_rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "due_bucket",
            F.when(F.col("n_changes") >= 3, F.lit("hot"))
            .when(F.col("n_changes") >= 1, F.lit("warm"))
            .otherwise(F.lit("cold")),
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# WARC revisit-record collapse — digest dedup within a URL's capture history
# ---------------------------------------------------------------------------

_REVISIT_CAPTURES = 3  # crawl snapshots per URL


@_q(
    "frontier_warc_revisit_collapse",
    f"""
    WITH caps AS (
      SELECT d.doc_id, g.k,
             CASE WHEN g.k > 1
                    AND (d.doc_id * 48271 + g.k * 16807) % 101 < 30
                  THEN 1 ELSE 0 END AS changed
      FROM documents d, generate_series(1, {_REVISIT_CAPTURES}) AS g(k)
    ),
    ver AS (
      SELECT doc_id, k,
             CAST(1 + SUM(changed) OVER (
               PARTITION BY doc_id ORDER BY k
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS version
      FROM caps
    ),
    refs AS (
      SELECT doc_id, k AS capture, version,
             CAST(MIN(k) OVER (PARTITION BY doc_id, version) AS BIGINT)
               AS ref_capture
      FROM ver
    )
    SELECT doc_id, CAST(capture AS BIGINT) AS capture, version,
           capture <> ref_capture AS is_revisit,
           ref_capture,
           CAST(CASE WHEN capture <> ref_capture THEN 0
                     ELSE 800 + (doc_id * 97 + version * 13) % 4000
                END AS BIGINT) AS payload_bytes
    FROM refs ORDER BY doc_id, capture
    """,
)
def frontier_warc_revisit_collapse(spark, sf):
    """WARC ``revisit`` record synthesis — the archive-side dual of the
    recrawl ops: when a capture's content digest equals an EARLIER capture
    of the same URL, the WARC writer stores a payload-less revisit record
    pointing at the original (WARC 1.1 §6.7.2 identical-payload-digest;
    Common Crawl's and the Wayback Machine's storage discipline).  Capture
    histories are synthesized deterministically ({_REVISIT_CAPTURES}
    captures/URL, capture k>1 changed iff (doc_id·48271 + k·16807) mod 101
    < 30, content version = 1 + running change count), so "same digest" =
    "same version" and the reference capture is the version's first.
    ``payload_bytes`` makes the storage win explicit: revisits store 0.

    Scale shape: ONE shuffle on the URL key covers both windows (the
    running version sum and the per-(url, version) first-capture) — at
    10^10 URLs this is the url-hash partitioning the frontier already
    maintains, so the collapse runs as a partition-local sort, the same
    discipline as ``frontier_warc_cdx_index``'s offset prefix-sum; the
    digest compare never leaves the partition because a URL's history is
    co-located by construction."""
    d = load(spark, sf, "documents").select("doc_id")
    caps = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.lit(_REVISIT_CAPTURES))).alias("k"),
    ).withColumn(
        "changed",
        F.when(
            (F.col("k") > 1)
            & ((F.col("doc_id") * 48271 + F.col("k") * 16807) % 101 < 30),
            1,
        ).otherwise(0),
    )
    wv = (
        Window.partitionBy("doc_id")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ver = caps.withColumn(
        "version", (F.lit(1) + F.sum("changed").over(wv)).cast("long")
    )
    wr = Window.partitionBy("doc_id", "version")
    refs = ver.withColumn("ref_capture", F.min("k").over(wr).cast("long"))
    return refs.select(
        "doc_id",
        F.col("k").cast("long").alias("capture"),
        "version",
        (F.col("k") != F.col("ref_capture")).alias("is_revisit"),
        "ref_capture",
        F.when(F.col("k") != F.col("ref_capture"), F.lit(0))
        .otherwise(800 + (F.col("doc_id") * 97 + F.col("version") * 13) % 4000)
        .cast("long")
        .alias("payload_bytes"),
    ).repartition(1).sortWithinPartitions("doc_id", "capture")


# ---------------------------------------------------------------------------
# URL-level quality gate — blocklist + soft keyword/digit scoring
# ---------------------------------------------------------------------------

_URL_BLOCKLIST = ("site-src3.com", "site-src7.com", "site-src13.com")
_URL_SOFT_KEYWORDS = ("crawl", "feed", "campaign")
_URL_DIGIT_PERMILLE_MAX = 250


@_q(
    "frontier_url_blocklist_filter",
    f"""
    WITH {_URL_CANON_CTES},
    h AS (
      SELECT doc_id, url_raw, url_canon,
             COALESCE(regexp_extract(url_canon, '^[a-z]+://([^/:?#]+)', 1),
                      '') AS host
      FROM canon_url),
    s AS (
      SELECT doc_id, host,
             CAST({' + '.join(
                 f"len(regexp_extract_all(lower(url_raw), '{k}'))"
                 for k in _URL_SOFT_KEYWORDS)} AS BIGINT) AS kw_score,
             CAST(len(regexp_extract_all(url_raw, '[0-9]')) * 1000
                  // greatest(length(url_raw), 1) AS BIGINT)
               AS digit_permille,
             host IN {_URL_BLOCKLIST} AS blocked_domain
      FROM h)
    SELECT doc_id, host, kw_score, digit_permille, blocked_domain,
           CASE WHEN blocked_domain THEN 'blocked'
                WHEN kw_score >= 2
                     OR digit_permille > {_URL_DIGIT_PERMILLE_MAX}
                  THEN 'flagged'
                ELSE 'clean' END AS verdict
    FROM s ORDER BY doc_id
    """,
)
def frontier_url_blocklist_filter(spark, sf):
    """URL-level quality gate — the admission stage RefinedWeb §G.1 /
    FineWeb run BEFORE fetching or keeping a page: a hard domain blocklist
    (UT1-style, here a literal eTLD+1 list standing in for the ~4M-entry
    production list) plus soft URL scoring — total occurrences of
    flag keywords {_URL_SOFT_KEYWORDS} in the lowercased raw URL and the
    URL's digit density (link-farm/session-id smell), flagged past
    {_URL_DIGIT_PERMILLE_MAX}‰.  Hard block wins over soft flags; scores
    stay exact integers.  The host comes from the SAME canonical string
    the frontier keys on (``frontier_url_canonicalize``), so the gate and
    the dedup key can never disagree about what the domain is.

    Scale shape: pure scan-stage JVM regex over the URL column — zero
    shuffles (the ORDER BY is presentation only).  The production
    blocklist is a broadcast join against a 4M-row dim table instead of an
    IN literal — same plan shape as ``broadcast_dim_rollup``; soft scores
    stay map-side either way.  At 10^10 URLs this gate runs where the
    frontier rows already live, before any fetch budget is spent — the
    cheapest reject in the pipeline."""
    kw = None
    for k in _URL_SOFT_KEYWORDS:
        term = F.expr(f"size(regexp_extract_all(lower(url_raw), '{k}', 0))")
        kw = term if kw is None else kw + term
    c = frontier_url_canon_base(spark, sf).select(
        "doc_id", "url_raw", "url_canon"
    )
    return (
        c.withColumn(
            "host",
            F.regexp_extract("url_canon", "^[a-z]+://([^/:?#]+)", 1),
        )
        .withColumn("kw_score", kw.cast("long"))
        .withColumn(
            "digit_permille",
            # greatest(...,1): an empty URL must not divide by zero —
            # DuckDB's // raises where Spark's div returns NULL, so the
            # guard is required in BOTH engines for oracle parity
            F.expr(
                "CAST(size(regexp_extract_all(url_raw, '[0-9]', 0)) * 1000"
                " div greatest(length(url_raw), 1) AS BIGINT)"
            ),
        )
        .withColumn(
            "blocked_domain", F.col("host").isin(*_URL_BLOCKLIST)
        )
        .select(
            "doc_id",
            "host",
            "kw_score",
            "digit_permille",
            "blocked_domain",
            F.when(F.col("blocked_domain"), F.lit("blocked"))
            .when(
                (F.col("kw_score") >= 2)
                | (F.col("digit_permille") > _URL_DIGIT_PERMILLE_MAX),
                F.lit("flagged"),
            )
            .otherwise(F.lit("clean"))
            .alias("verdict"),
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Adaptive politeness — integer EWMA of fetch latency → crawl-delay
# ---------------------------------------------------------------------------

_EWMA_FETCHES = 6       # smoothing horizon (fetch history depth per URL/host)
_EWMA_DELAY_FACTOR = 4  # crawl_delay = factor × smoothed latency (AIMD-ish)
_EWMA_DELAY_MIN = 500   # ms floor
_EWMA_DELAY_MAX = 1000  # ms ceiling
_EWMA_SLOW_MS = 240     # smoothed latency past this flags a slow host


def _ewma_sql(lat) -> str:
    """Unrolled integer EWMA (α=1/8): e1 = lat(1); e_k = (7·e_{k-1} +
    lat(k)) div 8 — integer division each step, so the recursion is NOT a
    closed-form sum and must be unrolled identically in both engines.
    ``lat(k)`` is rendered by the caller (same string for Spark and
    DuckDB; both use BIGINT arithmetic and `//`/`div` floor division on
    non-negative values)."""
    expr = lat(1)
    for k in range(2, _EWMA_FETCHES + 1):
        expr = f"(7 * ({expr}) + {lat(k)})"
        # Spark `div` / DuckDB `//` — caller substitutes the operator
        expr = expr + " {D} 8"
    return expr


_LAT = "(80 + (doc_id * 131 + {k} * 17) % 241)"
_EWMA_EXPR_DUCK = _ewma_sql(lambda k: _LAT.format(k=k)).replace("{D}", "//")
_EWMA_EXPR_SPARK = _ewma_sql(lambda k: _LAT.format(k=k)).replace("{D}", "div")


@_q(
    "frontier_host_rate_ewma",
    f"""
    WITH s AS (
      SELECT doc_id,
             CAST({_EWMA_EXPR_DUCK}
                  AS BIGINT) AS ewma_ms,
             CAST(LEAST({', '.join(_LAT.format(k=k)
                                   for k in range(1, _EWMA_FETCHES + 1))})
                  AS BIGINT) AS min_lat_ms,
             CAST(GREATEST({', '.join(_LAT.format(k=k)
                                      for k in range(1, _EWMA_FETCHES + 1))})
                  AS BIGINT) AS max_lat_ms
      FROM documents)
    SELECT doc_id, ewma_ms, min_lat_ms, max_lat_ms,
           CAST(LEAST({_EWMA_DELAY_MAX},
                      GREATEST({_EWMA_DELAY_MIN},
                               ewma_ms * {_EWMA_DELAY_FACTOR})) AS BIGINT)
             AS crawl_delay_ms,
           ewma_ms > {_EWMA_SLOW_MS} AS slow_host
    FROM s ORDER BY doc_id
    """,
)
def frontier_host_rate_ewma(spark, sf):
    """Adaptive politeness — the feedback loop a fixed per-host budget
    lacks: smooth each host's observed fetch latency with an integer EWMA
    (α=1/8, the classic TCP RTT estimator form) and derive the crawl
    delay from it ({_EWMA_DELAY_FACTOR}× smoothed latency, clamped to
    [{_EWMA_DELAY_MIN}, {_EWMA_DELAY_MAX}] ms) — slow servers get backed
    off automatically, fast ones get crawled at full budget, the
    discipline polite crawlers (Heritrix's delay-factor, the reference's
    fixed politeness budget) parameterize by hand.  The integer recursion
    e_k = (7·e_{{k-1}} + lat_k) div 8 is UNROLLED identically in both
    engines (integer div makes it non-associative — no closed form), and
    latencies are a closed form of (doc_id, fetch#), so both engines
    derive identical histories.

    Scale shape: ZERO shuffles — the history is a closed form, so the
    whole pipeline (six latencies, the unrolled EWMA, the clamp) is one
    codegen'd projection inside the scan; in production the latencies
    come from the fetch log pre-aggregated per host, and the EWMA folds
    in the same partition-local pass that writes the politeness-budget
    table (the per-(host,salt) key the claim window already uses)."""
    lat = lambda k: _LAT.format(k=k)  # noqa: E731
    mins = ", ".join(lat(k) for k in range(1, _EWMA_FETCHES + 1))
    ew = _EWMA_EXPR_SPARK
    return (
        load(spark, sf, "documents")
        .select(
            "doc_id",
            F.expr(f"CAST({ew} AS BIGINT)").alias("ewma_ms"),
            F.expr(f"CAST(least({mins}) AS BIGINT)").alias("min_lat_ms"),
            F.expr(f"CAST(greatest({mins}) AS BIGINT)").alias("max_lat_ms"),
        )
        .select(
            "doc_id",
            "ewma_ms",
            "min_lat_ms",
            "max_lat_ms",
            F.expr(
                f"CAST(least({_EWMA_DELAY_MAX}, greatest({_EWMA_DELAY_MIN},"
                f" ewma_ms * {_EWMA_DELAY_FACTOR})) AS BIGINT)"
            ).alias("crawl_delay_ms"),
            (F.col("ewma_ms") > _EWMA_SLOW_MS).alias("slow_host"),
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )
