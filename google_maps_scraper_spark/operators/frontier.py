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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analytics import _URL_CANON_CTES, frontier_url_canonicalize, load

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
    c = frontier_url_canonicalize(spark, sf).select("doc_id", "url_canon")
    return (
        c.withColumn(
            "rest", F.expr("substr(url_canon, instr(url_canon, '://') + 3)")
        )
        .withColumn("hostport", F.expr("regexp_extract(rest, '^[^/]*', 0)"))
        .withColumn("host", F.expr("regexp_replace(hostport, ':[0-9]+$', '')"))
        .withColumn("port", F.expr("regexp_extract(hostport, ':([0-9]+)$', 1)"))
        .select(
            "doc_id",
            "url_canon",
            F.expr(
                "array_join(reverse(split(host, '[.]')), ',')"
                " || CASE WHEN port = '' THEN '' ELSE ':' || port END"
                " || ')' || substr(rest, length(hostport) + 1)"
            ).alias("surt_key"),
        )
        .orderBy("doc_id")
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
        .orderBy("doc_id")
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
        frontier_url_canonicalize(spark, sf)
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
        .orderBy("doc_id")
    )
