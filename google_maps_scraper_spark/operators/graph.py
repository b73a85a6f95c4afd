"""Iterative graph compute over the document link graph.

A web crawl at 10^10-URL scale IS a graph workload: the frontier expands a
link graph, and the canonical post-crawl analyses — PageRank for recrawl
prioritisation, triangle counting for spam/link-farm detection — are
iterative joins over an edge table far too large for any single node.  The
reference's crawl graph (seed → SERP → place → website,
``gmaps/job.go``/``gmaps/place.go``) is two hops deep; these operators
exercise the general-depth machinery on the same engine.

The edge table is DERIVED deterministically from the ``documents`` table
(doc ``u`` links to ``(u*(j+2) + j) mod N`` for ``j`` in 0..2, self loops
dropped) so both the Spark plan and the DuckDB oracle construct the
identical graph at any scale factor with zero external data — the
BASELINE.json input-hint discipline.  The three multiplier maps share
different gcds with N, so in-degrees spread (1..7 at N=500) instead of the
uniform-rank degenerate case a bijective shift map would give.

All ranks are SCALED INTEGERS (1.0 ≡ 1_000_000, damping 0.85 applied as
``(85*x) div 100``): integer division is associativity-exact, so the
comparison is bit-exact across engines with no float-ordering hazard.

Scale shapes (10^10 nodes, ~3·10^10 edges):

* PageRank: each iteration is one shuffle — contributions pre-aggregate
  map-side on ``dst`` (partial sum before the exchange), the rank table
  joins edge partitions on ``src``.  On a real cluster the edge table is
  bucketed by ``src`` once so every iteration reuses the same partitioning
  (no re-shuffle of the edges, only the rank deltas move); rank state is
  re-wrapped per iteration exactly like the crawl engine's state leaves
  (``plans/crawl.py`` ``_reset_stats``) so Catalyst planning stays O(1) in
  iteration count.
* Triangles: canonical ``u < v`` orientation makes each triangle counted
  once; the wedge join's fanout is bounded in practice by orienting edges
  from the lower-(degree, id) endpoint (node-iterator of Schank & Wagner),
  which caps per-key work at O(max_deg) — with id ordering kept here so the
  oracle is order-free.  Both joins are plain equi-joins: AQE handles the
  skewed high-degree keys by splitting their partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analytics import load

__all__ = ["QUERIES", "ORACLES", "doc_edges"]

QUERIES = {}
ORACLES = {}

EDGE_FANOUT = 3  # links per document before self-loop drop / dedup


def _register(name, sql=None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# Shared DuckDB CTE: the derived edge list (directed, self-loops dropped,
# deduplicated).  Kept textually tiny so each oracle inlines it.
_EDGES_CTE = f"""
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    e0 AS (
      SELECT d.doc_id AS src,
             (d.doc_id * (j.j + 2) + j.j) % n.n AS dst
      FROM documents d
      CROSS JOIN n
      CROSS JOIN (VALUES (0), (1), (2)) AS j(j)
    ),
    e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst)
"""


def doc_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Directed edge list (src, dst) derived from ``documents``.

    ``N`` enters as a SCALAR SUBQUERY (one count job whose result inlines
    into the projection) rather than a count-crossJoin — the crossJoin form
    plans as a 1-row BroadcastNestedLoopJoin, which the plan guard forbids
    outright because every OTHER BNLJ is a scale killer; the generator
    explode stays inside the scan stage, so edge construction is a single
    map-side pass at any corpus size."""
    load(spark, sf, "documents").select("doc_id").createOrReplaceTempView(
        "gms_graph_docs"
    )
    js = ",".join(str(j) for j in range(EDGE_FANOUT))
    return spark.sql(
        f"""
        SELECT src, dst FROM (
          SELECT doc_id AS src,
                 (doc_id * (j + 2) + j)
                   % (SELECT COUNT(*) FROM gms_graph_docs) AS dst
          FROM gms_graph_docs
          LATERAL VIEW explode(array({js})) AS j
        ) WHERE src <> dst
        GROUP BY src, dst
        """
    )


_PR_ONE = 1_000_000      # scaled 1.0
_PR_BASE = 150_000       # (1 - 0.85) * _PR_ONE


def _pr_step(ranks: DataFrame, edges_deg: DataFrame, nodes: DataFrame) -> DataFrame:
    """One scaled-integer PageRank iteration: contributions flow src→dst,
    pre-aggregated map-side on dst; nodes with no in-links keep the base."""
    contrib = (
        edges_deg.join(ranks, "src")
        .select("dst", F.expr("r div out_deg").alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("s"))
    )
    return nodes.join(contrib, nodes.doc_id == contrib.dst, "left").select(
        F.col("doc_id").alias("src"),
        (
            F.lit(_PR_BASE)
            + F.expr("85 * coalesce(s, 0) div 100").cast("long")
        ).alias("r"),
    )


@_register(
    "graph_pagerank_2iter",
    f"""
    WITH {_EDGES_CTE},
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg FROM e GROUP BY src),
    r0 AS (SELECT doc_id AS src, CAST({_PR_ONE} AS BIGINT) AS r FROM documents),
    c1 AS (SELECT e.dst, CAST(SUM(r0.r // deg.out_deg) AS BIGINT) AS s
           FROM e JOIN deg USING (src) JOIN r0 USING (src) GROUP BY e.dst),
    r1 AS (SELECT d.doc_id AS src,
                  CAST({_PR_BASE} + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS r
           FROM documents d LEFT JOIN c1 ON c1.dst = d.doc_id),
    c2 AS (SELECT e.dst, CAST(SUM(r1.r // deg.out_deg) AS BIGINT) AS s
           FROM e JOIN deg USING (src) JOIN r1 USING (src) GROUP BY e.dst),
    r2 AS (SELECT d.doc_id,
                  CAST({_PR_BASE} + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT)
                    AS pr_scaled
           FROM documents d LEFT JOIN c2 ON c2.dst = d.doc_id)
    SELECT doc_id, pr_scaled FROM r2 ORDER BY doc_id
    """,
)
def graph_pagerank_2iter(spark, sf):
    """Two scaled-integer PageRank iterations (damping 0.85) over the
    derived doc link graph — the recrawl-prioritisation signal a frontier
    at 10^10 URLs actually uses (change-rate-weighted PageRank is the
    classic recrawl policy).

    Each iteration = join(ranks, edges on src) + groupBy(dst): contributions
    partial-aggregate map-side before the one exchange per iteration; out-
    degrees are computed once and ride the edge table.  Integer ranks
    (1.0 ≡ 10^6, ``div`` throughout) make the result bit-exact vs the
    DuckDB oracle — float PageRank would differ by summation order."""
    edges = doc_edges(spark, sf)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    edges_deg = edges.join(deg, "src")
    nodes = load(spark, sf, "documents").select("doc_id")
    ranks = nodes.select(
        F.col("doc_id").alias("src"), F.lit(_PR_ONE).cast("long").alias("r")
    )
    for _ in range(2):
        ranks = _pr_step(ranks, edges_deg, nodes)
    return (
        ranks.select(F.col("src").alias("doc_id"), F.col("r").alias("pr_scaled"))
        .repartition(1).sortWithinPartitions("doc_id")
    )


@_register(
    "graph_triangle_count",
    f"""
    WITH {_EDGES_CTE},
    u AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e),
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM u e1
      JOIN u e2 ON e2.a = e1.b
      JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    m AS (SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri),
    cnt AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM m GROUP BY node)
    SELECT d.doc_id, COALESCE(cnt.n_tri, 0) AS n_tri
    FROM documents d LEFT JOIN cnt ON cnt.node = d.doc_id
    ORDER BY d.doc_id
    """,
)
def graph_triangle_count(spark, sf):
    """Per-node triangle counts over the undirected doc link graph — the
    link-farm / spam-cluster detector (dense triangle neighbourhoods mark
    collusive linking; sparse ones mark organic link structure).

    Canonical ``a < b`` orientation counts each triangle exactly once; the
    wedge join (e1.b = e2.a ⇒ a < b < c) then one membership equi-join
    closes the triangle.  Both joins are shuffle equi-joins on edge keys —
    the node-iterator shape whose fanout a real deployment bounds by
    orienting on (degree, id) instead of id (documented, result-identical);
    AQE splits skewed high-degree keys at runtime."""
    e = doc_edges(spark, sf)
    u = (
        e.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    e1 = u
    e2 = u.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = u.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    members = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    cnt = members.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))
    d = load(spark, sf, "documents").select("doc_id")
    return (
        d.join(cnt, d.doc_id == cnt.node, "left")
        .select("doc_id", F.coalesce("n_tri", F.lit(0)).alias("n_tri"))
        .repartition(1).sortWithinPartitions("doc_id")
    )


@_register(
    "graph_reciprocal_edges",
    f"""
    WITH {_EDGES_CTE},
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS out_deg
            FROM e GROUP BY src),
    rec AS (SELECT e1.src AS node, CAST(COUNT(*) AS BIGINT) AS recip_n
            FROM e e1 JOIN e e2 ON e1.src = e2.dst AND e1.dst = e2.src
            GROUP BY e1.src)
    SELECT node, out_deg, COALESCE(recip_n, 0) AS recip_n
    FROM deg LEFT JOIN rec USING (node) ORDER BY node
    """,
)
def graph_reciprocal_edges(spark, sf):
    """Per-node reciprocal-link counts (u→v with v→u) over the directed doc
    link graph — the mutual-linking signal of link-exchange/spam-ring
    detection (organic web linking is overwhelmingly asymmetric; reciprocal
    density flags collusion, complementing the triangle counter's
    clustering signal).

    One self-equi-join on the composite (src, dst) key — the reversed edge
    list reuses the same table, so at scale the join co-locates for free
    when the edge table is bucketed by its key (same bucketing PageRank's
    iterations reuse); the per-node rollups partial-aggregate map-side.
    No new shuffle shape beyond what the other graph ops already pinned."""
    e = doc_edges(spark, sf)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    rec = e.join(rev, ["src", "dst"]).groupBy("src").agg(
        F.count(F.lit(1)).alias("recip_n")
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    return (
        deg.join(rec, "src", "left")
        .select(
            F.col("src").alias("node"),
            "out_deg",
            F.coalesce("recip_n", F.lit(0)).alias("recip_n"),
        )
        .repartition(1).sortWithinPartitions("node")
    )


_ANCHOR_MOD = 11  # distinct anchor-text vocabulary size in the derived graph


@_register(
    "graph_anchor_text_inversion",
    f"""
    WITH {_EDGES_CTE},
    a AS (SELECT src, dst,
                 'kw' || CAST((src + dst) % {_ANCHOR_MOD} AS STRING) AS anchor
          FROM e),
    inl AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS n_inlinks
            FROM e GROUP BY dst),
    da AS (SELECT DISTINCT dst, anchor FROM a),
    agg AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS n_anchors,
                   string_agg(anchor, ' ' ORDER BY anchor) AS anchors
            FROM da GROUP BY dst)
    SELECT inl.dst AS doc_id, n_inlinks, n_anchors, anchors
    FROM inl JOIN agg ON agg.dst = inl.dst
    ORDER BY doc_id
    """,
)
def graph_anchor_text_inversion(spark, sf):
    """Link inversion with anchor-text aggregation — the oldest web-scale
    reduce there is (the op MapReduce was built to run): flip every edge to
    point AT its target and collect the distinct anchor texts inlinks use,
    because what OTHER pages call a URL is a stronger relevance signal than
    the page's own words.  Anchor text derives deterministically from the
    edge key (``kw((src+dst) mod {_ANCHOR_MOD})``) so both engines build the
    identical corpus (the zero-external-data discipline of ``doc_edges``).

    Scale shape: one groupBy on dst — ``collect_set`` dedups INSIDE the
    partial aggregate, so the map side already emits at most the anchor
    vocabulary per (partition, dst) and the exchange carries bounded sets,
    not the raw 3·10^10 edge stream; a production variant caps the set with
    ``slice()`` after sort (documented, not needed at vocab {_ANCHOR_MOD}).
    The sorted space-join makes the set comparison order-free and string-
    exact vs the oracle."""
    e = doc_edges(spark, sf)
    a = e.withColumn(
        "anchor",
        F.concat(
            F.lit("kw"),
            ((F.col("src") + F.col("dst")) % _ANCHOR_MOD).cast("string"),
        ),
    )
    return (
        a.groupBy("dst")
        .agg(
            F.count(F.lit(1)).alias("n_inlinks"),
            F.count_distinct("anchor").alias("n_anchors"),
            F.concat_ws(" ", F.array_sort(F.collect_set("anchor"))).alias(
                "anchors"
            ),
        )
        .select(F.col("dst").alias("doc_id"), "n_inlinks", "n_anchors", "anchors")
        .repartition(1).sortWithinPartitions("doc_id")
    )


@_register(
    "graph_hits_1iter",
    f"""
    WITH {_EDGES_CTE},
    auth AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS auth FROM e GROUP BY dst),
    hub AS (SELECT e.src, CAST(SUM(auth.auth) AS BIGINT) AS hub
            FROM e JOIN auth USING (dst) GROUP BY e.src)
    SELECT d.doc_id,
           COALESCE(auth.auth, 0) AS auth,
           COALESCE(hub.hub, 0) AS hub
    FROM documents d
    LEFT JOIN auth ON auth.dst = d.doc_id
    LEFT JOIN hub ON hub.src = d.doc_id
    ORDER BY d.doc_id
    """,
)
def graph_hits_1iter(spark, sf):
    """One un-normalized HITS iteration (Kleinberg) from the uniform start:
    ``auth(v) = Σ hub₀(u→v) = indegree(v)``, then ``hub(u) = Σ auth(v)`` over
    u's out-links — hubs are pages whose OUTLINKS point at well-cited pages,
    the complementary signal to PageRank's in-link flow (a crawl frontier
    seeds from high-hub pages to reach many authorities per fetch).
    Normalization is a scalar factor per vector — it cannot change any
    ordering — so dropping it keeps every score an exact integer and the
    oracle comparison bit-exact (float L2 normalization would differ by
    summation order).

    Scale shape: two shuffles total — the indegree groupBy(dst) and the
    hub groupBy(src) after an equi-join of the edge table with the tiny
    per-node auth table; both partial-aggregate map-side, and on a real
    cluster both reuse the single (src)-bucketed edge layout the PageRank
    iterations pinned (only per-node score deltas ever move)."""
    e = doc_edges(spark, sf)
    auth = e.groupBy("dst").agg(F.count(F.lit(1)).alias("auth"))
    hub = (
        e.join(auth, "dst")
        .groupBy("src")
        .agg(F.sum("auth").alias("hub"))
    )
    d = load(spark, sf, "documents").select("doc_id")
    return (
        d.join(auth, d.doc_id == auth.dst, "left")
        .join(hub, d.doc_id == hub.src, "left")
        .select(
            "doc_id",
            F.coalesce("auth", F.lit(0)).alias("auth"),
            F.coalesce("hub", F.lit(0)).alias("hub"),
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )


@_register(
    "graph_label_propagation_2iter",
    f"""
    WITH {_EDGES_CTE},
    und AS (SELECT src AS v, dst AS u FROM e
            UNION ALL
            SELECT dst AS v, src AS u FROM e),
    l1 AS (SELECT v, LEAST(v, MIN(u)) AS lbl FROM und GROUP BY v),
    l2 AS (SELECT und.v AS v, LEAST(MIN(a.lbl), MIN(b.lbl)) AS label
           FROM und
           JOIN l1 a ON a.v = und.v
           JOIN l1 b ON b.v = und.u
           GROUP BY und.v)
    SELECT v, CAST(label AS BIGINT) AS label FROM l2 ORDER BY v
    """,
)
def graph_label_propagation_2iter(spark, sf):
    """Min-label propagation, two synchronous rounds — the connected-
    components / community-seeding kernel (each node adopts the minimum
    label in its closed neighborhood; labels start as node ids).  This is
    the hash-min building block of large-graph CC (Rastogi et al.) that
    ``dedup_cluster_components`` applies to the dedup graph — here run on
    the directed crawl link graph treated as undirected, the shape used to
    group mirror sites / link farms before recrawl budgeting.

    Scale shape: one shuffle per round.  Round 1 is a groupBy(v) over the
    undirected edge view with a map-side MIN partial; round 2 re-joins the
    edge table against the tiny (v, lbl) state on both endpoints — on a
    real cluster the edge table stays bucketed by v (both probes reuse the
    same layout; only the label table, O(nodes) not O(edges), moves), the
    same pinned-edge-layout rule as the PageRank iterations above.  The
    MIN aggregate is idempotent and associative, so stragglers and
    re-execution are harmless — no float, no ordering hazard."""
    e = doc_edges(spark, sf)
    und = e.select(F.col("src").alias("v"), F.col("dst").alias("u")).unionAll(
        e.select(F.col("dst").alias("v"), F.col("src").alias("u"))
    )
    l1 = (
        und.groupBy("v")
        .agg(F.min("u").alias("mu"))
        .select("v", F.least(F.col("v"), F.col("mu")).alias("lbl"))
    )
    a = l1.select(F.col("v").alias("av"), F.col("lbl").alias("lbl_v"))
    b = l1.select(F.col("v").alias("bv"), F.col("lbl").alias("lbl_u"))
    return (
        und.join(a, und.v == a.av)
        .join(b, und.u == b.bv)
        .groupBy("v")
        .agg(F.least(F.min("lbl_v"), F.min("lbl_u")).alias("label"))
        .repartition(1).sortWithinPartitions("v")
    )


@_register(
    "graph_degree_histogram",
    f"""
    WITH {_EDGES_CTE},
    od AS (SELECT d.doc_id, CAST(COUNT(e.src) AS BIGINT) AS deg
           FROM documents d LEFT JOIN e ON e.src = d.doc_id
           GROUP BY d.doc_id),
    idg AS (SELECT d.doc_id, CAST(COUNT(e.dst) AS BIGINT) AS deg
            FROM documents d LEFT JOIN e ON e.dst = d.doc_id
            GROUP BY d.doc_id),
    ho AS (SELECT deg AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes_out
           FROM od GROUP BY deg),
    hi AS (SELECT deg AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes_in
           FROM idg GROUP BY deg)
    SELECT COALESCE(ho.degree, hi.degree) AS degree,
           COALESCE(n_nodes_out, 0) AS n_nodes_out,
           COALESCE(n_nodes_in, 0) AS n_nodes_in
    FROM ho FULL OUTER JOIN hi ON ho.degree = hi.degree
    ORDER BY degree
    """,
)
def graph_degree_histogram(spark, sf):
    """Degree distribution of the link graph — the first diagnostic run on
    any web graph (the in-degree tail is the power law that decides skew
    strategy: which hosts need salting, where AQE skew-split will fire,
    how deep the politeness queues get).  Zero-degree nodes are COUNTED
    (left join from the node table), because "pages nobody links to" is
    exactly the orphan set a recrawl scheduler treats specially.

    Scale shape (10^10 nodes): two groupBys over the edge table shuffled
    on node id (map-side count partials; AQE splits the celebrity keys),
    then histograms over the per-node table — whose output is only as
    large as the number of DISTINCT degree values (≪ nodes, by the power
    law itself), so the final full-outer merge is a broadcast-sized join.
    No float, no ordering hazard: every column is a count."""
    e = doc_edges(spark, sf)
    docs = load(spark, sf, "documents").select("doc_id")

    def hist(key: str, out_name: str) -> DataFrame:
        per_node = (
            docs.join(
                e.groupBy(F.col(key).alias("doc_id")).agg(
                    F.count(F.lit(1)).alias("d")
                ),
                "doc_id",
                "left",
            )
            .select(F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("degree"))
        )
        return per_node.groupBy("degree").agg(F.count(F.lit(1)).alias(out_name))

    ho = hist("src", "n_nodes_out")
    hi = hist("dst", "n_nodes_in")
    return (
        ho.join(hi, "degree", "full_outer")
        .select(
            "degree",
            F.coalesce("n_nodes_out", F.lit(0)).cast("long").alias("n_nodes_out"),
            F.coalesce("n_nodes_in", F.lit(0)).cast("long").alias("n_nodes_in"),
        )
        .repartition(1).sortWithinPartitions("degree")
    )


_BFS_SEED_MOD = 97  # doc_id % 97 == 0 marks the seed set (~1% of nodes)


@_register(
    "graph_bfs_depth2",
    f"""
    WITH {_EDGES_CTE},
    d0 AS (SELECT doc_id AS v FROM documents WHERE doc_id % {_BFS_SEED_MOD} = 0),
    r1 AS (SELECT DISTINCT e.dst AS v FROM e JOIN d0 ON e.src = d0.v
           WHERE e.dst NOT IN (SELECT v FROM d0)),
    r2 AS (SELECT DISTINCT e.dst AS v FROM e JOIN r1 ON e.src = r1.v
           WHERE e.dst NOT IN (SELECT v FROM d0)
             AND e.dst NOT IN (SELECT v FROM r1)),
    lab AS (SELECT v, 0 AS depth FROM d0
            UNION ALL SELECT v, 1 FROM r1
            UNION ALL SELECT v, 2 FROM r2)
    SELECT d.doc_id, CAST(COALESCE(lab.depth, -1) AS BIGINT) AS depth
    FROM documents d LEFT JOIN lab ON lab.v = d.doc_id
    ORDER BY d.doc_id
    """,
)
def graph_bfs_depth2(spark, sf):
    """Breadth-first crawl-depth labeling from a seed set, depth cap 2 —
    the north_star's "breadth-first-with-depth-cap crawl ordering" as a
    standalone graph kernel (the crawl engine's seed → SERP → place
    expansion IS this computation; ``max_depth`` in the reference's
    job chain, gmaps/job.go).  Each node gets the minimum number of hops
    from any seed within the cap, or -1 if unreachable — the label a
    frontier uses to enforce the depth cap without carrying per-path
    state.

    Scale shape: one equi-join + anti-join per level — the exact
    admission pipeline of a crawl round (expand claimed, drop seen),
    so each level is one shuffle over the edge table and the "seen"
    anti-join probes a frontier-sized table (broadcast-sized relative to
    the edges at every real depth; the crawl engine's scan-probe
    semi-join is the same shape).  Levels are inherently sequential —
    that is the data dependency, same as the reference's depth loop."""
    e = doc_edges(spark, sf)
    docs = load(spark, sf, "documents").select("doc_id")
    d0 = docs.filter(F.col("doc_id") % _BFS_SEED_MOD == 0).select(
        F.col("doc_id").alias("v")
    )
    r1 = (
        e.join(d0, e.src == d0.v)
        .select(F.col("dst").alias("v"))
        .distinct()
        .join(d0, "v", "left_anti")
    )
    seen01 = d0.unionAll(r1)
    r2 = (
        e.join(r1, e.src == r1.v)
        .select(F.col("dst").alias("v"))
        .distinct()
        .join(seen01, "v", "left_anti")
    )
    lab = (
        d0.withColumn("depth", F.lit(0))
        .unionAll(r1.withColumn("depth", F.lit(1)))
        .unionAll(r2.withColumn("depth", F.lit(2)))
    )
    return (
        docs.join(lab, docs.doc_id == lab.v, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("depth"), F.lit(-1)).cast("long").alias("depth"),
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )


@_register(
    "graph_domain_link_matrix",
    None,  # SQL assembled below (needs the frontier host fragments)
)
def graph_domain_link_matrix(spark, sf):
    """Domain-level condensation of the link graph — collapse page→page
    edges into an eTLD+1 → eTLD+1 matrix with link counts, the host graph
    behind link-farm detection, domain authority, and crawl-budget
    allocation (page graphs at 10^10 nodes are analyzed at domain
    granularity first; Common Crawl publishes exactly this artifact as its
    "domain-level web graph").  Nodes map to registrable domains via the
    shared host-synthesis + eTLD+1 fragments (``operators.frontier``), so
    both engines condense the identical graph; ``internal`` marks
    same-domain edges (site navigation) that domain-rank computations
    drop.

    Scale shape: the node→domain map projects inside the documents scan;
    the edge table joins it twice (src, dst) — plain hash equi-joins that
    broadcast while the map fits and shuffle-hash beyond — and the
    condensation groupBy has |domains|² worst-case but power-law actual
    cardinality with map-side partials.  No step touches page bodies."""
    from .frontier import _ETLD1_SQL, _HOST_RAW_SQL

    d = load(spark, sf, "documents")
    dom = (
        d.select("doc_id", F.expr(_HOST_RAW_SQL).alias("host"))
        .withColumn("etld1", F.expr(_ETLD1_SQL))
        .select("doc_id", "etld1")
    )
    e = doc_edges(spark, sf)
    return (
        e.join(dom.withColumnRenamed("etld1", "src_dom"), e.src == dom.doc_id)
        .select("src_dom", "dst")
        .join(
            dom.select(
                F.col("doc_id").alias("d2"), F.col("etld1").alias("dst_dom")
            ),
            F.col("dst") == F.col("d2"),
        )
        .groupBy("src_dom", "dst_dom")
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
        .withColumn("internal", F.col("src_dom") == F.col("dst_dom"))
        .repartition(1).sortWithinPartitions("src_dom", "dst_dom")
    )


def _domain_matrix_sql() -> str:
    from .frontier import _ETLD1_SQL, _HOST_RAW_SQL

    return f"""
    WITH {_EDGES_CTE},
    raw AS (SELECT doc_id, {_HOST_RAW_SQL} AS host FROM documents),
    dom AS (SELECT doc_id, {_ETLD1_SQL} AS etld1 FROM raw)
    SELECT s.etld1 AS src_dom, t.etld1 AS dst_dom,
           CAST(COUNT(*) AS BIGINT) AS n_links,
           s.etld1 = t.etld1 AS internal
    FROM e
    JOIN dom s ON s.doc_id = e.src
    JOIN dom t ON t.doc_id = e.dst
    GROUP BY s.etld1, t.etld1 ORDER BY src_dom, dst_dom
    """


ORACLES["graph_domain_link_matrix"] = _domain_matrix_sql()


@_register(
    "graph_harmonic_centrality_2hop",
    f"""
    WITH {_EDGES_CTE},
    in1 AS (SELECT DISTINCT dst AS v, src AS u FROM e),
    two0 AS (
      SELECT DISTINCT b.dst AS v, a.src AS u
      FROM e a JOIN e b ON a.dst = b.src),
    two AS (
      SELECT t.v, t.u FROM two0 t
      LEFT JOIN in1 ON in1.v = t.v AND in1.u = t.u
      WHERE t.u <> t.v AND in1.u IS NULL),
    c1 AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n1 FROM in1 GROUP BY 1),
    c2 AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n2 FROM two GROUP BY 1)
    SELECT d.doc_id,
           COALESCE(c1.n1, 0) AS n_dist1,
           COALESCE(c2.n2, 0) AS n_dist2,
           2 * COALESCE(c1.n1, 0) + COALESCE(c2.n2, 0) AS harmonic_x2
    FROM documents d
    LEFT JOIN c1 ON c1.v = d.doc_id
    LEFT JOIN c2 ON c2.v = d.doc_id
    ORDER BY d.doc_id
    """,
)
def graph_harmonic_centrality_2hop(spark, sf):
    """Harmonic centrality truncated at radius 2, inbound direction — the
    bounded-radius centrality Common Crawl publishes for its host graph
    (harmonic handles disconnected webs where closeness breaks; the
    2-hop truncation is what makes it computable at 10^10 nodes).  For
    each node: |exact-distance-1 in-neighbors| + ½·|exact-distance-2| —
    scaled ×2 (``harmonic_x2 = 2·n1 + n2``) so the score stays an exact
    integer.

    Scale shape: distance-1 is the edge table deduped; distance-2 is ONE
    self-join (fanout bounded by per-node out-degree, here ≤{EDGE_FANOUT})
    followed by an anti-join that removes nodes already at distance 1 —
    the same expand-then-drop-seen shape as a crawl round and
    ``graph_bfs_depth2``, but per-TARGET, so the counts partial-aggregate
    map-side and only (v, count) pairs cross the final wire."""
    e = doc_edges(spark, sf)
    docs = load(spark, sf, "documents").select("doc_id")
    in1 = e.select(F.col("dst").alias("v"), F.col("src").alias("u")).distinct()
    two = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.dst") == F.col("b.src"))
        .select(F.col("b.dst").alias("v"), F.col("a.src").alias("u"))
        .distinct()
        .filter(F.col("u") != F.col("v"))
        .join(in1, ["v", "u"], "left_anti")
    )
    c1 = in1.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("n_dist1"))
    c2 = two.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("n_dist2"))
    return (
        docs.join(c1, docs.doc_id == c1.v, "left")
        .drop("v")
        .join(c2, docs.doc_id == c2.v, "left")
        .drop("v")
        .select(
            "doc_id",
            F.coalesce("n_dist1", F.lit(0)).cast("long").alias("n_dist1"),
            F.coalesce("n_dist2", F.lit(0)).cast("long").alias("n_dist2"),
            (
                2 * F.coalesce("n_dist1", F.lit(0))
                + F.coalesce("n_dist2", F.lit(0))
            )
            .cast("long")
            .alias("harmonic_x2"),
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )


_KCORE_K = 5


@_register(
    "graph_kcore_2iter",
    f"""
    WITH {_EDGES_CTE},
    ue AS (
      SELECT src AS a, dst AS b FROM e
      UNION SELECT dst, src FROM e),
    d0 AS (SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS deg FROM ue GROUP BY 1),
    s1 AS (SELECT v FROM d0 WHERE deg >= {_KCORE_K}),
    ue1 AS (
      SELECT ue.a, ue.b FROM ue
      JOIN s1 x ON x.v = ue.a JOIN s1 y ON y.v = ue.b),
    d1 AS (SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS deg FROM ue1 GROUP BY 1),
    s2 AS (SELECT v FROM d1 WHERE deg >= {_KCORE_K})
    SELECT d.doc_id,
           COALESCE(d0.deg, 0) AS deg_initial,
           d0x.v IS NOT NULL AS survived_r1,
           d1x.v IS NOT NULL AS survived_r2
    FROM documents d
    LEFT JOIN d0 ON d0.v = d.doc_id
    LEFT JOIN s1 d0x ON d0x.v = d.doc_id
    LEFT JOIN s2 d1x ON d1x.v = d.doc_id
    ORDER BY d.doc_id
    """,
)
def graph_kcore_2iter(spark, sf):
    f"""Two peeling rounds of {_KCORE_K}-core decomposition over the
    undirected link graph — the link-farm/spam-cluster detector (a k-core
    survives only through mutual reinforcement; Common Crawl's host-graph
    releases ship core numbers next to harmonic centrality).  Round 1
    drops nodes with undirected degree < {_KCORE_K}; round 2 recomputes
    degrees on the INDUCED subgraph and peels again — each node reports
    its initial degree and both survival flags, so the fixpoint's first
    two steps are pinned exactly.

    Scale shape: each peel is one degree groupBy (map-side combined) plus
    two semi-join-shaped filters of the edge list against the survivor
    set — the expand-and-drop shape of a crawl round again; a full k-core
    fixpoint iterates this exactly like the crawl's `run()` loop, with
    the same survivor-set-is-small broadcast opportunity."""
    e = doc_edges(spark, sf)
    docs = load(spark, sf, "documents").select("doc_id")
    ue = e.select(F.col("src").alias("a"), F.col("dst").alias("b")).union(
        e.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    ).distinct()
    d0 = ue.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    s1 = d0.filter(F.col("deg") >= _KCORE_K).select("v")
    ue1 = (
        ue.join(s1.withColumnRenamed("v", "a"), "a", "left_semi")
        .join(s1.withColumnRenamed("v", "b"), "b", "left_semi")
    )
    d1 = ue1.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    s2 = d1.filter(F.col("deg") >= _KCORE_K).select("v")
    return (
        docs.join(d0, docs.doc_id == d0.v, "left")
        .drop("v")
        .join(s1.select(F.col("v"), F.lit(True).alias("sv1")), docs.doc_id == F.col("v"), "left")
        .drop("v")
        .join(s2.select(F.col("v"), F.lit(True).alias("sv2")), docs.doc_id == F.col("v"), "left")
        .drop("v")
        .select(
            "doc_id",
            F.coalesce("deg", F.lit(0)).cast("long").alias("deg_initial"),
            F.coalesce("sv1", F.lit(False)).alias("survived_r1"),
            F.coalesce("sv2", F.lit(False)).alias("survived_r2"),
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Spam mass — blocklist-personalized PageRank share (TrustRank inverted)
# ---------------------------------------------------------------------------

# the URL quality gate's blocked domains (operators/frontier.py
# _URL_BLOCKLIST: site-src{3,7,13}.com), projected onto the doc graph via
# source = 'src' || doc_id % 20
_SPAM_SEED_RESIDUES = (3, 7, 13)
_SPAM_MASS_SUSPECT_PERMILLE = 250  # flags spam-adjacent non-seeds at every sf


@_register(
    "graph_spam_mass_2iter",
    f"""
    WITH {_EDGES_CTE},
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg FROM e GROUP BY src),
    seed AS (SELECT doc_id, doc_id % 20 IN {_SPAM_SEED_RESIDUES} AS is_seed
             FROM documents),
    r0 AS (SELECT doc_id AS src, CAST({_PR_ONE} AS BIGINT) AS r FROM documents),
    c1 AS (SELECT e.dst, CAST(SUM(r0.r // deg.out_deg) AS BIGINT) AS s
           FROM e JOIN deg USING (src) JOIN r0 USING (src) GROUP BY e.dst),
    r1 AS (SELECT d.doc_id AS src,
                  CAST({_PR_BASE} + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS r
           FROM documents d LEFT JOIN c1 ON c1.dst = d.doc_id),
    c2 AS (SELECT e.dst, CAST(SUM(r1.r // deg.out_deg) AS BIGINT) AS s
           FROM e JOIN deg USING (src) JOIN r1 USING (src) GROUP BY e.dst),
    r2 AS (SELECT d.doc_id,
                  CAST({_PR_BASE} + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT)
                    AS pr_scaled
           FROM documents d LEFT JOIN c2 ON c2.dst = d.doc_id),
    s0 AS (SELECT s.doc_id AS src,
                  CAST(CASE WHEN s.is_seed THEN {_PR_ONE} ELSE 0 END AS BIGINT)
                    AS r
           FROM seed s),
    sc1 AS (SELECT e.dst, CAST(SUM(s0.r // deg.out_deg) AS BIGINT) AS s
            FROM e JOIN deg USING (src) JOIN s0 USING (src) GROUP BY e.dst),
    s1 AS (SELECT sd.doc_id AS src,
                  CAST(CASE WHEN sd.is_seed THEN {_PR_BASE} ELSE 0 END
                       + (85 * COALESCE(sc1.s, 0)) // 100 AS BIGINT) AS r
           FROM seed sd LEFT JOIN sc1 ON sc1.dst = sd.doc_id),
    sc2 AS (SELECT e.dst, CAST(SUM(s1.r // deg.out_deg) AS BIGINT) AS s
            FROM e JOIN deg USING (src) JOIN s1 USING (src) GROUP BY e.dst),
    s2 AS (SELECT sd.doc_id,
                  CAST(CASE WHEN sd.is_seed THEN {_PR_BASE} ELSE 0 END
                       + (85 * COALESCE(sc2.s, 0)) // 100 AS BIGINT)
                    AS spam_scaled
           FROM seed sd LEFT JOIN sc2 ON sc2.dst = sd.doc_id)
    SELECT r2.doc_id, r2.pr_scaled, s2.spam_scaled,
           CAST(s2.spam_scaled * 1000 // r2.pr_scaled AS BIGINT)
             AS spam_mass_permille,
           s2.spam_scaled * 1000 // r2.pr_scaled
             > {_SPAM_MASS_SUSPECT_PERMILLE} AS is_spam_suspect
    FROM r2 JOIN s2 USING (doc_id) ORDER BY r2.doc_id
    """,
)
def graph_spam_mass_2iter(spark, sf):
    """Spam mass (Gyöngyi et al., TrustRank/spam-mass line of work): the
    share of a page's PageRank that arrives FROM a known-bad seed set —
    here the URL quality gate's blocked domains
    (``frontier_url_blocklist_filter``) projected onto the doc graph.
    Two propagations run over the SAME edges and out-degrees with the same
    scaled-integer arithmetic as ``graph_pagerank_2iter`` (1.0 ≡ 10^6,
    ``div`` throughout — bit-exact across engines, no float summation
    order): the uniform one (plain PageRank) and one whose restart mass is
    concentrated on the spam seeds.  spam_mass‰ = 1000·spamrank/pagerank;
    pages past {_SPAM_MASS_SUSPECT_PERMILLE}‰ are flagged — link
    neighborhoods that inherit most of their rank from blocked domains,
    the crawl-frontier demotion signal the blocklist alone cannot give
    (it only sees the seeds themselves).

    Scale shape: identical to PageRank's — per iteration ONE exchange
    (contributions groupBy dst, partial-aggregated map-side); the two
    propagations share the edge+degree table, and the final permille is a
    co-partitioned join on doc_id.  Everything the 10^10-node argument for
    ``graph_pagerank_2iter`` says applies unchanged."""
    edges = doc_edges(spark, sf)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    edges_deg = edges.join(deg, "src")
    nodes = load(spark, sf, "documents").select("doc_id")
    seed_pred = F.col("doc_id").cast("long") % 20
    is_seed = seed_pred.isin(*_SPAM_SEED_RESIDUES)

    def step(ranks, base_col):
        contrib = (
            edges_deg.join(ranks, "src")
            .select("dst", F.expr("r div out_deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        return nodes.join(contrib, nodes.doc_id == contrib.dst, "left").select(
            F.col("doc_id").alias("src"),
            (base_col + F.expr("85 * coalesce(s, 0) div 100")).cast("long").alias("r"),
        )

    uni_base = F.lit(_PR_BASE)
    spam_base = F.when(is_seed, F.lit(_PR_BASE)).otherwise(F.lit(0))
    pr = nodes.select(
        F.col("doc_id").alias("src"), F.lit(_PR_ONE).cast("long").alias("r")
    )
    sr = nodes.select(
        F.col("doc_id").alias("src"),
        F.when(is_seed, F.lit(_PR_ONE)).otherwise(F.lit(0)).cast("long").alias("r"),
    )
    for _ in range(2):
        pr = step(pr, uni_base)
        sr = step(sr, spam_base)
    pr = pr.select(F.col("src").alias("doc_id"), F.col("r").alias("pr_scaled"))
    sr = sr.select(F.col("src").alias("doc_id"), F.col("r").alias("spam_scaled"))
    return (
        pr.join(sr, "doc_id")
        .select(
            "doc_id",
            "pr_scaled",
            "spam_scaled",
            F.expr("CAST(spam_scaled * 1000 div pr_scaled AS BIGINT)").alias(
                "spam_mass_permille"
            ),
            (
                F.expr("spam_scaled * 1000 div pr_scaled")
                > _SPAM_MASS_SUSPECT_PERMILLE
            ).alias("is_spam_suspect"),
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )
