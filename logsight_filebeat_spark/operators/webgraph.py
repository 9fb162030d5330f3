"""Web-graph operators over Common-Crawl-style pages: href extraction, edge
lists, degree stats, and a deterministic fixed-point PageRank.

The reference shipper (aiops/logsight-filebeat) has no graph stage — this
suite belongs to the training-data surface the brief layers on top: link
centrality is the classic crawl-derived page-quality prior (seed ranking /
crawl prioritization in every Common-Crawl-descended corpus pipeline), and
the edge list falls straight out of the html column the input_hint carries.

Scale shapes (100 TB / 10^12 pages, 1000 executors):

* ``extract_links`` is a scan-side projection: decode + one RE2-able regex
  producing an array, then ``posexplode``. No shuffle; the html payload never
  leaves its input partition (the edge list carries urls, not bytes).
* ``link_edges`` / ``host_edges`` / degree aggregates are single hash
  aggregates with map-side partials on (src, dst) / host keys.
* ``pagerank`` is the standard edge-partitioned power iteration: per round
  ONE equi-join of edges against the rank table on ``src`` plus ONE hash
  aggregate on ``dst``. Ranks are persisted per round (each round's output
  feeds both the contribution join and the dangling-mass aggregate; without
  the persist the two consumers would re-derive the whole prior lineage
  twice per round — exponential in rounds). The dangling-mass and constants
  ride a broadcast 1-row aggregate, never a driver collect of data rows.

Determinism: ranks are scaled BIGINTs (fixed point, ``scale`` = 1e12) and
every division is integral (`div`). Integer arithmetic is associative, so
results are bit-identical at any partitioning/parallelism AND across engines
— a DuckDB oracle unrolling the same rounds with ``//`` reproduces every
rank exactly, floors included. (Float PageRank cannot make that promise:
summation order changes last bits.) The floor operations bleed a little
probability mass per round — identically on both engines — so ranks are
comparable within a run, which is all a ranking signal needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logsight_filebeat_spark.functions.caching import (
    iteration_barrier,
    track_persist,
)
from logsight_filebeat_spark.functions.hashing import seeded_hash32
from logsight_filebeat_spark.operators.enrich import url_host

# the href shape the synthetic fixture (sources/pages.py) and any
# double-quoted html attribute emit; capture group 1 = the target url.
HREF_RE = r'href="([^"]+)"'


def extract_links(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """One row per href occurrence: (src_url, link_pos, dst_url).

    Pure scan projection — binary html decodes to string, one
    ``regexp_extract_all`` builds the per-page target array, ``posexplode``
    emits edges. Pages with no hrefs simply produce no rows (they are the
    dangling nodes of the graph).
    """
    arr = F.regexp_extract_all(
        F.col(html_col).cast("string"), F.lit(HREF_RE), F.lit(1)
    )
    return pages.select(
        F.col(url_col).alias("src_url"), F.posexplode(arr).alias("link_pos", "dst_url")
    )


def link_edges(links: DataFrame, drop_self: bool = True) -> DataFrame:
    """Collapse href occurrences to weighted distinct edges:
    (src_url, dst_url, n_hrefs). One hash aggregate on the pair key."""
    e = links
    if drop_self:
        e = e.filter(F.col("src_url") != F.col("dst_url"))
    return e.groupBy("src_url", "dst_url").agg(
        F.count(F.lit(1)).alias("n_hrefs")
    )


# full anchor tag: group 1 = target url, group 2 = the anchor text (the
# visible text between <a ...> and </a>; [^<]* keeps it regex-cheap — nested
# markup inside an anchor ends the capture, matching the extraction cost
# budget of a scan-stage projection)
ANCHOR_RE = r'<a href="([^"]+)">([^<]*)</a>'


def extract_anchors(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """One row per anchor tag: (src_url, dst_url, anchor).

    Spark's ``regexp_extract_all`` returns one capture group per call, so
    the target-url and anchor-text arrays are extracted separately from the
    same pattern and zipped positionally — both calls run in the same scan
    projection over the html bytes (which never shuffle), and the zip +
    single explode keeps it one pass."""
    h = F.col(html_col).cast("string")
    z = F.arrays_zip(
        F.regexp_extract_all(h, F.lit(ANCHOR_RE), F.lit(1)).alias("dst_url"),
        F.regexp_extract_all(h, F.lit(ANCHOR_RE), F.lit(2)).alias("anchor"),
    )
    return pages.select(
        F.col(url_col).alias("src_url"), F.explode(z).alias("a")
    ).select("src_url", F.col("a.dst_url").alias("dst_url"), F.col("a.anchor").alias("anchor"))


def anchor_profile(anchors: DataFrame, drop_self: bool = True) -> DataFrame:
    """Inbound anchor-text profile per target page:
    (dst_url, n_anchors, n_sources, anchor_texts) — the classic crawl-graph
    relevance/quality signal (what OTHER pages call this page).

    One hash aggregate on dst_url; ``anchor_texts`` is the sorted distinct
    anchor strings (deterministic across partitionings — collect_set order
    is not, array_sort pins it). At 100 TB the distinct-set per popular
    page is bounded by anchor vocabulary, not inlink count; cap with a
    pre-aggregate doc-freq filter if a hot page's vocabulary is adversarial."""
    a = anchors
    if drop_self:
        a = a.filter(F.col("src_url") != F.col("dst_url"))
    return a.groupBy("dst_url").agg(
        F.count(F.lit(1)).alias("n_anchors"),
        F.countDistinct("src_url").alias("n_sources"),
        F.array_sort(F.collect_set("anchor")).alias("anchor_texts"),
    )


def host_edges(links: DataFrame) -> DataFrame:
    """Host-level projection of the link graph:
    (src_host, dst_host, n_links) including self-host edges (intra-site
    links are a real signal — e.g. nav-heavy templates)."""
    return (
        links.select(
            url_host("src_url").alias("src_host"), url_host("dst_url").alias("dst_host")
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def host_degrees(links: DataFrame) -> DataFrame:
    """Per-host out/in link totals: (host, out_links, in_links). Two hash
    aggregates on host + one full-outer equi-join of the two small
    per-host tables."""
    out_d = (
        links.groupBy(url_host("src_url").alias("host"))
        .agg(F.count(F.lit(1)).alias("out_links"))
    )
    in_d = (
        links.groupBy(url_host("dst_url").alias("host"))
        .agg(F.count(F.lit(1)).alias("in_links"))
    )
    return (
        out_d.join(in_d, "host", "full_outer")
        .select(
            "host",
            F.coalesce("out_links", F.lit(0)).alias("out_links"),
            F.coalesce("in_links", F.lit(0)).alias("in_links"),
        )
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_nodes: int,
    n_iter: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Deterministic fixed-point PageRank: (node, rank_scaled BIGINT).

    Per round, for every node v:

        rank'(v) = (100-d)·r0 div 100  +  d·(incoming(v) + dang div n) div 100

    where r0 = scale div n is the uniform start mass, incoming(v) =
    Σ_{(u,v)∈E} rank(u) div outdeg(u), and dang = Σ rank over nodes with no
    out-edges. All divisions integral — see the module docstring for why
    that buys bit-exact cross-engine reproducibility.

    ``n_nodes`` is a required control-plane scalar (the caller typically
    knows it; counting inside would force an extra job per call). Join
    shape per round: edges ⋈ ranks on src (shuffle hash join, both sides
    partitioned by src at scale) → hash agg on dst; the dangling sum is a
    1-row aggregate broadcast into the rank update.
    """
    if n_nodes <= 0:
        raise ValueError("n_nodes must be positive")
    r0 = scale // n_nodes
    base = (100 - damping_pct) * r0 // 100

    # edges/nodes/outdeg are re-read every round (edges twice: contrib join
    # + dangling anti-join); without a persist each action re-derives them
    # from source — for page graphs that is the href regex over the raw
    # html corpus, re-paid n_iter times. Tracked persists (caller releases
    # via functions/caching.release_persisted) cut the lineage once.
    edges = track_persist(edges)
    nodes = track_persist(nodes)
    outdeg = track_persist(
        edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("outdeg"))
    )
    ranks = nodes.select(F.col(node_col), F.lit(r0).cast("long").alias("rank"))

    for _ in range(n_iter):
        ranks = track_persist(ranks)
        contrib = (
            edges.join(ranks.withColumnRenamed(node_col, src_col), src_col)
            .join(outdeg, src_col)
            .select(
                F.col(dst_col).alias(node_col),
                F.expr("rank div outdeg").alias("c"),
            )
        )
        incoming = contrib.groupBy(node_col).agg(F.sum("c").alias("inc"))
        dangling = (
            ranks.join(
                outdeg, ranks[node_col] == outdeg[src_col], "left_anti"
            ).agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("dsum"))
        )
        ranks = (
            nodes.select(node_col)
            .join(incoming, node_col, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                node_col,
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * (coalesce(inc, 0L)"
                        f" + dsum div {n_nodes})) div 100"
                    )
                ).cast("long").alias("rank"),
            )
        )
    return ranks.select(F.col(node_col), F.col("rank").alias("rank_scaled"))


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 2,
    scale: int = 10**6,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Deterministic fixed-point HITS (Kleinberg 1999):
    (node, hub_scaled BIGINT, auth_scaled BIGINT).

    Per round:  auth_raw(v) = Σ_{(u,v)∈E} hub(u), then L1-renormalize to
    total mass ``scale·n`` via ``auth = auth_raw·scale·n div Σ auth_raw``;
    hubs update symmetrically from the fresh auths. All-integer arithmetic
    (exact sums in any accumulation order, truncating div) makes every
    score bit-identical across partitionings AND engines — the same
    property the ``pagerank`` fixed point pins.

    Overflow bound: values ≤ scale·n after each renormalize, raw sums
    ≤ scale·n·maxdeg, and the renormalize multiplies by scale·n — keep
    ``(scale·n)² · maxdeg < 2^63`` (the 10^6 default holds to ~10^5 nodes
    per verification graph; production graphs renormalize with div-first
    ordering or a wider scale split). Join shape per round: two edge⋈score
    equi-joins (shuffle-hash at scale, both sides partitionable on the
    join key) + two dst/src hash aggregates; each total rides a broadcast
    1-row aggregate. No global sort, no cross join, no collect.
    """
    # edges and nodes feed two joins per round — persist so the page-graph
    # href extraction (the expensive upstream) runs once, not 2·n_iter times
    edges = track_persist(edges)
    nodes = track_persist(nodes)
    hubs = nodes.select(F.col(node_col), F.lit(scale).cast("long").alias("h"))
    auths = nodes.select(F.col(node_col), F.lit(scale).cast("long").alias("a"))
    for _ in range(n_iter):
        hubs = track_persist(hubs)
        a_raw = (
            edges.join(
                hubs.withColumnRenamed(node_col, src_col), src_col
            )
            .groupBy(F.col(dst_col).alias(node_col))
            .agg(F.sum("h").alias("raw"))
        )
        auths = _hits_renorm(nodes, a_raw, scale, node_col, "a")
        auths = track_persist(auths)
        h_raw = (
            edges.join(
                auths.withColumnRenamed(node_col, dst_col), dst_col
            )
            .groupBy(F.col(src_col).alias(node_col))
            .agg(F.sum("a").alias("raw"))
        )
        hubs = _hits_renorm(nodes, h_raw, scale, node_col, "h")
    return (
        hubs.join(auths, node_col)
        .select(
            node_col,
            F.col("h").alias("hub_scaled"),
            F.col("a").alias("auth_scaled"),
        )
    )


def _hits_renorm(
    nodes: DataFrame, raw: DataFrame, scale: int, node_col: str, out: str
) -> DataFrame:
    """L1 renormalize raw scores to total mass n·scale (integral):
    ``score = raw · scale · n div max(Σ raw, 1)`` — the total and n ride
    ONE broadcast 1-row aggregate; zero-degree nodes score 0."""
    tot = raw.agg(
        F.coalesce(F.sum("raw"), F.lit(0)).alias("_tot"),
    ).crossJoin(F.broadcast(nodes.agg(F.count(F.lit(1)).alias("_n"))))
    return (
        nodes.select(node_col)
        .join(raw, node_col, "left")
        .crossJoin(F.broadcast(tot))
        .select(
            node_col,
            F.expr(
                f"(coalesce(raw, 0L) * {scale} * _n)"
                " div greatest(_tot, 1L)"
            ).cast("long").alias(out),
        )
    )


def page_graph(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> tuple[DataFrame, DataFrame]:
    """(nodes, edges) of the page-level graph: nodes = every page url,
    edges = distinct non-self (src, dst) href pairs."""
    nodes = pages.select(F.col(url_col).alias("node")).distinct()
    edges = (
        link_edges(extract_links(pages, html_col, url_col))
        .select(F.col("src_url").alias("src"), F.col("dst_url").alias("dst"))
    )
    return nodes, edges


def url_templates(
    df: DataFrame,
    url_col: str = "url",
    min_pages: int = 2,
) -> DataFrame:
    """URL template signatures — the spam-farm / boilerplate-site signal:
    normalize every URL's path by collapsing volatile segments (UUIDs,
    long hex ids, digit runs) into placeholders, then count pages and
    distinct URLs per (host, template). A template with thousands of
    near-identical pages is a generated-content farm; curation pipelines
    cap or drop them (the URL-level companion to the per-domain doc cap).

    Returns (host, template, n_pages, n_urls) for templates with
    ``n_pages ≥ min_pages``.

    Scale shape: the template is a codegen'd regexp_replace chain in the
    scan; the count is ONE hash aggregate keyed on (host, template) —
    distinct-URL counting rides the same shuffle (no second pass). All
    patterns sit in the Java-regex ∩ RE2 subset for oracle parity."""
    u = F.col(url_col)
    host = F.regexp_extract(u, r"^[a-z]+://([^/]+)", 1)
    path = F.regexp_extract(u, r"^[a-z]+://[^/]+([^?#]*)", 1)
    t = F.regexp_replace(
        path,
        r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
        "{uuid}",
    )
    t = F.regexp_replace(t, r"[0-9a-fA-F]{16,}", "{hex}")
    t = F.regexp_replace(t, r"[0-9]+", "{n}")
    return (
        df.select(host.alias("host"), t.alias("template"), u.alias("_u"))
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("_u").alias("n_urls"),
        )
        .filter(F.col("n_pages") >= min_pages)
    )


def resolve_chains(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    converge: bool = True,
) -> DataFrame:
    """Pointer-jumping resolution of functional link chains (canonical-URL
    / redirect chains: every src maps to at most ONE dst): returns
    (src, root, hops) where root is the chain terminal and hops the walk
    length. Each round substitutes next(x) ← next(next(x)), DOUBLING the
    resolved distance — ``n_iter`` rounds resolve chains up to 2^n_iter
    hops in n_iter equi-join shuffles, vs one shuffle per hop for the
    naive walk. That O(log L) vs O(L) gap is the whole point at crawl
    scale, where redirect chains are short but the table is 10^12 rows.

    Deterministic for acyclic functional mappings; a cycle longer than
    2^n_iter simply stops mid-cycle (bounded work, no livelock). Join keys
    are the URLs themselves — hash equi-joins, never a sort.

    Each round self-joins the previous state, so an unpersisted lineage
    doubles per round — 2^n_iter re-derivations of the upstream edge list
    (at crawl scale, 2^n_iter re-parses of raw html) — and even a
    persisted one doubles the ANALYZED plan per round (persist caches the
    physical result; the logical plan still nests). Every round therefore
    ends at :func:`~logsight_filebeat_spark.functions.caching.
    iteration_barrier`: eager materialization + lineage truncated to a
    leaf, so each round is exactly one scan of the previous state's local
    blocks plus one equi-join — O(n_iter) work AND O(1) plan size per
    round at any round count. Rounds materialize at call time (not at the
    caller's action); superseded rounds release via ``release_persisted``.

    ``converge`` (default) adds a per-round aggregate over the
    just-materialized state: if NO pointer jumped this round, every root
    is already a chain terminal and the remaining rounds are skipped.
    Real redirect/canonical chains are ≤3 hops, so a generous ``n_iter``
    costs log2(actual chain length)+1 rounds, not n_iter — at crawl scale
    each skipped round is a full shuffle of the 10^12-row state."""
    cur = iteration_barrier(
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("root"),
            F.lit(1).cast("bigint").alias("hops"),
        )
    )
    for _ in range(n_iter):
        # SHUFFLE_HASH: without the hint Spark picks sort-merge, paying two
        # full sorts of the state per round; the functional mapping is
        # unique per src, so the build side is flat and hash join wins at
        # every scale (the sort buys nothing — the next round reshuffles)
        nxt = cur.select(
            F.col("src").alias("_ns"),
            F.col("root").alias("_nr"),
            F.col("hops").alias("_nh"),
        ).hint("SHUFFLE_HASH")
        cur = iteration_barrier(
            cur.join(nxt, cur["root"] == nxt["_ns"], "left")
            .select(
                "src",
                F.coalesce("_nr", "root").alias("root"),
                (F.col("hops") + F.coalesce("_nh", F.lit(0))).alias("hops"),
                F.col("_nr").isNotNull().alias("_moved"),
            )
        )
        if converge:
            # the barrier already materialized every partition of the new
            # state, so this aggregate is a cheap scan of local blocks
            moved = cur.agg(F.max("_moved").alias("m")).first()["m"]
            if not moved:
                break
    return cur.drop("_moved")


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over the
    UNDIRECTED simple graph underlying ``edges`` — the classic spam-farm /
    community-density signal on web graphs (a link farm's hosts close
    triangles with each other far more than organic neighborhoods do).

    Scale shape: the standard degree-oriented wedge join. Every edge is
    oriented from its lower-(degree, node) endpoint to the higher one —
    a total order, so each triangle is generated EXACTLY ONCE from its
    lowest-rank corner, and the wedge fan-out per node is bounded by its
    ORIENTED out-degree ≤ O(√m) on any graph (the m^{3/2} bound); a
    109-degree hub never enumerates its full neighborhood². Three
    consumers share the persisted oriented edge list; all joins are
    equi-joins on rank keys — no theta join anywhere.

    Returns (node, deg, triangles, clustering) for every node;
    clustering = 2·triangles / (deg·(deg−1)), 0.0 for deg < 2."""
    und = (
        edges.select(
            F.least(src_col, dst_col).alias("a"),
            F.greatest(src_col, dst_col).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    und = track_persist(und)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    deg = track_persist(deg)
    # single sortable rank key encoding (deg, node): lexicographic on the
    # zero-padded degree then the node — one-column compares everywhere
    rank = F.concat(
        F.lpad(F.col("deg").cast("string"), 12, "0"),
        F.lit("|"),
        F.col("node"),
    )
    ranked = deg.select("node", rank.alias("rank"))
    e = (
        und.join(
            ranked.select(
                F.col("node").alias("a"), F.col("rank").alias("ra")
            ),
            "a",
        )
        .join(
            ranked.select(
                F.col("node").alias("b"), F.col("rank").alias("rb")
            ),
            "b",
        )
        .select(
            F.when(F.col("ra") < F.col("rb"), F.col("ra"))
            .otherwise(F.col("rb"))
            .alias("u"),
            F.when(F.col("ra") < F.col("rb"), F.col("rb"))
            .otherwise(F.col("ra"))
            .alias("v"),
        )
    )
    e = track_persist(e)
    # wedges at u: (u→v1, u→v2) with rank v1 < v2; the closing edge, if
    # present, is oriented v1→v2 by order transitivity — one equi-join
    w1 = e.select(F.col("u"), F.col("v").alias("v1"))
    w2 = e.select(F.col("u"), F.col("v").alias("v2"))
    wedges = w1.join(w2, "u").where(F.col("v1") < F.col("v2"))
    closing = e.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tri = wedges.join(closing, ["v1", "v2"], "left_semi")
    corners = (
        tri.select(F.col("u").alias("r"))
        .unionAll(tri.select(F.col("v1").alias("r")))
        .unionAll(tri.select(F.col("v2").alias("r")))
        .select(
            # the rank prefix is FIXED-WIDTH (12 digits + '|'), so a
            # positional strip is exact whatever characters the node holds
            F.col("r").substr(F.lit(14), F.length("r")).alias("node")
        )
    )
    tn = corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
    coeff = F.when(
        F.col("deg") >= 2,
        F.lit(2.0)
        * F.col("triangles").cast("double")
        / (F.col("deg") * (F.col("deg") - 1)).cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(tn, "node", "left")
        .withColumn("triangles", F.coalesce("triangles", F.lit(0)))
        .select(
            "node",
            "deg",
            "triangles",
            F.round(coeff, 6).alias("clustering"),
        )
    )


def trustrank(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    n_seeds: int,
    n_iter: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Deterministic fixed-point TrustRank (Gyongyi et al., VLDB 2004):
    personalized PageRank whose teleport vector is uniform over a curated
    SEED set instead of all nodes — trust flows out of hand-verified good
    pages along links, so link-farm neighborhoods that inflate vanilla
    PageRank score near zero. The standard spam-demotion prior in
    crawl-derived corpus curation.

    Per round, for every node v:

        rank'(v) = seed(v)·((100-d)·r0 div 100 + d·(dang div n_seeds) div 100)
                   + d·incoming(v) div 100

    with r0 = scale div n_seeds (all start mass on seeds), incoming(v) =
    Σ_{(u,v)∈E} rank(u) div outdeg(u), and dang = Σ rank over nodes with no
    out-edges (dangling mass returns to the seed set — the personalized
    teleport, not the uniform one). All divisions integral, so ranks are
    scaled-BIGINT bit-exact across partitionings and engines exactly like
    :func:`pagerank`; a DuckDB oracle unrolls the same rounds and matches
    floors included.

    ``seeds`` is one column ``node_col`` and is small by definition (a
    curated whitelist) — it broadcasts into the per-round rank update;
    ``n_seeds`` is the required control-plane scalar mirroring
    ``pagerank``'s ``n_nodes``. Join shape per round is identical to
    :func:`pagerank`: one edges⋈ranks equi-join + one dst hash aggregate +
    a broadcast 1-row dangling aggregate. Non-seed nodes carry rank 0 until
    trust reaches them; after k rounds exactly the k-step link neighborhood
    of the seed set is scored — the intended semantics, not an
    approximation."""
    if n_seeds <= 0:
        raise ValueError("n_seeds must be positive")
    r0 = scale // n_seeds
    base = (100 - damping_pct) * r0 // 100

    edges = track_persist(edges)
    nodes = track_persist(nodes)
    seed_flag = F.broadcast(
        seeds.select(F.col(node_col), F.lit(True).alias("_seed"))
    )
    outdeg = track_persist(
        edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("outdeg"))
    )
    ranks = (
        nodes.join(seed_flag, node_col, "left")
        .select(
            F.col(node_col),
            F.when(F.col("_seed"), F.lit(r0)).otherwise(F.lit(0))
            .cast("long")
            .alias("rank"),
        )
    )

    for _ in range(n_iter):
        ranks = track_persist(ranks)
        contrib = (
            edges.join(ranks.withColumnRenamed(node_col, src_col), src_col)
            .join(outdeg, src_col)
            .select(
                F.col(dst_col).alias(node_col),
                F.expr("rank div outdeg").alias("c"),
            )
        )
        incoming = contrib.groupBy(node_col).agg(F.sum("c").alias("inc"))
        dangling = ranks.join(
            outdeg, ranks[node_col] == outdeg[src_col], "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("dsum"))
        ranks = (
            nodes.select(node_col)
            .join(incoming, node_col, "left")
            .join(seed_flag, node_col, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                node_col,
                (
                    F.when(
                        F.col("_seed"),
                        F.lit(base)
                        + F.expr(
                            f"({damping_pct} * (dsum div {n_seeds})) div 100"
                        ),
                    ).otherwise(F.lit(0))
                    + F.expr(f"({damping_pct} * coalesce(inc, 0L)) div 100")
                ).cast("long").alias("rank"),
            )
        )
    return ranks.select(F.col(node_col), F.col("rank").alias("trust_scaled"))


def cocitation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_out_degree: int = 64,
    min_common: int = 1,
) -> DataFrame:
    """Co-citation similarity (Small 1973): pairs of pages that share a
    citing source, weighted by how many distinct sources link BOTH — the
    classic link-based "related pages" signal and a near-dup prior for
    mirror detection (two mirrors inherit the same inbound neighborhoods).

    Returns (a, b, common) with a < b lexicographically, ``common`` =
    number of distinct sources linking both, filtered to ``common >=
    min_common``.

    Scale shape: pair generation is a SELF-JOIN of the deduplicated edge
    list on src — never an all-pairs form; each source of out-degree k
    yields k·(k-1)/2 pairs. That k² is the one blow-up risk, so sources
    with out-degree > ``max_out_degree`` are DROPPED first (the standard
    cap: a 10^4-outlink hub page is a directory, not an endorsement, and
    contributes k² noise pairs). The cap bounds per-source work at
    max_out_degree², making the join output linear in sources; the a<b
    inequality halves it and canonicalizes pair order. One hash aggregate
    on the (a, b) pair key finishes it."""
    if max_out_degree < 2:
        raise ValueError("max_out_degree must be >= 2")
    e = track_persist(
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).distinct()
    )
    kept = e.join(
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .filter(F.col("outdeg") <= max_out_degree)
        .select("src"),
        "src",
        "left_semi",
    )
    left = kept.select(F.col("src"), F.col("dst").alias("a"))
    right = kept.select(F.col("src"), F.col("dst").alias("b"))
    return (
        left.join(right, "src")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.countDistinct("src").alias("common"))
        .filter(F.col("common") >= F.lit(min_common))
    )


def adamic_adar(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_out_degree: int = 64,
    min_common: int = 1,
) -> DataFrame:
    """Adamic–Adar link-prediction scores (Adamic & Adar 2003) over shared
    in-neighborhoods: for every pair of pages co-linked by at least
    ``min_common`` distinct sources, score = Σ over shared sources u of
    1/ln(outdeg(u)). The frequency-weighted refinement of co-citation —
    a source linking 3 pages is a far stronger relatedness signal per
    pair than a source linking 60, and 1/ln is the published weighting.
    The standard candidate generator for "related pages" / knowledge-graph
    edge completion over a crawl.

    Returns (a, b, common, aa_score) with a < b lexicographically,
    ``common`` = distinct shared sources, ``aa_score`` rounded to 6.

    Scale shape: identical to :func:`cocitation` — pair generation is a
    self-join of the deduped edge list on src, never an all-pairs form,
    with sources above ``max_out_degree`` dropped first (bounding
    per-source fan-out at max_out_degree² AND capping the smallest
    weight, so the cap is also the score's noise floor). The per-source
    weight rides the left edge list into the pair join — one extra
    column, no extra shuffle: degree join, pair join, and final
    aggregate all key on src or the pair. Sources of out-degree 1 yield
    no pairs and are filtered before the weight divides by ln(1)=0."""
    if max_out_degree < 2:
        raise ValueError("max_out_degree must be >= 2")
    e = track_persist(
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).distinct()
    )
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .filter(
            (F.col("outdeg") <= max_out_degree) & (F.col("outdeg") >= 2)
        )
    )
    weighted = e.join(deg, "src").select(
        "src",
        "dst",
        (F.lit(1.0) / F.log(F.col("outdeg").cast("double"))).alias("_w"),
    )
    left = weighted.select("src", "_w", F.col("dst").alias("a"))
    right = weighted.select("src", F.col("dst").alias("b"))
    return (
        left.join(right, "src")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.countDistinct("src").alias("common"),
            F.round(F.sum("_w"), 6).alias("aa_score"),
        )
        .filter(F.col("common") >= F.lit(min_common))
    )


def kcore(
    edges: DataFrame,
    k: int,
    max_iter: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k-core decomposition membership: the maximal subgraph of the
    UNDIRECTED simple graph in which every node has degree ≥ k. Returns
    (node, core_deg) for surviving nodes, core_deg = degree within the
    core. Dense cores separate organically-linked hubs from link farms
    (farms inflate raw degree but rarely survive peeling, Seidman 1983) —
    a standard graph-quality prior beside PageRank/TrustRank.

    Algorithm: iterative peeling — drop all nodes with current degree < k,
    restrict edges to survivors, repeat. Each round is one degree hash
    aggregate + two left-semi equi-joins over the previous round's edge
    state. The round body references that state THREE times (twice for
    the undirected degree union, once as the join probe side), so a
    persist-only loop grows the analyzed plan 3× per round — 3^n after n
    rounds, which OOMs driver-side plan stringification by round 3 even
    on a toy graph. Each round therefore ends at
    :func:`~logsight_filebeat_spark.functions.caching.iteration_barrier`:
    materialize + truncate lineage to a leaf, O(1) plan size per round,
    and the eager materialization doubles as the barrier for the
    ``n_new`` convergence count. Peeling is CONFLUENT: the fixpoint is
    unique whatever the removal order, so the result is deterministic at
    any parallelism and an oracle unrolling the same rounds matches
    exactly; rounds past convergence are no-ops, which lets a fixed-round
    SQL unroll mirror the early-exiting Spark loop. ``max_iter`` bounds
    work; real web graphs converge in a handful of rounds for small k
    (each round removes a whole frontier, not one node)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    cur = iteration_barrier(
        edges.select(
            F.least(src_col, dst_col).alias("a"),
            F.greatest(src_col, dst_col).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    n_prev = cur.count()
    for _ in range(max_iter):
        deg = (
            cur.select(F.col("a").alias("node"))
            .unionAll(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        cur = iteration_barrier(
            cur.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
        )
        n_new = cur.count()  # cheap: counts the checkpointed blocks
        if n_new == n_prev:
            break
        n_prev = n_new
    return (
        cur.select(F.col("a").alias("node"))
        .unionAll(cur.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_deg"))
    )


def host_features(
    pages: DataFrame,
    seeds: DataFrame | None = None,
    k: int = 3,
    kcore_iter: int = 6,
    trust_iter: int = 3,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Per-HOST web-graph feature table — the composed curation signal a
    crawl pipeline joins against its quality gates: (host, n_pages,
    out_links, in_links, core3_pages, trust_sum). Combines the standalone
    graph operators (degrees, :func:`kcore` membership, :func:`trustrank`
    mass) into one host rollup; every aggregated value is an exact
    INTEGER (counts + the scaled-BIGINT trust ranks), so the rollup is
    bit-stable at any parallelism and in any engine — no float ever
    crosses an aggregate.

    A link farm shows up here as: many pages, huge out_links, near-zero
    in_links from outside, dense k-core membership among its own pages,
    and ~zero trust_sum; an organic hub as the inverse. ``seeds`` defaults
    to every page under https://popular.example.org/ (the fixture's
    curated whitelist); pass a real seed table in production.

    Scale shape: the edge list derives once (persisted through the graph
    ops' own barriers); degrees are two hash aggregates on the edge list;
    k-core and trustrank are the bounded-round operators documented on
    their own functions; the final rollup is ONE host hash aggregate over
    page-level features (map-side combine collapses hot hosts)."""
    nodes, edges = page_graph(pages, html_col, url_col)
    nodes = track_persist(nodes)
    edges = track_persist(edges)
    if seeds is None:
        seeds = nodes.filter(
            F.col("node").startswith("https://popular.example.org/")
        )
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    indeg = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("indeg")
    )
    core = kcore(edges, k=k, max_iter=kcore_iter).select("node")
    trust = trustrank(
        nodes, edges, seeds, n_seeds=seeds.count(), n_iter=trust_iter
    )
    per_url = (
        nodes.join(outdeg, "node", "left")
        .join(indeg, "node", "left")
        .join(core.withColumn("_in_core", F.lit(1)), "node", "left")
        .join(trust, "node")
        .select(
            url_host("node").alias("host"),
            F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
            F.coalesce("indeg", F.lit(0)).alias("indeg"),
            F.coalesce("_in_core", F.lit(0)).alias("in_core"),
            F.col("trust_scaled"),
        )
    )
    return per_url.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("outdeg").alias("out_links"),
        F.sum("indeg").alias("in_links"),
        F.sum("in_core").alias("core3_pages"),
        F.sum("trust_scaled").alias("trust_sum"),
    )


def random_walks(
    edges: DataFrame,
    walk_len: int = 3,
    seed: str = "walk",
    src: str = "src",
    dst: str = "dst",
    starts: DataFrame | None = None,
) -> DataFrame:
    """Deterministic hash-driven random walks — the sampling primitive
    under DeepWalk/node2vec-style graph embeddings and neighborhood
    audits, with the same reproducibility contract as every sampler here:
    step t from node u moves to the ``hash(seed:t, u) mod outdeg(u)``-th
    neighbor (neighbors ranked by dst), so a walk is a pure function of
    (seed, start) — stable under reruns, partitionings, and engines, and
    oracle-checkable (the portable-md5 hash family, never an RNG). Walks
    start at every edge source (or ``starts``' ``node`` column) and stop
    early at dangling nodes. Returns (start, step, node) path rows,
    step 0..walk_len.

    Scale shape: the neighbor index is ONE ranking window per src (web
    out-degree is page-bounded — hundreds, not millions — so the window
    is flat) materialized once behind an iteration barrier and reused by
    every step; each step is then one hash equi-join on the current node
    keyed exactly like the index, with the mod-pick as the join's
    residual filter. State stays one row per live walk: O(walk_len)
    joins over never-growing inputs, no lineage doubling."""
    from pyspark.sql import Window

    from logsight_filebeat_spark.functions.caching import track_persist

    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    w = Window.partitionBy("_s").orderBy("_d")
    idx = track_persist(
        e.select(
            "_s",
            "_d",
            (F.row_number().over(w) - 1).cast("bigint").alias("_rn"),
            F.count(F.lit(1)).over(Window.partitionBy("_s")).alias("_deg"),
        )
    )
    if starts is None:
        starts = e.select(F.col("_s").alias("node")).distinct()
    state = starts.select(
        F.col("node").alias("start"), F.col("node").alias("node")
    )
    steps = [
        state.select(
            "start", F.lit(0).cast("bigint").alias("step"), "node"
        )
    ]
    for t in range(1, walk_len + 1):
        # Delimited seed: f"{seed}:{t}" keeps the per-step hash family
        # injective in (seed, step) — an undelimited concat would alias
        # e.g. (seed='walk1', t=2) with (seed='walk', t=12).
        pick = seeded_hash32(F.col("node"), f"{seed}:{t}") % F.col("_deg")
        state = (
            state.join(idx, (F.col("node") == F.col("_s")) & (F.col("_rn") == pick))
            .select("start", F.col("_d").alias("node"))
        )
        steps.append(
            state.select(
                "start", F.lit(t).cast("bigint").alias("step"), "node"
            )
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source BFS: the minimum hop distance from any seed node to
    every page reachable within ``max_depth`` hops — the crawl-depth /
    seed-proximity feature classic quality priors are built on (pages far
    from any trusted seed are disproportionately spam; TrustRank's
    first-order cousin, but exact hops instead of damped mass).

    ``seeds`` carries one ``node`` column. Returns (node, dist) with dist
    = the FIRST round the node was reached (so min distance, seeds at 0).

    Scale shape: textbook frontier BFS — per round ONE equi-join of the
    (never-growing) frontier against edges on ``src``, one distinct on the
    reached set, one anti-join against the visited set. Frontier and
    visited both end each round at
    :func:`~logsight_filebeat_spark.functions.caching.iteration_barrier`
    (each is consumed twice next round: the join/anti-join AND the union),
    so plan size stays O(1) per round and superseded rounds release. The
    visited set carries 8-byte-ish url strings only — at 10^12 nodes it is
    the same order as the rank table PageRank already persists per round.
    Empty frontier short-circuits the remaining rounds (the aggregate runs
    over just-materialized local blocks, same discipline as
    :func:`resolve_chains`)."""
    visited = iteration_barrier(
        seeds.select(
            F.col("node"), F.lit(0).cast("bigint").alias("dist")
        ).distinct()
    )
    frontier = visited.select("node")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    for d in range(1, max_depth + 1):
        reached = (
            e.join(frontier.hint("SHUFFLE_HASH"), e["_s"] == frontier["node"])
            .select(F.col("_d").alias("node"))
            .distinct()
            .join(visited.select("node"), ["node"], "left_anti")
        )
        frontier = iteration_barrier(reached)
        if frontier.agg(F.count(F.lit(1)).alias("n")).first()["n"] == 0:
            break
        visited = iteration_barrier(
            visited.unionByName(
                frontier.select(
                    "node", F.lit(d).cast("bigint").alias("dist")
                )
            )
        )
    return visited


def reciprocity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node edge reciprocity over the distinct directed edge list:
    (node, n_out, n_recip, reciprocity) where n_recip counts out-edges
    whose reverse edge also exists — the link-exchange / mutual-linking
    spam signal (organic web linking is strongly asymmetric; link-farm
    rings reciprocate near 100%).

    Scale shape: ONE self-equi-join of the distinct edge list against its
    reversal on the (src, dst) pair key (left_semi marks reciprocated
    edges without widening rows), then ONE hash aggregate on src. No
    pairwise forms, no windows; both sides shuffle on the same pair key."""
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).distinct()
    rev = e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
    recip = e.join(rev, ["_s", "_d"], "left_semi").select(
        "_s", F.lit(1).alias("_r")
    )
    return (
        e.select("_s", F.lit(0).alias("_r"))
        .unionByName(recip)
        .groupBy(F.col("_s").alias("node"))
        .agg(
            F.sum(F.lit(1) - F.col("_r")).cast("bigint").alias("n_out"),
            F.sum("_r").cast("bigint").alias("n_recip"),
        )
        .select(
            "node",
            "n_out",
            "n_recip",
            F.round(F.col("n_recip") / F.col("n_out"), 6).alias("reciprocity"),
        )
    )


def label_propagation(
    edges: DataFrame,
    n_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation communities: (node, label).

    The classic near-linear community detector (Raghavan et al. 2007, the
    LPA GraphX/GraphFrames ships) — the mirror-farm / template-network
    grouping signal the pairwise suites can't produce: communities emerge
    from link density, not content similarity. Every node starts labeled
    with itself; each synchronous round relabels every node with the most
    frequent label among its undirected neighbors PLUS its own current
    label (the self-vote — the standard damping that kills the two-cycle
    oscillation pure synchronous LPA exhibits on bipartite structures),
    ties broken by MINIMUM label (byte order). Deterministic by
    construction — mode + ordered tie-break has no
    float math and no partition-order dependence, so a DuckDB oracle
    unrolling the same rounds matches exactly (unlike GraphX's
    hash-partition-order tie-breaking, which is run-dependent).

    Scale shape per round: ONE equi-join of the symmetrized distinct edge
    list against the label table on the neighbor key + ONE hash aggregate
    on (node, label) + ONE ordered-struct min per node (never a window:
    ``min(struct(-cnt, label))`` is an ordinary aggregate with map-side
    partials). Labels are persisted per round and the superseded round
    released by the caller via release_persisted — same iteration
    discipline as :func:`pagerank`; the symmetrized edges persist once.
    """
    e = (
        edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
        .filter(F.col("_u") != F.col("_v"))
    )
    und = track_persist(
        e.unionByName(
            e.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))
        ).distinct()
    )
    nodes = track_persist(
        und.select(F.col("_u").alias("node")).distinct()
    )
    labels = nodes.select("node", F.col("node").alias("label"))

    for _ in range(n_iter):
        labels = track_persist(labels)
        nbr = und.join(
            labels.select(
                F.col("node").alias("_v"), F.col("label").alias("_nl")
            ),
            "_v",
        ).select("_u", "_nl")
        self_vote = labels.select(
            F.col("node").alias("_u"), F.col("label").alias("_nl")
        )
        counted = (
            nbr.unionByName(self_vote)
            .groupBy(F.col("_u").alias("node"), "_nl")
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        # argmax count, tie -> min label: min over the lexicographic
        # struct (-cnt, label). Aggregate, not window — partial-combinable.
        # The self-vote union guarantees every node appears in `counted`,
        # so this aggregate IS the complete next label table — no join
        # back onto the previous round needed.
        labels = counted.groupBy("node").agg(
            F.min(
                F.struct(
                    (-F.col("_cnt")).alias("nc"), F.col("_nl").alias("lb")
                )
            )["lb"].alias("label")
        )
    return labels
