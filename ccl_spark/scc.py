"""Strongly connected components (directed) — the web bow-tie
decomposition (Broder et al., "Graph structure in the Web"): the giant
SCC is the web's core, and IN/OUT/tendrils hang off it.

Algorithm: iterative TRIM + forward-backward coloring, the standard
distributed SCC recipe (FW-BW-Trim; Slota et al., Orzan's coloring —
both public):

1. TRIM: a vertex with no in-edges or no out-edges (within the
   remaining graph) cannot sit on a directed cycle, so it is a
   singleton SCC; remove and repeat. This peels trees/paths in
   O(depth) cheap rounds and is what keeps the phase count low on
   web-shaped graphs (a pure path would otherwise cost one coloring
   phase per vertex).
2. COLOR: propagate the minimum vertex id FORWARD to a fixpoint —
   color(v) = min id that can reach v. Each color class has one root
   r (color(r) == r).
3. CONFIRM: grow the set that can reach its root BACKWARD through
   same-color vertices; the grown set of color r is exactly SCC(r)
   (classic FW∩BW argument restricted to the color class).
4. Extract confirmed SCCs, remove their vertices, repeat from 1.

Everything is DataFrame joins/aggregates with per-round
localCheckpoint; labels are canonical minimum member ids, so output is
deterministic at any parallelism and the driver gate checks it against
a DuckDB transitive-closure oracle (mutual reachability).

Scale shape: each trim round is two degree aggregates + anti-joins;
each color/confirm round is one equi-join + one min-aggregate over the
REMAINING edge set (which only shrinks). Rounds are O(diameter) like
PageRank's iterations; phases are O(#SCC-diameter of the condensation)
after trimming, small on web graphs whose mass sits in one giant SCC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sig(df: DataFrame, *cols: str) -> tuple:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64(*cols)), F.lit(0)).alias("h"),
    ).first()
    return (row["n"], row["h"])


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """Return ``(vertex long, component long)`` where ``component`` is
    the minimum vertex id of the vertex's strongly connected component
    (singletons label themselves)."""
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = (
        edges.select(F.col(src).cast("long").alias("vertex"))
        .unionByName(edges.select(F.col(dst).cast("long").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    done: list[DataFrame] = []  # (vertex, component) of extracted SCCs

    for _phase in range(max_iter):
        # ---- TRIM: peel acyclic fringe as singleton SCCs ----
        while True:
            srcs = e.select("u").distinct()
            dsts = e.select("v").distinct()
            cyclic = srcs.join(dsts, srcs.u == dsts.v).select(
                F.col("u").alias("vertex")
            )  # has BOTH an out-edge and an in-edge
            trimmed = verts.join(cyclic, "vertex", "left_anti").localCheckpoint(
                eager=True
            )
            n_trim = trimmed.count()
            if n_trim == 0:
                break
            done.append(trimmed.select("vertex", F.col("vertex").alias("component")))
            verts = verts.join(trimmed, "vertex", "left_anti").localCheckpoint(
                eager=True
            )
            e = (
                e.join(trimmed.select(F.col("vertex").alias("u")), "u", "left_anti")
                .join(trimmed.select(F.col("vertex").alias("v")), "v", "left_anti")
                .select("u", "v")
                .localCheckpoint(eager=True)
            )
        if verts.isEmpty():
            break

        # ---- COLOR: forward min-id propagation to fixpoint ----
        color = verts.select("vertex", F.col("vertex").alias("c")).localCheckpoint(
            eager=True
        )
        sig = _sig(color, "vertex", "c")
        for _ in range(max_iter):
            incoming = (
                e.join(color.select(F.col("vertex").alias("u"), "c"), "u")
                .groupBy(F.col("v").alias("vertex"))
                .agg(F.min("c").alias("inc"))
            )
            nxt = (
                color.join(incoming, "vertex", "left")
                .select("vertex", F.least("c", F.coalesce("inc", "c")).alias("c"))
                .localCheckpoint(eager=False)
            )
            new_sig = _sig(nxt, "vertex", "c")
            color = nxt
            if new_sig == sig:
                break
            sig = new_sig

        # ---- CONFIRM: backward reachability to the root, same color ----
        ec = (
            e.join(color.select(F.col("vertex").alias("u"), F.col("c").alias("cu")), "u")
            .join(color.select(F.col("vertex").alias("v"), F.col("c").alias("cv")), "v")
            .filter(F.col("cu") == F.col("cv"))
            .select("u", "v")
            .localCheckpoint(eager=True)
        )  # edges inside one color class
        inset = color.filter(F.col("vertex") == F.col("c")).select(
            "vertex"
        )  # the roots
        inset = inset.localCheckpoint(eager=True)
        n_in = inset.count()
        for _ in range(max_iter):
            grown = (
                ec.join(inset.select(F.col("vertex").alias("v")), "v", "left_semi")
                .select(F.col("u").alias("vertex"))
                .unionByName(inset)
                .distinct()
                .localCheckpoint(eager=True)
            )
            n2 = grown.count()
            inset = grown
            if n2 == n_in:
                break
            n_in = n2

        scc = color.join(inset, "vertex", "left_semi").select(
            "vertex", F.col("c").alias("component")
        ).localCheckpoint(eager=True)
        done.append(scc)
        verts = verts.join(scc.select("vertex"), "vertex", "left_anti").localCheckpoint(
            eager=True
        )
        if verts.isEmpty():
            break
        e = (
            e.join(scc.select(F.col("vertex").alias("u")), "u", "left_anti")
            .join(scc.select(F.col("vertex").alias("v")), "v", "left_anti")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(f"scc: not done in {max_iter} phases")

    if not done:  # no edges at all
        return verts.select("vertex", F.col("vertex").alias("component"))
    out = done[0]
    for d in done[1:]:
        out = out.unionByName(d)
    return out


def _closure(e: DataFrame, seed: DataFrame, direction: str, max_iter: int) -> DataFrame:
    """Reachability closure of ``seed`` (column ``vertex``) over
    directed edges: 'forward' = vertices reachable FROM the seed,
    'backward' = vertices that can REACH it. Count-fixpoint loop of
    semi-join rounds (each round one equi-join over the edge table —
    O(diameter) rounds, the same bound as PageRank iterations)."""
    grown = seed.select("vertex").localCheckpoint(eager=True)
    n = grown.count()
    for _ in range(max_iter):
        if direction == "forward":
            step = e.join(
                grown.select(F.col("vertex").alias("u")), "u", "left_semi"
            ).select(F.col("v").alias("vertex"))
        else:
            step = e.join(
                grown.select(F.col("vertex").alias("v")), "v", "left_semi"
            ).select(F.col("u").alias("vertex"))
        nxt = grown.unionByName(step).distinct().localCheckpoint(eager=True)
        n2 = nxt.count()
        grown = nxt
        if n2 == n:
            return grown
        n = n2
    raise RuntimeError(f"closure: no fixpoint in {max_iter} rounds")


def bowtie(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """Bow-tie decomposition of a directed graph (Broder et al.):
    ``(vertex, region)`` with region in {'core', 'in', 'out', 'other'}
    — core = the LARGEST strongly connected component (ties broken by
    smallest label), 'in' = can reach the core, 'out' = reachable from
    the core, 'other' = tendrils + disconnected mass. Composes
    strongly_connected_components with two reachability closures."""
    labels = strongly_connected_components(edges, src, dst, max_iter=max_iter)
    labels = labels.localCheckpoint(eager=True)
    core_row = (
        labels.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("component"))
        .first()
    )
    core = labels.filter(F.col("component") == core_row["component"]).select("vertex")
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out_set = _closure(e, core, "forward", max_iter)
    in_set = _closure(e, core, "backward", max_iter)
    return (
        labels.join(in_set.select("vertex", F.lit(1).alias("_in")), "vertex", "left")
        .join(out_set.select("vertex", F.lit(1).alias("_out")), "vertex", "left")
        .select(
            "vertex",
            F.when(F.col("component") == core_row["component"], F.lit("core"))
            .when(F.col("_in") == 1, F.lit("in"))
            .when(F.col("_out") == 1, F.lit("out"))
            .otherwise(F.lit("other"))
            .alias("region"),
        )
    )
