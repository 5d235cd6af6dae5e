"""Strongly connected components vs an independent Kosaraju oracle."""

from __future__ import annotations

from collections import defaultdict

from ccl_spark.scc import strongly_connected_components


def kosaraju(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Min-member SCC labels, classic two-pass DFS (iterative)."""
    fwd, rev = defaultdict(list), defaultdict(list)
    verts = set()
    for u, v in edges:
        verts |= {u, v}
        if u != v:
            fwd[u].append(v)
            rev[v].append(u)
    order, seen = [], set()
    for s in sorted(verts):
        if s in seen:
            continue
        stack = [(s, iter(fwd[s]))]
        seen.add(s)
        while stack:
            node, it = stack[-1]
            nxt = next(it, None)
            if nxt is None:
                order.append(node)
                stack.pop()
            elif nxt not in seen:
                seen.add(nxt)
                stack.append((nxt, iter(fwd[nxt])))
    labels: dict[int, int] = {}
    for s in reversed(order):
        if s in labels:
            continue
        comp, stack = [s], [s]
        labels[s] = -1
        while stack:
            node = stack.pop()
            for nxt in rev[node]:
                if nxt not in labels:
                    labels[nxt] = -1
                    comp.append(nxt)
                    stack.append(nxt)
        m = min(comp)
        for v in comp:
            labels[v] = m
    return labels


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.vertex: r.component for r in strongly_connected_components(df).collect()
    }
    assert got == kosaraju(edges)


def test_scc_cycle_with_tail(spark):
    # 0->1->2->0 cycle, 2->3->4 tail, isolated self-loop 9
    _check(spark, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (9, 9)])


def test_scc_two_cycles_one_way_bridge(spark):
    # {0,1,2} and {5,6} cycles joined 2->5: two separate SCCs
    _check(spark, [(0, 1), (1, 2), (2, 0), (2, 5), (5, 6), (6, 5)])


def test_scc_pure_dag_all_singletons(spark):
    _check(spark, [(i, i + 1) for i in range(8)] + [(0, 5), (3, 7)])


def test_scc_functional_graph(spark):
    # quadratic map c -> (c^2 + 1) % 37: tree tails feeding cycles
    _check(spark, [(c, (c * c + 1) % 37) for c in range(37)])


def test_scc_pseudo_random(spark):
    for seed in (3, 11):
        edges = [
            ((i * 7 + seed) % 23, (i * i * 5 + 2 * seed) % 23) for i in range(60)
        ]
        _check(spark, [e for e in edges if e[0] != e[1]])


def bowtie_ref(edges: list[tuple[int, int]]) -> dict[int, str]:
    from collections import Counter

    labels = kosaraju(edges)
    sizes = Counter(labels.values())
    core_label = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    core = {v for v, l in labels.items() if l == core_label}
    fwd, rev = defaultdict(set), defaultdict(set)
    for u, v in edges:
        if u != v:
            fwd[u].add(v)
            rev[v].add(u)

    def closure(seed, adj):
        seen, stack = set(seed), list(seed)
        while stack:
            for n in adj[stack.pop()]:
                if n not in seen:
                    seen.add(n)
                    stack.append(n)
        return seen

    out_set, in_set = closure(core, fwd), closure(core, rev)
    return {
        v: (
            "core"
            if v in core
            else "in" if v in in_set else "out" if v in out_set else "other"
        )
        for v in labels
    }


def test_bowtie_hand_case(spark):
    from ccl_spark.scc import bowtie

    # core {2,3,4}; 0->1->2 is IN; 4->5->6 is OUT; 8<->9 separate SCC
    # (other); 7 dangling off the IN path (other: tendril)
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 4), (4, 2),
        (4, 5), (5, 6), (8, 9), (9, 8), (1, 7),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.vertex: r.region for r in bowtie(df).collect()}
    assert got == bowtie_ref(edges)
    assert got[2] == got[3] == got[4] == "core"
    assert got[0] == got[1] == "in"
    assert got[5] == got[6] == "out"
    assert got[7] == got[8] == got[9] == "other"


def test_bowtie_functional_and_random(spark):
    from ccl_spark.scc import bowtie

    for edges in (
        [(c, (c * c + 1) % 37) for c in range(37) if c != (c * c + 1) % 37],
        [((i * 7 + 3) % 23, (i * i * 5 + 6) % 23) for i in range(60)],
    ):
        edges = [e for e in edges if e[0] != e[1]]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.vertex: r.region for r in bowtie(df).collect()}
        assert got == bowtie_ref(edges)

def test_scc_large_diameter_cycle_converges(spark):
    """ADVICE r4 regression: a directed cycle whose diameter exceeds
    the outer phase budget must still resolve to ONE component — the
    COLOR/CONFIRM inner fixpoints run to convergence (with a raise
    backstop), never silently extract a partial coloring."""
    edges = [(i, (i + 1) % 12) for i in range(12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.vertex: r.component
        for r in strongly_connected_components(df, max_iter=5).collect()
    }
    assert got == {i: 0 for i in range(12)}


def test_scc_deep_path_flat_plan(spark):
    """Deep acyclic chain: trim peels ~n/2 levels, but the extracted
    batches fold into one checkpointed accumulator, so the returned
    plan stays O(1) wide regardless of trim depth (verdict r4 #8)."""
    n = 150
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    res = strongly_connected_components(df)
    got = {r.vertex: r.component for r in res.collect()}
    assert got == {i: i for i in range(n)}  # all singletons
    plan = res._jdf.queryExecution().optimizedPlan().toString()  # noqa: SLF001
    assert len(plan.splitlines()) < 10  # flat: a checkpointed scan, not a union tower


def test_condensation_levels(spark):
    from ccl_spark.scc import condensation_levels

    # two 2-cycles {0,1} and {2,3} chained, feeding vertex 4; plus an
    # isolated source 5 -> 0: levels  {5}:0, {0,1}:1, {2,3}:2, {4}:3
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4), (5, 0)],
        "src long, dst long",
    )
    got = {r.component: r.level for r in condensation_levels(edges).collect()}
    assert got == {5: 0, 0: 1, 2: 2, 4: 3}


def test_condensation_diamond_longest_path(spark):
    from ccl_spark.scc import condensation_levels

    # diamond with a long arm: 0->1->2->3 and 0->3 — level(3) must be
    # the LONGEST path (3), not the shortest (1)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3)], "src long, dst long"
    )
    got = {r.component: r.level for r in condensation_levels(edges).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
