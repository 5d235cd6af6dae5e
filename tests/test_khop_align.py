from __future__ import annotations

import math

from ccl_spark.similarity import khop_feature_sums, reciprocal_matches


def test_khop_matches_python(spark):
    # path graph 1-2-3 (both orientations), 2 features
    edges = [(1, 2), (2, 1), (2, 3), (3, 2)]
    feats = {1: [0.001, 0.002], 2: [0.01, 0.0], 3: [0.0, 0.1]}
    e = spark.createDataFrame(edges, "src long, dst long")
    f = spark.createDataFrame(
        [(v, x) for v, x in feats.items()], "vec_id long, embedding array<double>"
    )
    got = {
        (r.vertex, r.i): r.s for r in khop_feature_sums(e, f, k=2).collect()
    }
    # pure-python (A+I)^2 x with the same quantization
    q = {v: [round(x * 1000) for x in xs] for v, xs in feats.items()}
    nbrs = {1: [2], 2: [1, 3], 3: [2]}
    state = dict(q)
    for _ in range(2):
        state = {
            v: [
                state[v][j] + sum(state[u][j] for u in nbrs[v])
                for j in range(2)
            ]
            for v in state
        }
    exp = {(v, j + 1): state[v][j] for v in state for j in range(2)}
    assert got == exp


def test_khop_zero_hops_is_quantized_identity(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    f = spark.createDataFrame(
        [(1, [0.5, -0.25]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    got = {(r.vertex, r.i): r.s for r in khop_feature_sums(e, f, k=0).collect()}
    assert got == {(1, 1): 500, (1, 2): -250, (2, 1): 0, (2, 2): 1000}


def test_khop_isolated_vertex_keeps_self(spark):
    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    f = spark.createDataFrame(
        [(1, [1.0]), (2, [1.0]), (9, [0.123])],
        "vec_id long, embedding array<double>",
    )
    got = {(r.vertex, r.i): r.s for r in khop_feature_sums(e, f, k=3).collect()}
    assert got[(9, 1)] == 123  # no neighbors: self carried through


def test_reciprocal_matches_mutual_top1(spark):
    a = spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [0.0, 1.0]), (4, [0.7, 0.7])],
        "vec_id long, embedding array<double>",
    )
    b = spark.createDataFrame(
        [(1, [0.9, 0.1]), (3, [0.1, 0.9])],
        "vec_id long, embedding array<double>",
    )
    got = {(r.id_a, r.id_b): r.cosine for r in reciprocal_matches(a, b).collect()}
    # 0<->1 and 2<->3 are mutual top-1; 4's best is 1 but 1 prefers 0
    assert set(got) == {(0, 1), (2, 3)}
    q = lambda v: [round(x * 1000) for x in v]  # noqa: E731
    def cos(x, y):
        dot = sum(p * r for p, r in zip(q(x), q(y)))
        return round(
            dot / math.sqrt(sum(p * p for p in q(x)) * sum(r * r for r in q(y))), 6
        )
    assert got[(0, 1)] == cos([1.0, 0.0], [0.9, 0.1])


def test_reciprocal_matches_tie_breaks_to_smaller_id(spark):
    # two identical B vectors: A's top-1 is the smaller id; only that
    # one can be mutual
    a = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<double>")
    b = spark.createDataFrame(
        [(1, [1.0, 0.0]), (3, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = [(r.id_a, r.id_b) for r in reciprocal_matches(a, b).collect()]
    assert got == [(0, 1)]
