"""Anchor extraction + per-target anchor-term aggregation vs
driver-side ground truth / pure-Python oracles."""

from __future__ import annotations

from collections import Counter

from ccl_spark.anchors import anchor_term_index, top_anchored_targets
from ccl_spark.datagen import generate_pages, ground_truth_anchors
from ccl_spark.extract import extract_anchor_pairs

N = 300


def _truth(n=N):
    # generator never emits self-links or dup targets per page, but the
    # extractor filters/dedups anyway — mirror that here for parity
    return {
        (s, d, a) for s, d, a in ground_truth_anchors(n, seed=42) if s != d
    }


def test_anchor_extraction_matches_ground_truth(spark):
    pages = generate_pages(spark, N, seed=42)
    got = {
        (r["src_url"], r["dst_url"], r["anchor"])
        for r in extract_anchor_pairs(pages).collect()
    }
    assert got == _truth()


def _py_index(triples, k_terms=3):
    """Pure-Python replay of anchor_term_index."""
    per_tgt: dict[str, Counter] = {}
    inlinks: Counter = Counter()
    for _s, d, a in triples:
        inlinks[d] += 1
        per_tgt.setdefault(d, Counter()).update(t for t in a.split(" ") if t)
    rows = set()
    for d, cnt in per_tgt.items():
        ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (term, n) in enumerate(ordered[:k_terms], start=1):
            rows.add((d, inlinks[d], rank, term, n))
    return rows


def test_anchor_term_index_matches_python_oracle(spark):
    pages = generate_pages(spark, N, seed=42)
    got = {
        tuple(r) for r in anchor_term_index(extract_anchor_pairs(pages)).collect()
    }
    assert got == _py_index(_truth())


def test_top_anchored_targets_deterministic_and_consistent(spark):
    pages = generate_pages(spark, N, seed=42)
    anchors = extract_anchor_pairs(pages)
    rows = [tuple(r) for r in top_anchored_targets(anchors, n_targets=5).collect()]
    # restriction of the full index to the 5 most-linked targets
    full = _py_index(_truth())
    top5 = sorted({(r[1], r[0]) for r in full}, key=lambda kv: (-kv[0], kv[1]))[:5]
    keep = {d for _n, d in top5}
    expect = sorted(
        (r for r in full if r[0] in keep), key=lambda r: (-r[1], r[0], r[2])
    )
    assert rows == [tuple(r) for r in expect]
    # repeated run returns the identical ordering (deterministic tie-breaks)
    assert rows == [
        tuple(r) for r in top_anchored_targets(anchors, n_targets=5).collect()
    ]
