"""dup_clusters / dedup_corpus: transitive closure of verified
near-dup pairs into keep-sets (round-3 verdict ask #1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccl_spark.dedup import dedup_corpus, dup_clusters


def test_dup_clusters_transitive(spark):
    """A~B and B~C but A≁C must still land in ONE cluster {A, B, C}
    with keep = min id — plus an independent 2-cluster to show
    clusters don't bleed into each other."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = {
        r.doc_id: (r.cluster_id, r.keep) for r in dup_clusters(pairs).collect()
    }
    assert got == {
        1: (1, 1),
        2: (1, 0),
        3: (1, 0),
        10: (10, 1),
        11: (10, 0),
    }


def test_dup_clusters_chain_order_free(spark):
    """Pair orientation/order must not matter (canonical min labels)."""
    fwd = spark.createDataFrame([(5, 4), (3, 4), (2, 3)], "id_a long, id_b long")
    got = sorted(
        (r.cluster_id, r.doc_id, r.keep) for r in dup_clusters(fwd).collect()
    )
    assert got == [(2, 2, 1), (2, 3, 0), (2, 4, 0), (2, 5, 0)]


def test_dedup_corpus_end_to_end(spark):
    """Exact dups + a transitive near-dup chain: survivors are the
    min-id representative of each cluster plus every unpaired doc."""
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact dup of 1 -> dropped
            (3, base + " tonight"),  # near-dup of 1 -> same cluster
            (4, "completely different text about spark engines and big data"),
            (5, "another unrelated document with its own words entirely"),
        ],
        "doc_id long, text string",
    )
    out = dedup_corpus(docs, threshold=0.5)
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [1, 4, 5]
    # schema passes through untouched
    assert out.columns == ["doc_id", "text"]


def test_dup_clusters_keep_count_matches_cluster_count(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 20, 2)], "id_a long, id_b long"
    )
    cl = dup_clusters(pairs)
    n_clusters = cl.select("cluster_id").distinct().count()
    n_keep = cl.filter(F.col("keep") == 1).count()
    assert n_clusters == n_keep == 10


def test_containment_pairs_subset_doc(spark):
    """The asymmetric case Jaccard misses: a short doc fully embedded
    in a long one has containment ~1 while Jaccard is ~|A|/|B|."""
    from ccl_spark.dedup import containment_pairs

    short = "the quick brown fox jumps over the lazy dog"
    long_ = (
        "intro paragraph with plenty of other words here . "
        + short
        + " . and a long tail of unrelated material follows this quotation"
    )
    docs = spark.createDataFrame(
        [(1, short), (2, long_), (3, "completely different text entirely")],
        "doc_id long, text string",
    )
    rows = {
        (r.id_a, r.id_b): (r.containment_a, r.containment_b)
        for r in containment_pairs(docs, k=8, threshold=0.9).collect()
    }
    assert set(rows) == {(1, 2)}
    ca, cb = rows[(1, 2)]
    assert ca >= 0.9  # doc 1's grams are (almost) all inside doc 2
    assert cb < 0.5  # but doc 2 is NOT contained in doc 1


def test_containment_pairs_max_df_drops_boilerplate(spark):
    """Scale path: grams above max_df are skipped — a ubiquitous
    boilerplate suffix must not pair up everything, while a genuine
    containment (sharing rare grams) survives."""
    from pyspark.sql import functions as F

    from ccl_spark.dedup import containment_pairs

    boiler = " copyright footer all rights reserved"
    docs = spark.createDataFrame(
        [(i, f"unique body text number {i} with its own words{boiler}") for i in range(20)]
        + [(100, "a very distinctive quoted sentence appears here"),
           (101, "prefix words then a very distinctive quoted sentence appears here plus more")],
        "doc_id long, text string",
    )
    out = containment_pairs(docs, k=8, threshold=0.9, max_df=5, log_dropped=False)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (100, 101) in pairs
    # the 20 boilerplate docs share only capped grams -> no flood
    assert all(a >= 100 for a, b in pairs), pairs


def test_line_dedup_corpus_exact(spark):
    from ccl_spark.dedup import line_dedup_corpus

    docs = spark.createDataFrame(
        [
            (0, "alpha beta\ncookie banner\nunique zero"),
            (1, "cookie banner\nunique one\nalpha beta"),
            (2, "cookie banner\nalpha beta"),  # fully duplicated
            (3, "  \nunique three\n\ncookie banner"),  # blank lines dropped
        ],
        "doc_id long, text string",
    )

    # pure-Python replay of the rule: global first occurrence by
    # (doc_id, line_idx) over non-blank lines
    rows = []
    for did, text in [(r.doc_id, r.text) for r in docs.collect()]:
        for i, ln in enumerate(text.split("\n")):
            if ln.strip():
                rows.append((did, i, ln))
    seen, expect = {}, {}
    for did, i, ln in sorted(rows):
        expect.setdefault(did, [0, 0, []])
        expect[did][0] += 1
        if ln not in seen:
            seen[ln] = (did, i)
            expect[did][1] += 1
            expect[did][2].append(ln)
    got = {
        r.doc_id: (r.n_lines, r.n_kept, r.deduped_text)
        for r in line_dedup_corpus(docs).collect()
    }
    assert got == {
        d: (n, k, "\n".join(ls)) for d, (n, k, ls) in expect.items()
    }
    assert got[2] == (2, 0, "")  # fully-duplicated doc -> drop signal

    # deterministic under repartition
    again = {
        r.doc_id: (r.n_lines, r.n_kept, r.deduped_text)
        for r in line_dedup_corpus(docs.repartition(7)).collect()
    }
    assert again == got


def test_line_dedup_corpus_normalize(spark):
    from ccl_spark.dedup import line_dedup_corpus

    docs = spark.createDataFrame(
        [
            (0, "Cookie  Banner\nkeep zero"),
            (1, "cookie banner\nkeep one"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_kept, r.deduped_text)
        for r in line_dedup_corpus(docs, normalize=True).collect()
    }
    # doc 0 owns the normalized key and keeps its ORIGINAL casing
    assert got == {0: (2, "Cookie  Banner\nkeep zero"), 1: (1, "keep one")}
    raw = {
        r.doc_id: r.n_kept
        for r in line_dedup_corpus(docs, normalize=False).collect()
    }
    assert raw == {0: 2, 1: 2}


def test_dup_clusters_keep_best_argmax(spark):
    from ccl_spark.dedup import dup_clusters, dup_clusters_keep_best

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    quality = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (10, 0.1), (11, 0.5)],
        "doc_id long, score double",
    )
    got = {r.doc_id: r for r in dup_clusters_keep_best(pairs, quality).collect()}
    # cluster {1,2,3}: 2 and 3 tie at 0.9 -> smaller id 2 wins
    assert got[2].keep == 1 and got[1].keep == 0 and got[3].keep == 0
    assert got[1].cluster_id == got[2].cluster_id == got[3].cluster_id == 1
    # cluster {10,11}: 11 wins on score despite larger id
    assert got[11].keep == 1 and got[10].keep == 0
    # min-id variant picks 10 instead — the two policies genuinely differ
    minid = {r.doc_id: r.keep for r in dup_clusters(pairs).collect()}
    assert minid[10] == 1 and minid[11] == 0
    # missing score -> treated as 0.0, never crashes
    q2 = quality.filter("doc_id <> 11")
    got2 = {r.doc_id: r for r in dup_clusters_keep_best(pairs, q2).collect()}
    assert got2[10].keep == 1 and got2[11].score == 0.0


def test_near_dup_eval_counts_banding_misses(spark):
    import itertools

    from ccl_spark.dedup import near_dup_eval

    # clones (J=1, always caught) + moderate-overlap pairs that a
    # single-band-of-16 detector will mostly miss
    base = "w%d " * 30
    docs = []
    for i in range(6):
        words = " ".join(f"w{i}_{j}" for j in range(30))
        docs.append((2 * i, words))
        if i < 2:
            docs.append((2 * i + 1, words))  # exact clone
        else:
            # replace the last 8 words -> J well below 1 but above 0.5
            repl = " ".join(f"w{i}_{j}" for j in range(22)) + " " + " ".join(
                f"x{i}_{j}" for j in range(8)
            )
            docs.append((2 * i + 1, repl))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # exact truth in python
    def sh3(t):
        w = t.split(" ")
        if len(w) < 3:
            return {" ".join(w)}
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    texts = dict(docs)
    truth = set()
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = sh3(texts[a]), sh3(texts[b])
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.5:
            truth.add((a, b))

    # strong detector: 16 bands of 2 -> catches everything here
    strong = near_dup_eval(df, threshold=0.5, n=3, n_hashes=32, bands=16).first()
    assert strong.fp == 0
    assert strong.tp + strong.fn == len(truth)
    assert strong.tp == len(truth) and strong.recall == 1.0

    # weak detector: 1 band of 32 minhashes -> all 32 must agree; the
    # moderate-overlap pairs are (deterministically) missed
    weak = near_dup_eval(df, threshold=0.5, n=3, n_hashes=32, bands=1).first()
    assert weak.fp == 0 and weak.precision in (1.0, 0.0)
    assert weak.tp + weak.fn == len(truth)
    assert weak.fn >= strong.fn
