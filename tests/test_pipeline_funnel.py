from __future__ import annotations

from ccl_spark.graphstats import partition_cut
from ccl_spark.pipeline import corpus_funnel_stats, prepare_corpus


def _docs(spark):
    good = " ".join(["alpha", "beta", "gamma", "the", "of"] * 8)  # keeps
    texts = {
        1: good,
        2: good,                      # exact dup of 1
        3: good + " tail tail",       # near-dup of 1
        4: "too short",               # quality-dropped
        5: " ".join(["delta", "kappa", "sigma", "the", "a"] * 8),  # keeps
    }
    return spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    ), texts


def test_funnel_counts(spark):
    docs, texts = _docs(spark)
    r = corpus_funnel_stats(docs, near_dup_threshold=0.5).first()
    assert r.n_raw == 5
    assert r.n_quality == 4          # doc 4 dropped by the gate
    assert r.n_exact == 3            # {1,2} collapse -> reps {1,3,5}
    assert r.n_final == 2            # 3 near-dups into 1; survivors {1,5}
    assert r.total_tokens == len(texts[1].split()) + len(texts[5].split())


def test_prepare_corpus_survivors(spark):
    docs, _ = _docs(spark)
    final = {r.doc_id for r in prepare_corpus(docs, near_dup_threshold=0.5).collect()}
    assert final == {1, 5}


def test_partition_cut_metrics(spark):
    # two components of 3 vertices each; a perfect assignment cuts 0,
    # splitting one component cuts its internal edges
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12)], "src long, dst long"
    )
    perfect = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (10, 1), (11, 1), (12, 1)], "vertex long, part long"
    )
    split = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 0), (10, 1), (11, 1), (12, 1)], "vertex long, part long"
    )
    p = partition_cut(e, perfect, "perfect").first()
    assert p.cut_edges == 0 and p.cut_frac == 0.0 and p.n_parts == 2
    assert p.max_part_frac == 0.5
    s = partition_cut(e, split, "split").first()
    assert s.cut_edges == 2  # both edges at vertex 2 cross
    assert s.n_edges == 4


def test_curation_funnel_stages(spark):
    from ccl_spark.pipeline import curation_funnel

    # 4 hosts x 3 docs; one host blocked by suffix, one host gibberish.
    # NB the LM is corpus-trained, so the tail host needs noise with
    # UNREPEATED bigrams (a repeated symbol pattern would predict
    # itself); varied pseudo-random characters score far below prose.
    rows = []
    for hn, hname in enumerate(["good.a.com", "fine.b.com", "bad.spam.net", "junk.c.com"]):
        for d in range(3):
            base = ("the cat sat on the mat and ran " * 3) + f"x{d} "
            noise = (
                "".join(chr(33 + ((d * 53 + i * 17) % 90)) for i in range(150))
                if hname.startswith("junk")
                else ""
            )
            rows.append((f"u{hn}_{d}", hname, base + noise))
    docs = spark.createDataFrame(rows, "doc_id string, host string, text string")
    bl = spark.createDataFrame([("spam.net",)], "domain string")
    r = curation_funnel(docs, bl, id_col="doc_id").first()
    assert r.n_raw == 12
    assert r.n_unblocked == 9  # bad.spam.net suffix-blocked
    # terciles over 3 surviving hosts: the gibberish host is the tail
    assert r.n_quality_hosts == 2
    assert r.n_docs_kept == 6
    assert r.total_tokens > 0


def test_robots_parse_and_filter(spark):
    from ccl_spark.frontier import parse_robots_rules, robots_filter

    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /admin\nDisallow: /tmp\n"
                      "User-agent: badbot\nDisallow: /"),
            ("b.com", "User-agent: googlebot\nDisallow: /secret\n"
                      "User-agent: *\nDisallow: /x"),
            ("c.com", "User-agent: *\n# no disallows\n"),
        ],
        "host string, body string",
    )
    rules = {(r.host, r.path_prefix) for r in parse_robots_rules(robots).collect()}
    # wildcard groups only; the badbot '/' and googlebot '/secret' are ignored
    assert rules == {("a.com", "/admin"), ("a.com", "/tmp"), ("b.com", "/x")}

    urls = spark.createDataFrame(
        [
            ("https://a.com/admin/panel",),   # blocked
            ("https://a.com/tmpfile",),       # blocked (prefix match)
            ("https://a.com/public",),        # allowed
            ("https://b.com/x/1",),           # blocked
            ("https://b.com/secret",),        # allowed (* group has no /secret)
            ("https://c.com/anything",),      # allowed (no rules)
            ("https://d.com/x",),             # allowed (no robots at all)
            ("https://a.com/",),              # allowed (root not disallowed)
        ],
        "url string",
    )
    kept = {r.url for r in robots_filter(urls, parse_robots_rules(robots)).collect()}
    assert kept == {
        "https://a.com/public",
        "https://b.com/secret",
        "https://c.com/anything",
        "https://d.com/x",
        "https://a.com/",
    }
