from __future__ import annotations

from ccl_spark.suffix import corpus_token_stream, suffix_array


def _sa_oracle(tokens: list[str]) -> list[int]:
    return sorted(range(len(tokens)), key=lambda i: tokens[i:])


def test_suffix_array_banana(spark):
    toks = spark.createDataFrame(
        list(enumerate("banana")), "pos long, tok string"
    )
    got = {r.rank: r.pos for r in suffix_array(toks).collect()}
    assert [got[r] for r in sorted(got)] == [5, 3, 1, 0, 4, 2]


def test_suffix_array_matches_python_tokens(spark):
    words = [f"w{(i * 13) % 7}" for i in range(40)]  # heavy repeats
    toks = spark.createDataFrame(
        list(enumerate(words)), "pos long, tok string"
    )
    got = {r.rank: r.pos for r in suffix_array(toks).collect()}
    assert [got[r] for r in sorted(got)] == _sa_oracle(words)


def test_corpus_stream_separators_block_cross_doc_runs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    stream = corpus_token_stream(docs)
    rows = sorted((r.pos, r.tok) for r in stream.collect())
    toks = [t for _, t in rows]
    # layout: a b c !sep1 a b c !sep2
    assert toks == ["a", "b", "c", "!sep1", "a", "b", "c", "!sep2"]
    got = {r.rank: r.pos for r in suffix_array(stream).collect()}
    assert [got[r] for r in sorted(got)] == _sa_oracle(toks)
    # the two identical "a b c" runs are ADJACENT in the suffix array
    # (that adjacency is what exact-substring dedup scans for)
    order = [got[r] for r in sorted(got)]
    ia, ib = order.index(0), order.index(4)
    assert abs(ia - ib) == 1


def test_adjacent_lcp_banana(spark):
    from ccl_spark.suffix import adjacent_lcp

    toks = spark.createDataFrame(
        list(enumerate("banana")), "pos long, tok string"
    )
    got = {r.rank: r.lcp for r in adjacent_lcp(toks).collect()}
    # SA order a, ana, anana, banana, na, nana -> LCPs 1, 3, 0, 0, 2
    assert got == {1: 1, 2: 3, 3: 0, 4: 0, 5: 2}


def test_adjacent_lcp_matches_python(spark):
    from ccl_spark.suffix import adjacent_lcp

    words = [f"w{(i * 13) % 5}" for i in range(30)]
    sa = sorted(range(len(words)), key=lambda i: words[i:])
    def lcp(a, b):
        n = 0
        while a + n < len(words) and b + n < len(words) and words[a + n] == words[b + n]:
            n += 1
        return n
    toks = spark.createDataFrame(list(enumerate(words)), "pos long, tok string")
    got = {r.rank: r.lcp for r in adjacent_lcp(toks).collect()}
    assert got == {k: lcp(sa[k - 1], sa[k]) for k in range(1, len(words))}


def test_verbatim_doc_pairs_finds_long_shared_passage(spark):
    from ccl_spark.suffix import verbatim_doc_pairs

    passage = " ".join(f"p{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (0, "alpha beta " + passage + " gamma"),
            (1, "unrelated words only here entirely"),
            (2, "delta " + passage + " epsilon zeta"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b): r.max_lcp
        for r in verbatim_doc_pairs(docs, min_len=5, max_rounds=10).collect()
    }
    assert (0, 2) in got and got[(0, 2)] >= 30
    assert all(1 not in pair for pair in got)


def test_verbatim_doc_pairs_chain_covers_all_holders(spark):
    # a run shared by THREE docs surfaces as a chain of adjacent pairs
    # touching every holder (closure via dup_clusters, like MinHash)
    from ccl_spark.suffix import verbatim_doc_pairs

    run = " ".join(f"r{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(i, f"u{i} " + run + f" t{i}") for i in range(3)]
        + [(9, "nothing shared at all")],
        "doc_id long, text string",
    )
    pairs = verbatim_doc_pairs(docs, min_len=12, max_rounds=10).collect()
    touched = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    assert touched == {0, 1, 2}
    assert all(r.max_lcp >= 12 for r in pairs)
    assert len(pairs) >= 2  # chain over 3 occurrences


def test_verbatim_doc_pairs_min_len_filters(spark):
    from ccl_spark.suffix import verbatim_doc_pairs

    docs = spark.createDataFrame(
        [(0, "x y shared pair here"), (1, "shared pair elsewhere z")],
        "doc_id long, text string",
    )
    two = {
        (r.doc_a, r.doc_b): r.max_lcp
        for r in verbatim_doc_pairs(docs, min_len=2, max_rounds=8).collect()
    }
    assert two == {(0, 1): 2}  # "shared pair" is the longest shared run
    assert verbatim_doc_pairs(docs, min_len=3, max_rounds=8).count() == 0
