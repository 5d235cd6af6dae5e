"""bpe_merges vs an independent pure-Python BPE reference
(Sennrich-style most-frequent-pair merge loop) — same deterministic
semantics, entirely separate implementation."""

from __future__ import annotations

from collections import Counter

from ccl_spark.textops import bpe_merges

END = "</w>"


def _ref_bpe(texts: list[str], n_merges: int) -> list[tuple[int, str, str, int]]:
    words = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {w: list(w) + [END] for w in words}
    out = []
    for k in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += words[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), c = best
        out.append((k, a, b, c))
        for w, syms in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2  # left-to-right non-overlapping
                else:
                    merged.append(syms[i])
                    i += 1
            vocab[w] = merged
    return out


def _ref_segment(texts: list[str], n_merges: int) -> dict[str, list[str]]:
    """Final per-word segmentation from the reference trainer."""
    merges = [(a, b) for _, a, b, _ in _ref_bpe(texts, n_merges)]
    words = {w for t in texts for w in t.split(" ") if w}
    out = {}
    for w in words:
        syms = list(w) + [END]
        for a, b in merges:
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        out[w] = syms
    return out


def _run(spark, texts, n):
    from ccl_spark.textops import bpe_apply

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.n)
        for r in bpe_merges(docs, n_merges=n).orderBy("merge_rank").collect()
    ]
    assert got == _ref_bpe(texts, n)
    # encoder side: applying the learned merges reproduces the
    # reference segmentation of every vocabulary word
    seg = {
        r.word: list(r.syms)
        for r in bpe_apply(docs, [(a, b) for _, a, b, _ in got]).collect()
    }
    assert seg == _ref_segment(texts, n)
    return got


def test_bpe_hand_case(spark):
    # classic: "low lower lowest" family — first merges build "low"
    texts = ["low low low lower lower lowest", "low lowest newest newest"]
    got = _run(spark, texts, 6)
    assert got[0][1:3] == ("l", "o")  # 'lo' appears in every word
    assert got[1][1:3] == ("lo", "w")


def test_bpe_overlapping_runs(spark):
    # runs of identical symbols: "aaaa" merges to [aa, aa], not [aa, a, a]
    texts = ["aaaa aaa aa", "aaaa aaaa b"]
    _run(spark, texts, 4)


def test_bpe_pseudo_random_corpus(spark):
    # deterministic pseudo-random corpus, no hand bias
    texts = [
        " ".join(
            "".join(chr(97 + ((i * 7 + j * 13 + m) % 5)) for m in range(2 + (i + j) % 4))
            for j in range(8)
        )
        for i in range(12)
    ]
    _run(spark, texts, 8)
