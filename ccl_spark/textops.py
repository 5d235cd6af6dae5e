"""Text analysis over document tables — webtext-pipeline operators.

All JVM-side (split / filter / aggregate higher-order functions); no
Python in the hot path. Designed for a ``documents(doc_id, text, ...)``
shape but column names are parameters.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

EN_STOP = ["a", "the", "and", "of", "to", "in", "is", "it"]
DE_STOP = ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"]
FR_STOP = ["le", "la", "les", "et", "est", "un", "une", "de"]

_LANG_MARKERS = {"en": EN_STOP, "de": DE_STOP, "fr": FR_STOP}


def _tokens(text_col: str) -> F.Column:
    return F.split(F.col(text_col), " ")


def _count_in(text_col: str, words: list[str]) -> F.Column:
    lst = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter(split({text_col}, ' '), x -> x IN ({lst})))")


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.size(_tokens(text_col)).cast("long").alias("n_tokens"),
    )


# BPE-ish pre-tokenization split (letter runs / digit runs / other
# symbol runs), expressed with character classes that behave
# identically in Java regex (Spark) and RE2-ish engines (DuckDB) so the
# count is oracle-checkable.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_count_bpe(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Token counts under a BPE-style pre-tokenizer (letter/digit/
    symbol runs) — the usual first stage of a GPT-2-family tokenizer,
    JVM regexp, no Python."""
    return docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), F.lit(0))
        )
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def quality_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Length / punctuation / stopword-ratio / mean-word-length features
    (the standard webtext quality heuristics)."""
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    n_char = F.length(F.col(text_col))
    n_punct = n_char - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    n_stop = _count_in(text_col, EN_STOP)
    return docs.select(
        F.col(id_col).cast("long").alias(id_col),
        n_char.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(n_punct.cast("double") / F.greatest(n_char, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_stop.cast("double") / F.greatest(n_tok, F.lit(1)), 6).alias("stop_ratio"),
        F.round(
            (n_char - n_tok + 1).cast("double") / F.greatest(n_tok, F.lit(1)), 6
        ).alias("mean_word_len"),
    )


def _word_ngrams(text_col: str, n: int) -> F.Column:
    """Word n-grams of a whitespace-split text as an array column,
    built JVM-side: transform over a 1..len-n+1 index sequence joining
    n consecutive tokens with single spaces. Empty array when the doc
    has fewer than n tokens."""
    t = f"split({text_col}, ' ')"
    parts = ", ' ', ".join(f"{t}[i - 1 + {j}]" for j in range(n))
    return F.expr(
        f"CASE WHEN size({t}) < {n} THEN array() "
        f"ELSE transform(sequence(1, size({t}) - {n} + 1), "
        f"i -> concat({parts})) END"
    )


def ngram_repetition(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document word-n-gram repetition stats: total n-gram
    occurrences, the count of the most frequent n-gram, and how many
    occurrences belong to n-grams that appear more than once in the
    document. One explode + one groupBy on (doc, gram) — the shuffle
    key is document-local, so partial aggregation absorbs it and no
    key ever outgrows its own document."""
    grams = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.explode_outer(_word_ngrams(text_col, n)).alias("gram"),
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("gram").alias("cnt"))
    return per_gram.groupBy(id_col).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("total"),
        F.coalesce(F.max("cnt"), F.lit(0)).cast("long").alias("top_cnt"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))),
            F.lit(0),
        )
        .cast("long")
        .alias("dup_cnt"),
    )


def repetition_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 3,
) -> DataFrame:
    """Gopher/MassiveText-style repetition quality signals (Rae et al.
    2021 §A.1.1, adapted to word n-grams since the synthetic corpus has
    no line structure): ``top_ngram_frac`` = fraction of n-gram
    occurrences taken by the single most frequent ``top_n``-gram
    (boilerplate/listing detector), ``dup_ngram_frac`` = fraction of
    ``dup_n``-gram occurrences that are repeats within the document
    (internal-duplication detector). Docs scoring high on either are
    the ones repetition filters drop before LLM training."""
    top = ngram_repetition(docs, top_n, id_col, text_col).select(
        id_col,
        F.round(
            F.col("top_cnt").cast("double") / F.greatest(F.col("total"), F.lit(1)), 6
        ).alias("top_ngram_frac"),
    )
    dup = ngram_repetition(docs, dup_n, id_col, text_col).select(
        id_col,
        F.round(
            F.col("dup_cnt").cast("double") / F.greatest(F.col("total"), F.lit(1)), 6
        ).alias("dup_ngram_frac"),
    )
    return top.join(dup, id_col)


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: per-language stopword hit counts,
    argmax with deterministic tie-break (en > de > fr > und)."""
    scores = {lang: _count_in(text_col, words) for lang, words in _LANG_MARKERS.items()}
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(list(_LANG_MARKERS)):  # earlier langs win ties
        s = scores[lang]
        best = F.when(s >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, s)
    cols = [F.col(id_col).cast("long").alias(id_col)]
    cols += [scores[lang].cast("long").alias(f"n_{lang}") for lang in _LANG_MARKERS]
    cols.append(best.alias("lang_guess"))
    return docs.select(*cols)


def vocabulary(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
    pattern: str | None = None,
) -> DataFrame:
    """(token, n_docs, count) corpus vocabulary — the first step of
    tokenizer training. ``pattern`` switches from whitespace tokens to
    BPE_PATTERN-style regexp tokens. One explode + one groupBy; token
    frequency is Zipfian (stopwords are hub keys) but count and
    distinct-doc count aggregate map-side partially, so the skew never
    reaches a single reducer with raw rows — the same
    partial-aggregation argument as salted_in_degrees."""
    toks = (
        F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
        if pattern
        else _tokens(text_col)
    )
    exploded = docs.select(
        F.col(id_col).alias("_doc"), F.explode(toks).alias("token")
    ).filter(F.col("token") != "")
    return (
        exploded.groupBy("token")
        .agg(
            F.countDistinct("_doc").alias("n_docs"),
            F.count(F.lit(1)).alias("count"),
        )
        .filter(F.col("count") >= min_count)
    )


def tfidf_top_terms(
    docs: DataFrame,
    k_terms: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k_terms`` terms per document by TF-IDF with
    ``idf = ln(N / df)`` (raw term count × inverse document
    frequency — the classic keyword-extraction scoring).

    Shape at scale: one explode + (doc, term) count (map-side partial
    absorbs stopword skew exactly as in :func:`vocabulary`), a
    term-keyed df aggregate joined back, the corpus size N brought in
    as a broadcast one-row frame (no collect), and a per-document
    window for the top-k — the window key is ``doc_id``, so no
    partition ever exceeds one document's vocabulary.  Deterministic
    tie-break (round(score, 6) DESC, term ASC)."""
    exploded = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.explode(_tokens(text_col)).alias("term"),
    ).filter(F.col("term") != "")
    tf = exploded.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k_terms)
        .select(id_col, "term", "score")
    )


# Conservative patterns that parse identically in Java regex (Spark)
# and RE2 (DuckDB): no backrefs, no lookaround.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d[\d().-]{7,}\d",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
}


def scrub_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII redaction — the mandatory scrub stage of a
    training-data pipeline: emails, phone-number-shaped digit runs and
    IPv4 literals are counted and replaced by ``[EMAIL]``/``[PHONE]``/
    ``[IP]`` placeholders (in that fixed order, so the output is
    deterministic).  Pure JVM ``regexp_extract_all`` /
    ``regexp_replace`` — no Python in the path; patterns restricted to
    the Java∩RE2 regex subset so an ANSI-SQL engine reproduces the
    result byte-for-byte.

    Returns ``(id, n_email, n_phone, n_ipv4, scrubbed)``.
    """
    # sequential scrub: email, then IPv4, then phone — an IPv4 literal
    # also matches the looser phone shape, so each stage counts on the
    # PREVIOUS stage's output (counts == placeholders inserted, no
    # double counting)
    def n(col: F.Column, pat: str) -> F.Column:
        return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).cast("long")

    s0 = F.col(text_col)
    s1 = F.regexp_replace(s0, PII_PATTERNS["email"], "[EMAIL]")
    s2 = F.regexp_replace(s1, PII_PATTERNS["ipv4"], "[IP]")
    s3 = F.regexp_replace(s2, PII_PATTERNS["phone"], "[PHONE]")
    return docs.select(
        F.col(id_col).cast("long").alias(id_col),
        n(s0, PII_PATTERNS["email"]).alias("n_email"),
        n(s2, PII_PATTERNS["phone"]).alias("n_phone"),
        n(s1, PII_PATTERNS["ipv4"]).alias("n_ipv4"),
        s3.alias("scrubbed"),
    )


def inverted_index(
    docs: DataFrame,
    max_postings: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Positional inverted index — the search-engine build step:
    ``(term, n_docs, n_postings, postings)`` with ``postings`` the
    space-joined ``doc:pos`` occurrence list (1-based token position),
    sorted by (doc, pos) and truncated to ``max_postings`` entries
    (``n_postings`` keeps the untruncated total, so truncation is
    visible, never silent).

    One posexplode + one term-keyed aggregate; the per-term posting
    list is assembled with ``array_sort(collect_list(struct))`` so the
    output is deterministic at any parallelism, and the truncation cap
    bounds the hot-term (stopword) row width — the Zipf-skew guard for
    an index build at corpus scale."""
    tok = (
        docs.select(
            F.col(id_col).cast("long").alias("doc"),
            F.posexplode(_tokens(text_col)).alias("pos0", "term"),
        )
        .filter(F.col("term") != "")
        .select("term", "doc", (F.col("pos0") + 1).alias("pos"))
    )
    entries = F.transform(
        F.slice(
            F.array_sort(F.collect_list(F.struct("doc", "pos"))), 1, max_postings
        ),
        lambda x: F.concat_ws(
            ":", x["doc"].cast("string"), x["pos"].cast("string")
        ),
    )
    return tok.groupBy("term").agg(
        F.countDistinct("doc").alias("n_docs"),
        F.count(F.lit(1)).alias("n_postings"),
        F.array_join(entries, " ").alias("postings"),
    )


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    end_marker: str = "</w>",
) -> DataFrame:
    """BPE tokenizer training, stage 2 (Sennrich et al. 2016): the
    iterative most-frequent-pair merge loop, as DataFrame ops over the
    DISTINCT-WORD table. Returns the learned merge list
    ``(merge_rank, lhs, rhs, n)`` — rank-k merge of symbols lhs+rhs,
    n = corpus-weighted occurrence count at the time of the merge.

    Semantics (deterministic, engine-independent, mirrored by the
    driver-gate's chained-CTE DuckDB oracle):
    - words weighted by corpus frequency; symbols start as single
      characters plus an ``end_marker`` sentinel;
    - each round: count adjacent symbol pairs weighted by word count;
      the merge pair is argmax count, ties broken lexicographically
      (smallest lhs, then rhs);
    - occurrences merge LEFT-TO-RIGHT NON-OVERLAPPING ("aaa" with
      pair (a,a) yields [aa, a]) — encoded as: candidate positions
      grouped into maximal consecutive runs, every other position of a
      run (even offset) merges. A run longer than 1 only exists when
      lhs == rhs, which is exactly the overlapping case.

    Scale shape: state is the distinct-word symbol table (bounded by
    total characters of the VOCABULARY, not the corpus — the one-time
    word-count groupBy absorbed the corpus scan), re-sequenced and
    localCheckpoint'ed per round; the per-round argmax is a 1-row
    driver fetch (the merge literal must reach the plan builder, the
    same O(1)/round driver traffic as a convergence scalar)."""
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    rows = (
        words.select(
            "word",
            "wc",
            F.explode(F.sequence(F.lit(1), F.length("word") + 1)).alias("pos"),
        )
        .select(
            "word",
            "wc",
            "pos",
            F.when(F.col("pos") <= F.length("word"), F.expr("substr(word, pos, 1)"))
            .otherwise(F.lit(end_marker))
            .alias("sym"),
        )
        .localCheckpoint(eager=True)
    )
    wpos = Window.partitionBy("word").orderBy("pos")
    out: list[tuple[int, str, str, int]] = []
    for k in range(1, n_merges + 1):
        nxt_sym = F.lead("sym").over(wpos)
        cnt = (
            rows.withColumn("b", nxt_sym)
            .filter(F.col("b").isNotNull())
            .groupBy(F.col("sym").alias("a"), "b")
            .agg(F.sum("wc").alias("c"))
        )
        best = cnt.orderBy(F.desc("c"), F.asc("a"), F.asc("b")).first()
        if best is None:
            break
        a, b, c = best["a"], best["b"], int(best["c"])
        out.append((k, a, b, c))
        rows = _merge_pass(rows, a, b, wpos).localCheckpoint(eager=True)
    return spark.createDataFrame(out, "merge_rank long, lhs string, rhs string, n long")


def _merge_pass(rows: DataFrame, a: str, b: str, wpos) -> DataFrame:
    """One left-to-right non-overlapping merge of adjacent (a, b) over
    the (word, pos, sym) table — the rewrite shared by training
    (bpe_merges) and encoding (bpe_apply)."""
    nxt_sym = F.lead("sym").over(wpos)
    marked = (
        rows.withColumn(
            "cand",
            F.coalesce((F.col("sym") == F.lit(a)) & (nxt_sym == F.lit(b)), F.lit(False)),
        )
        .withColumn(
            "rn",
            F.sum(F.col("cand").cast("long")).over(
                wpos.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("grp", F.col("pos") - F.col("rn"))
    )
    wgrp = Window.partitionBy("word", "grp")
    marked = marked.withColumn(
        "active",
        F.col("cand")
        & (
            ((F.col("pos") - F.min(F.when(F.col("cand"), F.col("pos"))).over(wgrp)) % 2)
            == 0
        ),
    ).withColumn("prev_active", F.lag("active").over(wpos))
    keep = [c for c in rows.columns if c not in ("pos", "sym")]
    return marked.filter(~F.coalesce(F.col("prev_active"), F.lit(False))).select(
        *keep,
        F.row_number().over(wpos).alias("pos"),
        F.when(F.col("active"), F.lit(a + b)).otherwise(F.col("sym")).alias("sym"),
    )


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    end_marker: str = "</w>",
) -> DataFrame:
    """The ENCODER side of the tokenizer: apply learned merges (rank
    order) and return ``(word, syms array<string>)`` — the
    segmentation of every DISTINCT corpus word. Applying merges at
    vocabulary scale and joining back to documents is the standard
    trick that keeps tokenization O(|vocab| * n_merges) instead of
    O(|corpus| * n_merges); downstream, ``docs.select(explode(split))``
    joined on word tokenizes the corpus order-preservingly."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    rows = (
        words.select(
            "word",
            F.explode(F.sequence(F.lit(1), F.length("word") + 1)).alias("pos"),
        )
        .select(
            "word",
            "pos",
            F.when(F.col("pos") <= F.length("word"), F.expr("substr(word, pos, 1)"))
            .otherwise(F.lit(end_marker))
            .alias("sym"),
        )
        .localCheckpoint(eager=True)
    )
    wpos = Window.partitionBy("word").orderBy("pos")
    for i, (a, b) in enumerate(merges):
        rows = _merge_pass(rows, a, b, wpos)
        # checkpoint every few passes: lineage depth grows by ~5 window
        # ops per merge and the table only shrinks
        if (i + 1) % 4 == 0:
            rows = rows.localCheckpoint(eager=True)
    return rows.groupBy("word").agg(
        F.array_sort(F.collect_list(F.struct("pos", "sym")))
        .getField("sym")
        .alias("syms")
    )


def bpe_encode_docs(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    end_marker: str = "</w>",
) -> DataFrame:
    """Corpus tokenization END-TO-END — the deliverable an LLM data
    pipeline actually ships: ``(doc_id, pos, token_id, token)`` rows,
    one per emitted token, ``pos`` the 0-based position within the
    document's token stream.

    Token ids are the distinct symbols of the learned segmentation in
    lexicographic order (dense, 0-based) — deterministic and
    engine-independent, so the DuckDB oracle re-derives the identical
    id map (a production tokenizer would rank by frequency; the id
    ASSIGNMENT rule is orthogonal to the pipeline shape).

    Scale shape: the merge loop runs at VOCABULARY scale (bpe_apply —
    O(|vocab| * n_merges), never O(corpus * n_merges)); documents then
    join their words to the segmentation with the vocab-sized tables
    BROADCAST, and the per-document position is a per-doc window over
    (word position, symbol offset) — corpus rows are touched exactly
    once, in one broadcast-join + explode pass."""
    seg = bpe_apply(docs, merges, id_col, text_col, end_marker)
    vocab = (
        seg.select(F.explode("syms").alias("token"))
        .distinct()
        .withColumn(
            "token_id",
            (F.row_number().over(Window.orderBy("token")) - 1).cast("long"),
        )
    )  # vocab-bounded: the single-partition window is a few thousand rows
    words = (
        docs.select(
            F.col(id_col).cast("long").alias(id_col),
            F.posexplode(F.split(F.col(text_col), " ")).alias("wpos", "word"),
        )
        .filter(F.col("word") != "")
    )
    # token position = (symbols emitted by earlier words) + offset in
    # this word's segmentation: the cumulative sum runs over WORD rows
    # (one per corpus word), not the ~5x larger exploded token table a
    # row_number over (wpos, spos) would have to sort — same pos values
    w = Window.partitionBy(id_col).orderBy("wpos")
    offs = words.join(F.broadcast(seg), "word").withColumn(
        "off",
        F.coalesce(
            F.sum(F.size("syms")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    toks = offs.select(
        id_col, "off", F.posexplode("syms").alias("spos", "token")
    )
    return toks.join(F.broadcast(vocab), "token").select(
        id_col,
        (F.col("off") + F.col("spos")).cast("long").alias("pos"),
        "token_id",
        "token",
    )


def char_bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    id_cast: str | None = "long",
) -> DataFrame:
    """Per-document mean log-probability under an add-one-smoothed
    character-bigram model trained on the corpus itself — the
    perplexity-style fluency signal of the CCNet/Gopher quality
    filters, self-contained (no external LM): gibberish and
    boilerplate-dense documents score far from the corpus mean.

    Model: P(b|a) = (C(ab)+1) / (C(a·)+V), with C from the corpus
    bigram table and V the distinct-character count; score(doc) =
    Σ ln P over the document's bigrams / n_bigrams.

    Shape at scale: one explode to the corpus bigram table, one
    (bigram) count aggregate (map-side partials absorb the Zipf skew),
    a broadcast of the |Σ|²-bounded model back onto the per-document
    bigrams, and one per-document mean.  Returns
    ``(id, n_bigrams, logprob)`` with logprob rounded to 6dp.
    """
    # guard: sequence(1, 0) DESCENDS in Spark, so short docs need an
    # explicit empty array, not a degenerate sequence
    bg = F.expr(
        f"CASE WHEN length({text_col}) < 2 THEN array() "
        f"ELSE transform(sequence(1, length({text_col}) - 1),"
        f" i -> substring({text_col}, i, 2)) END"
    )
    pairs = docs.select(
        (
            F.col(id_col).cast(id_cast) if id_cast else F.col(id_col)
        ).alias(id_col),
        F.explode(bg).alias("ab"),
    )
    cab = pairs.groupBy("ab").agg(F.count(F.lit(1)).alias("cab"))
    ca = cab.groupBy(F.substring("ab", 1, 1).alias("a")).agg(
        F.sum("cab").alias("ca")
    )
    v = (
        pairs.select(F.explode(F.split(F.col("ab"), "")).alias("ch"))
        .filter(F.col("ch") != "")
        .agg(F.countDistinct("ch").alias("v"))
    )
    model = (
        cab.withColumn("a", F.substring("ab", 1, 1))
        .join(ca, "a")
        .crossJoin(F.broadcast(v))
        .select(
            "ab",
            F.log((F.col("cab") + 1) / (F.col("ca") + F.col("v"))).alias("lp"),
        )
    )
    return (
        pairs.join(F.broadcast(model), "ab")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum("lp") / F.count(F.lit(1)), 6).alias("logprob"),
        )
    )


def doc_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 8
) -> DataFrame:
    """Winnowing-style fingerprint: the minimum 64-bit hash over all
    character k-grams of the normalized text (robust to token order at
    the edges; identical docs -> identical fingerprint)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    grams = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {k} + 1, 1)),"
        f" i -> substring(lower(regexp_replace({text_col}, '\\\\s+', ' ')), i, {k}))"
    )
    return docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.xxhash64(norm).alias("text_hash"),
        F.array_min(F.transform(grams, lambda g: F.xxhash64(g))).alias("fingerprint"),
    )


def zipf_alpha(
    docs: DataFrame,
    f_min: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(alpha double, n_tail long)`` — Hill maximum-likelihood
    estimate of the vocabulary's Zipf exponent,
    alpha = 1 + n / Σ ln(f / (f_min − 1/2)) over terms with frequency
    ≥ f_min (Clauset, Shalizi & Newman 2009 eq. 3.7 — the same
    estimator powerlaw_alpha applies to degrees, here on term
    frequencies).  The one-number summary of corpus lexical diversity:
    natural text sits near alpha ≈ 2, template/spam mass pushes it
    away.  One explode + one term-keyed count (map-side partials
    absorb stopword skew) + one scalar aggregate."""
    uni = (
        docs.select(F.explode(_tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
        .filter(F.col("f") >= f_min)
    )
    return uni.agg(
        F.round(
            F.lit(1.0)
            + F.count(F.lit(1))
            / F.sum(F.log(F.col("f").cast("double") / (f_min - 0.5))),
            6,
        ).alias("alpha"),
        F.count(F.lit(1)).alias("n_tail"),
    )


def gopher_quality_flags(
    docs: DataFrame,
    min_tokens: int = 30,
    max_tokens: int = 100000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stop_ratio: float = 0.05,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style document quality gate (Rae et al. 2021 §A1.1):
    per-document token count, mean word length, and stopword ratio,
    each tested against the rule thresholds, folded into one ``keep``
    decision — the pre-training corpus filter stage.

    All-JVM expressions over ONE ``split``: no shuffle at all (a pure
    projection), so the filter streams at scan speed over any corpus
    size.  Ratios are 6dp-rounded with explicit double casts so the
    SQL oracle reproduces them bit-for-bit.

    Returns ``(doc_id, n_tokens, mean_word_len, stop_ratio, keep)``.
    """
    stop_list = ", ".join(f"'{w}'" for w in EN_STOP)
    words = f"filter(split({text_col}, ' '), x -> x <> '')"
    out = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.expr(f"size({words})").cast("long").alias("n_tokens"),
        F.expr(f"aggregate({words}, 0L, (acc, x) -> acc + length(x))")
        .cast("long")
        .alias("n_chars"),
        F.expr(f"size(filter({words}, x -> x IN ({stop_list})))")
        .cast("long")
        .alias("n_stop"),
    ).select(
        "doc_id",
        "n_tokens",
        F.round(F.col("n_chars").cast("double") / F.col("n_tokens"), 6).alias(
            "mean_word_len"
        ),
        F.round(F.col("n_stop").cast("double") / F.col("n_tokens"), 6).alias(
            "stop_ratio"
        ),
    )
    keep = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("stop_ratio") >= min_stop_ratio)
    )
    return out.withColumn("keep", keep)


def winnow_fingerprints(
    docs: DataFrame,
    n: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing fingerprint SETS (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word ``n``-gram,
    slide a window of ``w`` consecutive hashes, and select the
    RIGHTMOST MINIMAL hash of each window.  The selected (position,
    hash) set is the document's fingerprint: any shared substring of
    at least ``n + w - 1`` words is guaranteed to contribute at least
    one common fingerprint — the local-sampling guarantee simple
    min-hashing lacks.

    Shape at scale: one gram explode, a bounded ``w``-way window
    expansion (each gram joins the ≤``w`` windows containing it — a
    sequence explode, no self-join), one (doc, window) argmin and a
    distinct — all linear in total grams.  The hash is the md5→hex→
    int64 draw (the walks trick), so the selection replays
    bit-identically in SQL.

    Returns distinct ``(doc_id, pos, fp)`` — fingerprint hash plus the
    gram position it was sampled at.  Documents with fewer than ``n``
    words fingerprint to nothing; fewer than ``w`` grams collapse to a
    single whole-document window.
    """
    grams = (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.posexplode(_word_ngrams(text_col, n)).alias("pos", "gram"),
        )
        .select(
            "doc_id",
            "pos",
            F.expr(
                "cast(conv(substring(md5(gram), 1, 15), 16, 10) as bigint)"
            ).alias("gh"),
        )
        # the gram count comes from a per-doc window over the EXPLODED
        # rows, never from a second size(transform(...)) expression —
        # an expression column beside a generator is re-evaluated per
        # output row, which turns the gram build O(len²) per document
        # (measured 31.7s -> 0.3s on the 500-doc corpus)
        .withColumn(
            "ng", F.max("pos").over(Window.partitionBy("doc_id")) + F.lit(1)
        )
        # materialize once: the window sort and the distinct both
        # re-read the hashed gram table
        .localCheckpoint(eager=True)
    )
    expanded = grams.select(
        "doc_id",
        "pos",
        "gh",
        F.explode(
            F.sequence(
                F.greatest(F.col("pos") - F.lit(w - 1), F.lit(0)),
                F.least(F.col("pos"), F.greatest(F.col("ng") - F.lit(w), F.lit(0))),
            )
        ).alias("s"),
    )
    win = Window.partitionBy("doc_id", "s").orderBy(F.asc("gh"), F.desc("pos"))
    return (
        expanded.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("pos").cast("long").alias("pos"), F.col("gh").alias("fp"))
        .distinct()
    )


def winnow_pairs(
    docs: DataFrame,
    n: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs by shared winnowing fingerprints: documents
    sharing at least ``min_shared`` distinct fingerprint hashes.

    The pair join is an inverted-index equi-join on the fingerprint
    value with the containment-style ``max_df`` hot-hash cap
    (boilerplate fingerprints shared by more than ``max_df`` docs are
    dropped BEFORE pairing — the quadratic guard), so cost is bounded
    by ``max_df``² per surviving hash, never all-pairs.

    Returns ``(id_a, id_b, n_shared)``, ``id_a < id_b``.
    """
    fps = (
        winnow_fingerprints(docs, n=n, w=w, id_col=id_col, text_col=text_col)
        .select("doc_id", "fp")
        .distinct()
    )
    if max_df is not None:
        hot = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
        fps = fps.join(hot.filter(F.col("df") <= max_df).select("fp"), "fp")
    a = fps.select(F.col("doc_id").alias("id_a"), "fp")
    b = fps.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def tfidf_doc_similarity(
    docs: DataFrame,
    k: int = 20,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` document pairs by TF-IDF weighted dot product
    ``Σ_t tf_a(t)·tf_b(t)·idf(t)²`` — bag-of-words document
    similarity served off the inverted index.

    The pair generation is the inverted-index equi-join on ``term``
    (the same shape as containment/winnow pairs), with ``max_df``
    dropping stop-like terms before pairing — both the quadratic
    guard and the standard retrieval practice.  tf/df are exact
    integers; idf enters once per (pair, term) row and the final sum
    is 6dp-rounded with an (id_a, id_b) tie-break.

    Returns ``(id_a, id_b, score)``, ``id_a < id_b``, ordered.
    """
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(_tokens(text_col)).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    wtf = tf.join(dfreq, "term").crossJoin(F.broadcast(n_docs)).select(
        "doc_id",
        "term",
        "tf",
        F.log(F.col("n_docs") / F.col("df")).alias("idf"),
    )
    a = wtf.select(
        F.col("doc_id").alias("id_a"), "term", F.col("tf").alias("tf_a"), "idf"
    )
    b = wtf.select(
        F.col("doc_id").alias("id_b"), "term", F.col("tf").alias("tf_b")
    )
    return (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.round(
                F.sum(F.col("tf_a") * F.col("tf_b") * F.col("idf") * F.col("idf")), 6
            ).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("id_a"), F.asc("id_b"))
        .limit(k)
    )


def winnow_pairs_fold(
    index: DataFrame,
    new_docs: DataFrame,
    n: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """INCREMENTAL near-dup maintenance (the crawl-batch shape): fold
    a batch of new documents into a persisted winnowing fingerprint
    index WITHOUT re-fingerprinting the existing corpus.

    ``index`` is the stored ``(doc_id, fp)`` table (distinct — exactly
    what :func:`winnow_fingerprints` selected for the corpus so far).
    Returns ``(pairs, new_index)``: near-dup pairs touching the batch
    (new-new and new-old, ``id_a < id_b``, same ``min_shared`` /
    ``max_df`` semantics as :func:`winnow_pairs` with the df cap
    computed over the COMBINED index), and the updated index to
    persist for the next batch.

    Equivalence contract (pinned by tests): ``pairs`` equals a
    from-scratch :func:`winnow_pairs` over old∪new restricted to pairs
    with at least one new id — the per-document fingerprint set is
    batch-independent (winnowing is per-document), and the df cap sees
    the identical combined fingerprint population.  Cost per batch is
    fingerprinting the BATCH plus one inverted-index join whose probe
    side is batch-sized — never a corpus re-scan.
    """
    new_fps = (
        winnow_fingerprints(new_docs, n=n, w=w, id_col=id_col, text_col=text_col)
        .select("doc_id", "fp")
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_fps = index.select("doc_id", "fp").unionByName(new_fps)
    if max_df is not None:
        keep = (
            all_fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("fp")
        )
        capped_new = new_fps.join(keep, "fp")
        capped_all = all_fps.join(keep, "fp")
    else:
        capped_new, capped_all = new_fps, all_fps
    raw = (
        capped_new.select(F.col("doc_id").alias("id_n"), "fp")
        .join(capped_all.select(F.col("doc_id").alias("id_o"), "fp"), "fp")
        .filter(F.col("id_n") != F.col("id_o"))
        .select(
            F.least("id_n", "id_o").alias("id_a"),
            F.greatest("id_n", "id_o").alias("id_b"),
            "fp",
        )
        .distinct()  # new-new pairs arrive once per orientation
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return raw, all_fps


def compression_ratio(
    docs: DataFrame,
    level: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document zlib compression ratio — the classic
    repetitiveness/boilerplate quality signal (highly compressible
    text is template or repeated content; filters drop the extremes).

    Arrow-batched ``mapInPandas`` (compression is the one per-doc op
    with no JVM expression form); one pass, no shuffle.  Returns
    ``(doc_id, raw_bytes, zlib_bytes, ratio)`` with
    ``ratio = zlib_bytes / raw_bytes`` 6dp-rounded (lower = more
    repetitive).  Deterministic for a fixed zlib level.
    """
    import zlib
    from collections.abc import Iterator

    import pandas as pd

    def batch(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            raw = pdf[text_col].str.encode("utf-8")
            rb = raw.str.len().astype("int64")
            zb = raw.map(lambda b: len(zlib.compress(b, level))).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "raw_bytes": rb,
                    "zlib_bytes": zb,
                    "ratio": (zb / rb.clip(lower=1)).round(6),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        batch, schema="doc_id long, raw_bytes long, zlib_bytes long, ratio double"
    )


def host_quality_buckets(
    docs: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style per-host language-model quality terciles: score
    every document with the corpus-trained char-bigram logprob
    (:func:`char_bigram_logprob`), average per host, and split hosts
    into head / middle / tail buckets at the exact 1/3 and 2/3
    percentiles of the per-host mean — the standard perplexity
    bucketing a pretraining pipeline uses to keep head+middle and
    drop the tail.

    Scale design: no global NTILE window (a single-task sort at 10^8
    hosts) — the two cut points come from one exact-percentile
    aggregate over the host table (already |hosts|-sized, tiny next
    to the corpus) and the bucket is a map-side comparison, so the
    whole op is the logprob pipeline plus two small aggregates.
    Hosts tied exactly at a cut share the better bucket, which keeps
    the assignment a pure function of the score (deterministic and
    engine-independent), unlike NTILE's count-balanced split.

    Returns ``(host, n_docs, mean_logprob, bucket, keep)`` with
    bucket 1 = head (most fluent), 3 = tail, keep = bucket <= 2.
    """
    lp = char_bigram_logprob(docs, id_col=id_col, text_col=text_col, id_cast=None)
    hosts = (
        docs.select(F.col(id_col), F.col(host_col).alias("host"))
        .join(lp, id_col)
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum("logprob") / F.count(F.lit(1)), 6).alias("mean_logprob"),
        )
    )
    cuts = hosts.agg(
        F.percentile("mean_logprob", F.lit(1.0 / 3.0)).alias("cut_lo"),
        F.percentile("mean_logprob", F.lit(2.0 / 3.0)).alias("cut_hi"),
    )
    bucket = (
        F.when(F.col("mean_logprob") >= F.col("cut_hi"), 1)
        .when(F.col("mean_logprob") >= F.col("cut_lo"), 2)
        .otherwise(3)
    )
    return hosts.crossJoin(F.broadcast(cuts)).select(
        "host",
        "n_docs",
        "mean_logprob",
        bucket.alias("bucket"),
        (bucket <= 2).alias("keep"),
    )


def heaps_curve(
    docs: DataFrame,
    points: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Heaps-law vocabulary-growth curve: distinct-token count after
    the first p documents (in ``id`` order) for each prefix size in
    ``points`` — the measurement that sizes a tokenizer's vocabulary
    against corpus growth (V ~ k·N^beta).

    Scale shape: NO per-prefix distinct pass — each token contributes
    at its FIRST document (one groupBy min over the exploded stream),
    and a prefix's vocabulary is the count of tokens with first_doc
    <= cutoff: one broadcast of the O(|points|) cutoff list joined
    against the token-first table, partial-aggregating per cutoff.
    Returns ``(n_docs, vocab)`` sorted by prefix size.
    """
    if not points:
        raise ValueError("points must be non-empty")
    firsts = (
        docs.select(
            F.col(id_col).cast("long").alias("d"),
            F.explode(_tokens(text_col)).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.min("d").alias("first_doc"))
    )
    cuts = docs.sparkSession.createDataFrame(
        [(int(p),) for p in sorted(points)], "n_docs long"
    )
    # prefix p = docs with id < p (ids are 0-based in the synthetic
    # corpus; for arbitrary ids pass explicit cutoff values)
    return (
        firsts.crossJoin(F.broadcast(cuts))
        .filter(F.col("first_doc") < F.col("n_docs"))
        .groupBy("n_docs")
        .agg(F.count(F.lit(1)).alias("vocab"))
        .orderBy("n_docs")
    )


def token_coverage(
    docs: DataFrame,
    ks: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus coverage of a rank-k vocabulary truncation: for each k
    in ``ks``, the fraction of all token OCCURRENCES covered by the k
    most frequent types (ties broken by token string) — the tokenizer
    budget curve (how big must the vocab be for 95% coverage).

    One vocabulary aggregate, then a window cumsum over the
    VOCAB-sized table ordered by (count desc, token) — bounded by
    distinct types, not corpus size (the same bounded-table contract
    as the suffix-array rank chain; range-partition the rank if the
    type table itself is huge).  Returns ``(k, covered, total,
    coverage)`` with coverage rounded to 6dp.
    """
    if not ks:
        raise ValueError("ks must be non-empty")
    counts = (
        docs.select(F.explode(_tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    ranked = counts.select(
        F.row_number().over(w).alias("rank"),
        F.col("cnt"),
    )
    kdf = docs.sparkSession.createDataFrame([(int(k),) for k in sorted(ks)], "k long")
    tot = counts.agg(F.sum("cnt").alias("total"))
    return (
        ranked.crossJoin(F.broadcast(kdf))
        .filter(F.col("rank") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum("cnt").alias("covered"))
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            F.col("covered").cast("long").alias("covered"),
            F.col("total").cast("long").alias("total"),
            F.round(F.col("covered") / F.col("total"), 6).alias("coverage"),
        )
        .orderBy("k")
    )


def fuzzy_match(
    left: DataFrame,
    right: DataFrame,
    left_col: str = "term",
    right_col: str = "term",
    max_dist: int = 2,
    prefix: int = 2,
) -> DataFrame:
    """Blocked fuzzy string matching (the entity-resolution join): a
    left string matches a right string when their Levenshtein
    distance is <= ``max_dist``, found WITHOUT the all-pairs product
    — candidates must share a ``prefix``-char block AND sit within
    ``max_dist`` in length (both are necessary conditions only when
    the first ``prefix`` chars are untouched; the standard ER
    blocking trade: edits inside the prefix are missed, which is the
    documented recall cost that makes the join linear).  Levenshtein
    is integer-exact and identical across engines, so the whole op is
    SQL-replayable.

    One equi-join on the block key with a length band, then the
    distance verify on the candidates only.  Returns
    ``(left, right, dist)`` for matched pairs (excluding exact
    left==right matches; set ``max_dist`` and filter dist=0 upstream
    for those)."""
    if max_dist < 1 or prefix < 1:
        raise ValueError("max_dist and prefix must be >= 1")
    l = left.select(  # noqa: E741
        F.col(left_col).alias("l"),
        F.substring(F.col(left_col), 1, prefix).alias("blk"),
        F.length(F.col(left_col)).alias("ln"),
    ).distinct()
    r = right.select(
        F.col(right_col).alias("r"),
        F.substring(F.col(right_col), 1, prefix).alias("blk"),
        F.length(F.col(right_col)).alias("rn"),
    ).distinct()
    cand = l.join(r, "blk").filter(
        (F.abs(F.col("ln") - F.col("rn")) <= max_dist) & (F.col("l") != F.col("r"))
    )
    return (
        cand.select("l", "r", F.levenshtein("l", "r").alias("dist"))
        .filter(F.col("dist") <= max_dist)
        .select(F.col("l").alias("left"), F.col("r").alias("right"), "dist")
    )


def corpus_js_divergence(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Jensen-Shannon divergence between the unigram distributions of
    two deterministic corpus halves (``doc_id % 2``) — the drift probe
    run between crawl snapshots or before/after a filtering stage: a
    JSD near 0 means the filter didn't shift the language, a jump
    means it did.  One row: token totals, vocabulary sizes/overlap,
    and the JSD in nats (0 <= JSD <= ln 2).

    Shape at scale: one explode, ONE (term)-keyed conditional
    aggregate carrying both halves' counts (never two scans or a
    self-join), totals brought in as a broadcast one-row frame, and a
    final scalar aggregate.  Zero-count terms contribute 0 to their
    half's KL term by definition (the CASE guard, not a float hack);
    per-term contributions are ~1e-3 doubles so the rounded-6dp sum is
    stable under any partial-sum order.
    """
    side = F.pmod(F.col(id_col).cast("long"), F.lit(2))
    terms = docs.select(
        side.alias("side"), F.explode(_tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    cnt = terms.groupBy("term").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("cb"),
    )
    tot = cnt.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    p = F.col("ca").cast("double") / F.col("na")
    q = F.col("cb").cast("double") / F.col("nb")
    m = (p + q) / 2
    contrib = (
        F.when(F.col("ca") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("cb") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    ) / 2
    return (
        cnt.crossJoin(F.broadcast(tot))
        .agg(
            F.max("na").cast("long").alias("n_tokens_a"),
            F.max("nb").cast("long").alias("n_tokens_b"),
            F.sum(F.when(F.col("ca") > 0, 1).otherwise(0))
            .cast("long")
            .alias("vocab_a"),
            F.sum(F.when(F.col("cb") > 0, 1).otherwise(0))
            .cast("long")
            .alias("vocab_b"),
            F.sum(F.when((F.col("ca") > 0) & (F.col("cb") > 0), 1).otherwise(0))
            .cast("long")
            .alias("vocab_shared"),
            F.round(F.sum(contrib), 6).alias("js_divergence"),
        )
    )


def ctfidf_terms(
    docs: DataFrame,
    class_col: str = "source",
    k_terms: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Class-based TF-IDF (Grootendorst's c-TF-IDF, the BERTopic
    labeling score): the ``k_terms`` most DISTINCTIVE terms per class
    — here per ``source``/host — by ``score = c * ln(1 + N/df)`` with
    c the term's count inside the class, df the number of classes
    containing it, N the class count.  The +1 keeps corpus-universal
    terms positive instead of vanishing, matching the published form.

    One explode + (class, term) count, a term-keyed df aggregate, N as
    a broadcast one-row frame, and a per-class window top-k — the
    window key is the class, so no partition exceeds one class's
    vocabulary.  Deterministic tie-break (round(score, 6) DESC, term
    ASC) so both engines select identical rows.
    """
    exploded = docs.select(
        F.col(class_col).alias("cls"), F.explode(_tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = exploded.groupBy("cls", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_cls = docs.select(class_col).distinct().agg(
        F.count(F.lit(1)).alias("n_cls")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_cls))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(
                    F.lit(1.0) + F.col("n_cls").cast("double") / F.col("df")
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("cls").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k_terms)
        .select(F.col("cls").alias(class_col), "term", "score")
    )


def naive_bayes_train(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, int]:
    """Multinomial Naive Bayes trainer (the classic supervised text
    classifier — McCallum & Nigam 1998) with add-one smoothing.

    Tokens are the corpus's whitespace tokens (the same tokenizer as
    ``vocabulary``).  Returns ``(class_stats, token_counts, vocab)``:
    ``class_stats`` = (label, n_docs, total_tokens) — one row per
    class; ``token_counts`` = (token, label, c) observed class-
    conditional counts; ``vocab`` = distinct-token count V.  The
    log-likelihood of token t in class y is
    ``ln(c(t,y)+1) - ln(T_y + V)`` — everything downstream derives
    from integer counts, so the model is exactly reproducible.

    Execution shape (100-TB story): ONE shuffle reduces the exploded
    token stream to (token, label) counts — the model is vocab x
    classes, orders of magnitude smaller than the corpus; class stats
    fold map-side from the same pass.
    """
    toks = docs.select(
        F.col(label_col).alias("label"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"),
    ).filter(F.col("token") != "")
    token_counts = toks.groupBy("token", "label").agg(
        F.count(F.lit(1)).alias("c")
    )
    class_stats = token_counts.groupBy("label").agg(F.sum("c").alias("total_tokens"))
    n_docs = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    class_stats = class_stats.join(F.broadcast(n_docs), "label")
    vocab = token_counts.select("token").distinct().count()
    return class_stats, token_counts, vocab


def naive_bayes_classify(
    docs: DataFrame,
    class_stats: DataFrame,
    token_counts: DataFrame,
    vocab: int,
    n_train_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a ``naive_bayes_train`` model: for each
    (doc, class), ``ln(n_y) - ln(N) + sum_t cnt_t * (ln(c(t,y)+1) -
    ln(T_y+V))`` over the doc's token multiset (unseen tokens fall
    back to the smoothed zero count).  Returns one row per (doc,
    class): ``(doc_id, label, score, best)`` with score rounded to
    6dp and ``best`` marking the argmax under the deterministic
    (rounded score DESC, label) tie-break.

    Execution shape: doc tokens aggregate per (doc, token) once, then
    cross the (small) class list and broadcast-join the model's
    (token, label) counts — the corpus is touched once; no
    per-class corpus passes.
    """
    doc_toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    labels = class_stats.select("label", "total_tokens", "n_docs")
    scored = (
        doc_toks.crossJoin(F.broadcast(labels))
        .join(F.broadcast(token_counts), ["token", "label"], "left")
        .withColumn("c0", F.coalesce(F.col("c"), F.lit(0)))
        .groupBy("doc_id", "label", "total_tokens", "n_docs")
        .agg(
            F.sum(
                F.col("cnt")
                * (
                    F.log(F.col("c0") + F.lit(1).cast("double"))
                    - F.log((F.col("total_tokens") + F.lit(vocab)).cast("double"))
                )
            ).alias("ll")
        )
        .select(
            "doc_id",
            "label",
            F.round(
                F.log(F.col("n_docs").cast("double"))
                - F.log(F.lit(float(n_train_docs)))
                + F.col("ll"),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "label")
    return scored.withColumn("best", F.row_number().over(w) == 1)


def readability_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch Reading Ease per document — the classic readability
    signal in web-text quality filtering (alongside the Gopher rules):
    ``206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)``.

    All three inputs are integer counts from pure regex/string ops
    (words = whitespace tokens; sentences = [.!?] characters, floored
    at 1; syllables = maximal vowel-group runs, the standard cheap
    approximation) — a single JVM-codegen projection over the corpus,
    no shuffle at all; the two float divisions happen once per row.

    Returns ``(doc_id, n_words, n_sentences, n_syllables, flesch)``
    with flesch rounded to 6dp.
    """
    lower = F.lower(F.col(text_col))
    words = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    ).cast("long")
    sentences = F.greatest(
        F.lit(1).cast("long"),
        F.length(F.regexp_replace(F.col(text_col), "[^.!?]", "")).cast("long"),
    )
    collapsed = F.regexp_replace(lower, "[aeiouy]+", "V")
    removed = F.regexp_replace(lower, "[aeiouy]+", "")
    syllables = F.greatest(
        F.lit(1).cast("long"),
        (F.length(collapsed) - F.length(removed)).cast("long"),
    )
    out = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    return out.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.lit(206.835)
            - F.lit(1.015)
            * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
            - F.lit(84.6)
            * (
                F.col("n_syllables").cast("double")
                / F.col("n_words").cast("double")
            ),
            6,
        ).alias("flesch"),
    )


def hashed_features(
    docs: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "feat",
) -> DataFrame:
    """Hashing-trick (Weinberger et al. 2009) sparse feature vectors:
    each token maps to ``md5(token, salt) mod n_buckets`` and the doc
    becomes its (bucket, count) rows — the fixed-width, vocab-free
    vectorization a downstream linear model or clusterer trains on.

    No vocabulary table, no fitting pass, no driver state: one
    tokenize + one (doc, bucket) aggregate, which is why the trick is
    the default at 100-TB corpus scale (the vocabulary of the web
    does not fit anywhere, the hash function does).  md5-deterministic
    → the same document always vectorizes identically on any engine.

    Returns ``(doc_id, bucket, cnt)`` sparse rows.
    """
    bucket = F.expr(
        "pmod(cast(conv(substring(md5(concat(token, "
        f"',{salt}')), 1, 15), 16, 10) as bigint), {n_buckets})"
    )
    return (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def unigram_doc_nll(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's
    own unigram MLE — the cheapest perplexity-style fluency signal
    (the unigram sibling of ``char_bigram_logprob``): rare-word-heavy
    documents score high, stopword soup scores low.

    ``nll(d) = ln(C) - (1/n_d) * sum_t ln(c_t)`` over the doc's token
    occurrences (C = corpus token count, c_t = corpus count of t) —
    every ln argument is an exact integer, so both engines agree to
    the 6dp rounding.  One tokenize pass feeds both the count table
    and the scoring join (broadcast, vocab-sized).

    Returns ``(doc_id, n_tokens, nll)``.
    """
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"),
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("ct"))
    total = toks.count()
    return (
        toks.join(F.broadcast(counts), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.log(F.col("ct").cast("double"))).alias("sl"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.log(F.lit(float(total))) - F.col("sl") / F.col("n_tokens"), 6
            ).alias("nll"),
        )
    )
