"""CCNet-style line-level boilerplate removal.

Web pages of a host share navigation/footer lines; an LLM corpus pass
strips any line that appears in more than ``max_ratio`` of a group's
documents (Wenzek et al. 2020 "CCNet" do this corpus-wide on line
hashes; grouping by host is the sharper variant for host-templated
boilerplate).

Execution shape (100-TB story):
- documents explode to (doc, group, pos, line) once; the line's
  xxhash64 — not the line string — is the join/aggregation key, so
  shuffles move 8-byte keys, not page-length strings;
- document frequency per (group, line-hash) is one map-side-combined
  groupBy; the boilerplate set (df/n_docs > max_ratio) is tiny and
  joins back as a keyed left-anti join (broadcastable per group);
- reassembly is one groupBy per document: collect (pos, line)
  structs, array_sort (pos is the leading struct field, so ordering
  is positional), array_join — no window, no global sort.

Nothing is quadratic; every stage is keyed by (group, line-hash) or
doc id. Deterministic throughout: same input ⇒ same output strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def remove_boilerplate(
    docs: DataFrame,
    group_col: str = "host",
    id_col: str = "url",
    text_col: str = "text",
    sep: str = "\n",
    max_ratio: float = 0.5,
    min_docs: int = 2,
) -> DataFrame:
    """Strip lines occurring in > ``max_ratio`` of the group's docs
    (and in at least ``min_docs`` docs). Returns one row per input
    document: (id_col, group_col, text_col) with surviving lines
    rejoined in original order ('' if every line was boilerplate).
    """
    lines = docs.select(
        id_col,
        group_col,
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    ).withColumn("lh", F.xxhash64("line"))
    n_docs = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    df_counts = lines.groupBy(group_col, "lh").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )
    boiler = (
        df_counts.join(n_docs, group_col)
        .filter(
            (F.col("df") >= min_docs)
            & (F.col("df") > F.col("n_docs") * F.lit(max_ratio))
        )
        .select(group_col, "lh")
    )
    kept = lines.join(boiler, [group_col, "lh"], "left_anti")
    rebuilt = kept.groupBy(id_col, group_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias(text_col)
    )
    # documents whose every line was boilerplate must survive as ''
    return (
        docs.select(id_col, group_col)
        .join(rebuilt, [id_col, group_col], "left")
        .select(
            id_col, group_col, F.coalesce(text_col, F.lit("")).alias(text_col)
        )
    )
