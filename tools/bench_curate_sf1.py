"""End-to-end curation funnel at ~1M documents (r5 verdict ask #6):
the full LLM-data pipeline — extract -> quality -> exact/near/line/
chunk dedup -> contamination -> tokenize — in ONE session over a
driver-generated 1M-page corpus (10x the sf0.1 bench), with per-stage
wall clocks.  Catches driver-side cliffs no sf0.01 gate sees.

Usage: BENCH_PAGES=1000000 python tools/bench_curate_sf1.py
Prints one JSON line {stage: sec, ...} plus totals.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from ccl_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_pages = int(os.environ.get("BENCH_PAGES", "1000000"))
    spark = get_spark("bench_curate_sf1")
    walls: dict[str, float] = {}
    rows: dict[str, int] = {}

    def stage(name, fn):
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        time.sleep(0.5)
        spark.sparkContext.setJobDescription(f"curate: {name}")
        t0 = time.monotonic()
        out = fn()
        walls[name] = round(time.monotonic() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"  {name}: {walls[name]:.2f}s -> {out}", file=sys.stderr)
        rows[name] = int(out)
        return out

    from ccl_spark.boilerplate import remove_boilerplate
    from ccl_spark.datagen import generate_pages
    from ccl_spark.dedup import (
        chunk_dedup_corpus,
        collapse_exact,
        contamination,
        line_dedup_corpus,
        near_duplicates,
    )
    from ccl_spark.extract import extract_text
    from ccl_spark.textops import bpe_encode_docs, bpe_merges, gopher_quality_flags

    pages = generate_pages(spark, n_pages, seed=42)

    # 1. extraction: html -> (url, host, text), materialized once — the
    # corpus every later stage consumes (docs carry a dense id)
    def extract():
        docs = (
            extract_text(pages)
            .select(
                F.xxhash64("url").alias("doc_id"),
                F.regexp_extract("url", r"https://(h\d+)\.", 1).alias("host"),
                "text",
            )
            .localCheckpoint(eager=True)
        )
        globals()["docs"] = docs
        return docs.count()

    stage("extract", extract)
    docs = globals()["docs"]

    # 2. quality flags (gopher-style)
    # synthetic page text has no English stopwords, so the keep-filter
    # would be empty; noop-sink the flags table so the optimizer can't
    # prune the flag expressions out of a bare count (guide §1.4)
    def _gopher():
        gopher_quality_flags(docs).write.format("noop").mode("overwrite").save()
        return docs.count()

    stage("quality_gopher", _gopher)

    # 3. per-host boilerplate removal
    stage(
        "boilerplate",
        lambda: remove_boilerplate(
            docs.select("doc_id", "host", "text"), id_col="doc_id"
        ).count(),
    )

    # 4. exact dedup (collapse to representatives)
    stage("exact_dedup", lambda: collapse_exact(docs, "doc_id", "text").count())

    # 5. near dedup (MinHash-LSH, bucket-capped, verified)
    # max_bucket=1000: the synthetic 31-word vocab makes shingle sets
    # far more collision-prone than web text, so degenerate LSH buckets
    # are expected and the documented cap is the defense under test
    stage(
        "near_dedup",
        lambda: near_duplicates(
            docs, n=3, n_hashes=32, bands=16, threshold=0.8,
            max_bucket=1000, log_dropped=False,
        ).count(),
    )

    # 6. line-level dedup (CCNet shape)
    stage("line_dedup", lambda: line_dedup_corpus(docs).count())

    # 7. chunk-level CDC dedup
    stage(
        "chunk_dedup",
        lambda: chunk_dedup_corpus(docs, n=4, boundary_mod=8).count(),
    )

    # 8. contamination vs a benchmark set (first 200 docs as stand-in)
    bench_set = (
        docs.limit(200)
        .select(F.col("doc_id").alias("bench_id"), "text")
        .localCheckpoint(eager=True)
    )
    stage(
        "contamination",
        lambda: contamination(docs, bench_set, n=8).count(),
    )

    # 9. tokenize the corpus (trained merges reused, encode timed)
    merges = [
        (r.lhs, r.rhs)
        for r in bpe_merges(docs, n_merges=8).orderBy("merge_rank").collect()
    ]
    stage("tokens_encode", lambda: bpe_encode_docs(docs, merges).count())

    total = round(sum(walls.values()), 3)
    print(
        json.dumps(
            {
                "metric": "curate_funnel_seconds",
                "value": total,
                "unit": "sec",
                "stages": walls,
                "rows": rows,
                "n_pages": n_pages,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
