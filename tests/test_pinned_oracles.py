"""Drift guard for the pinned oracles (tools/pin_oracles.py).

The five hash-specific / approximate gate queries (fingerprint,
simhash, emb_near_dup, ann_lsh_topk, ann_ivf_topk) are oracle-checked
against PINNED expected rows at sf0.01. If an implementation change
alters any of their output, this test fails before the driver gate
does — rerun tools/pin_oracles.py only when the change is intentional.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from pin_oracles import (  # noqa: E402
    PINNED,
    SF_DIR,
    compute,
    crosscheck_pinned,
    pinned_path,
    xxh64,
)


@pytest.mark.parametrize("name", PINNED)
def test_pinned_oracle_matches_fresh_run(spark, name):
    if not Path(SF_DIR).exists():
        pytest.skip("driver testdata not present")
    fresh = compute(spark, name)
    pinned = pq.read_table(pinned_path(name)).to_pandas()
    pd.testing.assert_frame_equal(fresh, pinned, check_exact=True)


@pytest.mark.parametrize("name", PINNED)
def test_pinned_oracle_independent_check(name):
    """The committed pins agree with implementations that share NO code
    with the engine (pure-Python XXH64 + plain text processing for the
    hash queries; numpy brute-force cosine for the embedding queries) —
    closes the pin-generated-by-the-engine circularity (ADVICE r3)."""
    if not Path(SF_DIR).exists():
        pytest.skip("driver testdata not present")
    crosscheck_pinned(name, pq.read_table(pinned_path(name)).to_pandas())


def test_xxh64_reference_vectors(spark):
    """The pure-Python XXH64 is bit-equal to Spark's xxhash64 on
    strings (the only form the pinned recomputations rely on)."""
    from pyspark.sql import functions as F

    samples = ["", "a", "hello world", "x" * 31, "y" * 32, "z" * 100, "ünïcodé"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert got[s] == xxh64(s.encode("utf-8")), s
