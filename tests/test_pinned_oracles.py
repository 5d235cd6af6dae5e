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

from pin_oracles import PINNED, SF_DIR, compute, pinned_path  # noqa: E402


@pytest.mark.parametrize("name", PINNED)
def test_pinned_oracle_matches_fresh_run(spark, name):
    if not Path(SF_DIR).exists():
        pytest.skip("driver testdata not present")
    fresh = compute(spark, name)
    pinned = pq.read_table(pinned_path(name)).to_pandas()
    pd.testing.assert_frame_equal(fresh, pinned, check_exact=True)
