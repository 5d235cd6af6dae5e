"""Pin DuckDB oracles for the hash-specific / approximate queries.

Five gate queries have no SQL-expressible twin (xxhash64 is not in
DuckDB; LSH/IVF probing is approximate by design): fingerprint,
simhash, emb_near_dup, ann_lsh_topk, ann_ivf_topk. Their inputs are
seeded-deterministic, so the expected rows at the driver's comparison
scale (sf0.01) are a constant — this script computes them ONCE and
pins them as parquet under .oracle/, exactly like the committed
corpus-edge dumps (and like the reference pins hard-coded expected
arrays in its unittests, ccl_marker_stack.py:1293-1337). The oracle
SQL then just scans the pinned file.

tests/test_pinned_oracles.py recomputes all five at sf0.01 and
asserts equality with the committed parquet, so drift between the
implementation and the pinned expectation fails CI before it fails
the driver gate.

Run: python tools/pin_oracles.py   (rewrites .oracle/pinned_*_sf001.parquet)
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

PINNED = ["fingerprint", "simhash", "emb_near_dup", "ann_lsh_topk", "ann_ivf_topk"]
SF_DIR = "/root/testdata/sf0.01"


def pinned_path(name: str) -> str:
    return str(REPO / ".oracle" / f"pinned_{name}_sf001.parquet")


def compute(spark, name: str):
    """The query's sorted expected rows as a pandas frame (dtypes are
    the Spark result dtypes — int64/float64 — so DuckDB reads back the
    exact same schema and bits)."""
    import __spark_entry__ as entry

    pdf = entry.queries()[name](spark, SF_DIR).toPandas()
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main() -> None:
    from ccl_spark.session import get_spark

    spark = get_spark("pin_oracles", master="local[8]", shuffle_partitions=8)
    (REPO / ".oracle").mkdir(exist_ok=True)
    for name in PINNED:
        pdf = compute(spark, name)
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), pinned_path(name))
        print(f"{name}: pinned {len(pdf)} rows, dtypes={dict(pdf.dtypes.astype(str))}")
    spark.stop()


if __name__ == "__main__":
    main()
