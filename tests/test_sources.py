from __future__ import annotations

import pytest

from ccl_spark.sources import read_table, write_table


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    ref = str(tmp_path / "t")
    write_table(df, ref)
    got = read_table(spark, ref)
    assert sorted((r.id, r.s) for r in got.collect()) == [(1, "a"), (2, "b")]
    write_table(df, ref, mode="append")
    assert read_table(spark, ref).count() == 4


def test_table_ref_requires_iceberg(spark):
    # no Iceberg runtime in this container -> catalog refs must fail loudly
    with pytest.raises(ValueError, match="Iceberg"):
        read_table(spark, "db.pages")
