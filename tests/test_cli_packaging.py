"""spark-submit packaging: the zip must be importable standalone and
the CLI must run an algorithm end-to-end from parquet to parquet."""

from __future__ import annotations

import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_zip_builds_and_imports(tmp_path):
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "package.py")],
        capture_output=True,
        text=True,
        check=True,
    )
    zpath = Path(out.stdout.strip())
    assert zpath.exists()
    names = zipfile.ZipFile(zpath).namelist()
    assert "ccl_spark/cc.py" in names and "ccl_spark/cli.py" in names
    # import from the zip alone, no repo on sys.path
    check = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, sys.argv[1]); "
            "import ccl_spark.cc, ccl_spark.cli, ccl_spark.pagerank; print('zip-import-ok')",
            str(zpath),
        ],
        capture_output=True,
        text=True,
        cwd="/tmp",
    )
    assert "zip-import-ok" in check.stdout, check.stderr


def test_cli_cc_end_to_end(spark, tmp_path):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "src long, dst long"
    )
    epath = str(tmp_path / "edges")
    edges.write.parquet(epath)
    opath = str(tmp_path / "components")

    from ccl_spark.cli import main

    rc = main(["cc", "--edges", epath, "--out", opath, "--master", "local[4]"])
    assert rc == 0
    got = {r.vertex: r.component for r in spark.read.parquet(opath).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}


def test_cli_refuses_stale_checkpoint(spark, tmp_path):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    epath = str(tmp_path / "edges")
    edges.write.parquet(epath)
    ck = str(tmp_path / "ck")

    from ccl_spark.cli import main

    assert main(["cc", "--edges", epath, "--out", str(tmp_path / "o1"),
                 "--checkpoint", ck, "--interval", "1"]) == 0
    # same root without --resume must refuse
    assert main(["cc", "--edges", epath, "--out", str(tmp_path / "o2"),
                 "--checkpoint", ck]) == 2
    # with --resume it completes
    assert main(["cc", "--edges", epath, "--out", str(tmp_path / "o3"),
                 "--checkpoint", ck, "--resume"]) == 0


def test_cli_dedup_end_to_end(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely different text with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    dpath = str(tmp_path / "docs")
    docs.write.parquet(dpath)
    opath = str(tmp_path / "pairs")

    from ccl_spark.cli import main

    rc = main(["dedup", "--docs", dpath, "--out", opath, "--threshold", "0.5",
               "--master", "local[4]"])
    assert rc == 0
    pairs = {(r.id_a, r.id_b) for r in spark.read.parquet(opath).collect()}
    assert pairs == {(0, 1)}


def test_cli_dedup_corpus_end_to_end(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely different text with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    dpath = str(tmp_path / "docs_c")
    docs.write.parquet(dpath)
    opath = str(tmp_path / "deduped")

    from ccl_spark.cli import main

    rc = main(["dedup-corpus", "--docs", dpath, "--out", opath,
               "--threshold", "0.5", "--master", "local[4]"])
    assert rc == 0
    kept = sorted(r.doc_id for r in spark.read.parquet(opath).collect())
    assert kept == [0, 2]  # doc 1 is the near-dup of 0; min id wins


def test_cli_tokenize_end_to_end(spark, tmp_path):
    """tokenize subcommand: train merges on the corpus, write every
    document's token-id stream; ids are dense and positions contiguous."""
    docs = spark.createDataFrame(
        [(0, "low lower lowest low"), (1, "new newer low")],
        "doc_id long, text string",
    )
    dpath = str(tmp_path / "docs")
    docs.write.parquet(dpath)
    opath = str(tmp_path / "toks")

    from ccl_spark.cli import main

    rc = main(["tokenize", "--docs", dpath, "--out", opath, "--merges", "4",
               "--master", "local[4]"])
    assert rc == 0
    rows = spark.read.parquet(opath).collect()
    assert {r.doc_id for r in rows} == {0, 1}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.pos)
    for poss in by_doc.values():
        assert sorted(poss) == list(range(len(poss)))  # contiguous stream
    ids = {r.token_id for r in rows}
    assert ids == set(range(max(ids) + 1))  # dense lexicographic id map


def test_cli_walks_end_to_end(spark, tmp_path):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    epath = str(tmp_path / "edges")
    edges.write.parquet(epath)
    opath = str(tmp_path / "walks")

    from ccl_spark.cli import main

    rc = main(
        ["walks", "--edges", epath, "--out", opath, "--walk-len", "3",
         "--master", "local[4]"]
    )
    assert rc == 0
    rows = spark.read.parquet(opath).collect()
    assert len(rows) == 4  # one walk per vertex
    assert all(len(r.walk.split(" ")) == 4 for r in rows)

    # node2vec mode via --p/--q
    opath2 = str(tmp_path / "walks2")
    rc = main(
        ["walks", "--edges", epath, "--out", opath2, "--walk-len", "2",
         "--p", "2.0", "--q", "0.5", "--master", "local[4]"]
    )
    assert rc == 0
    assert spark.read.parquet(opath2).count() == 4


def test_cli_curate(spark, tmp_path):
    from ccl_spark.cli import main

    rows = []
    for hn, hname in enumerate(["good.a.com", "fine.b.com", "bad.spam.net"]):
        for i in range(3):
            rows.append(
                (f"u{hn}_{i}", hname, "the cat sat on the mat and ran " * 3 + f"y{i} ")
            )
    spark.createDataFrame(
        rows, "doc_id string, host string, text string"
    ).write.parquet(str(tmp_path / "docs"))
    spark.createDataFrame([("spam.net",)], "domain string").write.parquet(
        str(tmp_path / "bl")
    )
    rc = main(
        [
            "curate",
            "--docs", str(tmp_path / "docs"),
            "--blocklist", str(tmp_path / "bl"),
            "--out", str(tmp_path / "out"),
        ]
    )
    assert rc == 0
    out = spark.read.parquet(str(tmp_path / "out"))
    hosts = {r.host for r in out.select("host").distinct().collect()}
    assert "bad.spam.net" not in hosts  # suffix-blocked
    assert out.count() == 6
