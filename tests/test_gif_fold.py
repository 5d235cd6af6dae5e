from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ccl_spark.dedup import (
    minhash_index,
    near_duplicates,
    near_duplicates_fold,
)
from ccl_spark.multimodal import gif_decode, gif_encode, gif_synth_pixels


# ----------------------------------------------------------------- GIF


def test_gif_roundtrip_many_colors():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.integers(0, 256, (64, 48)).astype(np.uint8)
    img = pal[idx]  # random indices: LZW crosses several width bumps
    assert (gif_decode(gif_encode(img)) == img).all()


def test_gif_roundtrip_tiny_and_flat():
    img = np.zeros((5, 7, 3), np.uint8)
    img[2:, 3:] = [255, 0, 0]
    assert (gif_decode(gif_encode(img)) == img).all()
    flat = np.full((3, 3, 3), 9, np.uint8)
    assert (gif_decode(gif_encode(flat)) == flat).all()


def test_gif_decode_spec_fixture():
    # canonical 1x1 black-pixel GIF89a, hand-assembled per the spec
    # (Appendix F LZW: clear=4, pixel code 0, eoi=5 at width 3) — pins
    # the decoder against spec BYTES, not just our own encoder
    fix = bytes.fromhex(
        "474946383961" "0100" "0100" "80" "00" "00"
        "000000" "ffffff"
        "2c" "0000" "0000" "0100" "0100" "00"
        "02" "02" "4401" "00" "3b"
    )
    out = gif_decode(fix)
    assert out.shape == (1, 1, 3) and (out == 0).all()


def test_gif_decode_skips_extensions():
    img = gif_synth_pixels(3)
    payload = gif_encode(img)
    # splice a graphic-control extension between the palette and the
    # image descriptor — decoders must skip it (compute the real
    # descriptor offset: 13-byte header + global color table)
    at = 13 + 3 * (2 << (payload[10] & 0x07))
    assert payload[at] == 0x2C
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    assert (gif_decode(payload[:at] + gce + payload[at:]) == img).all()


def test_gif_encode_refuses_true_color():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    with pytest.raises(ValueError, match="quantize"):
        gif_encode(img)


# --------------------------------------------------------- MinHash fold


def _fold_docs(spark):
    base = "one two three four five six seven eight nine ten eleven twelve"
    texts = {
        1: base + " a b",
        2: base + " c d",          # near-dup of 1
        3: "p q r s t u v w x y z",
        4: base + " e f",          # new batch: near-dup of 1 and 2
        8: base,                   # new batch: near-dup of all three
        12: "k l m n o p q r s",   # new batch: unrelated-ish
    }
    return spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )


def test_minhash_fold_equals_from_scratch(spark):
    docs = _fold_docs(spark)
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    sh, banded = minhash_index(old)
    pairs, all_sh, all_banded = near_duplicates_fold(sh, banded, new, threshold=0.5)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in near_duplicates(docs, threshold=0.5, pre_collapse=False).collect()
        if r.id_a % 4 == 0 or r.id_b % 4 == 0
    }
    assert got == full and got
    # the updated index equals a from-scratch index over old ∪ new
    sh2, banded2 = minhash_index(docs)
    assert all_sh.count() == sh2.count()
    assert all_sh.exceptAll(sh2).count() == 0
    assert all_banded.count() == banded2.count()
    assert all_banded.exceptAll(banded2).count() == 0


def test_minhash_fold_exact_dup_across_batches(spark):
    docs = spark.createDataFrame(
        [(1, "same text here okay"), (4, "same text here okay")],
        "doc_id long, text string",
    )
    sh, banded = minhash_index(docs.filter(F.col("doc_id") == 1))
    pairs, _, _ = near_duplicates_fold(
        sh, banded, docs.filter(F.col("doc_id") == 4), threshold=0.9
    )
    rows = pairs.collect()
    assert len(rows) == 1 and rows[0].jaccard == 1.0
    assert (rows[0].id_a, rows[0].id_b) == (1, 4)
