"""Deterministic synthetic Common-Crawl-style pages corpus.

Schema per BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Properties engineered to exercise the engine the way real web data does:
- out-degrees drawn from a seeded Pareto (power-law) distribution with
  a dangling fraction (pages with no out-links) for PageRank's
  dangling-mass path;
- link targets skewed toward low page ids (``target = V * u**beta``) so
  in-degree is power-law too — hub vertices exercise the salting /
  AQE-skew path;
- everything derived from splitmix64 of (seed, page_id, slot): order-
  independent, partition-independent, identical at any parallelism.

``text`` is generated first and embedded in ``html`` as the single
``<p>`` body; the extractor (extract.py) recovers it byte-identically —
the per-row invariant the driver contract pins.

Generation runs in mapInPandas (Arrow batches). At production scale
this module is replaced by reading the real Iceberg pages table; it
exists so tests and benchmarks are hermetic.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_WORDS = (
    "web graph link page crawl rank node edge spark shuffle partition "
    "data index query label component merge fork star union find batch "
    "hash salt skew broadcast iceberg snapshot text token language"
).split()
_LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]

_MASK = (1 << 64) - 1


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set)."""
    z = (x + 0x9E3779B97F4A7C15) & _MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK
    return z ^ (z >> 31)


def _hash(seed: int, ids: np.ndarray, slot: int) -> np.ndarray:
    return _splitmix64(
        (np.uint64(seed) * np.uint64(0x100000001B3))
        ^ ids.astype(np.uint64)
        ^ (np.uint64(slot) << np.uint64(40))
    )


def _unit(h: np.ndarray) -> np.ndarray:
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def url_of(i: int, n_hosts: int) -> str:
    return f"https://h{i % n_hosts}.example.com/p/{i}"


def _link_targets(i: int, v: int, seed: int, max_out: int = 40) -> list[int]:
    """Deterministic out-link target ids of page i (dedup'd, in slot order)."""
    ids = np.array([i], dtype=np.uint64)
    if _unit(_hash(seed, ids, 1))[0] < 0.06:
        return []  # dangling page
    u = _unit(_hash(seed, ids, 2))[0]
    k = min(max_out, max(1, int(1.5 * (1.0 - u) ** (-0.7))))
    slots = np.arange(k, dtype=np.uint64)
    h = _hash(seed, ids[0] + (slots << np.uint64(20)) + np.uint64(7), 3)
    tgt = (v * _unit(h) ** 2.2).astype(np.int64)  # skew toward low ids (hubs)
    tgt = tgt[tgt != i]
    return list(dict.fromkeys(tgt.tolist()))


def out_links(
    i: int, v: int, seed: int, n_hosts: int, max_out: int = 40
) -> list[str]:
    """Deterministic out-link urls of page i (shared with tests/oracles)."""
    return [url_of(int(t), n_hosts) for t in _link_targets(i, v, seed, max_out)]


def link_anchor(i: int, t: int, seed: int) -> str:
    """Deterministic anchor text of the link i -> t: the target's topic
    word (a function of t alone, so incoming anchors of a page share a
    dominant term, as real anchor text does) plus 1-2 hash-picked filler
    words from the (seed, i, t) stream."""
    h = int(
        _hash(
            seed,
            np.array([np.uint64(i) ^ (np.uint64(t) << np.uint64(21))], dtype=np.uint64),
            8,
        )[0]
    )
    words = [_WORDS[t % len(_WORDS)], _WORDS[h % len(_WORDS)]]
    if (h >> 24) % 3:
        words.append(_WORDS[(h >> 44) % len(_WORDS)])
    return " ".join(words)


def out_links_anchored(
    i: int, v: int, seed: int, n_hosts: int, max_out: int = 40
) -> list[tuple[str, str]]:
    """(url, anchor-text) pairs of page i's out-links."""
    return [
        (url_of(int(t), n_hosts), link_anchor(i, int(t), seed))
        for t in _link_targets(i, v, seed, max_out)
    ]


def page_main_text(i: int, seed: int) -> str:
    """Deterministic body text of page i (driver-replayable)."""
    ids = np.array([i], dtype=np.uint64)
    n = 20 + int(_hash(seed, ids, 5)[0] % np.uint64(40))
    ws = _hash(seed, ids, 6)[0]
    return " ".join(
        _WORDS[int(w % len(_WORDS))]
        for w in _splitmix64(ws + np.arange(n, dtype=np.uint64))
    )


def host_footer(host: int, seed: int) -> str:
    """Deterministic boilerplate footer shared by EVERY page of a host
    (every 4th host has none) — the repeated-line mass a CCNet-style
    line-dedup pass must detect and strip."""
    if host % 4 == 0:
        return ""
    h = _hash(seed, np.array([host], dtype=np.uint64), 9)[0]
    n = 6 + int(h % np.uint64(5))
    return " ".join(
        _WORDS[int(w % len(_WORDS))]
        for w in _splitmix64(h + np.arange(n, dtype=np.uint64))
    )


def page_text(i: int, seed: int, n_hosts: int) -> str:
    """Full page text: main body plus the host footer as a second line
    (matches the html's two <p> blocks, so the extract_text invariant
    holds byte-identically)."""
    main = page_main_text(i, seed)
    foot = host_footer(i % n_hosts, seed)
    return f"{main}\n{foot}" if foot else main


def _gen_batch(
    pdf_iter: Iterator[pd.DataFrame], v: int, seed: int, n_hosts: int
) -> Iterator[pd.DataFrame]:
    base_ts = pd.Timestamp("2026-01-05", tz="UTC")
    for pdf in pdf_iter:
        ids = pdf["id"].to_numpy(dtype=np.uint64)
        langs = [
            _LANGS[int(h % len(_LANGS))] for h in _hash(seed, ids, 4)
        ]
        rows = []
        for j, i in enumerate(ids.tolist()):
            main = page_main_text(i, seed)
            foot = host_footer(i % n_hosts, seed)
            text = f"{main}\n{foot}" if foot else main
            links = out_links_anchored(i, v, seed, n_hosts)
            anchors = "".join(f'<a href="{u}">{a}</a>' for u, a in links)
            foot_p = f"<p>{foot}</p>" if foot else ""
            html = (
                f"<html><head><title>page {i}</title></head>"
                f"<body><p>{main}</p>{foot_p}{anchors}</body></html>"
            )
            rows.append(
                (
                    url_of(i, n_hosts),
                    base_ts + pd.Timedelta(seconds=int(i % 86400)),
                    html.encode("utf-8"),
                    text,
                    langs[j],
                )
            )
        yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    n_hosts: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    n_hosts = n_hosts or max(1, n_pages // 50)
    parts = partitions or spark.sparkContext.defaultParallelism
    rng = spark.range(0, n_pages, numPartitions=parts)
    return rng.mapInPandas(
        lambda it: _gen_batch(it, n_pages, seed, n_hosts), schema=PAGES_SCHEMA
    )


def ground_truth_edges(n_pages: int, seed: int = 42, n_hosts: int | None = None):
    """Driver-side oracle: the exact (src_url, dst_url) set the generator
    embedded — used to verify extraction end-to-end."""
    n_hosts = n_hosts or max(1, n_pages // 50)
    out = []
    for i in range(n_pages):
        for u in out_links(i, n_pages, seed, n_hosts):
            out.append((url_of(i, n_hosts), u))
    return out


def ground_truth_texts(n_pages: int, seed: int = 42, n_hosts: int | None = None):
    """Driver-side oracle: (url, host, text) triples exactly as
    generated — feeds the DuckDB boilerplate-removal oracle
    independently of the Spark extraction path."""
    n_hosts = n_hosts or max(1, n_pages // 50)
    return [
        (url_of(i, n_hosts), f"h{i % n_hosts}", page_text(i, seed, n_hosts))
        for i in range(n_pages)
    ]


def ground_truth_anchors(n_pages: int, seed: int = 42, n_hosts: int | None = None):
    """Driver-side oracle: the exact (src_url, dst_url, anchor) triples
    the generator embedded — verifies anchor extraction end-to-end and
    feeds the DuckDB anchor-aggregation oracle independently of the
    Spark extraction path."""
    n_hosts = n_hosts or max(1, n_pages // 50)
    out = []
    for i in range(n_pages):
        for u, a in out_links_anchored(i, n_pages, seed, n_hosts):
            out.append((url_of(i, n_hosts), u, a))
    return out
