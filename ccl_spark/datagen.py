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


def _batch_main_texts(ids: np.ndarray, seed: int) -> list[str]:
    """Vectorized page_main_text over a whole id batch: one splitmix64
    pass over the concatenated word streams instead of one numpy call
    per page. Byte-identical to the scalar spec (pinned by
    tests/test_datagen.py)."""
    n = (20 + (_hash(seed, ids, 5) % np.uint64(40))).astype(np.int64)
    ws = _hash(seed, ids, 6)
    total = int(n.sum())
    starts = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(n, out=starts[1:])
    # per-page arange(n_j), concatenated: global index minus page start
    offs = (np.arange(total, dtype=np.uint64)
            - np.repeat(starts[:-1], n).astype(np.uint64))
    stream = _splitmix64(np.repeat(ws, n) + offs)
    # the scalar spec indexes with `int(w % len(_WORDS))` where w is a
    # numpy uint64 SCALAR: numpy promotes uint64-scalar % python-int to
    # float64, so the modulo is taken after float rounding of w — keep
    # that exact arithmetic (array % int would stay uint64 and differ)
    idx = (stream.astype(np.float64) % float(len(_WORDS))).astype(np.int64)
    words = np.array(_WORDS)[idx]
    wl = words.tolist()
    return [" ".join(wl[starts[j]:starts[j + 1]]) for j in range(len(ids))]


def _batch_links(
    ids: np.ndarray, v: int, seed: int, n_hosts: int, max_out: int = 40
) -> list[list[tuple[str, str]]]:
    """Vectorized out_links_anchored over a whole id batch: the three
    per-page hash draws and the per-link anchor hash each become one
    array op; only the order-preserving dedup and string assembly stay
    per-row. Byte-identical to the scalar spec."""
    dangling = _unit(_hash(seed, ids, 1)) < 0.06
    u = _unit(_hash(seed, ids, 2))
    with np.errstate(divide="ignore", over="ignore"):
        raw = 1.5 * (1.0 - u) ** (-0.7)
    k = np.clip(raw, 1, max_out).astype(np.int64)
    k[dangling] = 0
    total = int(k.sum())
    starts = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(k, out=starts[1:])
    slots = (np.arange(total, dtype=np.uint64)
             - np.repeat(starts[:-1], k).astype(np.uint64))
    page_rep = np.repeat(ids, k)
    h = _hash(seed, page_rep + (slots << np.uint64(20)) + np.uint64(7), 3)
    tgt = (v * _unit(h) ** 2.2).astype(np.int64)
    # per-page: drop self-links, dedup preserving slot order
    per_page_tgts: list[list[int]] = []
    flat_src: list[int] = []
    flat_tgt: list[int] = []
    tl = tgt.tolist()
    il = ids.astype(np.int64).tolist()
    for j, i in enumerate(il):
        ts = list(dict.fromkeys(t for t in tl[starts[j]:starts[j + 1]] if t != i))
        per_page_tgts.append(ts)
        flat_src.extend([i] * len(ts))
        flat_tgt.extend(ts)
    # anchors: one hash pass over all (page, target) pairs
    if flat_tgt:
        av = (np.array(flat_src, dtype=np.uint64)
              ^ (np.array(flat_tgt, dtype=np.uint64) << np.uint64(21)))
        ah = _hash(seed, av, 8).tolist()
    else:
        ah = []
    nw = len(_WORDS)
    out: list[list[tuple[str, str]]] = []
    pos = 0
    for j in range(len(ids)):
        links = []
        for t in per_page_tgts[j]:
            hh = ah[pos]
            pos += 1
            words = [_WORDS[t % nw], _WORDS[hh % nw]]
            if (hh >> 24) % 3:
                words.append(_WORDS[(hh >> 44) % nw])
            links.append((url_of(t, n_hosts), " ".join(words)))
        out.append(links)
    return out


def _gen_batch(
    pdf_iter: Iterator[pd.DataFrame], v: int, seed: int, n_hosts: int
) -> Iterator[pd.DataFrame]:
    base_ts = pd.Timestamp("2026-01-05", tz="UTC")
    footer_memo: dict[int, str] = {}  # n_hosts-bounded, per task
    for pdf in pdf_iter:
        ids = pdf["id"].to_numpy(dtype=np.uint64)
        langs = [
            _LANGS[int(h % len(_LANGS))] for h in _hash(seed, ids, 4)
        ]
        mains = _batch_main_texts(ids, seed)
        all_links = _batch_links(ids, v, seed, n_hosts)
        rows = []
        for j, i in enumerate(ids.tolist()):
            main = mains[j]
            host = i % n_hosts
            foot = footer_memo.get(host)
            if foot is None:
                foot = footer_memo[host] = host_footer(host, seed)
            text = f"{main}\n{foot}" if foot else main
            anchors = "".join(f'<a href="{u}">{a}</a>' for u, a in all_links[j])
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
