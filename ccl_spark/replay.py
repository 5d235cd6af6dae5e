"""Deterministic label-numbering replay.

Component *membership* is computed distributed (cc.py) and is
order-free. The reference's golden fixtures additionally pin exact
label *integers* (e.g. 52/53/24 in ccl_marker_stack.py:1618-1632),
which encode its sequential numbering algebra:

- per-slice labels shifted by a running ``marker_base``
  (ccl_marker_stack.py:270-284, 963-965),
- merge/fork equivalence classes assigned fresh labels in combined-CCL
  label order (:565-588),
- label compaction above ``marker_base_0`` (:622-630) and translation
  adjustment (:641-650),
- backward resolve with translation composition (:986-1010, :88-122)
  and back-substitution (:65-86),
- the segmented protocol: sequential shift (:775-828, :1463-1469),
  interface relabel2 (:1471-1501) and the serial translation
  propagation (:1506-1591).

All of that arithmetic only touches *label-level summaries* (a few
ints per structure per slice), never pixels, so we replay it on the
driver over the tiny per-slice outputs of the distributed engine:
``labels`` (per-slice structure ordinals) and ``overlaps`` (which
structures of slice t coincide with which of slice t-1). At web scale
the replay is skipped — canonical min-vertex component ids are the
product; the replay exists to prove exact parity with the reference's
own unit-test fixtures.

This file is a from-scratch reimplementation of the *semantics*
(traced and verified against all four golden fixtures); it shares no
code with the reference.
"""

from __future__ import annotations

from collections.abc import Iterable

Translation = tuple[frozenset[int], int]


def _backsub(values: dict[int, int], translations: list[Translation]) -> dict[int, int]:
    """Apply [set(old), new] translations; the last matching entry wins
    (matches the reference's sequential overwrite, ccl_marker_stack.py:65-86)."""
    out = {}
    for k, v in values.items():
        nv = v
        for dom, tgt in translations:
            if v in dom:
                nv = tgt
        out[k] = nv
    return out


def _compose(x0: list[Translation], x1: list[Translation]) -> list[Translation]:
    """x0 then x1, with pass-through of unmatched entries of either side
    (ccl_marker_stack.py:88-122)."""
    x01: list[Translation] = []
    for rj, sj in x1:
        r: set[int] = set()
        for ri, si in x0:
            if si in rj:
                r |= ri
        if r:
            x01.append((frozenset(r), sj))
    for ri, si in x0:
        if not any(e in dom for e in ri for dom, _ in x01):
            x01.append((ri, si))
    for rj, sj in x1:
        if not any(e in dom for e in rj for dom, _ in x01):
            x01.append((rj, sj))
    return x01


def _classes(entries: list[tuple[set[int], set[int]]]) -> list[tuple[set[int], set[int]]]:
    """Equivalence-closure of [r_set, s_set] entries: union any two
    sharing an r or an s member, keep only classes with both sides
    nonempty, ordered by first contributing entry
    (ccl_marker_stack.py:484-530)."""
    n = len(entries)
    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    seen_r: dict[int, int] = {}
    seen_s: dict[int, int] = {}
    for i, (r, s) in enumerate(entries):
        for e in r:
            if e in seen_r:
                union(i, seen_r[e])
            else:
                seen_r[e] = i
        for e in s:
            if e in seen_s:
                union(i, seen_s[e])
            else:
                seen_s[e] = i

    groups: dict[int, tuple[set[int], set[int]]] = {}
    order: list[int] = []
    for i, (r, s) in enumerate(entries):
        root = find(i)
        if root not in groups:
            groups[root] = (set(), set())
            order.append(root)
        groups[root][0].update(r)
        groups[root][1].update(s)
    return [groups[root] for root in order if groups[root][0] and groups[root][1]]


def _relabel2(
    m0_vals: dict[int, int],
    m1_vals: dict[int, int],
    overlaps: Iterable[tuple[int, int]],
    marker_base0: int,
) -> tuple[dict[int, int], list[Translation], list[Translation], list[int]]:
    """Label-level ccl_relabel2 (ccl_marker_stack.py:262-723).

    ``m0_vals``/``m1_vals`` map per-slice structure ordinals (combined-CCL
    order) to their current stored values; ``overlaps`` are (m0_label,
    m1_label) coincidence pairs. Returns (m1_new values by m1 label,
    translation01, translation11, m0_eol).
    """
    shifted = {l: v + marker_base0 for l, v in m1_vals.items()}
    marker_base = marker_base0 + max(shifted.values(), default=0)

    r_by_label: dict[int, set[int]] = {l: set() for l in m1_vals}
    for pl, cl in overlaps:
        r_by_label[cl].add(m0_vals[pl])

    entries = [(r_by_label[l], {shifted[l]}) for l in sorted(m1_vals)]
    classes = _classes(entries)

    fresh: dict[int, int] = {}  # shifted m1 value -> fresh label
    fresh_r: list[tuple[set[int], int]] = []
    cur = marker_base
    for r, s in classes:
        for sv in s:
            fresh[sv] = cur
        fresh_r.append((r, cur))
        cur += 1

    m1_new = {l: fresh.get(shifted[l], shifted[l]) for l in m1_vals}
    relabeled_m0 = {v for r, _ in fresh_r for v in r}
    m0_new_vals = set()
    for v in set(m0_vals.values()):
        hit = [t for r, t in fresh_r if v in r]
        m0_new_vals.add(hit[-1] if hit else v)

    # Compaction of labels above marker_base0 (ascending old value).
    old = sorted({v for v in m1_new.values() if v > marker_base0})
    remap = {o: marker_base0 + 1 + i for i, o in enumerate(old)}
    m1_new = {l: remap.get(v, v) for l, v in m1_new.items()}
    m0_new_vals = {remap.get(v, v) for v in m0_new_vals}
    translation01 = [(frozenset(r), remap.get(t, t)) for r, t in fresh_r]

    m1_set = set(m1_new.values())
    m0_eol = sorted(v for v in m0_new_vals if v > 0 and v not in m1_set)

    # translation11: final value -> set of original m1 values
    by_final: dict[int, set[int]] = {}
    for l, v in m1_new.items():
        by_final.setdefault(v, set()).add(m1_vals[l])
    translation11 = [(frozenset(by_final[v]), v) for v in sorted(by_final)]
    return m1_new, translation01, translation11, m0_eol


class StackReplay:
    """Replays ccl_marker_stack.make_labels_from at label level
    (ccl_marker_stack.py:852-1010)."""

    def __init__(self) -> None:
        self.slices: list[dict[int, int]] = []  # per-slice label -> stored value
        self.translations01: list[list[Translation]] = []
        self.eol: list[list[int]] = []
        self.marker_base = 0
        self._resolved: list[dict[int, int]] | None = None
        self.ages: dict[int, int] = {}

    def add_slice(
        self, labels: Iterable[int], overlaps: Iterable[tuple[int, int]] = ()
    ) -> None:
        labels = sorted(set(labels))
        self._resolved = None
        if not self.slices:
            self.slices.append({l: l for l in labels})
            self.translations01.append([])
            self.eol.append([])
            return
        prev = self.slices[-1]
        prev_max = max(prev.values(), default=0)
        if self.marker_base <= prev_max:
            self.marker_base = prev_max
        m1_new, t01, _t11, m0_eol = _relabel2(
            prev, {l: l for l in labels}, overlaps, self.marker_base
        )
        self.slices.append(m1_new)
        self.translations01.append(t01)
        self.eol.append(m0_eol)

    # -- resolve (ccl_marker_stack.py:986-1010) ---------------------------
    def resolve(self) -> list[dict[int, int]]:
        if self._resolved is not None:
            return self._resolved
        n = len(self.slices)
        self.ages = {}
        out = [dict(self.slices[-1])]
        for v in set(self.slices[-1].values()):
            self.ages[v] = 1
        x = list(self.translations01[-1])
        for i in range(n - 2, -1, -1):
            cur = _backsub(self.slices[i], x)
            for v in set(cur.values()):
                self.ages[v] = self.ages.get(v, 0) + 1
            x = _compose(self.translations01[i], x)
            out.append(cur)
        out.reverse()
        self._resolved = out
        return out

    def ages_at(self, idx: int) -> dict[int, int]:
        resolved = self.resolve()
        return {l: self.ages[v] for l, v in resolved[idx].items()}

    def ids_resolved(self) -> set[int]:
        return {v for s in self.resolve() for v in s.values()}

    def ids_max(self) -> int:
        ids = self.ids_resolved()
        return max(ids) if ids else 0

    # -- segmented protocol helpers ---------------------------------------
    def shift(self, delta: int) -> None:
        """shift_labels (ccl_marker_stack.py:775-828)."""
        self.slices = [
            {l: (v + delta if v > 0 else v) for l, v in s.items()} for s in self.slices
        ]
        self.translations01 = [
            [
                (
                    frozenset(r + delta if r > 0 else r for r in dom),
                    tgt + delta if tgt > 0 else tgt,
                )
                for dom, tgt in t
            ]
            for t in self.translations01
        ]
        self._resolved = None
        self.resolve()


def interface_relabel2(
    m0_vals: dict[int, int],
    m1_vals: dict[int, int],
    overlaps: Iterable[tuple[int, int]],
    marker_base0: int,
) -> tuple[list[Translation], list[Translation]]:
    """make_translations between two resolved segment-boundary slices
    (ccl_marker_stack.py:1091-1100, 1471-1501)."""
    _, t01, t11, _ = _relabel2(m0_vals, m1_vals, overlaps, marker_base0)
    return t01, t11


def segmented_resolve(
    segments: list[StackReplay],
    interface_overlaps: list[list[tuple[int, int]]],
) -> list[list[dict[int, int]]]:
    """Full segmented pipeline: per-segment stacks (already built),
    sequential shift, interface translations, serial global propagation
    (ccl_marker_stack.py:1457-1591). Returns resolved value maps per
    segment per slice (globally reconciled).
    """
    nseg = len(segments)
    for i in range(nseg - 1):
        delta = segments[i].ids_max()
        segments[i + 1].shift(delta)

    resolved = [[dict(s) for s in seg.resolve()] for seg in segments]

    t01s: list[list[Translation]] = []
    t11s: list[list[Translation]] = []
    for i in range(nseg - 1):
        m0 = resolved[i][-1]
        m1 = resolved[i + 1][0]
        t01, t11 = interface_relabel2(
            m0, m1, interface_overlaps[i], segments[i].ids_max()
        )
        t01s.append(t01)
        t11s.append(t11)

    def substitute(seg_slices: list[dict[int, int]], frm: int, to: int) -> None:
        for s in seg_slices:
            for l, v in s.items():
                if v == frm:
                    s[l] = to

    global_translations: list[list[tuple[int, int]]] = []
    for i in range(nseg - 2, -1, -1):
        for dom, _fict in t11s[i]:
            if len(dom) > 1:
                tgt = max(dom)
                for d in dom:
                    substitute(resolved[i + 1], d, tgt)
        for dom, _fict in t01s[i]:
            if len(dom) > 1:
                tgt = max(dom)
                for d in dom:
                    substitute(resolved[i], d, tgt)
        new: list[tuple[int, int]] = []
        for dom1, fict1 in t11s[i]:
            d1 = max(dom1)
            for dom0, fict0 in t01s[i]:
                if fict0 == fict1:
                    if global_translations:
                        for a, b in global_translations[-1]:
                            if a == d1:
                                d1 = b
                                break
                    new.append((max(dom0), d1))
                    break
        global_translations.append(new)
    global_translations.reverse()

    for i in range(nseg - 1):
        for frm, to in global_translations[i]:
            substitute(resolved[i], frm, to)
    return resolved
