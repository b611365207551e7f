"""Single-pass multi-pattern literal matching for decontamination.

The reference-scale problem (SURVEY.md decontamination; the large-K
path flagged in round 2): find every (document, snippet) pair where the
snippet occurs verbatim, for snippet sets of 10^4-10^6 benchmark
strings. A per-snippet scan is O(K x corpus); the classic fix is an
Aho-Corasick automaton (Aho & Corasick 1975). A byte-at-a-time
automaton scan is inherently sequential Python, so this module uses the
numpy-native equivalent with the same complexity: **vectorized
Rabin-Karp** (Karp & Rabin 1987) —

- snippet ANCHOR hashes (the first 2^k bytes, 2^k <= len) index into
  sorted per-width tables (build once per actor, the automaton
  analogue);
- ONE vectorized rolling-hash pass over the batch's concatenated bytes
  per distinct anchor WIDTH — at most log2(max_len) passes no matter
  how many distinct lengths the pattern set has — each O(corpus)
  independent of K;
- anchor hits (rare) verify the FULL pattern by exact byte comparison,
  so output is exact — hash width is 64 bits, collisions and shared
  anchors only cost a verify.

Arithmetic is uint64 wraparound (mod 2^64) with an ODD base, which is
invertible mod 2^64 — that turns the rolling window into a cumsum of
``byte * B^-t`` terms and makes the whole pass branch-free numpy:
``H[i] = (S[i+L-1] - S[i-1]) * B^(i+L-1) = sum_j c[i+j] * B^(L-1-j)``.

Matching is on UTF-8 bytes; a byte-level hit of a str-encoded pattern
always lands on a character boundary (a lead byte), so byte semantics
== Python ``in`` semantics exactly.
"""

from __future__ import annotations

import numpy as np

_BASE = np.uint64(0x100000001B3)          # FNV prime, odd -> invertible
_BASE_INV = np.uint64(pow(0x100000001B3, -1, 1 << 64))


def _pattern_hash(pat: bytes) -> np.uint64:
    h = np.uint64(0)
    with np.errstate(over="ignore"):                 # mod-2^64 by design
        for byte in pat:
            h = h * _BASE + np.uint64(byte)
    return h


class SnippetMatcher:
    """Build once (per actor), scan many batches.

    Patterns bucket by ANCHOR width — the largest power of two <= the
    pattern length — and each scan is ONE rolling-hash pass per
    distinct anchor width over the batch, hashing every pattern's
    FIRST ``w`` bytes. Anchor hits (rare, 64-bit) verify the FULL
    pattern bytes, so output is exact. Passes are therefore bounded by
    log2(max_len) (~a dozen) REGARDLESS of how many distinct lengths
    the pattern set has — the pre-r4 one-pass-per-distinct-length form
    degraded linearly on mixed-length sets (a 100-length set cost 100
    corpus passes; now <= 7 for lengths under 128 bytes). Cost
    envelope pytest: tests/test_match.py."""

    def __init__(self, snippets):
        """snippets: iterable of (snip_id, str-or-bytes). Empty
        snippets are ignored (they'd match everywhere)."""
        by_w: dict[int, list[tuple[int, bytes]]] = {}
        for sid, s in snippets:
            b = s.encode() if isinstance(s, str) else bytes(s)
            if b:
                w = 1 << (len(b).bit_length() - 1)   # 2^k <= len < 2^k+1
                by_w.setdefault(w, []).append((int(sid), b))
        self.tables: dict[int, tuple[np.ndarray, np.ndarray, list[bytes]]] = {}
        for w, items in by_w.items():
            hashes = np.asarray([_pattern_hash(b[:w]) for _, b in items],
                                dtype=np.uint64)
            order = np.argsort(hashes, kind="stable")
            self.tables[w] = (
                hashes[order],
                np.asarray([items[i][0] for i in order], dtype=np.int64),
                [items[i][1] for i in order],
            )
        self.max_len = max((max(len(b) for _, b in items)
                            for items in by_w.values()), default=0)

    def find_in_batch(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """texts: sequence of str. Returns (row_idx, snip_id) int64
        arrays — one entry per DISTINCT (document row, snippet) with
        the snippet contained in the document."""
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        if not self.tables or len(texts) == 0:
            return empty
        blobs = [t.encode() if isinstance(t, str) else bytes(t)
                 for t in texts]
        lens = np.asarray([len(b) for b in blobs], dtype=np.int64)
        data = np.frombuffer(b"".join(blobs), dtype=np.uint8)
        n = len(data)
        if n == 0:
            return empty
        ends = np.cumsum(lens)                       # doc i = [ends[i]-lens[i], ends[i])
        c = data.astype(np.uint64)
        # Binv^t and B^t for t in 0..n-1 (uint64 cumprod wraps mod 2^64)
        pinv = np.ones(n, dtype=np.uint64)
        pinv[1:] = _BASE_INV
        pinv = np.cumprod(pinv)
        powb = np.ones(n, dtype=np.uint64)
        powb[1:] = _BASE
        powb = np.cumprod(powb)
        S = np.cumsum(c * pinv)                      # wraparound prefix sums
        data_b = data.tobytes()

        out_rows, out_sids = [], []
        for w, (hsorted, sids, pats) in self.tables.items():
            if w > n:
                continue
            win = S[w - 1:].copy()
            win[1:] -= S[:n - w]                     # raw window sums
            H = win * powb[w - 1:]                   # exponent-aligned
            pos = np.searchsorted(hsorted, H)
            pos_c = np.minimum(pos, len(hsorted) - 1)
            cand = np.flatnonzero(hsorted[pos_c] == H)
            if len(cand) == 0:
                continue
            # anchor must not straddle a document boundary (the full
            # pattern's fit is re-checked per pattern in the verify)
            doc = np.searchsorted(ends, cand, side="right")
            inside = cand + w <= ends[doc]
            cand, doc = cand[inside], doc[inside]
            if len(cand) == 0:
                continue
            tbl_i = pos_c[cand]
            # runs of equal anchor hash in the table: expand to every
            # snippet sharing it (duplicate strings are distinct ids;
            # same-anchor different-tail patterns share a bucket entry)
            for start, ti, dc in zip(cand, tbl_i, doc):
                j = ti
                while j < len(hsorted) and hsorted[j] == hsorted[ti]:
                    p = pats[j]
                    if start + len(p) <= ends[dc] \
                            and data_b[start: start + len(p)] == p:
                        out_rows.append(int(dc))
                        out_sids.append(int(sids[j]))
                    j += 1
        if not out_rows:
            return empty
        pairs = np.stack([np.asarray(out_rows, np.int64),
                          np.asarray(out_sids, np.int64)], axis=1)
        pairs = np.unique(pairs, axis=0)             # multiple occurrences
        return pairs[:, 0], pairs[:, 1]
