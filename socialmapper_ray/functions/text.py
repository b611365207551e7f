"""Deterministic text functions over web-page batches.

The graft's heavy scalar function is html -> text extraction
(SURVEY.md §2.8 "JSON/html parsing" row): the reference's analogue is
Overpass/TIGER response parsing (query/__init__.py:239-316). The
contract (BASELINE.json input_hint) is **byte-identical extracted text
per url** regardless of batch boundaries or parallelism, so every
function here is pure, order-independent, and vectorized (pandas
C-level string kernels / numpy) — no state, no locale, no time.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

_MAIN_RE = r"<main>(.*?)</main>"
_WS_RE = re.compile(r"\s+")

# Minimal entity unescape, applied in fixed order; the synthetic
# generator never escapes (docs are markup-free) so this is identity on
# our corpus, but keeps the function total on arbitrary pages.
_UNESCAPES = [("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&")]

STOPWORDS = {
    "en": ("the", "and", "of", "a", "to", "in", "is", "it", "for", "on"),
    "fr": ("le", "la", "et", "de", "un", "une", "est", "pour", "dans", "les"),
    "es": ("el", "la", "y", "de", "un", "una", "es", "para", "en", "los"),
    "de": ("der", "die", "und", "das", "ein", "eine", "ist", "für", "in", "den"),
}
# flat english stop set used by the SQL-checkable quality metric
QUALITY_STOPWORDS = STOPWORDS["en"]


def decode_html(html: pd.Series) -> pd.Series:
    """binary html -> str (utf-8, strict: pages are produced as utf-8)."""
    if html.dtype == object and len(html) and isinstance(html.iloc[0], bytes):
        return html.str.decode("utf-8")
    return html.astype(str)


def extract_main_text(html: pd.Series) -> pd.Series:
    """Extract the <main> payload of each page; '' when absent.

    Pure + vectorized (single C regex pass per column), which is what
    makes the per-url byte-identity invariant hold at any parallelism.
    """
    s = decode_html(html)
    out = s.str.extract(_MAIN_RE, flags=re.S, expand=False).fillna("")
    for ent, ch in _UNESCAPES:
        out = out.str.replace(ent, ch, regex=False)
    return out


_MAIN_RE_ARROW = r"(?s)<main>(?P<m>.*?)</main>"


def decode_html_arrow(html):
    """binary/string html column -> Arrow string array (zero-copy when
    already string; utf-8-validated cast when binary)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    t = html.type if hasattr(html, "type") else html.chunk(0).type
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pc.cast(html, pa.string())
    return html


def extract_main_text_arrow(html):
    """Arrow-native :func:`extract_main_text` — one RE2 pass via
    ``pc.extract_regex``, literal entity unescapes via
    ``pc.replace_substring``. No pandas conversion anywhere; values
    byte-identical to the pandas kernel (pytest-equal)."""
    import pyarrow.compute as pc

    s = decode_html_arrow(html)
    out = pc.fill_null(pc.struct_field(
        pc.extract_regex(s, _MAIN_RE_ARROW), "m"), "")
    for ent, ch in _UNESCAPES:
        out = pc.replace_substring(out, pattern=ent, replacement=ch)
    return out


def token_count(text: pd.Series) -> pd.Series:
    """Whitespace token count; matches DuckDB
    ``len(regexp_split_to_array(trim(text), '\\s+'))`` for non-empty text."""
    t = text.str.strip()
    n = t.str.split(_WS_RE).str.len()
    return n.where(t.str.len() > 0, 0).astype(np.int64)


def stopword_count(text: pd.Series, stops=QUALITY_STOPWORDS) -> pd.Series:
    toks = text.str.lower().str.split(_WS_RE)
    stop = frozenset(stops)
    return toks.map(lambda ws: sum(w in stop for w in ws)
                    if isinstance(ws, list) else 0).astype(np.int64)


def alpha_ratio_scaled(text: pd.Series) -> pd.Series:
    """floor(1e6 * alpha_chars / chars) as int64 (0 for empty text).

    Integer-scaled ratios keep the DuckDB oracle hash-stable: both
    engines compute the same single IEEE division before flooring.
    """
    total = text.str.len().astype(np.int64)
    alpha = text.str.count(r"[A-Za-z]").astype(np.int64)
    ratio = np.where(total > 0, alpha / np.maximum(total, 1), 0.0)
    return pd.Series(np.floor(ratio * 1e6).astype(np.int64), index=text.index)


def lang_scores(text: pd.Series) -> pd.DataFrame:
    """Per-language stopword hit counts (n-gram-free heuristic lang-id)."""
    toks = text.str.lower().str.split(_WS_RE)
    data = {}
    for lang, stops in STOPWORDS.items():
        stop = frozenset(stops)
        data[lang] = toks.map(lambda ws: sum(w in stop for w in ws)
                              if isinstance(ws, list) else 0)
    return pd.DataFrame(data, index=text.index)


def predict_lang(text: pd.Series) -> pd.Series:
    """argmax language by stopword hits; 'und' when all-zero. Ties break
    by fixed language order (dict order of STOPWORDS) — deterministic."""
    sc = lang_scores(text)
    best = sc.idxmax(axis=1)
    return best.where(sc.max(axis=1) > 0, "und")


def doc_shingles(text: str, k: int) -> list[str]:
    """Distinct word-k-shingles of one doc, first-occurrence order
    (deterministic — no set iteration). [] when the doc has < k tokens.

    Matches DuckDB ``SELECT DISTINCT array_to_string(ts[i:i+k-1], ' ')``
    over ``regexp_split_to_array(trim(text), '\\s+')`` exactly.
    """
    t = text.strip() if isinstance(text, str) else ""
    ws = _WS_RE.split(t) if t else []
    if len(ws) < k:
        return []
    return list(dict.fromkeys(
        " ".join(ws[i: i + k]) for i in range(len(ws) - k + 1)))


def crc32_tokens(words: list[str]) -> np.ndarray:
    return np.asarray([zlib.crc32(w.encode("utf-8")) for w in words],
                      dtype=np.uint64)


def batch_token_hashes(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """Token crc32s of a whole batch: (flat uint64 array, doc segment
    offsets len n+1). crc32 runs once per UNIQUE token in the batch
    (factorize) — zipfian token frequency cuts the python hash loop by
    the type/token ratio; values identical to per-occurrence hashing."""
    tok_lists = [_WS_RE.split(t.strip()) if t.strip() else []
                 for t in texts]
    segs = np.zeros(len(tok_lists) + 1, dtype=np.int64)
    segs[1:] = np.cumsum([len(ws) for ws in tok_lists])
    if segs[-1] == 0:
        return np.empty(0, dtype=np.uint64), segs
    flat = np.asarray([w for ws in tok_lists for w in ws], dtype=object)
    codes, uniques = pd.factorize(flat, sort=False)
    uh = np.asarray([zlib.crc32(u.encode("utf-8")) for u in uniques],
                    dtype=np.uint64)
    return uh[codes], segs


def doc_fingerprint_scalar(t: str, shingle_k: int = 3) -> np.uint64:
    """Per-doc reference path (dual oracle for the batch kernel)."""
    from ..sources.synth import splitmix64

    ws = _WS_RE.split(t.strip()) if t.strip() else []
    if len(ws) < shingle_k:
        base = crc32_tokens(ws) if ws else np.asarray([0], dtype=np.uint64)
        return np.uint64(splitmix64(base).min())
    h = crc32_tokens(ws)
    acc = np.zeros(len(ws) - shingle_k + 1, dtype=np.uint64)
    for i in range(shingle_k):
        acc = acc * np.uint64(1099511628211) \
            + h[i: len(h) - shingle_k + 1 + i]
    return np.uint64(splitmix64(acc).min())


def doc_fingerprint(text: pd.Series, shingle_k: int = 3,
                    token_hashes=None) -> pd.Series:
    """64-bit rolling-shingle fingerprint: min over word-k-shingle hashes.

    Deterministic content fingerprint (cheap near-dup prefilter); the
    mixing step is splitmix64 over crc32 word hashes. Batched: one
    factorize-cached tokenizer pass, per-doc rolling accumulators, ONE
    splitmix64 over the concatenation, per-doc min via
    ``np.minimum.reduceat`` — identical values to
    :func:`doc_fingerprint_scalar` (pytest dual oracle), no per-doc
    python hash loop.
    """
    from ..sources.synth import splitmix64

    texts = text.tolist()
    th_flat, tsegs = token_hashes if token_hashes is not None else \
        batch_token_hashes(texts)
    k = shingle_k
    parts = []
    seg_lens = []
    with np.errstate(over="ignore"):
        for i in range(len(tsegs) - 1):
            th = th_flat[tsegs[i]:tsegs[i + 1]]
            if len(th) == 0:
                parts.append(np.asarray([0], dtype=np.uint64))
                seg_lens.append(1)
            elif len(th) < k:
                parts.append(th)          # min over raw token mixes
                seg_lens.append(len(th))
            else:
                m = len(th) - k + 1
                acc = np.zeros(m, dtype=np.uint64)
                for j in range(k):
                    acc = acc * np.uint64(1099511628211) + th[j: m + j]
                parts.append(acc)
                seg_lens.append(m)
    if not parts:
        return pd.Series(np.empty(0, dtype=np.uint64))
    mixed = splitmix64(np.concatenate(parts))
    starts = np.concatenate([[0], np.cumsum(seg_lens)[:-1]]).astype(np.int64)
    out = np.minimum.reduceat(mixed, starts)
    return pd.Series(out, index=text.index, dtype=np.uint64)
