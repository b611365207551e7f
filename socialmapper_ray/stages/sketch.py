"""Mergeable cardinality sketches (HyperLogLog, from scratch).

The exact distributed COUNT DISTINCT (``event_type_reach``) moves one
row per distinct (group, member) — fine until member cardinality itself
is the scale problem (unique users/urls at 100 TB). The standard answer
is a MERGEABLE SKETCH: fixed-size per-group register arrays that
combine with elementwise max, so the exchange carries
O(groups x 2^p x batches) bytes regardless of cardinality and the
combine is associative/commutative (any tree shape, any retry order).

Published foundation: Flajolet, Fusy, Gandouet, Meunier,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm" (AofA 2007), with the small-range linear-counting
correction from the same paper. Hashing is the engine's splitmix64.

Ray Data shape: per-batch partial registers inside ``map_batches``
(vectorized ``np.maximum.at``), ONE tiny groupby on the group key,
elementwise-max combine, driver-free estimate emission.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_P = 12  # 4096 registers: ~1.6% relative standard error


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(values: np.ndarray, p: int = DEFAULT_P) -> np.ndarray:
    """Register array (2^p uint8) for one set of int64 values."""
    from ..sources.synth import splitmix64

    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return reg
    h = splitmix64(values.astype(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # rank = 1 + leading zeros of the remaining bits; vectorized count
    # via binary halving (no python loop over values)
    shift = 32
    acc = np.zeros(len(h), dtype=np.uint8)
    work = rest.copy()
    while shift >= 1:
        top = work >> np.uint64(64 - shift)
        zero_top = top == 0
        acc[zero_top] += np.uint8(shift)
        work[zero_top] = work[zero_top] << np.uint64(shift)
        shift //= 2
    rank = acc + np.uint8(1)
    np.maximum.at(reg, idx, rank)
    return reg


def hll_estimate(reg: np.ndarray) -> float:
    """FFGM estimator + linear-counting small-range correction."""
    m = len(reg)
    est = _alpha(m) * m * m / np.sum(np.power(2.0, -reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct_per_group(ds, group_col: str, value_col: str,
                              p: int = DEFAULT_P):
    """Dataset -> (group, approx_distinct) via per-batch HLL partials.

    Exchange: one (group, 2^p-byte register blob) row per (group,
    batch); the groupby combine is an elementwise max over blobs.
    """
    def partial(batch) -> "pd.DataFrame":
        import pyarrow as pa

        df = batch.to_pandas()
        keys, blobs = [], []
        for g, grp in df.groupby(group_col, sort=False):
            reg = hll_registers(grp[value_col].to_numpy(np.int64), p)
            keys.append(g)
            blobs.append(reg.tobytes())
        # declared-pyarrow (see dedup.exact_dedup): binary register
        # blobs ride the exchange zero-copy
        return pa.table({group_col: pa.array(keys),
                         "reg": pa.array(blobs, pa.binary())})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(1 << p, dtype=np.uint8)
        for blob in g["reg"]:
            acc = np.maximum(acc, np.frombuffer(blob, dtype=np.uint8))
        return pd.DataFrame({
            group_col: [g[group_col].iloc[0]],
            "approx_distinct": [int(round(hll_estimate(acc)))],
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).map_groups(combine, batch_format="pandas")


# ---------------------------------------------------------------------------
# Bloom filter (mergeable membership sketch)
# ---------------------------------------------------------------------------
#
# Published foundation: Bloom, "Space/time trade-offs in hash coding
# with allowable errors" (CACM 1970); double hashing per Kirsch &
# Mitzenmacher, "Less hashing, same performance" (ESA 2006):
# position_i = (h1 + i*h2) mod m. Merge is bitwise OR — associative,
# commutative, retry/tree-safe, so per-batch partial bitmaps combine in
# any order. A Bloom filter NEVER false-negatives: engine code may use
# it only as a PREFILTER in front of an exact check.

BLOOM_M_BITS = 1 << 20          # 128 KiB bitmap
BLOOM_K = 7                     # ~optimal for ~100k members at 2^20 bits


def _bloom_positions(values: np.ndarray, m_bits: int, k: int):
    """(n, k) int64 bit positions via splitmix64 double hashing."""
    from ..sources.synth import splitmix64

    v = np.asarray(values, dtype=np.uint64)
    h1 = splitmix64(v).astype(np.int64) & np.int64((1 << 62) - 1)
    h2 = (splitmix64(v ^ np.uint64(0x9E3779B97F4A7C15))
          .astype(np.int64) & np.int64((1 << 62) - 1)) | np.int64(1)
    i = np.arange(k, dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.int64(m_bits)


def bloom_bits(values: np.ndarray, m_bits: int = BLOOM_M_BITS,
               k: int = BLOOM_K) -> np.ndarray:
    """Packed bitmap (m_bits/8 uint8) containing ``values`` (uint64)."""
    bits = np.zeros(m_bits >> 3, dtype=np.uint8)
    if len(values) == 0:
        return bits
    pos = _bloom_positions(values, m_bits, k).ravel()
    np.bitwise_or.at(bits, pos >> 3,
                     (np.uint8(1) << (pos & 7).astype(np.uint8)))
    return bits


def bloom_contains(bits: np.ndarray, values: np.ndarray,
                   m_bits: int = BLOOM_M_BITS,
                   k: int = BLOOM_K) -> np.ndarray:
    """Vectorized membership test -> bool array (false positives only)."""
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(values, m_bits, k)
    got = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & np.uint8(1)
    return got.all(axis=1)


def hex_to_u64(hashes) -> np.ndarray:
    """First 16 hex chars of a digest string column -> uint64 keys.

    Vectorized nibble fold (no per-row int() parse): the UCS4 buffer of
    a fixed-width 'U16' array views as (n, 16) codepoints; digits and
    a-f map to nibbles arithmetically. Equal to int(h[:16], 16)
    (pytest-checked).
    """
    if len(hashes) == 0:
        return np.empty(0, dtype=np.uint64)
    arr = np.asarray(hashes, dtype="U16")          # truncates to 16 chars
    codes = arr.view(np.uint32).reshape(len(arr), 16).astype(np.uint64)
    nib = codes - np.uint64(48)                    # '0'..'9' -> 0..9
    nib[nib > 9] -= np.uint64(39)                  # 'a'..'f' -> 10..15
    shifts = np.arange(60, -4, -4, dtype=np.uint64)
    return (nib << shifts[None, :]).sum(axis=1, dtype=np.uint64)


def bloom_of_dataset(ds, value_fn, m_bits: int = BLOOM_M_BITS,
                     k: int = BLOOM_K) -> np.ndarray:
    """OR-combine per-batch partial bitmaps into one bitmap.

    ``value_fn(batch_df) -> uint64 array``. The exchange carries one
    m_bits/8-byte row per input block (bounded by block count, never by
    cardinality); the driver folds ONLY those bitmaps.
    """
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = bloom_bits(value_fn(df), m_bits, k)
        return pd.DataFrame({"bits": [b.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = np.zeros(m_bits >> 3, dtype=np.uint8)
    for blob in parts["bits"]:
        out |= np.frombuffer(blob, dtype=np.uint8)
    return out


# ---------------------------------------------------------------------------
# Count-Min sketch (mergeable frequency sketch) + heavy hitters
# ---------------------------------------------------------------------------
#
# Published foundation: Cormode & Muthukrishnan, "An improved data
# stream summary: the count-min sketch and its applications" (J.
# Algorithms 2005). d x w counter matrix; point estimate = min over
# rows; one-sided error (never underestimates); merge = elementwise
# add, so per-batch partials combine in any order / tree shape. This is
# the scale path for corpus frequency questions when the VOCABULARY is
# itself too large to shuffle (top_tokens moves one row per distinct
# token per batch; the CMS moves a fixed d*w*8 bytes per batch).

CMS_D = 4
CMS_W = 1 << 14


def _cms_rows(keys: np.ndarray, d: int, w: int) -> np.ndarray:
    """(n, d) column indices via splitmix64 double hashing."""
    from ..sources.synth import splitmix64

    v = np.asarray(keys, dtype=np.uint64)
    h1 = splitmix64(v).astype(np.int64) & np.int64((1 << 62) - 1)
    h2 = (splitmix64(v ^ np.uint64(0xD1B54A32D192ED03))
          .astype(np.int64) & np.int64((1 << 62) - 1)) | np.int64(1)
    i = np.arange(d, dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.int64(w)


def cms_table(keys: np.ndarray, counts: np.ndarray,
              d: int = CMS_D, w: int = CMS_W) -> np.ndarray:
    """(d, w) int64 counter matrix for weighted keys (uint64)."""
    t = np.zeros((d, w), dtype=np.int64)
    if len(keys) == 0:
        return t
    cols = _cms_rows(keys, d, w)
    c = np.asarray(counts, dtype=np.int64)
    for r in range(d):
        np.add.at(t[r], cols[:, r], c)
    return t


def cms_estimate(t: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point estimates (int64, >= true count) for uint64 keys."""
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64)
    d, w = t.shape
    cols = _cms_rows(keys, d, w)
    est = t[0][cols[:, 0]]
    for r in range(1, d):
        est = np.minimum(est, t[r][cols[:, r]])
    return est
