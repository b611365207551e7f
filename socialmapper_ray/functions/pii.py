"""PII detection + redaction (emails, IPv4 addresses, phone numbers).

Web-scale training pipelines scrub PII before training (BigScience
ROOTS, Laurencon 2022; RefinedWeb, Penedo 2023 — both redact emails,
IP addresses and phone-number patterns with regex passes). The
patterns here are deliberately lookaround-free and backreference-free
so the SAME pattern string executes identically under Python ``re``
(the vectorized pandas path inside ``map_batches``) and RE2 (DuckDB
``regexp_*`` — the gate oracle): for these character-class patterns
the two engines' leftmost-greedy semantics coincide, which the
``pii_scrub`` gate pins end to end with a value-hash compare.

Redaction order is fixed (email -> ipv4 -> phone) and counts are taken
on the pre-redaction text, so the operator is a pure function of the
input string in both engines.

Scale shape: a single vectorized ``map_batches`` stage (compiled
patterns at module import — per-process, shared by every batch), no
shuffle, no state; the 100 TB cost is one streaming pass.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# One pattern string per PII kind, shared verbatim with the SQL oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,2}[ -]\d{3}[ -]\d{3}[ -]?\d{2,4}"

_ORDER = ((EMAIL_RE, "<EMAIL>", "n_email"),
          (IPV4_RE, "<IP>", "n_ipv4"),
          (PHONE_RE, "<PHONE>", "n_phone"))
_COMPILED = [(re.compile(p), tok, col) for p, tok, col in _ORDER]


def scrub_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Vectorized per-batch scrub: adds ``n_email``/``n_ipv4``/
    ``n_phone`` (counts on the pre-redaction text) and ``redacted``."""
    text = df[text_col].astype(str)
    out = df.copy()
    red = text
    for pat, token, col in _COMPILED:
        out[col] = text.str.count(pat).astype(np.int64)
        red = red.str.replace(pat, token, regex=True)
    out["redacted"] = red
    return out


def pii_scrub(ds, text_col: str = "text"):
    """Dataset-level scrub stage — stateless vectorized map_batches."""
    return ds.map_batches(lambda df: scrub_batch(df, text_col),
                          batch_format="pandas")
