"""URL filtering (domain blocklist + banned-word rules).

The RefinedWeb pipeline (Penedo 2023) filters crawl URLs before any
content processing: a curated domain blocklist (with subdomain
matching) plus URL-substring word rules. This module is the vectorized
engine half; the blocklist is a SMALL side — broadcast it (``ray.put``
once / closure capture for literals), never shuffle the URL stream
against it.

Verdict precedence is fixed (domain before word) so the operator is a
pure function of (url, blocklist, words) — the ``url_filter`` gate
replicates it in SQL and value-hash-compares per-URL verdicts.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_HOST_RE = r"^[a-zA-Z]+://([^/]+)"


def classify_urls(urls: pd.Series, blocklist: list[str],
                  banned_words: list[str]) -> pd.Series:
    """Per-URL verdict: 'blocked_domain' (host equals a blocklisted
    domain or is a subdomain of one), 'blocked_word' (any banned word
    appears in the URL), else 'kept'."""
    urls = urls.astype(str)
    host = urls.str.extract(_HOST_RE, expand=False).str.lower().fillna("")
    dom = host.isin(blocklist) \
        | host.str.endswith(tuple("." + b for b in blocklist))
    word_re = "|".join(re.escape(w) for w in banned_words)
    word = urls.str.contains(word_re, case=False, regex=True)
    return pd.Series(
        np.where(dom, "blocked_domain",
                 np.where(word, "blocked_word", "kept")),
        index=urls.index)


def url_filter(ds, blocklist: list[str], banned_words: list[str],
               url_col: str = "url", keep_only: bool = False):
    """Dataset-level filter stage — stateless vectorized map_batches;
    the blocklist travels in the task closure (small side, shipped
    once per task by Ray's capture, never exchanged)."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["verdict"] = classify_urls(df[url_col], blocklist,
                                       banned_words)
        return out[out["verdict"] == "kept"] if keep_only else out

    return ds.map_batches(fn, batch_format="pandas")
