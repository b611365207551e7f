"""Corpus n-gram language-model quality scoring (CCNet-style).

CCNet (Wenzek et al. 2019, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") ranks web documents by language-model
perplexity and keeps the low-perplexity head — the classic web-corpus
quality filter. This module implements the distributed version over a
Ray Dataset: an add-one (Laplace) smoothed bigram LM

    p(w_1)        = (U(w_1) + 1) / (N + V)
    p(w_i|w_:i-1) = (B(w_{i-1}, w_i) + 1) / (U(w_{i-1}) + V)

fit on the corpus itself (U = unigram counts, B = bigram counts,
N = total tokens, V = vocabulary size), scoring each doc by its mean
negative log-likelihood. Tokenization is the engine-wide whitespace
convention (functions/text._WS_RE — shared with top_tokens and its SQL
oracle, so the ``lm_perplexity`` gate replicates the entire fit+score
in DuckDB).

Distributed shape (the 100 TB story):
- FIT is one streaming pass of per-batch PRE-AGGREGATED (prev, w)
  partial counts (docs never span batches, so counts are additively
  mergeable) into ONE keyed exchange — the exchange carries one row
  per distinct (prev, w) per batch, zipf-bounded like top_tokens,
  never the corpus.
- The fitted model is COLLECTED (it is the output of the reduce, not
  the corpus) and broadcast once via ``ray.put``; ``vocab_cap`` and
  ``bigram_cap`` bound the collect. The vocab overflowing its cap
  raises loudly (a quality LM over an unbounded vocab needs feature
  hashing — out of scope, documented); the bigram table overflowing
  prunes DETERMINISTICALLY to the top-K by (count desc, prev, w),
  pushing pruned mass into the smoothing term (Brants et al. 2007
  count-cutoff pruning) — pinned by a pytest against an in-memory
  reference.
- SCORE is one vectorized streaming pass: per-batch explode +
  ``pd.Index.get_indexer`` lookups against the broadcast arrays; no
  shuffle, no per-row python.

Reference parity: the reference has no LM scorer (its quality gates
are rule-based); this operator is part of the brief's training-data
pipeline surface, alongside dedup/decontamination/packing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions import text as tx

def _bigram_key(prev: pd.Series, w: pd.Series) -> pd.Series:
    """Unambiguous single-string bigram key: length-prefixing the first
    token makes the pair reconstructible for ANY token content (no
    separator character can be assumed absent from a whitespace-split
    token — even NUL is legal)."""
    return prev.str.len().astype(str) + ":" + prev + w


def _tokens_frame(df: pd.DataFrame, text_col: str) -> pd.DataFrame:
    """(doc row, position, token, prev-token) exploded frame. Docs with
    empty trimmed text produce no rows (the top_tokens convention)."""
    t = df[text_col].astype(str).str.strip()
    toks = t.where(t.str.len() > 0).str.split(tx._WS_RE)
    ex = pd.DataFrame({"row": df.index, "w": toks}).explode("w") \
        .dropna(subset=["w"])
    ex["prev"] = ex["w"].shift(1)
    first = ~ex["row"].duplicated()
    ex.loc[first, "prev"] = None
    return ex


def fit_bigram_model(ds, text_col: str = "text",
                     vocab_cap: int = 1 << 24,
                     bigram_cap: int | None = None) -> dict:
    """One streaming pass + one keyed exchange -> model dict with
    numpy arrays (uni_w, uni_c, big_key, big_c, n, v)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ex = _tokens_frame(batch.to_pandas(), text_col)
        if ex.empty:
            return pa.table({"key": pa.array([], pa.string()),
                             "kind": pa.array([], pa.int8()),
                             "c": pa.array([], pa.int64())})
        uni = ex["w"].value_counts(sort=False)
        pairs = ex.dropna(subset=["prev"])
        big = _bigram_key(pairs["prev"], pairs["w"]) \
            .value_counts(sort=False)
        return pa.table({
            "key": np.concatenate([uni.index.to_numpy(dtype=object),
                                   big.index.to_numpy(dtype=object)]),
            "kind": np.concatenate([np.zeros(len(uni), np.int8),
                                    np.ones(len(big), np.int8)]),
            "c": np.concatenate([uni.to_numpy(np.int64),
                                 big.to_numpy(np.int64)])})

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["kind", "key"]).aggregate(Sum("c", alias_name="c"))
    cdf = counts.to_pandas()
    if cdf.empty:                    # all-empty corpus -> null model
        cdf = pd.DataFrame({"kind": pd.Series(dtype=np.int8),
                            "key": pd.Series(dtype=object),
                            "c": pd.Series(dtype=np.int64)})
    uni = cdf[cdf["kind"] == 0]
    big = cdf[cdf["kind"] == 1]
    if len(uni) > vocab_cap:
        raise ValueError(
            f"fit_bigram_model: vocabulary {len(uni)} exceeds vocab_cap "
            f"{vocab_cap}; an unbounded vocab needs feature hashing — "
            "raise the cap only with the driver memory to hold it")
    if bigram_cap is not None and len(big) > bigram_cap:
        # deterministic count-cutoff pruning (count desc, key asc)
        big = big.sort_values(["c", "key"], ascending=[False, True],
                              kind="stable").head(bigram_cap)
    uni = uni.sort_values("key", kind="stable")
    big = big.sort_values("key", kind="stable")
    return {
        "uni_w": uni["key"].to_numpy(dtype=object),
        "uni_c": uni["c"].to_numpy(np.int64),
        "big_key": big["key"].to_numpy(dtype=object),
        "big_c": big["c"].to_numpy(np.int64),
        "n": int(uni["c"].sum()),
        "v": int(len(uni)),
    }


class PerplexityScorer:
    """Actor stage: broadcast model in ``__init__`` (once per actor),
    vectorized per-batch scoring in ``__call__``. Output is the
    driver-contract integer quantization ``nll_c =
    floor(nll * 1e4 + 0.5)`` (identical single IEEE ops both engines).
    """

    def __init__(self, model_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        m = ray.get(model_ref) if not isinstance(model_ref, dict) \
            else model_ref
        self.text_col = text_col
        self.id_col = id_col
        self.uni = pd.Index(m["uni_w"])
        self.uni_c = m["uni_c"]
        self.big = pd.Index(m["big_key"])
        self.big_c = m["big_c"]
        self.log_nv = np.log(m["n"] + m["v"])
        self.v = m["v"]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ex = _tokens_frame(df, self.text_col)
        if ex.empty:
            return pd.DataFrame({
                self.id_col: pd.Series(dtype=df[self.id_col].dtype),
                "n_tokens": pd.Series(dtype=np.int64),
                "nll_c": pd.Series(dtype=np.int64)})
        iw = self.uni.get_indexer(ex["w"])
        uw = np.where(iw >= 0, self.uni_c[np.maximum(iw, 0)], 0)
        first = ex["prev"].isna().to_numpy()
        # first token: (U(w)+1)/(N+V)
        lp = np.where(first, np.log(uw + 1.0) - self.log_nv, 0.0)
        # continuation: (B(prev,w)+1)/(U(prev)+V)
        cont = ex[~first]
        ib = self.big.get_indexer(_bigram_key(cont["prev"], cont["w"]))
        bc = np.where(ib >= 0, self.big_c[np.maximum(ib, 0)], 0)
        ip = self.uni.get_indexer(cont["prev"])
        up = np.where(ip >= 0, self.uni_c[np.maximum(ip, 0)], 0)
        lp[~first] = np.log(bc + 1.0) - np.log(up + float(self.v))
        agg = pd.DataFrame({"row": ex["row"].to_numpy(), "lp": lp}) \
            .groupby("row", sort=False)["lp"].agg(["sum", "size"])
        nll = -agg["sum"].to_numpy() / agg["size"].to_numpy()
        return pd.DataFrame({
            self.id_col: df.loc[agg.index, self.id_col].to_numpy(),
            "n_tokens": agg["size"].to_numpy(np.int64),
            "nll_c": np.floor(nll * 1e4 + 0.5).astype(np.int64)})


def score_perplexity(ds, model: dict, text_col: str = "text",
                     id_col: str = "doc_id", concurrency: int = 4):
    """Broadcast the fitted model once, score in a streaming actor
    pool. Pool kept narrow by default (and clamped so it can never
    starve the upstream read — the measured 7x stall mode in util.py):
    the kernel is index-lookup (DRAM-bandwidth-leaning, the knn/bands
    finding) not decode-CPU."""
    from ..util import clamp_concurrency

    ref = ray.put(model)
    return ds.map_batches(
        PerplexityScorer,
        fn_constructor_kwargs=dict(model_ref=ref, text_col=text_col,
                                   id_col=id_col),
        batch_format="pandas",
        concurrency=clamp_concurrency(concurrency,
                                      num_cpus_per_actor=1.0),
        num_cpus=1.0)
