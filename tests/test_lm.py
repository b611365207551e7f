"""CCNet-style bigram-LM scoring tests (stages/lm.py).

Dual-oracle strategy: an independent in-memory dict-based scorer
recomputes the add-one bigram model from scratch, so every distributed
result (fit counts, per-doc NLL, OOV handling, count-cutoff pruning)
is pinned without trusting any shared code path. The SQL parity of the
full fit+score is pinned separately by the lm_perplexity gate entry
(tests/test_queries_oracle.py).
"""

import math

import numpy as np
import pandas as pd
import pytest

from socialmapper_ray.stages import lm


def _ref_model(texts, bigram_cap=None):
    """Independent reference: plain dict counting."""
    docs = [t.strip().split() for t in texts if t.strip()]
    uni, big = {}, {}
    for toks in docs:
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    if bigram_cap is not None and len(big) > bigram_cap:
        keep = sorted(big.items(),
                      key=lambda kv: (-kv[1],
                                      f"{len(kv[0][0])}:{kv[0][0]}"
                                      + kv[0][1]))[:bigram_cap]
        big = dict(keep)
    return uni, big, sum(uni.values()), len(uni)


def _ref_nll(toks, uni, big, n, v):
    lp = math.log(uni.get(toks[0], 0) + 1) - math.log(n + v)
    for a, b in zip(toks, toks[1:]):
        lp += math.log(big.get((a, b), 0) + 1) \
            - math.log(uni.get(a, 0) + v)
    return -lp / len(toks)


def _fit(texts, ray_ds_from, **kw):
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return lm.fit_bigram_model(ray_ds_from(df), **kw), df


@pytest.fixture()
def ray_ds_from(ray_session):
    import ray.data as rd

    return lambda df: rd.from_pandas(df).repartition(3)


TEXTS = ["the cat sat on the mat",
         "the dog sat",
         "  ",                     # empty after trim -> excluded
         "mat",                    # single token -> unigram term only
         "the cat sat on the mat again and again"]


def test_fit_counts_match_reference(ray_ds_from):
    model, _ = _fit(TEXTS, ray_ds_from)
    uni, big, n, v = _ref_model(TEXTS)
    assert model["n"] == n and model["v"] == v
    got_uni = dict(zip(model["uni_w"], model["uni_c"]))
    assert got_uni == uni
    assert len(model["big_key"]) == len(big)
    # spot a known bigram through the length-prefixed key
    key = f"{len('the')}:the" + "cat"
    i = list(model["big_key"]).index(key)
    assert model["big_c"][i] == big[("the", "cat")] == 2


def test_scores_match_reference_and_quantization(ray_ds_from):
    model, df = _fit(TEXTS, ray_ds_from)
    uni, big, n, v = _ref_model(TEXTS)
    out = lm.score_perplexity(ray_ds_from(df), model, concurrency=2) \
        .to_pandas().set_index("doc_id").sort_index()
    kept = [(i, t.strip().split()) for i, t in enumerate(TEXTS)
            if t.strip()]
    assert sorted(out.index) == [i for i, _ in kept]
    for i, toks in kept:
        want = _ref_nll(toks, uni, big, n, v)
        assert out.loc[i, "n_tokens"] == len(toks)
        assert out.loc[i, "nll_c"] == math.floor(want * 1e4 + 0.5)
    # repeated text scores identically; novel bigrams score worse
    assert out.loc[0, "nll_c"] < out.loc[1, "nll_c"]


def test_oov_scoring_under_foreign_model(ray_ds_from):
    """Score a corpus against a model fit on DIFFERENT text: unseen
    unigrams/bigrams must take the smoothing floor, not crash."""
    model, _ = _fit(["aa bb aa", "bb cc"], ray_ds_from)
    uni, big, n, v = _ref_model(["aa bb aa", "bb cc"])
    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": ["zz qq", "aa zz bb"]})
    out = lm.score_perplexity(ray_ds_from(df), model) \
        .to_pandas().set_index("doc_id").sort_index()
    for i, t in enumerate(df["text"]):
        want = _ref_nll(t.split(), uni, big, n, v)
        assert out.loc[i, "nll_c"] == math.floor(want * 1e4 + 0.5)
    # fully-OOV doc is the worst-scored
    assert out.loc[0, "nll_c"] > out.loc[1, "nll_c"]


def test_bigram_cap_prunes_deterministically(ray_ds_from):
    """Count-cutoff pruning keeps the top-K by (count desc, key asc)
    and pushes pruned mass into the smoothing term — equal to the
    reference model pruned with the same rule."""
    texts = ["a b a b a c", "c a b d e", "e d c b a"]
    cap = 3
    model, df = _fit(texts, ray_ds_from, bigram_cap=cap)
    assert len(model["big_key"]) == cap
    uni, big, n, v = _ref_model(texts, bigram_cap=cap)
    assert len(big) == cap
    out = lm.score_perplexity(ray_ds_from(df), model) \
        .to_pandas().set_index("doc_id").sort_index()
    for i, t in enumerate(texts):
        want = _ref_nll(t.split(), uni, big, n, v)
        assert out.loc[i, "nll_c"] == math.floor(want * 1e4 + 0.5)
    # determinism: refit gives the identical pruned key set
    model2, _ = _fit(texts, ray_ds_from, bigram_cap=cap)
    assert list(model2["big_key"]) == list(model["big_key"])


def test_vocab_cap_raises_loudly(ray_ds_from):
    with pytest.raises(ValueError, match="vocab_cap"):
        _fit(["a b c d e f g h"], ray_ds_from, vocab_cap=4)


def test_all_empty_corpus(ray_ds_from):
    model, df = _fit(["  ", ""], ray_ds_from)
    assert model["n"] == 0 and model["v"] == 0
    out = lm.score_perplexity(ray_ds_from(df), model).to_pandas()
    assert len(out) == 0
    # dataset-level schema is dropped by Ray for all-empty pandas
    # outputs; the stage contract itself stays typed:
    scorer = lm.PerplexityScorer(model)
    empty = scorer(df.iloc[:0])
    assert list(empty.columns) == ["doc_id", "n_tokens", "nll_c"]
    assert empty["nll_c"].dtype == np.int64
