"""Training-data text/embedding operators as query entry points.

Dedup family + text analysis over ``documents``; ANN over
``embeddings`` (driver testdata tables). SQL oracles where ANSI-SQL can
express the op; signature-based ops (MinHash/SimHash/fingerprint/
lang-id) are rows-only checks plus pytest dual oracles
(tests/test_dedup.py, tests/test_text.py).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions import text as tx
from ..stages import ann as ann_mod
from ..stages import dedup as dedup_mod


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _read(sf_dir: str, table: str, columns: list[str]):
    from .flagship import _default_blocks

    from ..util import read_parquet_clean

    return read_parquet_clean(_p(sf_dir, table), columns=columns,
                              override_num_blocks=_default_blocks())


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------

def dedup_exact_q(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    agg = dedup_mod.exact_dedup(ds)
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "text_hash": df["text_hash"],
            "keep_id": df["keep_id"].astype(np.int64),
            "n_dupes": df["n_dupes"].astype(np.int64)}),
        batch_format="pandas")


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_dupes
FROM documents GROUP BY md5(text)
"""


def dedup_keep_best_q(sf_dir: str, threshold: float = 0.35):
    """Quality-ruled near-dup keep: each duplicate component keeps its
    LONGEST member (n_chars; ties -> min doc_id) — the production keep
    rule (RefinedWeb-style representative selection) on top of the
    collapsed LSH -> verify -> components machinery. Rows-only; the
    keep set is pytest-verified against an in-memory oracle
    (tests/test_dedup.py)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    out = dedup_mod.minhash_dedup_keep_best(ds, threshold=threshold)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "component": df["component"].astype(np.int64),
            "n_chars": df["n_chars"].astype(np.int64),
            "keep": df["keep"].astype(bool)}),
        batch_format="pandas")


def dedup_exact_edges_q(sf_dir: str, salt_buckets: int = 8):
    """Exact-duplicate STAR EDGES (a=representative, b=member) — the
    exact half of the collapsed near-dup graph (stages/dedup.py
    ``exact_star_edges``), driven through the gate with a SQL oracle.

    The documents table has no exact copies, so the query injects a
    deterministic duplicate pattern (every 3rd doc copied at +100000,
    every 7th at +200000) IDENTICALLY on both sides. The engine's
    two-level star-of-stars structure — (h64, doc_id % salt) local
    stars, then per-text rep stars — is replicated literally in SQL,
    so the edge SET matches row-for-row, not just its components.
    """
    import pyarrow as pa

    import ray.data as rd

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def inject(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ids = df["doc_id"].to_numpy(np.int64)
        parts = [df]
        m3 = ids % 3 == 0
        parts.append(pd.DataFrame({"doc_id": ids[m3] + 100000,
                                   "text": df["text"].to_numpy()[m3]}))
        m7 = ids % 7 == 0
        parts.append(pd.DataFrame({"doc_id": ids[m7] + 200000,
                                   "text": df["text"].to_numpy()[m7]}))
        out = pd.concat(parts, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    corpus = ds.map_batches(inject, batch_format="pyarrow")
    edges = dedup_mod.exact_star_edges(corpus, salt_buckets=salt_buckets)
    return edges.map_batches(
        lambda df: pd.DataFrame({"a": df["a"].astype(np.int64),
                                 "b": df["b"].astype(np.int64)}),
        batch_format="pandas")


DEDUP_EXACT_EDGES_SQL = """
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 7 = 0),
l1 AS (
  SELECT text, doc_id % 8 AS salt, MIN(doc_id) AS local_rep
  FROM d GROUP BY text, doc_id % 8),
reps AS (SELECT text, MIN(local_rep) AS rep FROM l1 GROUP BY text)
SELECT CAST(l1.local_rep AS BIGINT) AS a, CAST(d.doc_id AS BIGINT) AS b
FROM d JOIN l1 ON d.text = l1.text AND d.doc_id % 8 = l1.salt
WHERE d.doc_id <> l1.local_rep
UNION ALL
SELECT CAST(r.rep AS BIGINT) AS a, CAST(l1.local_rep AS BIGINT) AS b
FROM l1 JOIN reps r USING (text)
WHERE l1.local_rep <> r.rep
"""


def minhash_pairs_q(sf_dir: str, threshold: float = 0.35):
    """LSH candidates -> exact-Jaccard verified near-dup pairs.

    Rows-only check (signatures aren't SQL-expressible); determinism and
    precision are pytest-verified against brute-force Jaccard. Both the
    pair emission and the verification run distributed — no corpus text
    reaches the driver (stages/dedup.py verify_pairs_distributed).
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    cands = dedup_mod.candidate_pairs(ds, combine=False)
    out = dedup_mod.verify_pairs_distributed(cands, ds,
                                             threshold=threshold)
    out = out.to_pandas()
    out["a"] = out["a"].astype(np.int64)
    out["b"] = out["b"].astype(np.int64)
    out["jaccard"] = out["jaccard"].round(6)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def ngram_jaccard_pairs_q(sf_dir: str, threshold: float = 0.7):
    """Character-3-gram Jaccard near-dup pairs via MinHash-LSH blocking
    (rows-only; hashed-gram exactness sampled in tests).

    The quadratic presence-matrix kernel
    (dedup.char_ngram_jaccard_pairs) stays as the small-input verifier
    and test oracle; the wired query path blocks with LSH and verifies
    candidates with the char-n-gram set feature inside the distributed
    verify — no full-corpus driver read, no all-pairs matmul.

    Recall contract: blocking uses WORD-shingle MinHash, so a pair
    whose char-gram similarity clears the threshold while its word
    shingles are near-disjoint (e.g. heavy word reordering) is not a
    candidate and will not be emitted — the standard LSH recall trade,
    accepted for the scale path; the all-pairs kernel remains the
    exhaustive option for bounded inputs.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    cands = dedup_mod.candidate_pairs(ds, combine=False)
    out = dedup_mod.verify_pairs_distributed(
        cands, ds, threshold=threshold, feature="char_ngram")
    out = out.to_pandas()
    out["a"] = out["a"].astype(np.int64)
    out["b"] = out["b"].astype(np.int64)
    out["jaccard"] = out["jaccard"].round(6)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def dedup_minhash_keep_q(sf_dir: str, threshold: float = 0.35):
    """Full near-dup dedup decision table: every doc_id with its
    connected component and keep flag (rows-only). Streams: the corpus
    never materialises on the driver (only the sparse verified edge
    list does, for component labelling)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dedup_mod.minhash_dedup_keep(ds, threshold=threshold)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "component": df["component"].astype(np.int64),
            "keep": df["keep"].astype(bool)}),
        batch_format="pandas")


def simhash_pairs_q(sf_dir: str, max_hamming: int = 10):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = dedup_mod.simhash_pairs(ds, max_hamming=max_hamming)
    return pairs.map_batches(
        lambda df: pd.DataFrame({
            "a": df["a"].astype(np.int64), "b": df["b"].astype(np.int64),
            "hamming": df["hamming"].astype(np.int64)}),
        batch_format="pandas")


def fingerprint_q(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            # int64 view keeps the driver/pandas conversion lossless
            "fingerprint": tx.doc_fingerprint(df["text"])
                             .astype(np.uint64).astype(np.int64)})

    return ds.map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def text_quality_q(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "token_count": tx.token_count(df["text"]),
            "stop_count": tx.stopword_count(df["text"]),
            "alpha_ratio_ppm": tx.alpha_ratio_scaled(df["text"]),
        })

    return ds.map_batches(fn, batch_format="pandas")


def text_quality_sql() -> str:
    stops = ", ".join(f"'{w}'" for w in tx.QUALITY_STOPWORDS)
    return f"""
    SELECT doc_id,
      CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+'))
           END AS BIGINT) AS token_count,
      CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           w -> w IN ({stops}))) AS BIGINT) AS stop_count,
      CAST(floor(1e6 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                 / length(text)) AS BIGINT) AS alpha_ratio_ppm
    FROM documents
    """


def lang_id_q(sf_dir: str):
    """Heuristic language ID (rows-only; pytest-verified determinism)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "lang_pred": tx.predict_lang(df["text"])})

    return ds.map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# ANN
# ---------------------------------------------------------------------------

def ann_topk_q(sf_dir: str, k: int = 10, n_queries: int = 8):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qref = ann_mod.queries_ref_from_parquet(_p(sf_dir, "embeddings"),
                                            n_queries=n_queries)
    out = ann_mod.ann_topk(ds, qref, k=k)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "query_id": df["query_id"].astype(np.int64),
            "vec_id": df["vec_id"].astype(np.int64),
            "rank": df["rank"].astype(np.int64),
            "score_r": df["score"].round(4)}),
        batch_format="pandas")


def dedup_exact_salted_q(sf_dir: str):
    """Same result as dedup_exact via the skew-safe salted shuffle
    (checked against the SAME SQL oracle)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    agg = dedup_mod.exact_dedup_salted(ds)
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "text_hash": df["text_hash"],
            "keep_id": df["keep_id"].astype(np.int64),
            "n_dupes": df["n_dupes"].astype(np.int64)}),
        batch_format="pandas")


def embedding_neardup_q(sf_dir: str, threshold: float = 0.35):
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    Engine: per-batch normalized matmul against the broadcast full
    matrix (embeddings are the small side at <= ~1e6 rows; the LSH
    bucketed path is the scale variant, see stages/ann.py). SQL-oracled
    via list_cosine_similarity.
    """
    import pyarrow.parquet as pq

    import ray

    t = pq.read_table(_p(sf_dir, "embeddings"), columns=["vec_id",
                                                         "embedding"])
    ids = t["vec_id"].to_numpy()
    m = t["embedding"].combine_chunks().flatten().to_numpy() \
        .astype(np.float64).reshape(t.num_rows, -1)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    all_ref = ray.put({"ids": ids, "m": m})

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    class NearDup:
        def __init__(self, ref):
            d = ray.get(ref)
            self.ids = d["ids"]
            self.m = d["m"]

        def __call__(self, batch):
            import pyarrow as pa

            from ..stages.ann import _emb_matrix, _normalize

            if batch.num_rows == 0:
                return pa.table({"a": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64()),
                                 "cos_r": pa.array([], pa.int64())})
            x = _normalize(_emb_matrix(batch))
            bid = batch["vec_id"].to_numpy(zero_copy_only=False)
            s = x @ self.m.T
            r, c = np.nonzero(s >= threshold)
            a = bid[r]
            b = self.ids[c]
            keep = a < b
            return pa.table({
                "a": pa.array(a[keep], pa.int64()),
                "b": pa.array(b[keep], pa.int64()),
                "cosine_r": pa.array(np.round(s[r, c][keep], 4),
                                     pa.float64()),
            })

    return ds.map_batches(NearDup, fn_constructor_args=(all_ref,),
                          batch_format="pyarrow", concurrency=2,
                          num_cpus=0.5)


EMBEDDING_NEARDUP_SQL = """
SELECT a.vec_id AS a, b.vec_id AS b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4)
         AS cosine_r
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.35
"""


def ann_topk_lsh_q(sf_dir: str, k: int = 10, n_queries: int = 8):
    """Sign-LSH bucketed ANN (approximate scale path; rows-only —
    recall vs the exact path is pytest-measured)."""
    import pyarrow.parquet as pq

    t = pq.ParquetFile(_p(sf_dir, "embeddings"))
    dim = len(t.read_row_group(0)["embedding"][0])
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qref = ann_mod.queries_ref_from_parquet(_p(sf_dir, "embeddings"),
                                            n_queries=n_queries)
    out = ann_mod.ann_topk_lsh(ds, qref, dim=dim, k=k)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "query_id": df["query_id"].astype(np.int64),
            "vec_id": df["vec_id"].astype(np.int64),
            "rank": df["rank"].astype(np.int64),
            "score_r": df["score"].round(4)}),
        batch_format="pandas")


def ann_topk_ivf_q(sf_dir: str, k: int = 10, n_queries: int = 8,
                   n_probe: int = 10):
    """IVF-Flat ANN (k-means coarse quantizer; rows-only — recall floor
    vs the exact path is pytest-measured).

    n_probe default is high (10 of 32 cells) because the driver's
    synthetic embeddings are near-random (99.9th pct cosine ~0.38) —
    the worst case for a coarse quantizer; clustered real corpora
    reach the same recall with far fewer probes.
    """
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qref = ann_mod.queries_ref_from_parquet(_p(sf_dir, "embeddings"),
                                            n_queries=n_queries)
    cref = ann_mod.fit_ivf_centroids(_p(sf_dir, "embeddings"))
    out = ann_mod.ann_topk_ivf(ds, qref, cref, k=k, n_probe=n_probe)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "query_id": df["query_id"].astype(np.int64),
            "vec_id": df["vec_id"].astype(np.int64),
            "rank": df["rank"].astype(np.int64),
            "score_r": df["score"].round(4)}),
        batch_format="pandas")


def sample_docs_q(sf_dir: str, frac: float = 0.1, seed: int = 42):
    """Seeded random sampling (reference O1,
    pipeline/extraction.py:254-266). Rows-only: the sample is
    deterministic for a fixed seed+block layout but not SQL-reproducible."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    out = ds.random_sample(frac, seed=seed)
    return out.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["doc_id"].astype(np.int64)}),
        batch_format="pandas")


def media_features_q(sf_dir: str):
    """Multimodal decode stage over the pages' binary payload (stub
    decoder — see stages/multimodal.py). Rows-only check."""
    from ..pipelines.flagship import read_pages
    from ..sources import synth
    from ..stages import multimodal

    synth.ensure_synth(sf_dir)
    pages = read_pages(sf_dir).select_columns(["url", "html"]) \
        .rename_columns(["url", "payload"])
    out = multimodal.decode_media(pages)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        f0 = np.asarray([f[0] for f in df["features"]])
        return pd.DataFrame({
            "url": df["url"],
            "n_bytes": df["n_bytes"].astype(np.int64),
            "f0_ppm": np.floor(f0 * 1e6).astype(np.int64)})

    return out.map_batches(fin, batch_format="pandas")


def media_png_decode_q(sf_dir: str, hw: int = 24):
    """REAL image decode through the actor-pool media stage.

    Payloads are genuine baseline PNGs (one deterministic image per
    doc_id, encoded in-stream by the from-scratch RFC 2083 encoder) and
    the stage decodes them with the from-scratch decoder — zlib + numpy
    end to end, no codec library, nothing faked. Rows-only driver check;
    the encoder/decoder pair and all five scanline filters are
    golden-tested in tests/test_raster.py / test_multimodal.py.
    """
    from ..stages import multimodal
    from ..stages.raster import png_encode

    ds = _read(sf_dir, "documents", ["doc_id"])

    def make_payload(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.multimodal import fake_decode_image

        blobs = [png_encode(fake_decode_image(
            int(i).to_bytes(8, "little"), hw, hw)) for i in df["doc_id"]]
        return pd.DataFrame({"media_id": df["doc_id"].astype(np.int64),
                             "payload": blobs})

    media = ds.map_batches(make_payload, batch_format="pandas")
    out = multimodal.decode_media(media, decoder_cls=multimodal.PngImageDecoder)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "media_id": df["media_id"].astype(np.int64),
            "height": df["height"].astype(np.int64),
            "width": df["width"].astype(np.int64),
            "channels": df["channels"].astype(np.int64),
            "mean_r": df["mean_r"], "mean_g": df["mean_g"],
            "mean_b": df["mean_b"]}),
        batch_format="pandas")


def media_jpeg_decode_q(sf_dir: str, hw: int = 24):
    """REAL baseline-JPEG decode through the actor-pool media stage —
    the JPEG twin of :func:`media_png_decode_q`. Payloads are genuine
    baseline JPEGs (one deterministic image per doc_id, encoded
    in-stream by the from-scratch T.81 encoder at 4:4:4) and the stage
    decodes them with the from-scratch decoder — struct + numpy end to
    end, no codec library. Rows-only driver check; the codec's
    analytic flat-block goldens, 4:2:0 path, restart intervals and
    roundtrip error bounds are pinned in tests/test_jpeg.py.
    """
    from ..stages import multimodal
    from ..stages.jpeg import jpeg_encode

    ds = _read(sf_dir, "documents", ["doc_id"])

    def make_payload(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.multimodal import fake_decode_image

        blobs = [jpeg_encode(fake_decode_image(
            int(i).to_bytes(8, "little"), hw, hw), quality=90)
            for i in df["doc_id"]]
        return pd.DataFrame({"media_id": df["doc_id"].astype(np.int64),
                             "payload": blobs})

    media = ds.map_batches(make_payload, batch_format="pandas")
    out = multimodal.decode_media(media,
                                  decoder_cls=multimodal.JpegImageDecoder)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "media_id": df["media_id"].astype(np.int64),
            "height": df["height"].astype(np.int64),
            "width": df["width"].astype(np.int64),
            "channels": df["channels"].astype(np.int64),
            "mean_r": df["mean_r"], "mean_g": df["mean_g"],
            "mean_b": df["mean_b"]}),
        batch_format="pandas")


def media_jpeg_progressive_q(sf_dir: str):
    """REAL progressive-JPEG decode through the actor-pool media stage:
    payloads are genuine SOF2 streams (flat-gray frames at quality 100,
    muxed in-stream by the module's spectral-selection progressive
    encoder — interleaved DC scan + banded AC scans that are pure EOB
    runs) and the stage decodes them with the from-scratch T.81 §G
    progressive path. FULLY SQL-ORACLED: flat-gray q100 decodes
    bit-exactly (pinned in tests/test_jpeg_progressive.py), so every
    output column — including the per-channel means — is closed-form in
    doc_id."""
    from ..stages import multimodal
    from ..stages.jpeg import jpeg_encode_progressive

    ds = _read(sf_dir, "documents", ["doc_id"])

    def make_payload(df: pd.DataFrame) -> pd.DataFrame:
        blobs = []
        for i in df["doc_id"]:
            i = int(i)
            g = (53 * i) % 256
            w, h = 8 * (1 + i % 4), 8 * (1 + i % 3)
            blobs.append(jpeg_encode_progressive(
                np.full((h, w), g, dtype=np.uint8), quality=100))
        return pd.DataFrame({"media_id": df["doc_id"].astype(np.int64),
                             "payload": blobs})

    media = ds.map_batches(make_payload, batch_format="pandas")
    out = multimodal.decode_media(media,
                                  decoder_cls=multimodal.JpegImageDecoder)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "media_id": df["media_id"].astype(np.int64),
            "height": df["height"].astype(np.int64),
            "width": df["width"].astype(np.int64),
            "channels": df["channels"].astype(np.int64),
            "mean_r": df["mean_r"], "mean_g": df["mean_g"],
            "mean_b": df["mean_b"]}),
        batch_format="pandas")


MEDIA_JPEG_PROGRESSIVE_SQL = """
WITH b AS (
  SELECT doc_id AS media_id,
         (53 * doc_id) % 256 AS g,
         8 * (1 + doc_id % 4) AS w,
         8 * (1 + doc_id % 3) AS h
  FROM documents)
SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(h AS BIGINT) AS height,
       CAST(w AS BIGINT) AS width,
       CAST(1 AS BIGINT) AS channels,
       CAST(g AS DOUBLE) AS mean_r,
       CAST(g AS DOUBLE) AS mean_g,
       CAST(g AS DOUBLE) AS mean_b
FROM b
"""


def media_gif_decode_q(sf_dir: str):
    """REAL GIF decode through the actor-pool media stage: payloads are
    genuine GIF89a files (one per doc_id, LZW-compressed in-stream by
    the from-scratch encoder; every 2nd doc a 2-frame animation) and
    the stage decodes them with the from-scratch variable-width LZW
    decoder (stages/gif.py). FULLY SQL-ORACLED, exact-integer: GIF is
    lossless and the synthesized index pattern (x + 7y + d) mod nc is
    uniform over the palette because nc divides the width, so each
    channel sum is (w*h/nc) * sum(palette channel) — closed form in
    doc_id; one wrong pixel or palette entry flips the hash."""
    from ..stages import multimodal
    from ..stages.gif import gif_encode

    ds = _read(sf_dir, "documents", ["doc_id"])

    def make_payload(df: pd.DataFrame) -> pd.DataFrame:
        blobs = []
        for i in df["doc_id"]:
            i = int(i)
            nc = (4, 8, 16)[i % 3]
            w, h = nc * (1 + i % 3), 5 + i % 7
            ii = np.arange(nc, dtype=np.int64)
            pal = np.stack([(17 * ii + i) % 256, (29 * ii) % 256,
                            (31 * ii + 2 * i) % 256],
                           axis=1).astype(np.uint8)
            x = np.arange(w)[None, :]
            y = np.arange(h)[:, None]
            idx = ((x + 7 * y + i) % nc).astype(np.uint8)
            frames = [idx] if i % 2 == 0 else [idx, (idx + 1) % nc]
            blobs.append(gif_encode(frames, pal))
        return pd.DataFrame({"media_id": df["doc_id"].astype(np.int64),
                             "payload": blobs})

    media = ds.map_batches(make_payload, batch_format="pandas")
    out = multimodal.decode_media(media,
                                  decoder_cls=multimodal.GifImageDecoder)
    cols = ["media_id", "height", "width", "n_frames", "sum_r",
            "sum_g", "sum_b"]
    return out.map_batches(
        lambda df: df[cols].astype(np.int64), batch_format="pandas")


MEDIA_GIF_SQL = """
WITH b AS (
  SELECT doc_id AS media_id, doc_id AS d,
         CASE doc_id % 3 WHEN 0 THEN 4 WHEN 1 THEN 8 ELSE 16 END AS nc,
         CASE doc_id % 3 WHEN 0 THEN 4 WHEN 1 THEN 8 ELSE 16 END
           * (1 + doc_id % 3) AS w,
         5 + doc_id % 7 AS h
  FROM documents)
SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(h AS BIGINT) AS height,
       CAST(w AS BIGINT) AS width,
       CAST(1 + d % 2 AS BIGINT) AS n_frames,
       CAST((w * h // nc) * list_sum(list_transform(range(nc),
            i -> (17 * i + d) % 256)) AS BIGINT) AS sum_r,
       CAST((w * h // nc) * list_sum(list_transform(range(nc),
            i -> (29 * i) % 256)) AS BIGINT) AS sum_g,
       CAST((w * h // nc) * list_sum(list_transform(range(nc),
            i -> (31 * i + 2 * d) % 256)) AS BIGINT) AS sum_b
FROM b
"""


def media_wav_decode_q(sf_dir: str):
    """REAL audio decode through the actor-pool media stage — the WAV
    sibling of :func:`media_png_decode_q`. Payloads are genuine
    RIFF/WAVE PCM files (one deterministic square wave per doc_id,
    written in-stream by the from-scratch encoder) and the stage
    decodes them with the from-scratch parser (stages/audio.py) —
    struct + numpy end to end, no codec library.

    FULLY SQL-ORACLED, exact-integer: a square wave's peak, sum of
    squares and zero-crossing count are closed-form in the synthesis
    parameters (amplitude a, samples-per-half-period p, half-periods
    half, channels ch): peak = a, sumsq = ch * half * p * a^2,
    zcr = half - 1 — so the DuckDB oracle recomputes every output
    column with no float tolerance and a single mis-decoded sample
    flips the hash. Codec roundtrips (8/16/24/32-bit PCM, float32/64,
    extensible fmt, refusals) are pinned in tests/test_audio.py.
    """
    from ..stages import multimodal
    from ..stages.audio import WavAudioDecoder, wav_encode

    ds = _read(sf_dir, "documents", ["doc_id"])

    def make_payload(df: pd.DataFrame) -> pd.DataFrame:
        blobs = []
        for i in df["doc_id"]:
            i = int(i)
            p = 4 + i % 29
            half = 40 + 2 * (i % 13)
            a = 1000 + 37 * (i % 700)
            ch = 1 + i % 2
            c0 = np.tile(np.repeat(np.array([a, -a], dtype=np.int64), p),
                         half // 2)
            blobs.append(wav_encode(np.stack([c0] * ch, axis=1), 8000,
                                    bits=16))
        return pd.DataFrame({"media_id": df["doc_id"].astype(np.int64),
                             "payload": blobs})

    media = ds.map_batches(make_payload, batch_format="pandas")
    out = multimodal.decode_media(media, decoder_cls=WavAudioDecoder)
    cols = ["media_id", "sample_rate", "channels", "bits", "n_samples",
            "duration_us", "peak_q", "sumsq_q", "zcr_count"]
    return out.map_batches(
        lambda df: df[cols].astype(np.int64), batch_format="pandas")


MEDIA_WAV_SQL = """
WITH b AS (
  SELECT doc_id AS media_id,
         4 + doc_id % 29 AS p,
         40 + 2 * (doc_id % 13) AS half,
         1000 + 37 * (doc_id % 700) AS a,
         1 + doc_id % 2 AS ch
  FROM documents)
SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(ch AS BIGINT) AS channels,
       CAST(16 AS BIGINT) AS bits,
       CAST(half * p AS BIGINT) AS n_samples,
       CAST(half * p * 125 AS BIGINT) AS duration_us,
       CAST(a AS BIGINT) AS peak_q,
       CAST(ch * half * p * a * a AS BIGINT) AS sumsq_q,
       CAST(half - 1 AS BIGINT) AS zcr_count
FROM b
"""


def media_mjpeg_frames_q(sf_dir: str):
    """REAL video decode through the actor-pool media stage: payloads
    are genuine single-stream MJPEG AVI containers (one per doc_id,
    muxed in-stream: flat-gray frames -> from-scratch T.81 JPEG at
    quality 100 -> from-scratch RIFF 'AVI ' writer) and the stage
    parses the container and JPEG-decodes every 2nd frame
    (stages/video.py) — struct + numpy end to end, no codec library.

    FULLY SQL-ORACLED, exact-integer: flat-gray frames at quality 100
    decode bit-exactly (all-ones quant tables, DC-only blocks — pinned
    for all 256 gray values in tests/test_jpeg.py), so the oracle
    recomputes container metadata AND the decoded-luma sum over the
    sampled frames in closed form; one wrong pixel flips the hash.
    """
    from ..stages import multimodal
    from ..stages.video import MjpegVideoDecoder, avi_encode_mjpeg

    ds = _read(sf_dir, "documents", ["doc_id"])

    def make_payload(df: pd.DataFrame) -> pd.DataFrame:
        blobs = []
        for i in df["doc_id"]:
            i = int(i)
            nf = 3 + i % 6
            rate = (10, 20, 25)[i % 3]
            w, h = 16 * (1 + i % 3), 16 * (1 + i % 2)
            frames = [np.full((h, w), (37 * i + 11 * j) % 256,
                              dtype=np.uint8) for j in range(nf)]
            blobs.append(avi_encode_mjpeg(frames, rate=rate, quality=100))
        return pd.DataFrame({"media_id": df["doc_id"].astype(np.int64),
                             "payload": blobs})

    media = ds.map_batches(make_payload, batch_format="pandas")
    out = multimodal.decode_media(media, decoder_cls=MjpegVideoDecoder,
                                  batch_size=64)
    cols = ["media_id", "n_frames", "fps_milli", "width", "height",
            "duration_us", "n_sampled", "dec_w", "dec_h", "sum_y_q"]
    return out.map_batches(
        lambda df: df[cols].astype(np.int64), batch_format="pandas")


MEDIA_MJPEG_SQL = """
WITH b AS (
  SELECT doc_id AS media_id, doc_id,
         3 + doc_id % 6 AS nf,
         CASE doc_id % 3 WHEN 0 THEN 10 WHEN 1 THEN 20 ELSE 25 END AS rate,
         16 * (1 + doc_id % 3) AS w,
         16 * (1 + doc_id % 2) AS h
  FROM documents)
SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(nf AS BIGINT) AS n_frames,
       CAST(rate * 1000 AS BIGINT) AS fps_milli,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(nf * (1000000 // rate) AS BIGINT) AS duration_us,
       CAST((nf + 1) // 2 AS BIGINT) AS n_sampled,
       CAST(w AS BIGINT) AS dec_w,
       CAST(h AS BIGINT) AS dec_h,
       CAST(list_sum(list_transform(range(0, nf, 2),
                                    j -> (37 * doc_id + 11 * j) % 256))
            AS BIGINT) AS sum_y_q
FROM b
"""


def pii_scrub_q(sf_dir: str):
    """PII detection + redaction over documents (functions/pii.py —
    the RefinedWeb/ROOTS-style email/IP/phone scrub). Deterministic
    PII is injected into each doc's text IDENTICALLY on both sides
    (the url_dedup variant-injection pattern), then the Ray pipeline
    scrubs with Python re and the oracle with DuckDB RE2 using the
    SAME pattern strings — the value-hash compare on the redacted
    string pins engine-semantics parity, counts and replacement order
    end to end."""
    from ..functions import pii

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def inject(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].astype(np.int64)
        return pd.DataFrame({
            "doc_id": i,
            "text": (df["text"].astype(str)
                     + " contact u" + i.astype(str)
                     + "@mail" + (i % 7).astype(str)
                     + ".com or +1 555 01" + (i % 10).astype(str)
                     + " 99 from 10." + (i % 256).astype(str)
                     + ".0." + (i % 100).astype(str))})

    out = pii.pii_scrub(ds.map_batches(inject, batch_format="pandas"))
    cols = ["doc_id", "n_email", "n_ipv4", "n_phone", "redacted"]
    return out.map_batches(lambda df: df[cols], batch_format="pandas")


PII_SCRUB_SQL = """
WITH t AS (
  SELECT doc_id,
         text || ' contact u' || doc_id || '@mail' || (doc_id % 7)
              || '.com or +1 555 01' || (doc_id % 10)
              || ' 99 from 10.' || (doc_id % 256) || '.0.'
              || (doc_id % 100) AS text
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL}')) AS BIGINT)
         AS n_email,
       CAST(len(regexp_extract_all(text, '{IPV4}')) AS BIGINT)
         AS n_ipv4,
       CAST(len(regexp_extract_all(text, '{PHONE}')) AS BIGINT)
         AS n_phone,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{EMAIL}', '<EMAIL>', 'g'),
           '{IPV4}', '<IP>', 'g'),
         '{PHONE}', '<PHONE>', 'g') AS redacted
FROM t
"""


def _pii_sql() -> str:
    from ..functions import pii

    return PII_SCRUB_SQL.replace("{EMAIL}", pii.EMAIL_RE) \
        .replace("{IPV4}", pii.IPV4_RE).replace("{PHONE}", pii.PHONE_RE)


def url_filter_q(sf_dir: str):
    """RefinedWeb-style URL filtering (functions/urlfilter.py): domain
    blocklist with subdomain matching + banned-word rules, fixed
    verdict precedence. The synth world's URLs are clean, so the query
    injects deterministic hits IDENTICALLY on both sides (the url_dedup
    variant-injection pattern: every 6th URL gains a word-spiked copy,
    every 9th an 'ads.'-subdomain copy) — the oracle then checks real
    filter behavior, and the per-URL verdict strings are value-hashed.
    """
    import pyarrow as pa

    from ..functions import urlfilter
    from ..sources import synth
    from ..util import read_parquet_clean

    synth.ensure_synth(sf_dir)
    pages = read_parquet_clean(
        synth.table_path(sf_dir, "pages"), columns=["url"])

    def inject(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        num = df["url"].str[-10:].astype(np.int64)
        urls = [df["url"],
                df["url"][num % 6 == 0] + "/free-casino-bonus",
                df["url"][num % 9 == 0].str.replace(
                    "https://", "https://ads.", n=1)]
        return pa.table({"url": pa.array(pd.concat(urls,
                                                   ignore_index=True),
                                         pa.string())})

    ds = urlfilter.url_filter(
        pages.map_batches(inject, batch_format="pyarrow"),
        blocklist=["src1.example.org", "src3.example.org"],
        banned_words=["casino", "bonus"])
    return ds.map_batches(lambda df: df[["url", "verdict"]],
                          batch_format="pandas")


def url_filter_sql(d: str) -> str:
    return f"""
    WITH p AS (SELECT url FROM read_parquet('{d}/pages.parquet/*.parquet')),
    v AS (
      SELECT url FROM p
      UNION ALL
      SELECT url || '/free-casino-bonus' FROM p
      WHERE CAST(right(url, 10) AS BIGINT) % 6 = 0
      UNION ALL
      SELECT replace(url, 'https://', 'https://ads.') FROM p
      WHERE CAST(right(url, 10) AS BIGINT) % 9 = 0),
    h AS (SELECT url,
                 lower(coalesce(regexp_extract(url,
                     '^[a-zA-Z]+://([^/]+)', 1), '')) AS host
          FROM v)
    SELECT url,
           CASE WHEN host IN ('src1.example.org', 'src3.example.org')
                  OR host LIKE '%.src1.example.org'
                  OR host LIKE '%.src3.example.org'
                THEN 'blocked_domain'
                WHEN regexp_matches(lower(url), 'casino|bonus')
                THEN 'blocked_word'
                ELSE 'kept' END AS verdict
    FROM h
    """


def lm_perplexity_q(sf_dir: str):
    """CCNet-style LM quality scoring (stages/lm.py): fit an add-one
    smoothed bigram LM on the corpus (one pre-aggregated keyed
    exchange), broadcast it, score every doc's mean negative
    log-likelihood in one streaming pass. FULL SQL oracle: the DuckDB
    side refits the identical model (same whitespace tokenization as
    the top_tokens oracle, lag() for the bigram context) and emits the
    same floor(nll*1e4+0.5) quantization — fit and score are pinned
    end to end."""
    from ..stages import lm

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    model = lm.fit_bigram_model(ds)
    out = lm.score_perplexity(ds, model)
    cols = ["doc_id", "n_tokens", "nll_c"]
    return out.map_batches(lambda df: df[cols].astype(np.int64),
                           batch_format="pandas")


LM_PERPLEXITY_SQL = r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE trim(text) <> ''),
tok AS (
  SELECT doc_id, unnest(toks) AS w,
         unnest(range(1, len(toks) + 1)) AS pos
  FROM d),
tok2 AS (
  SELECT doc_id, pos, w,
         lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM tok),
uni AS (SELECT w, count(*) AS c FROM tok2 GROUP BY w),
tot AS (SELECT (SELECT count(*) FROM tok2) AS n,
               (SELECT count(*) FROM uni) AS v),
big AS (SELECT prev, w, count(*) AS c FROM tok2
        WHERE prev IS NOT NULL GROUP BY prev, w),
lp AS (
  SELECT t.doc_id,
         CASE WHEN t.prev IS NULL
           THEN ln(u.c + 1) - ln(tot.n + tot.v)
           ELSE ln(coalesce(b.c, 0) + 1) - ln(up.c + tot.v)
         END AS lp
  FROM tok2 t
  CROSS JOIN tot
  LEFT JOIN uni u ON u.w = t.w
  LEFT JOIN big b ON b.prev = t.prev AND b.w = t.w
  LEFT JOIN uni up ON up.w = t.prev)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(floor(-sum(lp) / count(*) * 10000 + 0.5) AS BIGINT) AS nll_c
FROM lp GROUP BY doc_id
"""


ANN_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings ORDER BY vec_id LIMIT 8),
s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS score
  FROM q CROSS JOIN embeddings e)
SELECT query_id, vec_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, vec_id) AS BIGINT) AS rank,
       ROUND(score, 4) AS score_r
FROM s
QUALIFY rank <= 10
"""


def sample_docs_hash_q(sf_dir: str, pct: int = 10):
    """Deterministic hash sampling — the SQL-reproducible O1 variant
    (reference seeded sampling, pipeline/extraction.py:254-266).

    Membership is a pure function of the row key (32-bit LCG step on
    doc_id), so the sample is stable under any repartitioning, resume,
    or engine — the property a 100 TB pipeline needs so re-runs and
    backfills pick the same rows. All arithmetic stays below 2^63
    ((2^32-1) * 1103515245 < 2^63), so int64 on both engines is exact.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    from ..util import lcg32

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        keep = (lcg32(df["doc_id"].to_numpy(np.int64)) % 100) < pct
        out = df.loc[keep]
        return pd.DataFrame({
            "doc_id": out["doc_id"].astype(np.int64),
            "lang": out["lang"],
            "n_chars": out["n_chars"].astype(np.int64),
        })

    return ds.map_batches(pick, batch_format="pandas")


SAMPLE_DOCS_HASH_SQL = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE ((doc_id % 4294967296) * 1103515245 + 12345) % 4294967296 % 100 < 10
"""


STRATA_PCT = {"en": 5, "de": 20, "fr": 20, "es": 50, "zh": 100}


def stratified_sample_q(sf_dir: str):
    """Stratified deterministic sampling: per-language keep rates
    (downsample the dominant stratum, keep all of the rare ones) — the
    standard training-data rebalance. Membership is the same
    repartition-stable LCG hash as sample_docs_hash, thresholded per
    stratum, so the sample is reproducible under resume/backfill and
    SQL-checkable."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    from ..util import lcg32

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        h = lcg32(df["doc_id"].to_numpy(np.int64)) % 100
        pct = df["lang"].map(STRATA_PCT).fillna(0).to_numpy(np.int64)
        out = df.loc[h < pct]
        return pd.DataFrame({
            "doc_id": out["doc_id"].astype(np.int64),
            "lang": out["lang"],
            "n_chars": out["n_chars"].astype(np.int64),
        })

    return ds.map_batches(pick, batch_format="pandas")


STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE ((doc_id % 4294967296) * 1103515245 + 12345) % 4294967296 % 100
      < CASE lang WHEN 'en' THEN 5 WHEN 'de' THEN 20 WHEN 'fr' THEN 20
                  WHEN 'es' THEN 50 WHEN 'zh' THEN 100 ELSE 0 END
"""


def dedup_minhash_keep_distributed_q(sf_dir: str, threshold: float = 0.35):
    """The zero-driver-materialization keep table (bucketed label
    propagation + left join; stages/dedup.py
    minhash_dedup_keep_distributed). Rows-only; equality with the
    broadcast variant is pytest-verified."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dedup_mod.minhash_dedup_keep_distributed(ds, threshold=threshold)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "component": df["component"].astype(np.int64),
            "keep": df["keep"].astype(bool)}),
        batch_format="pandas")


def pack_sequences_q(sf_dir: str, seq_tokens: int = 2048,
                     n_ranges: int = 64, token_table: str = "recompute"):
    """Sequence packing for LLM training: assign each document (in
    doc_id order) to the fixed-token-budget training sequence its
    running token offset falls in — i.e. an ORDERED GLOBAL PREFIX SUM,
    the one aggregate shape a plain groupby cannot express.

    Distributed scan in two small exchanges (no global sort of the
    corpus): documents range-bucket by ``doc_id // step``; stage 1
    partial-sums tokens per bucket (tiny table -> driver exclusive
    scan -> broadcast offsets); stage 2 is one groupby(bucket) where
    each bucket sorts its own id range and adds its broadcast base
    offset to a vectorized cumsum. Every value is a pure function of
    the doc set — stable under any block layout.

    The narrow (doc_id, n_tokens, __rb) table is consumed by BOTH
    stages. ``token_table`` picks how:
    - ``"recompute"`` (default): lazy — tokenization re-executes once
      per consumer. Zero pinned state (a ``materialize()`` here was the
      engine's only corpus-sized pin: 24 B/doc ~ 2.4 TB of object store
      at 1e11 docs), at the cost of one extra streaming tokenize pass.
    - ``"pin"``: ``materialize()`` — one tokenize pass, object-store
      (spillable) pin; right when token counting dominates.
    - ``"stage"``: write the table to scratch parquet once, read it
      twice — one tokenize pass, disk instead of object store.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    max_id = int(rd.read_parquet(_p(sf_dir, "documents"),
                                 columns=["doc_id"]).max("doc_id"))
    step = max(1, (max_id + n_ranges) // n_ranges)

    def tokens_and_bucket(t) -> "pa.Table":
        # declared-pyarrow: on the recompute path this stage FUSES into
        # the groupby's map phase, and a pandas-DECLARED fused stage
        # pays ~10x (exact_dedup notes); the pandas hop stays inside
        import pyarrow as pa

        df = t.to_pandas()
        ids = df["doc_id"].to_numpy(np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(tx.token_count(df["text"]).to_numpy()),
            "__rb": pa.array(ids // step),
        })

    toks = ds.map_batches(tokens_and_bucket, batch_format="pyarrow")
    if token_table == "pin":
        toks = toks.materialize()
    elif token_table == "stage":
        import tempfile

        from .. import util

        stage_dir = tempfile.mkdtemp(prefix="pack_toks_",
                                     dir="/tmp")
        toks.write_parquet(stage_dir)
        toks = util.read_parquet_clean(stage_dir)

    # stage 1: per-bucket token sums -> driver exclusive scan (one row
    # per range bucket — n_ranges rows, never the doc stream)
    sums = toks.groupby("__rb").sum("n_tokens").to_pandas() \
        .sort_values("__rb")
    base = np.concatenate([[0], np.cumsum(
        sums["sum(n_tokens)"].to_numpy())[:-1]]).astype(np.int64)
    base_map = dict(zip(sums["__rb"].astype(int), base))  # <= n_ranges rows

    def assign_seq(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable")
        nt = g["n_tokens"].to_numpy(np.int64)
        start = base_map[int(g["__rb"].iloc[0])] + np.cumsum(nt) - nt
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype(np.int64),
            "n_tokens": nt,
            "seq_id": (start // seq_tokens).astype(np.int64),
        })

    return toks.groupby("__rb").map_groups(assign_seq,
                                           batch_format="pandas")


PACK_SEQUENCES_SQL = """
SELECT doc_id, n_tokens,
       CAST((cum - n_tokens) // 2048 AS BIGINT) AS seq_id
FROM (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum
  FROM (SELECT doc_id,
               CAST(CASE WHEN trim(text) = '' THEN 0
                         ELSE len(regexp_split_to_array(trim(text),
                                                        '\\s+'))
                    END AS BIGINT) AS n_tokens
        FROM documents))
"""


def media_thumbs_q(sf_dir: str):
    """Stub-decode -> REAL bilinear 4x4 thumbnail over the pages'
    binary payload (rows-only; resize kernel dual-oracled in
    tests/test_multimodal.py against a per-pixel loop)."""
    from ..pipelines.flagship import read_pages
    from ..sources import synth
    from ..stages import multimodal

    synth.ensure_synth(sf_dir)
    pages = read_pages(sf_dir).select_columns(["url", "html"]) \
        .rename_columns(["url", "payload"])
    out = multimodal.media_thumbs(pages)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "url": df["url"],
            "mean_r_ppm": np.floor(df["mean_r"] * 1e6).astype(np.int64),
            "mean_g_ppm": np.floor(df["mean_g"] * 1e6).astype(np.int64),
            "mean_b_ppm": np.floor(df["mean_b"] * 1e6).astype(np.int64)}),
        batch_format="pandas")


def media_frames_q(sf_dir: str):
    """Frame-sample explode over the pages' binary payload (one row
    per sampled frame; rows-only)."""
    from ..pipelines.flagship import read_pages
    from ..sources import synth
    from ..stages import multimodal

    synth.ensure_synth(sf_dir)
    pages = read_pages(sf_dir).select_columns(["url", "html"]) \
        .rename_columns(["media_id", "payload"])
    out = multimodal.media_frames(pages)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "media_id": df["media_id"],
            "frame_index": df["frame_index"].astype(np.int64),
            "f0_ppm": np.floor(np.asarray(
                [f[0] for f in df["features"]]) * 1e6).astype(np.int64)}),
        batch_format="pandas")


def ann_topk_ivf_partitioned_q(sf_dir: str, k: int = 10, n_queries: int = 8,
                               n_probe: int = 10):
    """True inverted-file IVF: vectors shuffle to centroid cells,
    queries score only probed partitions (rows-only; pytest-equal to
    the scan-with-mask IVF at the same n_probe)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qref = ann_mod.queries_ref_from_parquet(_p(sf_dir, "embeddings"),
                                            n_queries=n_queries)
    cref = ann_mod.fit_ivf_centroids(_p(sf_dir, "embeddings"))
    out = ann_mod.ann_topk_ivf_partitioned(ds, qref, cref, k=k,
                                           n_probe=n_probe)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "query_id": df["query_id"].astype(np.int64),
            "vec_id": df["vec_id"].astype(np.int64),
            "rank": df["rank"].astype(np.int64),
            "score_r": df["score"].round(4)}),
        batch_format="pandas")


def decontaminate_q(sf_dir: str, n_bench: int = 5,
                    snip_start: int = 10, snip_len: int = 40):
    """Benchmark decontamination: flag every document containing any
    benchmark snippet as a literal substring — the standard eval-leak
    check of an LLM training pipeline (the benchmark side here is
    derived from the first ``n_bench`` docs, so the oracle can derive
    the identical snippets in SQL).

    Broadcast-small-side topology with a SINGLE-PASS kernel: the
    snippet list ships once via ``ray.put``; each actor builds a
    :class:`functions.match.SnippetMatcher` (the Aho-Corasick-class
    automaton analogue — vectorized Rabin-Karp fingerprint tables) once
    in ``__init__``, then every batch is ONE rolling-hash pass per
    distinct snippet length, O(corpus) independent of K. Output pairs
    are exact (hash hits verify by byte comparison), identical to the
    per-snippet scan and to the SQL position oracle.
    """
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_

    import ray

    from ..functions.match import SnippetMatcher
    from ..util import clamp_concurrency

    bench = pq_.read_table(_p(sf_dir, "documents"),
                           columns=["doc_id", "text"])
    bench = bench.filter(pc_.less(bench["doc_id"], n_bench))
    snips = [(int(i), str(t)[snip_start:snip_start + snip_len])
             for i, t in zip(bench["doc_id"].to_pylist(),
                             bench["text"].to_pylist())]
    snips_ref = ray.put(snips)

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    class Decontaminator:
        def __init__(self, ref):
            self.matcher = SnippetMatcher(ray.get(ref))

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            rows, sids = self.matcher.find_in_batch(df["text"].tolist())
            return pd.DataFrame({
                "doc_id": df["doc_id"].to_numpy(np.int64)[rows],
                "snip_id": sids})

    return ds.map_batches(
        Decontaminator, fn_constructor_args=(snips_ref,),
        batch_format="pandas",
        concurrency=clamp_concurrency(4, 0.5), num_cpus=0.5)


DECONTAMINATE_SQL = """
WITH snip AS (
  SELECT doc_id AS snip_id, substring(text, 11, 40) AS s
  FROM documents WHERE doc_id < 5)
SELECT d.doc_id, snip.snip_id
FROM documents d, snip
WHERE length(snip.s) > 0 AND position(snip.s IN d.text) > 0
"""


def _text_hash_bucket(text_hash, n_buckets: int) -> np.ndarray:
    """Shared routing hash for text_hash-keyed exchanges (incremental
    dedup plain + bloom MUST agree — they share one SQL oracle)."""
    return pd.util.hash_array(np.asarray(text_hash, dtype=object)) \
        .astype(np.int64) % np.int64(n_buckets)


def _incremental_anti_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket exact anti-join kernel shared by dedup_incremental_q
    and dedup_incremental_bloom_q: the earliest NEW doc per hash
    survives iff the hash is absent from the OLD side."""
    seen = set(g.loc[g["is_new"] == 0, "text_hash"])
    new = g.loc[g["is_new"] == 1].sort_values("doc_id") \
        .drop_duplicates("text_hash")
    keep = new.loc[~new["text_hash"].isin(seen)]
    return pd.DataFrame({
        "doc_id": keep["doc_id"].astype(np.int64),
        "text_hash": keep["text_hash"]})


def dedup_incremental_q(sf_dir: str, split_id: int = 250):
    """Incremental ingest dedup: documents arriving in a NEW shard
    (doc_id >= split) survive only if their content hash appears
    neither in the already-ingested corpus (doc_id < split) nor earlier
    within the new shard itself — the continuous-crawl ingest shape
    (dedupe each delivery against the accumulated corpus manifest).

    Both sides stream: the existing corpus contributes only per-batch
    pre-deduped (hash) rows and the two sides meet in ONE bucketed
    exchange (the orders_without_lineitem anti-join machinery keyed on
    a hash instead of an int). At 100 TB the 'old' side is the keep
    MANIFEST parquet, not a rescan — same operator either way.
    """
    from ..stages.dedup import add_text_hash

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_buckets = 16

    def prep(batch) -> "pd.DataFrame":
        import pyarrow as pa

        out = add_text_hash(batch.to_pandas())[["doc_id", "text_hash"]]
        out["is_new"] = (out["doc_id"] >= split_id).astype(np.int64)
        # old side: only distinct hashes per batch need to travel
        old = out.loc[out["is_new"] == 0].drop_duplicates("text_hash")
        new = out.loc[out["is_new"] == 1]
        out = pd.concat([old, new], ignore_index=True)
        bucket = _text_hash_bucket(out["text_hash"].to_numpy(dtype=object),
                                   n_buckets)
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(dtype=np.int64)),
            "text_hash": pa.array(out["text_hash"], pa.string()),
            "is_new": pa.array(out["is_new"].to_numpy(dtype=np.int64)),
            "__bucket": pa.array(bucket)})

    return ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(_incremental_anti_bucket,
                                        batch_format="pandas")


DEDUP_INCREMENTAL_SQL = """
WITH hashed AS (SELECT doc_id, md5(text) AS text_hash FROM documents),
     old AS (SELECT DISTINCT text_hash FROM hashed WHERE doc_id < 250),
     new_first AS (
       SELECT text_hash, MIN(doc_id) AS doc_id
       FROM hashed WHERE doc_id >= 250 GROUP BY text_hash)
SELECT n.doc_id, n.text_hash
FROM new_first n
WHERE n.text_hash NOT IN (SELECT text_hash FROM old)
"""


def dedup_incremental_bloom_q(sf_dir: str, split_id: int = 250):
    """Incremental dedup with a BLOOM PREFILTER — same output (and same
    SQL oracle) as :func:`dedup_incremental_q`, different data movement:

    1. Build a mergeable Bloom bitmap over the OLD corpus's content
       hashes (per-block partial bitmaps OR-combined — the exchange is
       bounded by block count, never by corpus cardinality).
    2. Stream the NEW shard once, marking bloom-positive rows as
       duplicate CANDIDATES; build a second bloom over just the
       candidate hashes.
    3. The exact bucketed anti-join then moves all new rows plus ONLY
       the old rows that hit the candidate bloom — at a typical ingest
       (most of the new shard is genuinely new, dup overlap is small)
       the old side ships a sliver of its hashes instead of all of
       them. Blooms never false-negative, so the exact check sees every
       true duplicate; false positives only add a few spurious old rows
       to the exchange. Output is EXACT either way.
    """
    from ..stages.dedup import add_text_hash
    from ..stages.sketch import bloom_contains, bloom_of_dataset, hex_to_u64

    n_buckets = 16

    def read_side(new: bool):
        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        expr = f"doc_id >= {split_id}" if new else f"doc_id < {split_id}"
        return ds.filter(expr=expr)

    def hash_keys(df: pd.DataFrame) -> np.ndarray:
        return hex_to_u64(add_text_hash(df)["text_hash"])

    bloom_old = bloom_of_dataset(read_side(False), hash_keys)
    import ray

    bloom_old_ref = ray.put(bloom_old)

    def cand_keys(df: pd.DataFrame) -> np.ndarray:
        keys = hash_keys(df)
        return keys[bloom_contains(ray.get(bloom_old_ref), keys)]

    bloom_cand_ref = ray.put(bloom_of_dataset(read_side(True), cand_keys))

    def prep_new(df: pd.DataFrame) -> pd.DataFrame:
        out = add_text_hash(df)[["doc_id", "text_hash"]]
        out["is_new"] = np.int64(1)
        return out

    def prep_old(df: pd.DataFrame) -> pd.DataFrame:
        out = add_text_hash(df)[["doc_id", "text_hash"]]
        keys = hex_to_u64(out["text_hash"])
        out = out.loc[bloom_contains(ray.get(bloom_cand_ref), keys)]
        out = out.drop_duplicates("text_hash")
        out["is_new"] = np.int64(0)
        return out

    both = read_side(True).map_batches(prep_new, batch_format="pandas") \
        .union(read_side(False).map_batches(prep_old,
                                            batch_format="pandas"))

    def bucketize(batch) -> "pd.DataFrame":
        import pyarrow as pa

        df = batch.to_pandas()
        bucket = _text_hash_bucket(df["text_hash"].to_numpy(dtype=object),
                                   n_buckets)
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(dtype=np.int64)),
            "text_hash": pa.array(df["text_hash"], pa.string()),
            "is_new": pa.array(df["is_new"].to_numpy(dtype=np.int64)),
            "__bucket": pa.array(bucket)})

    return both.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(_incremental_anti_bucket,
                                        batch_format="pandas")


def text_repetition_q(sf_dir: str):
    """Token repetition ratio per document (1 - distinct/total tokens,
    floor-ppm) — the repetitive-boilerplate quality signal of LLM data
    filtering. Distinct-per-doc counts come from ONE factorize pass
    over the whole batch (codes) + a vectorized per-segment unique
    count — no per-doc python set.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    import re

    ws_re = re.compile(r"\s+")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].tolist()
        tok_lists = [ws_re.split(t.strip()) if t.strip() else []
                     for t in texts]
        n = len(texts)
        n_tok = np.asarray([len(ws) for ws in tok_lists], dtype=np.int64)
        # factorize CODES are exact token identity (a hash would
        # undercount on collisions vs the SQL's list_distinct)
        flat = np.asarray([w for ws in tok_lists for w in ws],
                          dtype=object)
        codes = pd.factorize(flat, sort=False)[0] if len(flat) \
            else np.empty(0, dtype=np.int64)
        # unique tokens per doc: sort (doc, code) pairs once, count
        # boundaries per segment
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), n_tok)
        order = np.lexsort((codes, doc_idx))
        d_s, h_s = doc_idx[order], codes[order]
        if len(d_s):
            new = np.empty(len(d_s), dtype=bool)
            new[0] = True
            new[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
            n_distinct = np.bincount(d_s[new], minlength=n).astype(np.int64)
        else:
            n_distinct = np.zeros(n, dtype=np.int64)
        rep = np.zeros(n, dtype=np.int64)
        nz = n_tok > 0
        rep[nz] = np.floor(
            1e6 * (1.0 - n_distinct[nz] / n_tok[nz])).astype(np.int64)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64).to_numpy(),
            "n_tokens": n_tok,
            "n_distinct": n_distinct,
            "rep_ppm": rep,
        })

    return ds.map_batches(fn, batch_format="pandas")


TEXT_REPETITION_SQL = """
SELECT doc_id,
  CAST(CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
       END AS BIGINT) AS n_tokens,
  CAST(CASE WHEN trim(text) = '' THEN 0
            ELSE len(list_distinct(regexp_split_to_array(trim(text),
                                                         '\\s+')))
       END AS BIGINT) AS n_distinct,
  CAST(CASE WHEN trim(text) = '' THEN 0
            ELSE floor(1e6 * (1.0 -
                 CAST(len(list_distinct(regexp_split_to_array(
                      trim(text), '\\s+'))) AS DOUBLE)
                 / len(regexp_split_to_array(trim(text), '\\s+'))))
       END AS BIGINT) AS rep_ppm
FROM documents
"""


def url_dedup_q(sf_dir: str):
    """URL-normalization dedup — the crawl-frontier staple: strip the
    fragment and query string, lowercase scheme://host (RFC 3986 §6.2.2
    case normalization; path case is significant and kept), drop
    trailing slashes, then keep one row per normalized URL.

    The synth pages world has clean unique URLs, so the query injects
    deterministic variants IDENTICALLY on both sides (every 3rd page a
    '#section' copy, every 5th a '?utm_source=feed' copy, every 7th an
    UPPERCASED-host copy with a trailing '/') — the oracle then checks
    the normalizer's actual behavior, not a no-op. Output:
    (norm_url, keep_url = lexicographic min variant, n_variants).
    One keyed exchange (Arrow-block groupby; exact_dedup shape).
    """
    import pyarrow as pa
    from ray.data.aggregate import Count, Min

    from ..sources import synth
    from ..util import read_parquet_clean

    synth.ensure_synth(sf_dir)
    pages = read_parquet_clean(
        synth.table_path(sf_dir, "pages"), columns=["url"])

    def inject_and_normalize(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        num = df["url"].str[-10:].astype(np.int64)
        urls = [df["url"]]
        urls.append(df["url"][num % 3 == 0] + "#section")
        urls.append(df["url"][num % 5 == 0] + "?utm_source=feed")
        m7 = num % 7 == 0
        ph = df["url"][m7].str.extract(r"^([a-zA-Z]+://[^/]*)(.*)$")
        urls.append(ph[0].str.upper() + ph[1] + "/")
        s = pd.concat(urls, ignore_index=True)
        base = s.str.split("#").str[0].str.split("?").str[0]
        parts = base.str.extract(r"^([a-zA-Z]+://[^/]*)(.*)$")
        norm = parts[0].str.lower() \
            + parts[1].str.replace(r"/+$", "", regex=True)
        return pa.table({"url": pa.array(s, pa.string()),
                         "norm_url": pa.array(norm, pa.string())})

    agg = pages.map_batches(inject_and_normalize, batch_format="pyarrow") \
        .groupby("norm_url").aggregate(
            Min("url", alias_name="keep_url"),
            Count(alias_name="n_variants"))
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "norm_url": df["norm_url"],
            "keep_url": df["keep_url"],
            "n_variants": df["n_variants"].astype(np.int64)}),
        batch_format="pandas")


def url_dedup_sql(d: str) -> str:
    return f"""
    WITH p AS (SELECT url FROM read_parquet('{d}/pages.parquet/*.parquet')),
    v AS (
      SELECT url FROM p
      UNION ALL
      SELECT url || '#section' FROM p
      WHERE CAST(right(url, 10) AS BIGINT) % 3 = 0
      UNION ALL
      SELECT url || '?utm_source=feed' FROM p
      WHERE CAST(right(url, 10) AS BIGINT) % 5 = 0
      UNION ALL
      SELECT upper(concat(split_part(url, '://', 1), '://',
                          split_part(split_part(url, '://', 2), '/', 1)))
             || substr(url, length(concat(split_part(url, '://', 1), '://',
                       split_part(split_part(url, '://', 2), '/', 1))) + 1)
             || '/'
      FROM p WHERE CAST(right(url, 10) AS BIGINT) % 7 = 0),
    n AS (
      SELECT url,
             lower(concat(split_part(b, '://', 1), '://',
                          split_part(split_part(b, '://', 2), '/', 1)))
             || regexp_replace(
                  substr(b, length(concat(split_part(b, '://', 1), '://',
                         split_part(split_part(b, '://', 2), '/', 1))) + 1),
                  '/+$', '') AS norm_url
      FROM (SELECT url, split_part(split_part(url, '#', 1), '?', 1) AS b
            FROM v))
    SELECT norm_url, MIN(url) AS keep_url,
           CAST(COUNT(*) AS BIGINT) AS n_variants
    FROM n GROUP BY norm_url
    """


def domain_stats_q(sf_dir: str):
    """Per-domain rollup over the page stream (the crawl-curation
    'host budget' view: pages and text volume per registered host).
    Vectorized netloc split + per-batch partial aggregate; the
    exchange carries one row per (domain, batch). Oracle reads the
    same synth pages parquet with DuckDB string functions."""
    from ..sources import synth

    synth.ensure_synth(sf_dir)
    from ..util import read_parquet_clean

    pages = read_parquet_clean(
        synth.table_path(sf_dir, "pages"), columns=["url", "text"])

    import pyarrow as pa

    n_buckets = 32

    def partial(batch) -> "pa.Table":
        # declared-pyarrow: feeds the keyed exchange (module rule)
        df = batch.to_pandas()
        domain = df["url"].str.split("/").str[2]
        chars = df["text"].str.len().astype(np.int64)
        g = pd.DataFrame({"domain": domain, "chars": chars}) \
            .groupby("domain", sort=False) \
            .agg(n=("chars", "size"), c=("chars", "sum")).reset_index()
        # domain-hash bucket: host cardinality is unbounded on a real
        # crawl, so the combine must be keyed, not a repartition(1)
        # funnel whose input is domains x batches
        from ..util import route_hash64

        g["__hb"] = route_hash64(g["domain"].to_numpy()) \
            % np.int64(n_buckets)
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop(columns="__hb").groupby("domain", sort=False) \
            .sum().reset_index()
        return pd.DataFrame({
            "domain": g["domain"],
            "n_pages": g["n"].astype(np.int64),
            "sum_chars": g["c"].astype(np.int64),
        })

    return pages.map_batches(partial, batch_format="pyarrow") \
        .groupby("__hb").map_groups(finish, batch_format="pandas")


def domain_stats_sql(d: str) -> str:
    return f"""
    SELECT split_part(url, '/', 3) AS domain,
           CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(SUM(length(text)) AS BIGINT) AS sum_chars
    FROM read_parquet('{d}/pages.parquet/*.parquet')
    GROUP BY domain
    """


# ---------------------------------------------------------------------------
# Duplicate-shingle coverage (dup-span analysis, RefinedWeb/C4-style)
# ---------------------------------------------------------------------------

def dup_shingles_q(sf_dir: str, k: int = 5, n_buckets: int = 32,
                   oracle_exact: bool = False):
    """Per-doc duplicate-k-shingle coverage: what fraction of each doc's
    distinct word-5-shingles also appear in ANOTHER document.

    The corpus-level dup-span statistic behind C4/RefinedWeb-style
    "remove documents made of boilerplate" filters (Penedo et al. 2023,
    arXiv:2306.01116 §4; Lee et al. 2022, arXiv:2107.06499 use exact
    substring spans — word shingles are the bounded-memory analogue).

    Plan: explode (doc_id, shingle-key) distinct-per-doc -> hash-bucket
    the key (ONE exchange; per-bucket kernel is a single vectorized
    transform('size'), never per-shingle Python, and PRE-AGGREGATES per
    doc so the second exchange carries one row per (doc, bucket)) ->
    per-doc sum (second keyed exchange) -> ppm finalize.

    THE EXCHANGE KEY IS A 64-BIT CONTENT HASH by default (blake2b-8 of
    the shingle bytes): only 8 bytes per shingle ride the shuffle, and
    collision odds are ~n^2/2^65 — the 100 TB path. With
    ``oracle_exact=True`` the shingle STRING is carried instead so the
    DuckDB LATERAL-shingle oracle matches bit-for-bit with zero hash
    assumption (the gate entry uses this); a pytest asserts both key
    modes produce identical output at test scale. Every stage emits
    ARROW blocks: Ray's sort-aggregate is vectorized on Arrow but
    per-group python on pandas blocks (measured 19 s -> 1.5 s on this
    very query's final aggregate).
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    key_col = "shingle" if oracle_exact else "shingle_h"

    def explode(batch: pa.Table) -> pa.Table:
        # declared-pyarrow: a pandas-declared stage fused into the
        # shuffle map phase pays ~10x (see exact_dedup docstring)
        df = batch.to_pandas()
        if oracle_exact:
            # string shingles so the DuckDB LATERAL oracle is exact
            import zlib

            doc_ids: list[int] = []
            shingles: list[str] = []
            for did, t in zip(df["doc_id"], df["text"]):
                sh = tx.doc_shingles(t, k)
                doc_ids.extend([did] * len(sh))
                shingles.extend(sh)
            # route on a content hash (NOT python hash(): must be
            # stable across workers); one crc32 per unique shingle
            codes, uniq = pd.factorize(pd.Series(shingles, dtype=object),
                                       sort=False)
            uh = np.asarray([zlib.crc32(u.encode("utf-8")) for u in uniq],
                            dtype=np.int64)
            return pa.table({
                "doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64)),
                "shingle": pa.array(shingles, pa.string()),
                "bucket": pa.array(uh[codes] % np.int64(n_buckets))})
        # DEFAULT (engine) path: fully numeric — shingle keys come from
        # a vectorized rolling mix of token crc32s over the batch's
        # flat token array (no shingle STRING is ever built); windows
        # crossing a doc boundary are masked out, per-doc distinctness
        # falls out of one (doc, hash) lexsort + boundary dedup
        from ..sources.synth import splitmix64
        from ..stages.dedup import _SHINGLE_C, _batch_token_hashes

        flat, segs = _batch_token_hashes(df["text"].tolist())
        n_docs = len(segs) - 1
        T = int(segs[-1])
        ids = df["doc_id"].to_numpy().astype(np.int64)
        if T < k:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "shingle_h": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64())})
        consts = list(_SHINGLE_C) + [np.uint64(0x2545F4914F6CDD1D),
                                     np.uint64(0x9E6C63D0876A9A35)]
        with np.errstate(over="ignore"):
            acc = np.zeros(T - k + 1, dtype=np.uint64)
            for j in range(k):
                acc = acc + np.uint64(consts[j]) * flat[j: T - k + 1 + j]
            h = splitmix64(acc).view(np.int64)
        # window i belongs to the doc containing i..i+k-1 entirely
        win_doc = np.searchsorted(segs, np.arange(T - k + 1),
                                  side="right") - 1
        valid = np.arange(T - k + 1) + k <= segs[win_doc + 1]
        d = win_doc[valid]
        h = h[valid]
        order = np.lexsort((h, d))
        d, h = d[order], h[order]
        if len(d):
            first = np.empty(len(d), dtype=bool)
            first[0] = True
            first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
            d, h = d[first], h[first]
        return pa.table({
            "doc_id": pa.array(ids[d]),
            "shingle_h": pa.array(h),
            "bucket": pa.array(h % np.int64(n_buckets))})

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        # rows are distinct per (doc, shingle), so group size == number
        # of docs containing the shingle; pre-aggregate per doc before
        # the exchange
        nd = g.groupby(key_col, sort=False)["doc_id"].transform("size")
        t = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                          "dup": (nd.to_numpy() >= 2).astype(np.int64)})
        p = t.groupby("doc_id", sort=False) \
            .agg(n=("dup", "size"), d=("dup", "sum")).reset_index()
        return pa.table({
            "doc_id": pa.array(p["doc_id"].to_numpy(dtype=np.int64)),
            "n": pa.array(p["n"].to_numpy(dtype=np.int64)),
            "d": pa.array(p["d"].to_numpy(dtype=np.int64))})

    flags = ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas")
    agg = flags.groupby("doc_id").aggregate(
        Sum("n", alias_name="n_shingles"), Sum("d", alias_name="n_dup"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_shingles"].astype(np.int64)
        dup = df["n_dup"].astype(np.int64)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "n_shingles": n,
            "n_dup": dup,
            "dup_ppm": np.floor(1e6 * dup / n).astype(np.int64),
        })

    return agg.map_batches(finish, batch_format="pandas")


DUP_SHINGLES_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents WHERE trim(text) <> ''),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(ts[i:i+4], ' ') AS shingle
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts) - 4)) AS i) g
  WHERE len(ts) >= 5),
cnt AS (SELECT shingle, count(*) AS nd FROM sh GROUP BY shingle)
SELECT s.doc_id,
  CAST(count(*) AS BIGINT) AS n_shingles,
  CAST(count(*) FILTER (WHERE c.nd >= 2) AS BIGINT) AS n_dup,
  CAST(floor(1e6 * count(*) FILTER (WHERE c.nd >= 2) / count(*)) AS BIGINT)
    AS dup_ppm
FROM sh s JOIN cnt c USING (shingle)
GROUP BY s.doc_id
"""


# ---------------------------------------------------------------------------
# Corpus vocabulary statistics
# ---------------------------------------------------------------------------

def top_tokens_q(sf_dir: str, topk: int = 50):
    """Corpus top-k tokens by occurrence count, with document frequency.

    Per-batch partial (token, n_occ, n_docs) — docs never span batches,
    so both stats are additively mergeable — then ONE keyed exchange
    sums per token and a global sort+limit picks the head. The exchange
    carries one row per (token, batch): zipf-bounded, never the corpus.
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        t = df["text"].str.strip()
        toks = t.where(t.str.len() > 0).str.split(tx._WS_RE)
        ex = pd.DataFrame({"row": df.index, "token": toks}) \
            .explode("token").dropna(subset=["token"])
        occ = ex["token"].value_counts(sort=False)
        docs = ex.drop_duplicates(["row", "token"])["token"] \
            .value_counts(sort=False)
        # declared-pyarrow in AND out: the sort-aggregate is vectorized
        # on Arrow blocks (18x) and a pandas-DECLARED stage fused into
        # the shuffle map phase pays another ~10x (see exact_dedup)
        return pa.table({
            "token": pa.array(occ.index.astype(str), pa.string()),
            "occ": pa.array(occ.to_numpy(dtype=np.int64)),
            "docs": pa.array(docs.reindex(occ.index)
                             .to_numpy(dtype=np.int64))})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("occ", alias_name="n_occ"),
                                    Sum("docs", alias_name="n_docs"))
    top = agg.sort(["n_occ", "token"], descending=[True, False]).limit(topk)
    return top.map_batches(
        lambda df: pd.DataFrame({
            "token": df["token"],
            "n_occ": df["n_occ"].astype(np.int64),
            "n_docs": df["n_docs"].astype(np.int64)}),
        batch_format="pandas")


TOP_TOKENS_SQL = """
WITH t AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents WHERE trim(text) <> '')
SELECT token, CAST(count(*) AS BIGINT) AS n_occ,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM t GROUP BY token
ORDER BY n_occ DESC, token ASC LIMIT 50
"""


def top_tokens_cms_q(sf_dir: str, topk: int = 20, cand_factor: int = 4):
    """Approximate corpus heavy hitters via a count-min sketch — the
    scale path for :func:`top_tokens_q` when the VOCABULARY itself is
    too large to shuffle: each batch ships a fixed d x w counter matrix
    plus its local top candidates (bounded bytes per batch, independent
    of vocabulary size); the combine sums the sketches and re-estimates
    the candidate union. COUNT error is one-sided (CMS never
    under-counts a candidate).

    RECALL caveat (two-sided): a token can only appear in the output if
    it entered SOME batch's local top-``cand_factor * topk`` head — a
    token that is globally top-k purely by even spread, while never
    locally hot, is missed even though the sketch counted it. This is
    the standard heavy-hitters candidate-set trade (Cormode &
    Muthukrishnan 2005 track the heap against the FULL stream; a
    distributed combine only sees per-batch heads). Mitigations: raise
    ``cand_factor`` (candidate union grows as batches x head, still
    tiny), or use larger batches — a head of c*k misses a true top-k
    token only if every batch has >= c*k tokens locally hotter, which
    for zipfian text means the miss candidates are all near-ties.
    Exactness at the test vocabulary (where heads cover the vocab) is
    pytest-verified against exact DuckDB counts. Rows-only driver check
    (approximate op).
    """
    import zlib

    import pyarrow as pa

    from ..stages.sketch import CMS_D, CMS_W, cms_estimate, cms_table

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_cand = cand_factor * topk

    def partial(df: pd.DataFrame) -> pa.Table:
        t = df["text"].str.strip()
        toks = t.where(t.str.len() > 0).str.split(tx._WS_RE)
        ex = toks.explode().dropna()
        occ = ex.value_counts(sort=False)
        keys = np.asarray([zlib.crc32(w.encode("utf-8"))
                           for w in occ.index], dtype=np.uint64)
        cnts = occ.to_numpy(dtype=np.int64)
        sk = cms_table(keys, cnts)
        top = np.argsort(-cnts, kind="stable")[:n_cand]
        return pa.table({
            "sketch": pa.array([sk.tobytes()], pa.binary()),
            "cand": pa.array([list(occ.index[top].astype(str))],
                             pa.list_(pa.string())),
        })

    def merge_level(df: pd.DataFrame) -> pa.Table:
        # fold many (sketch, cand) rows into one — sketches are
        # elementwise-additive, candidate sets union
        total = np.zeros((CMS_D, CMS_W), dtype=np.int64)
        cands: set[str] = set()
        for blob, cl in zip(df["sketch"], df["cand"]):
            total += np.frombuffer(blob, dtype=np.int64) \
                .reshape(CMS_D, CMS_W)
            cands.update(cl)
        return pa.table({
            "sketch": pa.array([total.tobytes()], pa.binary()),
            "cand": pa.array([sorted(cands)], pa.list_(pa.string()))})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        m = merge_level(df).to_pandas()
        total = np.frombuffer(m["sketch"][0], dtype=np.int64) \
            .reshape(CMS_D, CMS_W)
        cand = list(m["cand"][0])
        keys = np.asarray([zlib.crc32(w.encode("utf-8")) for w in cand],
                          dtype=np.uint64)
        est = cms_estimate(total, keys)
        order = np.lexsort((np.asarray(cand, dtype=object), -est))[:topk]
        return pd.DataFrame({
            "token": np.asarray(cand, dtype=object)[order],
            "est_count": est[order].astype(np.int64)})

    # 2-level tree: level 1 folds per-batch sketches cluster-wide (one
    # ~128 KiB row out per task), the final task sees only `width`
    # sketches — never one row per input batch (the pre-r4
    # repartition(1) funneled n_batches x 128 KiB into a single task)
    from ..stages.zonal import _auto_buckets

    width = _auto_buckets()
    lvl1 = ds.map_batches(partial, batch_format="pandas") \
        .repartition(width) \
        .map_batches(lambda df: merge_level(df), batch_format="pandas",
                     batch_size=None)
    return lvl1.repartition(1) \
        .map_batches(finish, batch_format="pandas", batch_size=None)


def tfidf_top_terms_q(sf_dir: str, topk: int = 5):
    """Top-k distinctive tokens per source by an integer-exact tf/df
    score: score_ppm = floor(1e6 * tf_source / df_corpus).

    Three keyed exchanges, no driver hop, no broadcast of the vocab:
    (1) per-batch partial (source, token, tf, nd) -> sum per (source,
    token); (2) regroup by token — each doc has exactly ONE source, so
    df = sum of nd over the token's sources — score within the token
    group; (3) grouped top-k per source (bounded partial head like
    top_events_per_type). Mirrors a SQL window exactly.
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        t = df["text"].str.strip()
        toks = t.where(t.str.len() > 0).str.split(tx._WS_RE)
        ex = pd.DataFrame({
            "source": df["source"], "doc_id": df["doc_id"],
            "token": toks}).explode("token").dropna(subset=["token"])
        g = ex.groupby(["source", "token"], sort=False) \
            .agg(tf=("doc_id", "size"), nd=("doc_id", "nunique")) \
            .reset_index()
        # arrow out for the downstream sort-aggregate (see top_tokens_q)
        return pa.table({
            "source": pa.array(g["source"].astype(str), pa.string()),
            "token": pa.array(g["token"].astype(str), pa.string()),
            "tf": pa.array(g["tf"].to_numpy(dtype=np.int64)),
            "nd": pa.array(g["nd"].to_numpy(dtype=np.int64))})

    per_st = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["source", "token"]).aggregate(
            Sum("tf", alias_name="tf"), Sum("nd", alias_name="nd"))

    def add_token_bucket(df: pd.DataFrame) -> pa.Table:
        # regroup-by-token via a hash bucket: the scoring kernel then
        # runs ONCE per bucket (vectorized transform), not once per
        # vocabulary entry — map_groups per token is a python call per
        # unique token, a non-starter on a web-scale vocab
        import zlib

        codes, uniq = pd.factorize(df["token"], sort=False)
        uh = np.asarray([zlib.crc32(u.encode("utf-8")) for u in uniq],
                        dtype=np.int64)
        return pa.table({
            "source": pa.array(df["source"].astype(str), pa.string()),
            "token": pa.array(df["token"].astype(str), pa.string()),
            "tf": pa.array(df["tf"].to_numpy(dtype=np.int64)),
            "nd": pa.array(df["nd"].to_numpy(dtype=np.int64)),
            "bucket": pa.array(uh[codes] % 32)})

    def score_bucket(g: pd.DataFrame) -> pa.Table:
        # each doc has exactly one source, so df(token) = sum of nd over
        # the token's (source) rows — all of which share this bucket
        dfreq = g.groupby("token", sort=False)["nd"].transform("sum") \
            .to_numpy(dtype=np.int64)
        return pa.table({
            "source": pa.array(g["source"].astype(str), pa.string()),
            "token": pa.array(g["token"].astype(str), pa.string()),
            "score_ppm": pa.array(np.floor(
                1e6 * g["tf"].to_numpy(dtype=np.int64) / dfreq
            ).astype(np.int64))})

    scored = per_st.map_batches(add_token_bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(score_bucket, batch_format="pandas")

    def head(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["score_ppm", "token"],
                            ascending=[False, True], kind="stable")
        return df.groupby("source", sort=False).head(topk)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["score_ppm", "token"],
                            ascending=[False, True], kind="stable")
        df = df.groupby("source", sort=False).head(topk).copy()
        df["rnk"] = df.groupby("source", sort=False).cumcount() + 1
        return pd.DataFrame({
            "source": df["source"], "token": df["token"],
            "score_ppm": df["score_ppm"].astype(np.int64),
            "rnk": df["rnk"].astype(np.int64)}).reset_index(drop=True)

    # head is idempotent (grouped top-k of top-ks), so the 2-level tree
    # bounds the final task to width x sources x topk rows instead of
    # one row per (source, topk, input block)
    from ..util import tree_combine

    return tree_combine(scored.map_batches(head, batch_format="pandas"),
                        head) \
        .map_batches(finish, batch_format="pandas", batch_size=None)


TFIDF_TOP_TERMS_SQL = """
WITH t AS (
  SELECT doc_id, source,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents WHERE trim(text) <> ''),
df AS (SELECT token, count(DISTINCT doc_id) AS dfreq FROM t GROUP BY token),
tf AS (SELECT source, token, count(*) AS tf FROM t GROUP BY source, token)
SELECT source, token,
       CAST(floor(1e6 * tf.tf / df.dfreq) AS BIGINT) AS score_ppm,
       CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY floor(1e6 * tf.tf / df.dfreq) DESC, token ASC)
         AS BIGINT) AS rnk
FROM tf JOIN df USING (token)
QUALIFY rnk <= 5
"""


def doc_rarity_q(sf_dir: str, n_buckets: int = 32):
    """Per-doc token-rarity score: mean corpus document-frequency of the
    doc's tokens (occurrence-weighted) — rare-vocabulary docs score low,
    boilerplate scores high. The integer-exact cousin of a unigram-LM
    quality score (log-probability needs libm parity across engines;
    sums of integer document frequencies hash-match exactly).

    Same two-exchange shape as dup_shingles: per-batch (doc, token, occ)
    partials -> token-bucket exchange (df = rows per token inside the
    bucket, contributions computed vectorized, pre-aggregated per doc)
    -> per-doc sum. Arrow blocks into both aggregates.
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        import zlib

        df = batch.to_pandas()
        t = df["text"].str.strip()
        toks = t.where(t.str.len() > 0).str.split(tx._WS_RE)
        ex = pd.DataFrame({"doc_id": df["doc_id"], "token": toks}) \
            .explode("token").dropna(subset=["token"])
        g = ex.groupby(["doc_id", "token"], sort=False) \
            .size().reset_index(name="occ")
        codes, uniq = pd.factorize(g["token"], sort=False)
        uh = np.asarray([zlib.crc32(u.encode("utf-8")) for u in uniq],
                        dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(dtype=np.int64)),
            "token": pa.array(g["token"].astype(str), pa.string()),
            "occ": pa.array(g["occ"].to_numpy(dtype=np.int64)),
            "bucket": pa.array(uh[codes] % n_buckets)})

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        # one row per (doc, token) -> per-token row count IS the
        # document frequency; weight by occurrence and pre-sum per doc
        dfreq = g.groupby("token", sort=False)["occ"].transform("size") \
            .to_numpy(dtype=np.int64)
        occ = g["occ"].to_numpy(dtype=np.int64)
        t = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                          "ntok": occ, "sdf": occ * dfreq})
        p = t.groupby("doc_id", sort=False).sum().reset_index()
        return pa.table({
            "doc_id": pa.array(p["doc_id"].to_numpy(dtype=np.int64)),
            "ntok": pa.array(p["ntok"].to_numpy(dtype=np.int64)),
            "sdf": pa.array(p["sdf"].to_numpy(dtype=np.int64))})

    agg = ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas") \
        .groupby("doc_id").aggregate(Sum("ntok", alias_name="n_tokens"),
                                     Sum("sdf", alias_name="sum_df"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_tokens"].astype(np.int64)
        s = df["sum_df"].astype(np.int64)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "n_tokens": n, "sum_df": s,
            "mean_df_ppm": np.floor(1e6 * s / n).astype(np.int64)})

    return agg.map_batches(finish, batch_format="pandas")


DOC_RARITY_SQL = """
WITH t AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents WHERE trim(text) <> ''),
dt AS (SELECT doc_id, tok, count(*) AS occ FROM t GROUP BY doc_id, tok),
df AS (SELECT tok, count(*) AS dfreq FROM dt GROUP BY tok)
SELECT dt.doc_id,
  CAST(sum(dt.occ) AS BIGINT) AS n_tokens,
  CAST(sum(dt.occ * df.dfreq) AS BIGINT) AS sum_df,
  CAST(floor(1e6 * sum(dt.occ * df.dfreq) / sum(dt.occ)) AS BIGINT)
    AS mean_df_ppm
FROM dt JOIN df USING (tok)
GROUP BY dt.doc_id
"""


# ---------------------------------------------------------------------------
# Embedding clustering + semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------

def embedding_kmeans_q(sf_dir: str, k: int = 10, iters: int = 8):
    """Distributed Lloyd's k-means assignment over the embeddings table
    (rows-only: iterative float fitting isn't ANSI-SQL; determinism,
    layout-independence and label purity are pytest-verified in
    tests/test_cluster.py)."""
    from ..stages import cluster as cl

    def make_ds():
        return _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    cents = cl.kmeans_fit_distributed(make_ds, k=k, iters=iters)
    out = cl.assign_clusters(make_ds(), cents)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "vec_id": df["vec_id"].astype(np.int64),
            "cluster": df["cluster"].astype(np.int64)}),
        batch_format="pandas")


def semantic_dedup_q(sf_dir: str, k: int = 10, threshold: float = 0.3):
    """SemDeDup keep flags (Abbas et al. 2023): k-means cluster, then
    within-cluster cosine near-dup pruning keeping the smallest vec_id.
    Rows-only; pytest-verified against an in-memory dual oracle.

    Default threshold is 0.3 (not the paper's ~0.95) because the synth
    embeddings are near-orthogonal (within-label max cosine ~0.4) — at
    0.95 the op would be a no-op on this corpus and the keep=False
    branch would go untested.
    """
    from ..stages import cluster as cl

    def make_ds():
        return _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    cents = cl.kmeans_fit_distributed(make_ds, k=k, iters=8)
    out = cl.semantic_dedup(make_ds(), cents, threshold=threshold)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "vec_id": df["vec_id"].astype(np.int64),
            "cluster": df["cluster"].astype(np.int64),
            "keep": df["keep"].astype(bool)}),
        batch_format="pandas")
