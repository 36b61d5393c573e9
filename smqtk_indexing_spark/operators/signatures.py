"""Signature stage: documents -> (doc_id, n_tokens, n_shingles, shingles,
minhash, simhash, bands) in ONE vectorized ``mapInPandas`` pass.

This is the reference's ``build_index`` hash loop
(``/root/reference/smqtk_indexing/impls/nn_index/lsh.py:316-321``: per
descriptor, ``get_hash`` then bit-vector -> int key) lifted to a single
Arrow-batched pass — the same batched-numpy shape as the reference's ITQ fit
hot loop (``impls/lsh_functor/itq.py:333-344``), with no per-row Python UDFs
(BASELINE input_hint contract).

Column pruning: callers should ``select`` only what the next stage needs —
``content``/``text`` is dropped here and never re-read by the LSH stages.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smqtk_indexing_spark import kernels as K
from smqtk_indexing_spark.config import DedupConfig

SIGNATURE_SCHEMA = (
    "doc_id long, n_tokens int, n_shingles int, "
    "shingles array<long>, minhash array<long>, simhash long, bands array<long>"
)

ALL_COLUMNS = ("shingles", "minhash", "simhash", "bands")


def compute_signatures(
    df: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    include: tuple = ALL_COLUMNS,
) -> DataFrame:
    """One pass over (id, text) -> full signature set per document.

    Documents with fewer than ``shingle_k`` tokens get empty shingle sets and
    are excluded from LSH banding downstream (their ``bands`` is empty) —
    the analog of the reference's empty-input guard
    (``utils/iter_validation.py:8-28``), degraded per-row instead of failing
    the job.

    ``include`` selects the heavy optional columns. The scale pipeline
    carries only ("bands", "simhash") through its signature table (a few
    hundred bytes/doc) and fetches shingle arrays later for candidate docs
    only — Arrow-serializing every doc's full shingle set would dominate
    the stage at corpus scale.
    """
    shingle_k = cfg.shingle_k
    lowercase = cfg.lowercase
    num_perm, seed = cfg.num_perm, cfg.seed
    bands, rows_per_band = cfg.bands, cfg.rows_per_band
    inc_sh = "shingles" in include
    inc_mh = "minhash" in include
    inc_sim = "simhash" in include
    inc_bands = "bands" in include
    inc_sha = "sha256" in include
    schema = "doc_id long, n_tokens int, n_shingles int"
    if inc_sha:
        schema += ", sha256 string"
    if inc_sh:
        schema += ", shingles array<long>"
    if inc_mh:
        schema += ", minhash array<long>"
    if inc_sim:
        schema += ", simhash long"
    if inc_bands:
        schema += ", bands array<long>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        a, b = K.make_minhash_perms(num_perm, seed)  # rebuilt per task: tiny
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            texts = pdf[text_col].tolist()
            # C-level byte tokenization (same ASCII-whitespace set as the
            # regex twins), then each UNIQUE token in the batch is hashed
            # exactly once (heavy-tailed vocabularies): factorize -> hash
            # uniques -> gather. No per-token Python hashing anywhere.
            token_lists = [
                K.tokenize_bytes(t if t is not None else "", lowercase)
                for t in texts
            ]
            n_tokens = np.fromiter(
                (len(t) for t in token_lists), dtype=np.int64, count=len(texts)
            )
            flat = [tok for toks in token_lists for tok in toks]
            if flat:
                codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
                tok_hashes = K.hash_strs64(list(uniques))[codes]
            else:
                tok_hashes = np.empty(0, dtype=np.uint64)
            # one vectorized pass for ALL docs in the batch: windowed shingle
            # hashing with boundary masking + lexsort set-dedup, then blocked
            # reduceat minhash/simhash -- no per-document Python loops.
            values, offsets = K.shingle_sets_batch(tok_hashes, n_tokens, shingle_k)
            n_shingles = (offsets[1:] - offsets[:-1]).astype(np.int32)
            cols = {
                "doc_id": ids,
                "n_tokens": n_tokens.astype(np.int32),
                "n_shingles": n_shingles,
            }
            if inc_sha:
                # computed JVM-side (Catalyst sha2 in the projection feeding
                # this pass) and forwarded — same single content scan
                cols["sha256"] = pdf["sha256"]
            if inc_sh:
                vi = values.view(np.int64)
                cols["shingles"] = [
                    vi[offsets[i] : offsets[i + 1]].tolist()
                    for i in range(len(texts))
                ]
            if inc_mh or inc_bands or inc_sim:
                mh, sim = K.signatures_segmented(
                    values, offsets, a, b,
                    want_minhash=inc_mh or inc_bands,
                    want_simhash=inc_sim,
                )
                if inc_mh:
                    mhi = mh.view(np.int64)
                    cols["minhash"] = [r.tolist() for r in mhi]
                if inc_bands:
                    bkeys = K.band_keys_batch(mh, bands, rows_per_band)
                    cols["bands"] = [
                        row.tolist() if n_shingles[i] > 0 else []
                        for i, row in enumerate(bkeys)
                    ]
                if inc_sim:
                    cols["simhash"] = sim.view(np.int64)
            yield pd.DataFrame(cols)

    proj = [F.col(id_col).cast("long").alias(id_col), F.col(text_col)]
    if inc_sha:
        # sha256 piggybacks on the signature scan (the pipeline's exact-dup
        # member map derives from THIS column): one content pass computes
        # hash + signatures instead of two scans (round-4 stage table:
        # member_map's separate scan was 6.3 s at local[2], scaling 0.44)
        proj.append(
            F.sha2(F.encode(F.col(text_col), "utf-8"), 256).alias("sha256")
        )
    return df.select(*proj).mapInPandas(gen, schema=schema)


def compute_shingle_arrays(
    df: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text) -> verification-side descriptor fetch, run over candidate
    documents rather than the corpus (J2 in SURVEY.md §2.4:
    ``get_many_descriptors``, lsh.py:499-501). Carries the minhash column
    too when the estimated-Jaccard prefilter is enabled (M6 pruning)."""
    include = (
        ("shingles", "minhash") if cfg.minhash_prefilter > 0.0 else ("shingles",)
    )
    cols = ["doc_id", "shingles"] + (
        ["minhash"] if cfg.minhash_prefilter > 0.0 else []
    )
    return compute_signatures(
        df, cfg, id_col=id_col, text_col=text_col, include=include
    ).select(*cols)
