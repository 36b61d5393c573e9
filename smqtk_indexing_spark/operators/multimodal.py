"""Multimodal column plumbing — images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark side (schema, batching, partitioning, UDF signatures) is real and
tested. ``decode='real'`` is REAL for the formats the stdlib can decode —
PNG (zlib), PPM, 16-bit PCM WAV via ``smqtk_indexing_spark.codecs`` — and
raises for formats that genuinely need external codec libraries (JPEG,
MP3/MP4; PIL/ffmpeg are not in this container — swapping them in at the
same call sites is a deploy-time change). ``decode='fake'`` computes a
deterministic byte-level feature (a normalized 256-bin byte histogram) for
any payload, exercising the identical dataflow: binary in, fixed-width
float vector out, feeding the same ANN operators as text embeddings.

No reference analog (SMQTK-Indexing consumes pre-computed descriptors); this
is the training-data-pipeline surface the engine adds (SURVEY.md §2.10).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, data binary, "
    "meta map<string,string>"
)
FEATURE_SCHEMA = "asset_id long, kind string, n_bytes int, feature array<float>"


def to_assets(
    df: DataFrame, id_col: str, payload_col: str, kind: str
) -> DataFrame:
    """Wrap any payload column as a typed binary asset row."""
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(payload_col).cast("string"), "utf-8").alias("data"),
        F.create_map(
            F.lit("origin"), F.lit(payload_col), F.lit("codec"), F.lit("raw")
        ).alias("meta"),
    )


def _real_feature(kind: str, b: bytes) -> list:
    """Dispatch a decoded 256-dim feature by asset kind (codecs module).
    Raises for formats that require external codec libraries."""
    from smqtk_indexing_spark import codecs as C

    if kind == "image/png":
        return C.image_feature(C.decode_png(b)).tolist()
    if kind == "image/ppm":
        return C.image_feature(C.decode_ppm(b)).tolist()
    if kind == "audio/wav":
        samples, _rate = C.decode_wav(b)
        return C.audio_feature(samples).tolist()
    raise NotImplementedError(
        f"decode='real' for kind={kind!r} requires an external codec "
        "(PIL/ffmpeg; not in this container) — supported real kinds: "
        "image/png, image/ppm, audio/wav; or use decode='fake'"
    )


def extract_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """binary assets -> fixed-width (256-dim) float features, one Arrow pass.

    decode='real' decodes the asset with the stdlib codecs
    (PNG/PPM/WAV — ``codecs.py``) and emits the decoded-domain feature
    (mean-pooled greyscale thumbnail for images, pooled log-spectrum for
    audio); kinds needing external codec libraries raise. decode='fake' is
    the deterministic byte-histogram stand-in with the same schema and
    batch shape for any payload.
    """
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nb = [], []
            for kind, raw in zip(pdf["kind"], pdf["data"]):
                b = bytes(raw) if raw is not None else b""
                nb.append(len(b))
                if decode == "real":
                    feats.append(_real_feature(kind, b))
                    continue
                hist = np.bincount(
                    np.frombuffer(b, dtype=np.uint8), minlength=256
                ).astype(np.float32)
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nb, dtype="int32"),
                    "feature": feats,
                }
            )

    return df.select("asset_id", "kind", "data").mapInPandas(
        gen, schema=FEATURE_SCHEMA
    )


def synth_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    img_w: int = 24,
    img_h: int = 16,
    n_samples: int = 256,
) -> DataFrame:
    """Deterministic media assets, two rows per id: a PNG gradient image
    with pixel(y, x) = (id*7 + 3x + 5y) mod 256 and a 16-bit WAV ramp with
    sample(t) = ((id*13 + 11t) mod 65536) - 32768. Closed-form content is
    what lets a DuckDB oracle verify REAL decode output end-to-end
    (encode UDF -> binary column -> decode UDF -> stats == SQL formula)."""
    from smqtk_indexing_spark import codecs as C

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:img_h, 0:img_w]
        tt = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            ids, kinds, blobs = [], [], []
            for did in pdf[id_col].astype("int64"):
                i = int(did)
                img = ((i * 7 + 3 * xx + 5 * yy) % 256).astype(np.uint8)
                wavs = (((i * 13 + 11 * tt) % 65536) - 32768).astype(np.int16)
                ids += [i, i]
                kinds += ["image/png", "audio/wav"]
                blobs += [C.encode_png(img), C.encode_wav(wavs)]
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "kind": kinds,
                    "data": blobs,
                }
            )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        gen, schema="asset_id long, kind string, data binary"
    )


DECODE_STATS_SCHEMA = "asset_id long, kind string, n_units long, mean_val double"


def decode_stats(assets: DataFrame) -> DataFrame:
    """binary assets -> decoded-domain stats via the REAL stdlib codecs:
    images -> (pixel count, mean grey value); WAV -> (frame count, mean
    sample value). The oracle-checkable face of ``decode='real'``."""
    from smqtk_indexing_spark import codecs as C

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, ns, means = [], [], [], []
            for aid, kind, raw in zip(
                pdf["asset_id"], pdf["kind"], pdf["data"]
            ):
                b = bytes(raw)
                if kind == "image/png":
                    a = C.decode_png(b).astype(np.float64)
                    n, m = a.shape[0] * a.shape[1], float(a.mean())
                elif kind == "image/ppm":
                    a = C.decode_ppm(b).astype(np.float64)
                    n, m = a.shape[0] * a.shape[1], float(a.mean())
                elif kind == "audio/wav":
                    s, _rate = C.decode_wav(b)
                    n, m = s.shape[0], float(s.astype(np.float64).mean())
                else:
                    raise NotImplementedError(f"no stdlib codec for {kind!r}")
                ids.append(int(aid))
                kinds.append(kind)
                ns.append(n)
                means.append(m)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "kind": kinds,
                    "n_units": pd.Series(ns, dtype="int64"),
                    "mean_val": pd.Series(means, dtype="float64"),
                }
            )

    return assets.select("asset_id", "kind", "data").mapInPandas(
        gen, schema=DECODE_STATS_SCHEMA
    )


FRAME_SCHEMA = "asset_id long, frame_idx int, frame binary"


def sample_frames(
    df: DataFrame, n_frames: int = 4, decode: str = "fake"
) -> DataFrame:
    """Video frame sampling plumbing: binary asset -> n evenly-spaced frame
    rows. decode='real' is the ffmpeg integration point (NotImplemented in
    this container); decode='fake' splits the byte stream into n evenly-
    spaced windows — the identical row-explosion dataflow (one asset row ->
    n frame rows) and batch shape a real decoder produces."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real frame decode requires ffmpeg; not available in "
                    "this environment — use decode='fake'"
                )
            ids, idxs, frames = [], [], []
            for aid, raw in zip(pdf["asset_id"], pdf["data"]):
                b = bytes(raw) if raw is not None else b""
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    ids.append(int(aid))
                    idxs.append(i)
                    frames.append(b[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.select("asset_id", "data").mapInPandas(gen, schema=FRAME_SCHEMA)


def resize_payloads(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Resize plumbing: binary asset -> fixed-size binary (byte-resampled
    stand-in for image resize; the real path plugs a codec into the same
    signature). Deterministic: evenly-strided byte sampling, zero-padded."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for raw in pdf["data"]:
                b = bytes(raw) if raw is not None else b""
                if len(b) >= target_bytes:
                    idx = np.linspace(0, len(b) - 1, target_bytes).astype(int)
                    out.append(np.frombuffer(b, dtype=np.uint8)[idx].tobytes())
                else:
                    out.append(b.ljust(target_bytes, b"\0"))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "data": out,
                }
            )

    return df.select("asset_id", "kind", "data").mapInPandas(
        gen, schema="asset_id long, kind string, data binary"
    )
