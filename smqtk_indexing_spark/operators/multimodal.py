"""Multimodal column plumbing — images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark side (schema, batching, partitioning, UDF signatures) is real and
tested; the codec step is STUBBED — image/audio libraries are not in this
container, so ``decode='real'`` raises NotImplementedError and
``decode='fake'`` computes a deterministic byte-level feature (a normalized
256-bin byte histogram), which exercises the identical dataflow: binary in,
fixed-width float vector out, feeding the same ANN operators as text
embeddings.

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


def extract_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """binary assets -> fixed-width float features, one Arrow pass.

    decode='real' is the integration point for actual codecs (PIL/ffmpeg),
    intentionally NotImplemented in this container; decode='fake' is the
    deterministic stand-in with the same schema and batch shape.
    """
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; not available "
                    "in this environment — use decode='fake'"
                )
            feats, nb = [], []
            for raw in pdf["data"]:
                b = bytes(raw) if raw is not None else b""
                nb.append(len(b))
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
