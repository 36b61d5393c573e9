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
