"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern a 100 TB multimodal training pipeline needs: image/audio/video
stored as opaque ``binary`` columns next to typed metadata, with decode /
feature-extract implemented as Arrow-batched ``mapInPandas`` stages.

The real decoders (PIL/ffmpeg/torchaudio) are NOT in this container, so
``decode_image`` is STUBBED: it raises NotImplementedError unless
``fake=True``, in which case a deterministic fake extractor runs (first
``n_feat`` payload bytes scaled to [0,1]).  The Spark-side plumbing —
binary column, metadata struct, batch iteration, output schema — is real
and oracle-checked (the fake payload is md5(normalized text), so DuckDB
can recompute every feature from hex).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import norm_text

N_FEAT = 8


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the synthetic binary payload + typed metadata columns.
    In production this is the Iceberg scan of (payload binary,
    width int, height int, ...)."""
    return docs.select(
        "doc_id",
        F.unhex(F.md5(norm_text(F.col(text_col)))).alias("payload"),
        (F.col("n_chars") % 64 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 48 + 1).cast("int").alias("height"),
    )


def extract_features(
    media: DataFrame, n_feat: int = N_FEAT, fake: bool = True
) -> DataFrame:
    """binary payload → float features via Arrow-batched mapInPandas.

    fake=False is the real-decoder path: stubbed (no image libs in this
    container).  The plumbing (schema, batching, partition mapping) is
    identical for both paths.
    """
    if not fake:
        raise NotImplementedError(
            "real image decode requires PIL/libjpeg — not available in "
            "this environment; pass fake=True for the deterministic stub"
        )

    feat_cols = ", ".join(f"feat_{i} double" for i in range(n_feat))
    schema = f"doc_id long, width int, height int, {feat_cols}"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # fixed-width payloads (the md5 stub: 16 bytes ≥ n_feat) take
            # one vectorized frombuffer over the batch concatenation;
            # variable-width batches fall back to the per-row loop (a
            # blind reshape would silently shift bytes across rows)
            lens = pdf["payload"].map(len) if len(pdf) else None
            if len(pdf) and lens.nunique() == 1:
                width = int(lens.iloc[0])
                mat = (
                    np.frombuffer(b"".join(pdf["payload"]), dtype=np.uint8)
                    .reshape(len(pdf), width)[:, :n_feat]
                    .astype(np.float64)
                    / 255.0
                )
            else:
                mat = np.zeros((len(pdf), n_feat), dtype=np.float64)
                for r, buf in enumerate(pdf["payload"]):
                    mat[r] = (
                        np.frombuffer(buf, dtype=np.uint8, count=n_feat)
                        / 255.0
                    )
            out = {
                "doc_id": pdf["doc_id"].values,
                "width": pdf["width"].values,
                "height": pdf["height"].values,
            }
            for i in range(n_feat):
                out[f"feat_{i}"] = mat[:, i]
            yield pd.DataFrame(out)

    return media.mapInPandas(extract, schema=schema)


def multimodal_features(
    docs: DataFrame, n_feat: int = N_FEAT
) -> DataFrame:
    return extract_features(with_payload(docs), n_feat=n_feat, fake=True)
