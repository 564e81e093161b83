"""Multimodal (image/audio/video) column operators.

Training-data-pipeline extension (BASELINE.json): media travels as an opaque
``binary`` payload column plus typed metadata (schemas.MEDIA_SCHEMA). The
Spark-side plumbing — schema, Arrow batching, ``mapInPandas`` fan-out,
partition sizing — is real and tested; the codec step itself is stubbed
because no image/audio libraries exist in this container:

- with ``decoder='fake'`` (default) a DETERMINISTIC fake decoder derives
  features from the payload bytes (md5-seeded) — stable across runs, so tests
  and oracles can pin results;
- with ``decoder='real'`` the functions raise NotImplementedError at the
  decode site, marking exactly where Pillow/torchaudio/PyAV plug in.

Scale notes: payloads dominate row size, so operators project metadata-only
where possible (Parquet column pruning keeps payload I/O at zero until a
decode actually needs bytes); decode fan-out uses ``mapInPandas`` so payload
batches stream through Arrow without materializing a partition in memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FEATURE_DIM = 8

DECODE_SCHEMA = (
    "asset_id long, media_type string, feature array<float>, decode_error string"
)
FRAME_SAMPLE_SCHEMA = "asset_id long, frame_index int, frame_digest string"


def _fake_feature(payload: bytes | None, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic pseudo-feature: dim floats in [0,1) from md5(payload)."""
    if payload is None:
        payload = b""
    h = hashlib.md5(bytes(payload)).digest()
    return [h[i % 16] / 256.0 for i in range(dim)]


def decode_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """payload -> fixed-dim feature vector (the decode/feature-extract stage).

    Input needs (asset_id, media_type, payload); output row per asset with a
    ``feature`` array<float> and a per-record ``decode_error``.

    The decode stage is CPU-bound Python: it inherits the scan's
    partitioning, and a small input in one parquet row group would decode
    on ONE core (measured exactly that at sf0.1). ``ensure_min_partitions``
    spreads the batches across the executor slots; at 100 TB the input
    already has thousands of partitions and it's a no-op.
    """
    from ia_hadoop_tools_spark.operators.textops import ensure_min_partitions

    df = ensure_min_partitions(df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, errs = [], []
            for payload in pdf["payload"]:
                if decoder == "real":
                    raise NotImplementedError(
                        "real media decoding requires Pillow/torchaudio/PyAV; "
                        "not available in this environment"
                    )
                feats.append(_fake_feature(payload))
                errs.append(None)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "decode_error": errs,
                }
            )

    return df.select("asset_id", "media_type", "payload").mapInPandas(
        run, schema=DECODE_SCHEMA
    )


def frame_sample(df: DataFrame, every_n: int = 10, decoder: str = "fake") -> DataFrame:
    """Video frame sampling: emit one row per sampled frame (UDTF shape).

    With the fake decoder, 'frames' are every_n-th 1 KiB payload slice and the
    digest is its md5 — deterministic plumbing for the real PyAV implementation.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if decoder == "real":
                    raise NotImplementedError("real frame decode requires PyAV")
                data = bytes(payload or b"")
                n_frames = max(1, len(data) // 1024)
                for i in range(0, n_frames, every_n):
                    ids.append(aid)
                    idxs.append(i)
                    digests.append(
                        hashlib.md5(data[i * 1024 : (i + 1) * 1024]).hexdigest()
                    )
            yield pd.DataFrame(
                {"asset_id": ids, "frame_index": idxs, "frame_digest": digests}
            )

    return df.filter("media_type = 'video'").select("asset_id", "payload").mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA
    )


def resize_images(df: DataFrame, width: int, height: int, decoder: str = "fake") -> DataFrame:
    """Image resize stage; fake decoder passes payload through and stamps the
    new dimensions (real: Pillow thumbnail + re-encode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError("real image resize requires Pillow")
            out = pdf.copy()
            out["width"] = width
            out["height"] = height
            yield out

    return (
        df.filter("media_type = 'image'")
        .select("asset_id", "media_type", "payload", "width", "height")
        .mapInPandas(
            run,
            schema="asset_id long, media_type string, payload binary, width int, height int",
        )
    )
