"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The Spark-side machinery (schemas, partitioning by kind, UDF signatures,
batch shapes, byte budgets) is real and tested; the actual codec step is
STUBBED behind `decoder=` because no image/audio library ships in this
container: the default `deterministic_fake_decoder` derives features from
the payload bytes (pure function of content — reproducible tests), and
`strict_decoder` raises NotImplementedError to mark exactly where a real
PIL/libsndfile decode plugs in.

Scale notes: assets are processed in bounded Arrow batches
(`spark.sql.execution.arrow.maxRecordsPerBatch` caps rows per batch, and
`payload` bytes dominate — at 100 TB you partition by kind + size-bucket
so a batch of 4K images and a batch of 10s audio clips both fit executor
memory), and features are written columnar so downstream similarity
search reads vectors without touching payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)

FEATURE_SCHEMA = (
    "asset_id long, kind string, n_bytes long, feature array<double>"
)

FEATURE_DIM = 16


def deterministic_fake_decoder(payload: bytes, kind: str) -> np.ndarray:
    """STUB decode: a deterministic FEATURE_DIM-dim feature from payload
    bytes (chunked means, scaled). Stands in for decode->resize->embed."""
    b = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if b.size == 0:
        return np.zeros(FEATURE_DIM)
    chunks = np.array_split(b, FEATURE_DIM)
    return np.array([c.mean() if c.size else 0.0 for c in chunks]) / 255.0


def strict_decoder(payload: bytes, kind: str) -> np.ndarray:
    raise NotImplementedError(
        f"real {kind} decode requires an image/audio library not present "
        "in this container; plug PIL/soundfile in here"
    )


def synth_assets(n: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic fake binary assets (images/audio/video rows)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    rows = []
    for i in range(n):
        k = kinds[i]
        size = int(rng.integers(64, 2048))
        payload = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        rows.append(
            {
                "asset_id": i,
                "kind": str(k),
                "payload": payload,
                "width": int(rng.integers(16, 512)) if k == "image" else None,
                "height": int(rng.integers(16, 512)) if k == "image" else None,
                "sample_rate": 16000 if k == "audio" else None,
                "n_frames": int(rng.integers(1, 300)) if k == "video" else None,
            }
        )
    return pd.DataFrame(rows)


def extract_features(assets: DataFrame, decoder=deterministic_fake_decoder) -> DataFrame:
    """Decode + featurize every asset via mapInPandas (one Arrow batch at
    a time; payload column never leaves the executor)."""

    def run(batches):
        for pdf in batches:
            feats = [
                decoder(bytes(p), k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(assets: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled frame
    index (the decode of the frame itself is the stub boundary). Shows
    the 1->N mapInPandas fan-out shape a real sampler uses."""

    def run(batches):
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            out = []
            for r in vids.itertuples():
                nf = int(r.n_frames or 0)
                for fi in range(0, nf, every_n):
                    out.append((r.asset_id, fi))
            yield pd.DataFrame(out, columns=["asset_id", "frame_idx"]).astype(
                {"asset_id": "int64", "frame_idx": "int32"}
            )

    return assets.mapInPandas(run, schema="asset_id long, frame_idx int")
