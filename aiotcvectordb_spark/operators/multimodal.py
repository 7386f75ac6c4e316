"""Multimodal columns: opaque binary payloads + typed metadata.

The reference's multimodal surface is ``get_image_url`` (reference:
aiotcvectordb/model/collection_view.py:425-435 — per-document image
URLs). Generalized here the way a training-data pipeline needs it:
media travels as an opaque ``binary`` column with typed metadata, and
decode / feature-extraction / frame-sampling run as Arrow-batched
``mapInPandas`` stages so the plumbing (schema, batch shape,
partitioning) is identical to what a real codec UDF would use.

No image/audio codecs ship in this container, so ``mode="real"`` raises
``NotImplementedError`` at plan-build time; ``mode="fake"`` runs a
deterministic stand-in (byte histogram / fixed-stride frame slicing)
that exercises the full distributed path.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_BUCKETS = 8


def with_binary_payload(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary ``payload`` plus typed metadata columns.

    Stand-in ingestion: the UTF-8 encoding of ``text_col`` plays the role
    of image/audio bytes. Real ingestion would read files via
    ``spark.read.format("binaryFile")`` into the same shape.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("application/octet-stream")
    ).withColumn(
        "media_meta",
        F.create_map(
            F.lit("n_chars"), F.length(text_col).cast("string"),
            F.lit("codec"), F.lit("fake-v1"),
        ),
    )


def decode_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    mode: str = "fake",
) -> DataFrame:
    """Decode + feature-extract each payload into a dense feature vector.

    ``mode="real"`` is the seam where an actual decoder (PIL/librosa/
    ffmpeg) would plug in — unavailable in this container, so it raises.
    ``mode="fake"`` computes a deterministic normalized byte histogram
    ({FEATURE_BUCKETS} buckets), which has the same schema, Arrow batch
    shape, and partition behavior as a real extractor.
    """
    if mode == "real":
        raise NotImplementedError(
            "real media decoding requires image/audio codecs not present "
            "in this environment; use mode='fake' for the deterministic "
            "stand-in (same Spark plumbing)"
        )
    if mode != "fake":
        raise ValueError(f"unknown mode {mode!r}")

    id_type = dict(df.dtypes)[id_col]  # id passes through untouched
    schema = f"{id_col} {id_type}, n_bytes long, features array<double>"
    n_buckets = FEATURE_BUCKETS

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, sizes, feats = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(buf >> (8 - n_buckets.bit_length() + 1),
                                   minlength=n_buckets).astype(np.float64)
                total = hist.sum()
                ids.append(i)
                sizes.append(int(buf.size))
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({id_col: ids, "n_bytes": sizes, "features": feats})

    return df.select(id_col, payload_col).mapInPandas(extract, schema=schema)


def frame_sample(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = 64,
    stride: int = 128,
    mode: str = "fake",
) -> DataFrame:
    """Sample fixed-stride frames out of each payload (the video
    frame-sampling shape: one input row -> N frame rows).

    Fake mode slices raw bytes; a real sampler would seek codec
    keyframes — identical output schema either way.
    """
    if mode == "real":
        raise NotImplementedError(
            "real frame sampling requires video codecs not present in "
            "this environment; use mode='fake'"
        )
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, frame_no int, frame_off long, frame binary"

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {id_col: [], "frame_no": [], "frame_off": [], "frame": []}
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                for n, off in enumerate(range(0, len(raw), stride)):
                    out[id_col].append(i)
                    out["frame_no"].append(n)
                    out["frame_off"].append(off)
                    out["frame"].append(raw[off : off + frame_bytes])
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(sample, schema=schema)


def resize_images(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    width: int = 32,
    height: int = 32,
    mode: str = "fake",
) -> DataFrame:
    """Resize image payloads to (width, height) — the normalize step of
    an image-training pipeline. Arrow-batched ``mapInPandas``; output is
    one row per input with a fixed-size binary plus the recorded target
    dims, so downstream batch shapes are static.

    Fake mode emits a deterministic byte grid derived from the payload
    (image codecs aren't in this container); a real implementation swaps
    the inner loop for PIL/cv2 decode+resize — identical schema,
    partitioning, and batch shape either way.
    """
    if mode == "real":
        raise NotImplementedError(
            "real image resize requires PIL/cv2 not present in this "
            "environment; use mode='fake'"
        )
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, width int, height int, pixels binary"
    n_out = width * height

    def resize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, pix = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                if raw.size == 0:
                    raw = np.zeros(1, dtype=np.uint8)
                # nearest-neighbor resample of the byte stream to the
                # fixed output size — deterministic stand-in for decode+resize
                idx = (np.arange(n_out) * raw.size // n_out) % raw.size
                pix.append(raw[idx].tobytes())
                ids.append(i)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids),
                    "pixels": pix,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, schema=schema)
