"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio libraries, so the decode kernels are
STUBS behind `decoder=` injection (a deterministic fake for tests, a
NotImplementedError-raising default for real codecs). Everything Spark-side
— schema, partitioning, Arrow batch shape, mapInPandas signatures — is
real and tested.

Scale notes: blobs ride in parquet binary columns; feature extraction is
`mapInPandas` so each Arrow batch is decoded in one Python call (never
row-at-a-time); downstream joins use only the extracted metadata columns,
so the binary column is pruned out of every plan that doesn't need bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("blob", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), False),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        # nullable: a NULL blob (missing media) yields NULL features, the
        # md5(NULL)/strlen(NULL) SQL semantics — a False flag here makes
        # codegen NPE on the first NULL row instead
        T.StructField("digest", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feat", T.ArrayType(T.DoubleType()), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as the opaque blob (the test data
    has no real media; the plumbing is identical)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("blob"),
        F.struct(
            F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def fake_decoder(blob: bytes) -> list[float]:
    """Deterministic stand-in for a real decode+featurize kernel: 4 moments
    of the byte stream, vectorized over the buffer the way a production
    decode kernel would be. Replace with PIL/librosa/ffmpeg when available."""
    if not blob:
        return [0.0, 0.0, 0.0, 0.0]
    arr = np.frombuffer(blob, dtype=np.uint8).astype(np.float64)
    n = float(arr.size)
    return [n, float(arr.mean()), float((arr * arr).mean()), float(arr[0])]


def real_decoder(blob: bytes) -> list[float]:  # pragma: no cover - stub
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; inject a decoder via extract_features(decoder=...) — "
        "pil_image_decoder() builds one when Pillow is installed"
    )


def pil_image_decoder() -> Callable[[bytes], list[float]] | None:
    """Real image decode kernel, available where Pillow is installed
    (returns None here — this container ships no codecs).

    Same signature/shape as `fake_decoder` so it drops straight into
    `extract_features(decoder=...)`: [width, height, n_channels,
    mean_pixel_value]. Kept as a factory so the PIL import cost is paid
    once per executor task, not per blob.
    """
    try:
        from PIL import Image
    except ImportError:
        return None
    import io

    def decode(blob: bytes) -> list[float]:
        arr = np.asarray(Image.open(io.BytesIO(blob)), dtype=np.float64)
        if arr.ndim == 2:  # grayscale: normalize to HxWx1
            arr = arr[:, :, None]
        h, w, c = arr.shape
        return [float(w), float(h), float(c), float(arr.mean())]

    return decode


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] = fake_decoder,
    batch_hint: int = 1024,
) -> DataFrame:
    """mapInPandas feature extraction: digest + size + decoded feature vec.

    One Arrow batch in, one out; the UDF touches only (media_id, blob) —
    select them first so parquet column pruning drops everything else.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            # a NULL blob (missing/unfetched media) yields NULL features —
            # the SQL md5(NULL)/strlen(NULL) semantics — instead of a
            # TypeError killing the whole Arrow batch
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "digest": [
                        hashlib.md5(b).hexdigest() if b is not None else None for b in blobs
                    ],
                    "n_bytes": [len(b) if b is not None else None for b in blobs],
                    "feat": [decoder(bytes(b)) if b is not None else None for b in blobs],
                }
            )

    return media.select("media_id", "blob").mapInPandas(_extract, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int,
                decoder: Callable[[bytes], bytes] | None = None) -> DataFrame:
    """Image resize plumbing: blob → blob' keeping metadata. Default fake
    'resize' truncates bytes proportionally (deterministic); a real kernel
    would be injected the same way."""

    def _fake_resize(blob: bytes) -> bytes:
        target = max(1, (width * height) % (len(blob) + 1))
        return blob[:target]

    kernel = decoder or _fake_resize
    out_schema = MEDIA_SCHEMA

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [kernel(bytes(b)) for b in pdf["blob"]]
            meta = [
                {"n_bytes": len(b), "source": (m or {}).get("source")}
                for b, m in zip(blobs, pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "blob": blobs,
                    "meta": meta,
                }
            )

    return media.mapInPandas(_resize, out_schema)


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one row in → many rows out (frames).
    The fake kernel emits one 'frame' per `every_n` kilobytes of blob —
    the row-explosion shape (mapInPandas yielding more rows than input)
    is the part that matters for the engine."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                b = bytes(blob)
                step = max(1, every_n * 1024)
                for i, off in enumerate(range(0, len(b), step)):
                    ids.append(mid)
                    nos.append(i)
                    frames.append(b[off : off + 16])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return media.select("media_id", "blob").mapInPandas(_frames, out_schema)
