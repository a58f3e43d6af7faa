"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design: a multimodal asset is a row of
``(asset_id, modality, content: binary, meta: struct)`` — the content is
never interpreted by the engine, only by decode/feature UDFs running as
Arrow-batched ``mapInPandas`` stages. The Spark-side plumbing (schema,
partition sizing, UDF batch shape) is real and tested; the actual codec
calls are STUBBED behind ``NotImplementedError`` / a deterministic fake,
because no image/audio libraries ship in this container. Swapping in
PIL/libav later only touches the inner function body.

Scale notes: binary payloads make row-group sizing the dominant knob —
``target_batch_bytes`` controls Arrow batch memory, and content columns
should be pruned before wide shuffles (select metadata early, join
content back by id at the end).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MULTIMODAL_SCHEMA",
    "asset_table",
    "decode_images",
    "extract_image_features",
    "sample_video_frames",
    "fake_image_bytes",
    "fake_wav_bytes",
    "decode_audio",
    "extract_audio_features",
]

#: canonical multimodal asset schema
MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def fake_image_bytes(asset_id: int, width: int = 8, height: int = 8) -> bytes:
    """Deterministic fake 'image': a seeded byte grid. Stands in for real
    encoded images so the binary plumbing is exercised end-to-end."""
    rng = np.random.RandomState(asset_id % (2**31))
    return rng.randint(0, 256, size=width * height, dtype=np.uint8).tobytes()


def asset_table(spark, n: int = 100, modality: str = "image") -> DataFrame:
    """Synthesize a small asset table (testing aid)."""
    rows = [
        (i, modality, fake_image_bytes(i), (8, 8, None, f"{modality}/fake"))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema=MULTIMODAL_SCHEMA)


try:  # optional imaging dependency — decoding real mimes needs it
    from PIL import Image as _PILImage  # type: ignore

    _HAS_PIL = True
except ImportError:  # pragma: no cover - exercised via monkeypatch in tests
    _PILImage = None
    _HAS_PIL = False


def _decode_stub(content: bytes, mime: Optional[str]) -> np.ndarray:
    """Decode an encoded image to a 2-D luminance ndarray (uint8; a
    >8-bit JPEG yields uint16 samples at the stream's precision).

    ``image/fake`` payloads (the deterministic raw-grid fake) always
    decode, so the Arrow plumbing is testable without any imaging
    library. Real mimes decode through PIL when it is importable;
    without PIL, ``image/png`` (gray / gray+alpha / RGB / RGBA at
    8/16-bit, paletted and sub-byte-gray at 1/2/4/8-bit,
    non-interlaced) still decodes through the vendored pure-Python
    codec (:mod:`._png`) — color collapses to luminance with PIL's
    exact ``convert("L")`` fixed-point formula — and ``image/jpeg``
    (baseline SOF0 at any integer-ratio sampling — 4:4:4, 4:2:2, and
    the in-the-wild majority 4:2:0 — progressive SOF2, 12-bit
    extended sequential SOF1, and lossless SOF3 at 2..16-bit, both
    r9) decodes through the vendored :mod:`._jpeg` codec, taking the
    stream's own first/Y plane as the luminance grid. The
    ``NotImplementedError`` fires only for variants that genuinely
    need a library (arithmetic-coded and hierarchical JPEG; PNG —
    including Adam7 since r8 — has no decode fences left)."""
    if mime is not None and mime.startswith("image/fake"):
        arr = np.frombuffer(content, dtype=np.uint8)
        side = int(len(arr) ** 0.5)
        return arr[: side * side].reshape(side, side)
    if _HAS_PIL:
        import io

        img = _PILImage.open(io.BytesIO(content))
        if img.mode in ("I", "I;16", "I;16B"):
            # 16-bit samples: PIL's convert("L") CLAMPS >255 to 255;
            # take the high byte instead so PIL and vendored-codec
            # environments produce the same luminance grid
            return (
                np.asarray(img, dtype=np.uint32) >> 8
            ).astype(np.uint8)
        # luminance grid: keeps the downstream (width, height, intensity)
        # contract identical for fake and real payloads
        return np.asarray(img.convert("L"), dtype=np.uint8)
    if mime == "image/png":
        from ._png import decode_png_gray

        return decode_png_gray(content)
    if mime == "image/jpeg":
        from ._jpeg import decode_jpeg_gray

        return decode_jpeg_gray(content)
    raise NotImplementedError(
        "decoding this image format requires an imaging library (PIL) "
        "that is not installed; 'image/fake', 'image/png' (gray/RGB/"
        "RGBA/paletted/sub-byte/16-bit, incl. Adam7), and Huffman "
        "'image/jpeg' (baseline, progressive, 12-bit sequential, "
        "lossless) decode without it"
    )


def decode_images(
    df: DataFrame,
    target_batch_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """mapInPandas decode stage: (asset_id, width, height, mean_intensity).

    The batch iterator shape is the real 100 TB pattern: each Arrow batch
    holds ~target_batch_bytes of content, decoded without ever
    materializing the whole partition.
    """
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mean_intensity", T.DoubleType()),
        ]
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # column zip, not iterrows(): iterrows materializes a
            # Series per row (~100 µs each) — pure overhead next to a
            # sub-ms decode, and real money at corpus scale (r10)
            out = {"asset_id": [], "width": [], "height": [], "mean_intensity": []}
            for aid, content, meta in zip(
                pdf["asset_id"], pdf["content"], pdf["meta"]
            ):
                arr = _decode_stub(content, meta["mime"])
                out["asset_id"].append(aid)
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["mean_intensity"].append(float(arr.mean()))
            yield pd.DataFrame(out)

    return df.select("asset_id", "content", "meta").mapInPandas(
        decode_batches, schema=out_schema
    )


def extract_image_features(
    df: DataFrame, feature_dim: int = 16
) -> DataFrame:
    """Feature-extraction stage: (asset_id, features array<float>).

    STUB embedding: a deterministic hash-seeded projection of the decoded
    pixels — the real model call (ONNX/torch) slots into the same
    mapInPandas body with identical schema and batching.
    """
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            # column zip, not iterrows() (per-row Series cost, r10)
            for aid, content, meta in zip(
                pdf["asset_id"], pdf["content"], pdf["meta"]
            ):
                arr = _decode_stub(content, meta["mime"]).astype(np.float64)
                rng = np.random.RandomState(int(aid) % (2**31))
                proj = rng.randn(arr.size, feature_dim)
                vec = (arr.reshape(1, -1) @ proj).ravel()
                norm = np.linalg.norm(vec)
                feats.append((vec / norm if norm else vec).astype(np.float32).tolist())
                ids.append(aid)
            yield pd.DataFrame({"asset_id": ids, "features": feats})

    return df.select("asset_id", "content", "meta").mapInPandas(
        feat_batches, schema=out_schema
    )


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling plan for video assets: expands each asset into
    (asset_id, frame_ts_ms) rows from metadata duration — the decode of
    each frame is the stubbed step. Pure expression expansion (sequence +
    explode), so the planning stage is JVM-side and scan-shaped."""
    frames = df.filter(F.col("modality") == "video").select(
        "asset_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames


def fake_wav_bytes(asset_id: int, sample_rate: int = 8000, n: int = 200) -> bytes:
    """A REAL (RIFF/PCM16) WAV file with deterministic integer samples
    — ``sample_i = (((asset_id·7919 + i²) mod 2048) − 1024)·16`` — so
    audio decode exercises a genuine container format (stdlib ``wave``
    writer) while every derived statistic stays formula-reproducible
    for the cross-engine oracle. No audio library involved."""
    import io
    import struct
    import wave

    samples = [
        (((int(asset_id) * 7919 + i * i) % 2048) - 1024) * 16
        for i in range(int(n))
    ]
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(int(sample_rate))
    w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    w.close()
    return buf.getvalue()


def fake_jpeg_bytes(asset_id: int, quality: int = 90) -> bytes:
    """A REAL baseline JPEG (SOI/DQT/SOF0/DHT/SOS entropy stream, via
    the vendored :mod:`._jpeg` encoder) holding a 16×16 image of four
    8×8 constant tiles ``v_k = (asset_id·31 + k·57) mod 256`` — block-
    constant tiles survive DCT quantization EXACTLY (DC-only blocks,
    sub-half-pixel error before the final round), so the decoded mean
    is formula-reproducible for the cross-engine oracle while the
    payload still exercises multi-MCU entropy coding, DC prediction,
    and byte stuffing."""
    import numpy as np

    from ._jpeg import encode_jpeg_gray

    v = [(int(asset_id) * 31 + k * 57) % 256 for k in range(4)]
    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8] = v[0]
    img[:8, 8:] = v[1]
    img[8:, :8] = v[2]
    img[8:, 8:] = v[3]
    return encode_jpeg_gray(img, quality=quality)


def fake_jpeg420_bytes(asset_id: int, quality: int = 90) -> bytes:
    """A REAL baseline **4:2:0** color JPEG (Y at 2x2 sampling, one
    subsampled Cb + Cr block per 16x16 MCU — the in-the-wild majority
    layout) holding the same four 8x8 tiles as :func:`fake_jpeg_bytes`
    but as NEUTRAL color (r=g=b=v_k): the JFIF transform then gives
    Y=v exactly and Cb=Cr=128 exactly (the coefficient rows sum to 1
    and 0), so the decoded luminance is still formula-reproducible for
    the cross-engine oracle while the payload exercises the full 4:2:0
    MCU interleave (4 Y blocks + chroma), box subsampling, replication
    upsampling, and the color reconstruction path."""
    import numpy as np

    from ._jpeg import encode_jpeg_rgb

    v = [(int(asset_id) * 31 + k * 57) % 256 for k in range(4)]
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:8, :8] = v[0]
    img[:8, 8:] = v[1]
    img[8:, :8] = v[2]
    img[8:, 8:] = v[3]
    return encode_jpeg_rgb(img, quality=quality, subsampling="4:2:0")


def fake_jpeg_lossless_bytes(asset_id: int) -> bytes:
    """A REAL LOSSLESS (SOF3) grayscale JPEG holding a 16×16 GRADIENT
    ``pixel(y, x) = (asset_id·31 + y·17 + x·5) mod 256`` — lossless
    coding round-trips EVERY image bit-exactly, so the fixture can be
    non-block-constant (a gradient drives all three neighbors a/b/c
    through distinct values every sample) while the decoded mean stays
    formula-reproducible for the cross-engine oracle. The predictor
    cycles with the asset id (``(asset_id mod 7) + 1``), so a corpus
    decode exercises all seven T.81 Table H.1 predictors."""
    import numpy as np

    from ._jpeg import encode_jpeg_lossless

    y, x = np.mgrid[0:16, 0:16]
    img = (int(asset_id) * 31 + y * 17 + x * 5) % 256
    return encode_jpeg_lossless(
        img.astype(np.int64), predictor=(int(asset_id) % 7) + 1
    )


def fake_jpeg12_bytes(asset_id: int, quality: int = 90) -> bytes:
    """A REAL 12-BIT extended sequential (SOF1) grayscale JPEG of four
    8x8 constant tiles ``v_k = (asset_id·31 + k·57) mod 4096`` —
    block-constant tiles survive DCT quantization exactly at 12 bits
    too (DC-only blocks; the quality-90 DC step of 3 leaves the
    per-pixel error under 3/16, inside the final round), so the
    decoded mean is formula-reproducible while the payload exercises
    the Pq=1 quantization tables, the wide (SSSS<=15/14) Huffman
    tables, the 2048 level shift, and the uint16 output path."""
    import numpy as np

    from ._jpeg import encode_jpeg_gray12

    v = [(int(asset_id) * 31 + k * 57) % 4096 for k in range(4)]
    img = np.zeros((16, 16), dtype=np.int64)
    img[:8, :8] = v[0]
    img[:8, 8:] = v[1]
    img[8:, :8] = v[2]
    img[8:, 8:] = v[3]
    return encode_jpeg_gray12(img, quality=quality)


def fake_jpeg_progressive_bytes(asset_id: int, quality: int = 90) -> bytes:
    """A REAL PROGRESSIVE (SOF2, spectral-selection) grayscale JPEG of
    the same four 8x8 tiles as :func:`fake_jpeg_bytes` — one DC scan
    plus two AC band scans, so the decoder's multi-scan coefficient
    accumulation, EOB-run coding, and per-scan Huffman state are all
    on the oracle path; spectral selection at Ah=Al=0 reassembles the
    exact baseline coefficients, so the decoded mean is the identical
    tile formula."""
    import numpy as np

    from ._jpeg import encode_jpeg_gray_progressive

    v = [(int(asset_id) * 31 + k * 57) % 256 for k in range(4)]
    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8] = v[0]
    img[:8, 8:] = v[1]
    img[8:, :8] = v[2]
    img[8:, 8:] = v[3]
    return encode_jpeg_gray_progressive(img, quality=quality)


def decode_audio(
    df: DataFrame,
    target_batch_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """mapInPandas audio decode: parse WAV containers with the REAL
    stdlib ``wave`` reader (no external audio stack needed — PCM WAV is
    a first-class interchange format) and emit per-asset
    (asset_id, n_channels, sample_rate, n_samples, duration_ms,
    rms_q3). Compressed formats (mp3/ogg/flac) raise
    ``NotImplementedError`` — they genuinely need a codec library; the
    plumbing (schema, Arrow batching, error surface) is identical when
    one is swapped in.

    rms is computed from the exact integer sum of squares
    (``sqrt(ssq/n)`` rounded to q3), so the value is reproducible by
    any engine that can regenerate the samples.
    """
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("rms_q3", T.LongType()),
        ]
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import math
        import wave

        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "n_channels", "sample_rate", "n_samples",
                "duration_ms", "rms_q3",
            )}
            # column zip, not iterrows() (per-row Series cost, r10)
            for aid, content, meta in zip(
                pdf["asset_id"], pdf["content"], pdf["meta"]
            ):
                mime = meta["mime"]
                if mime not in ("audio/wav", "audio/x-wav"):
                    raise NotImplementedError(
                        f"decoding {mime!r} needs a codec library; "
                        "PCM WAV decodes with the stdlib reader"
                    )
                w = wave.open(io.BytesIO(bytes(content)), "rb")
                nch, sw, sr, nf = (
                    w.getnchannels(), w.getsampwidth(),
                    w.getframerate(), w.getnframes(),
                )
                frames = w.readframes(nf)
                w.close()
                if sw != 2:
                    raise NotImplementedError("only PCM16 WAV supported")
                x = np.frombuffer(frames, dtype="<i2").astype(np.int64)
                ssq = int((x * x).sum())
                n = len(x)
                rms = math.sqrt(ssq / n) if n else 0.0
                out["asset_id"].append(aid)
                out["n_channels"].append(nch)
                out["sample_rate"].append(sr)
                out["n_samples"].append(n)
                out["duration_ms"].append(n * 1000 // (sr * nch) if sr else 0)
                out["rms_q3"].append(int(math.floor(rms * 1000 + 0.5)))
            yield pd.DataFrame(out)

    return df.select("asset_id", "content", "meta").mapInPandas(
        decode_batches, schema=out_schema
    )


def extract_audio_features(df: DataFrame, n_windows: int = 16) -> DataFrame:
    """Windowed energy profile as the audio embedding stub: mean |x|
    per time window, L2-normalized float32 — the real model call
    (wav2vec/CLAP) slots into the same mapInPandas body with identical
    schema and batching. Runs on genuinely-decoded WAV samples."""
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            ids, feats = [], []
            # column zip, not iterrows() (per-row Series cost, r10)
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                w = wave.open(io.BytesIO(bytes(content)), "rb")
                frames = w.readframes(w.getnframes())
                w.close()
                x = np.abs(
                    np.frombuffer(frames, dtype="<i2").astype(np.float64)
                )
                chunks = np.array_split(x, n_windows)
                vec = np.array([c.mean() if len(c) else 0.0 for c in chunks])
                norm = np.linalg.norm(vec)
                feats.append(
                    (vec / norm if norm else vec).astype(np.float32).tolist()
                )
                ids.append(aid)
            yield pd.DataFrame({"asset_id": ids, "features": feats})

    return df.select("asset_id", "content", "meta").mapInPandas(
        feat_batches, schema=out_schema
    )
