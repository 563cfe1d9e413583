"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Decode is IMPORT-GATED (same pattern as the openpyxl/iceberg gates in
sources/): when Pillow is installed, `extract_image_features` decodes
real images (`_decode_image_bytes_pil`); when it is not — this test
container ships no codec libraries — the deterministic byte-statistics
stub stands in. Either way everything Spark-side is identical and
tested: schema contract, Arrow batch shape, mapInPandas signature,
partitioning, and the poison-row contract (a row that fails decode
yields NULL features + an error string, never a job failure).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # pragma: no cover - exercised only where Pillow is installed
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

IMAGE_FEATURE_DIM = 8

image_meta_schema = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def _decode_image_bytes(buf: bytes) -> np.ndarray:
    """STUB decoder. Real version: PIL.Image.open(BytesIO(buf)) → resize
    → channel means/hists. Deterministic fake: byte-level statistics so
    unit tests can pin exact outputs.

    Raises NotImplementedError for mime types a real codec would need —
    callers must treat decode failures as data, not crashes.
    """
    if not buf:
        raise NotImplementedError("empty payload: real codec required")
    a = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
    return np.array(
        [
            len(a),
            a.mean(),
            a.std(),
            a.min(),
            a.max(),
            np.median(a),
            a[: len(a) // 2].mean(),
            a[len(a) // 2 :].mean(),
        ]
    )


def _decode_image_bytes_pil(buf: bytes) -> np.ndarray:
    """Real decoder (used when Pillow is importable): decode → RGB →
    the same IMAGE_FEATURE_DIM-wide vector shape as the stub, but with
    image semantics: [width, height, mean_R, mean_G, mean_B, std_gray,
    min_gray, max_gray]. Bad/truncated payloads raise (PIL's
    UnidentifiedImageError subclasses ValueError) and become poison-row
    data upstream."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(buf)) as im:
        w, h = im.size
        a = np.asarray(im.convert("RGB"), dtype=np.float64)
    gray = a.mean(axis=2)
    return np.array(
        [
            float(w),
            float(h),
            a[:, :, 0].mean(),
            a[:, :, 1].mean(),
            a[:, :, 2].mean(),
            gray.std(),
            gray.min(),
            gray.max(),
        ]
    )


def _pick_decoder(decoder: str):
    """'auto' → PIL when installed else stub; 'pil'/'stub' force one
    ('pil' without Pillow raises up front with an actionable message,
    mirroring the openpyxl gate in sources/readers.py)."""
    if decoder == "auto":
        decoder = "pil" if HAS_PIL else "stub"
    if decoder == "pil":
        if not HAS_PIL:
            raise ImportError(
                "decoder='pil' requires Pillow (pip install Pillow); "
                "use decoder='stub' or 'auto' for the deterministic "
                "byte-statistics fallback"
            )
        return _decode_image_bytes_pil
    if decoder == "stub":
        return _decode_image_bytes
    raise ValueError(f"unknown decoder {decoder!r}; use auto|pil|stub")


def _poison_exceptions():
    """The ONE catch tuple every decode leg shares. Broad on purpose —
    fuzzing 20k corrupted WAVs showed the stdlib wave module raising
    bare RuntimeError (Chunk.skip's invalid seek) in ~5% of cases, and
    struct.error in header parses; a tuple hand-picked per leg is
    exactly how that job-killer slipped in. KeyboardInterrupt /
    MemoryError stay fatal (not subclasses of Exception we list)."""
    import struct
    import wave

    return (NotImplementedError, ValueError, TypeError, OSError,
            EOFError, RuntimeError, struct.error, wave.Error)


def _feature_extractor(df, content_col, id_col, decode_one):
    """Shared mapInPandas poison-row wrapper: binary → fixed-width
    feature vector, failures become (NULL features, error string) rows
    — at 10^12 scale a poison row must never kill the pipeline. Arrow
    streams the binary column in bounded batches
    (spark.sql.execution.arrow.maxRecordsPerBatch)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("decode_error", T.StringType()),
        ]
    )

    def decode(batches):
        exc = _poison_exceptions()
        for pdf in batches:
            feats, errs = [], []
            for buf in pdf[content_col]:
                try:
                    # buf may be NULL (bytes(None) is a TypeError, which
                    # must be data, not a job-killer)
                    if buf is None:
                        raise ValueError("null content")
                    feats.append(decode_one(bytes(buf)).tolist())
                    errs.append(None)
                except exc as ex:
                    feats.append(None)
                    errs.append(f"{type(ex).__name__}: {ex}")
            yield pd.DataFrame(
                {id_col: pdf[id_col], "features": feats, "decode_error": errs}
            )

    return df.select(id_col, content_col).mapInPandas(decode, schema=out_schema)


def extract_image_features(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id",
    decoder: str = "auto",
) -> DataFrame:
    """binary image → feature vector via the shared poison-row wrapper
    (_feature_extractor); decoder= selects the PIL-gated real path or
    the deterministic stub."""
    return _feature_extractor(df, content_col, id_col, _pick_decoder(decoder))


def sample_video_frames(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id",
    every_n: int = 10,
) -> DataFrame:
    """Frame-sampling contract: one output row per sampled frame with a
    frame index; a media whose payload is NULL/empty or whose decode
    fails emits ONE row with frame_idx=-1, NULL features, and the error
    string — downstream can distinguish "decode failed" from "no
    frames" and a poison row never kills the job (same contract as
    extract_image_features). Decode is the same stub; the EXPLODED row
    shape (media × frame) is the part that matters for downstream
    joins/partitioning."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("decode_error", T.StringType()),
        ]
    )

    def decode(batches):
        for pdf in batches:
            ids, idxs, feats, errs = [], [], [], []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                try:
                    if buf is None:
                        raise ValueError("null content")
                    b = bytes(buf)
                    # fake "frames": fixed-size strides over the payload
                    n_frames = max(1, len(b) // 64)
                    emitted = False
                    for fi in range(0, n_frames, every_n):
                        chunk = b[fi * 64 : (fi + 1) * 64]
                        if not chunk:
                            continue
                        ids.append(mid)
                        idxs.append(fi)
                        feats.append(_decode_image_bytes(chunk).tolist())
                        errs.append(None)
                        emitted = True
                    if not emitted:
                        raise ValueError("empty payload: no frames")
                except _poison_exceptions() as ex:
                    ids.append(mid)
                    idxs.append(-1)
                    feats.append(None)
                    errs.append(str(ex))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "features": feats,
                 "decode_error": errs}
            )

    return df.select(id_col, content_col).mapInPandas(decode, schema=out_schema)


def _decode_wav_bytes(buf: bytes) -> np.ndarray:
    """REAL audio decode for PCM WAV via the stdlib (wave + numpy — no
    external codec needed): [duration_sec, sample_rate, n_channels,
    rms, peak, zero_crossing_rate] over the normalized mono mixdown.
    Raises on non-WAV / compressed-WAV payloads (the poison-row wrapper
    catches wave.Error as data)."""
    import io
    import wave

    with wave.open(io.BytesIO(buf), "rb") as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        sw = w.getsampwidth()
        n = w.getnframes()
        raw = w.readframes(n)
    if sw == 1:  # 8-bit WAV is unsigned
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    if not len(x):
        raise ValueError("empty audio payload: no frames")
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.max(np.abs(x)))
    # a legitimate 1-frame WAV has no sample pairs: zcr is 0 by
    # definition, not np.mean([]) = NaN silently poisoning downstream
    zcr = (float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
           if len(x) > 1 else 0.0)
    return np.array([n / sr if sr else 0.0, float(sr), float(nch),
                     rms, peak, zcr])


def extract_audio_features(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id",
) -> DataFrame:
    """binary audio → fixed-width feature vector via mapInPandas — the
    audio leg of the multimodal contract (same Arrow batching +
    poison-row shape as extract_image_features). PCM WAV decodes FOR
    REAL through the stdlib; any other container (mp3/ogg/flac — codecs
    absent in this environment) becomes a poison row with the error
    string, never a job failure (the shared catch includes the bare
    RuntimeError the stdlib wave module raises on fuzzed chunk sizes —
    found by a 20k-corruption fuzz, see _poison_exceptions)."""
    return _feature_extractor(df, content_col, id_col, _decode_wav_bytes)
