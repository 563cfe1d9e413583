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
    if len(buf) < 2:
        # a 1-byte payload makes the half-buffer means np.mean([]) = NaN
        # with only a RuntimeWarning — silent NaN features instead of a
        # poison row
        raise ValueError("payload too short to featurize (< 2 bytes)")
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


def _parse_avi(buf: bytes):
    """Minimal RIFF/AVI demuxer — pure stdlib byte walking, no codec
    libraries (r5: upgrades the video path from contract-only to a REAL
    container parse). Returns ``(width, height, bit_count,
    compression, frames)`` for the FIRST 'vids' stream, where
    ``compression`` is the strf fourcc (b'\\x00'*4 = BI_RGB raw DIB,
    b'MJPG' = motion JPEG) and ``frames`` the ordered list of that
    stream's '##db'/'##dc' chunk payloads from the movi list ('rec '
    sub-lists included). Raises ValueError on anything malformed — the
    poison-row wrapper upstream turns that into data."""
    import struct

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    def walk(lo: int, hi: int):
        """Yield (fourcc, body_lo, body_hi) for each chunk in [lo, hi)."""
        p = lo
        while p + 8 <= hi:
            fcc = buf[p : p + 4]
            (sz,) = struct.unpack("<I", buf[p + 4 : p + 8])
            body = p + 8
            end = min(body + sz, hi)
            yield fcc, body, end
            p = body + sz + (sz & 1)  # chunks are word-aligned

    width = height = bits = None
    compression = None
    vid_stream = None
    frames: list[bytes] = []

    def scan_hdrl(lo: int, hi: int):
        nonlocal width, height, bits, compression, vid_stream
        stream_no = -1
        for fcc, b, e in walk(lo, hi):
            if fcc == b"LIST" and buf[b : b + 4] == b"strl":
                stream_no += 1
                is_vids = False
                for f2, b2, e2 in walk(b + 4, e):
                    if f2 == b"strh" and buf[b2 : b2 + 4] == b"vids":
                        is_vids = True
                    elif f2 == b"strf" and is_vids and vid_stream is None:
                        if e2 - b2 < 20:
                            raise ValueError("strf too short")
                        width, height, _, bits = struct.unpack(
                            "<iiHH", buf[b2 + 4 : b2 + 16]
                        )
                        compression = buf[b2 + 16 : b2 + 20]
                        vid_stream = stream_no

    def scan_movi(lo: int, hi: int):
        tag = b"%02dd" % vid_stream  # e.g. stream 0 → chunks '00db'/'00dc'
        for fcc, b, e in walk(lo, hi):
            if fcc == b"LIST" and buf[b : b + 4] == b"rec ":
                scan_movi(b + 4, e)
            elif fcc[:3] == tag and fcc[3:] in (b"b", b"c"):
                frames.append(buf[b:e])

    for fcc, b, e in walk(12, len(buf)):
        if fcc == b"LIST" and buf[b : b + 4] == b"hdrl":
            scan_hdrl(b + 4, e)
        elif fcc == b"LIST" and buf[b : b + 4] == b"movi":
            if vid_stream is None:
                raise ValueError("movi before any vids stream header")
            scan_movi(b + 4, e)
    if vid_stream is None or width is None:
        raise ValueError("no video stream in AVI")
    return int(width), int(height), int(bits), compression, frames


def _decode_dib_frame(data: bytes, w: int, h: int, bits: int) -> np.ndarray:
    """Uncompressed BI_RGB DIB frame → the IMAGE_FEATURE_DIM vector with
    the same semantics as the PIL image path: [w, h, mean_R, mean_G,
    mean_B, std_gray, min_gray, max_gray]. Pure numpy: rows are
    bottom-up, BGR, padded to 4-byte stride — no codec needed, so this
    REAL decode runs even in codec-less containers."""
    if bits != 24:
        raise ValueError(f"only 24-bit BI_RGB DIB supported, got {bits}")
    if w <= 0 or h == 0:
        # zero/negative width passes the stride*height length check with
        # stride 0 and would emit silent all-NaN channel means
        raise ValueError(f"invalid DIB dimensions {w}x{h}")
    hh = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(data) < stride * hh:
        raise ValueError("DIB frame shorter than stride * height")
    a = (
        np.frombuffer(data[: stride * hh], dtype=np.uint8)
        .reshape(hh, stride)[:, : w * 3]
        .reshape(hh, w, 3)
        .astype(np.float64)
    )
    if h > 0:  # positive height = bottom-up rows
        a = a[::-1]
    a = a[:, :, ::-1]  # BGR → RGB
    gray = a.mean(axis=2)
    return np.array(
        [
            float(w),
            float(hh),
            a[:, :, 0].mean(),
            a[:, :, 1].mean(),
            a[:, :, 2].mean(),
            gray.std(),
            gray.min(),
            gray.max(),
        ]
    )


def _decode_avi_frames(buf: bytes, every_n: int):
    """Demux + decode every ``every_n``-th frame of an AVI payload.
    Yields (frame_idx, feature_vector). BI_RGB streams decode with pure
    numpy; MJPG streams decode each sampled JPEG via the PIL gate
    (without Pillow the payload raises NotImplementedError and becomes
    a poison row, same as compressed images)."""
    w, h, bits, compression, frames = _parse_avi(buf)
    if not frames:
        raise ValueError("AVI contains no video frames")
    comp = compression.rstrip(b"\x00")
    for fi in range(0, len(frames), every_n):
        if comp == b"":
            yield fi, _decode_dib_frame(frames[fi], w, h, bits)
        elif comp in (b"MJPG", b"mjpg"):
            if not HAS_PIL:
                raise NotImplementedError(
                    "MJPG AVI frames need Pillow; install it or re-encode "
                    "to BI_RGB"
                )
            yield fi, _decode_image_bytes_pil(frames[fi])
        else:
            raise NotImplementedError(
                f"unsupported AVI compression {compression!r}"
            )


def sample_video_frames(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id",
    every_n: int = 10, decoder: str = "auto",
) -> DataFrame:
    """Frame-sampling contract: one output row per sampled frame with a
    frame index; a media whose payload is NULL/empty or whose decode
    fails emits ONE row with frame_idx=-1, NULL features, and the error
    string — downstream can distinguish "decode failed" from "no
    frames" and a poison row never kills the job (same contract as
    extract_image_features). The EXPLODED row shape (media × frame) is
    the part that matters for downstream joins/partitioning.

    decoder (r5):
    - "auto" (default): payloads carrying the RIFF/AVI magic demux for
      REAL through :func:`_parse_avi` (BI_RGB frames decode with pure
      numpy; MJPG frames via the PIL gate); anything else falls back to
      the deterministic byte-stride stub, preserving the prior contract
      for opaque payloads.
    - "avi": force the real demuxer — non-AVI payloads become poison
      rows.
    - "stub": force the byte-stride stub."""
    if int(every_n) < 1:
        # a caller bug, not per-row data: every_n=0 would make range()
        # raise inside the poison-row catch and silently poison EVERY
        # media row in the dataset
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    if decoder not in ("auto", "avi", "stub"):
        raise ValueError(f"unknown decoder {decoder!r}; use auto|avi|stub")
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
                # Per-media staging: a demuxer that yields some frames and
                # THEN raises (truncated chunk mid-stream) must not leave
                # partial frame rows next to the poison row — the contract
                # is all-frames XOR one frame_idx=-1 row per media.
                m_idxs, m_feats = [], []
                try:
                    if buf is None:
                        raise ValueError("null content")
                    b = bytes(buf)
                    is_avi = (
                        len(b) >= 12
                        and b[:4] == b"RIFF"
                        and b[8:12] == b"AVI "
                    )
                    if decoder == "avi" or (decoder == "auto" and is_avi):
                        for fi, vec in _decode_avi_frames(b, every_n):
                            m_idxs.append(fi)
                            m_feats.append(vec.tolist())
                    else:
                        # stub "frames": fixed-size strides over the payload
                        n_frames = max(1, len(b) // 64)
                        for fi in range(0, n_frames, every_n):
                            chunk = b[fi * 64 : (fi + 1) * 64]
                            if not chunk:
                                continue
                            m_idxs.append(fi)
                            m_feats.append(_decode_image_bytes(chunk).tolist())
                    if not m_idxs:
                        raise ValueError("empty payload: no frames")
                    ids.extend([mid] * len(m_idxs))
                    idxs.extend(m_idxs)
                    feats.extend(m_feats)
                    errs.extend([None] * len(m_idxs))
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
