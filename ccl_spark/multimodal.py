"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
metadata; decode / feature-extract / frame-sample are Arrow-batched
mapInPandas stages. The decoders for UNCOMPRESSED containers are REAL
pure-numpy parsers — no codec library needed:

- BMP  (BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bit BI_RGB,
        bottom-up BGR rows padded to 4 bytes)
- PNG  (8-bit truecolor, stdlib zlib inflate + pure-numpy scanline
        unfiltering, all five filter types on decode)
- WAV  (RIFF/WAVE, PCM 16-bit mono)
- AVI  (RIFF/'AVI ', 'vids'/'DIB ' stream, raw bottom-up DIB frames
        in '00db' movi chunks)

so decode -> feature is an actual pixel/sample pipeline. Lossy codec
formats (JPEG/MP4/Ogg/WebM — their libraries are not in this
container) hit a documented NotImplementedError at the exact seam a
codec would occupy; ``real_decode=False`` switches to a deterministic
byte-fold stand-in for fully opaque payloads.

synth_media emits VALID containers of all three kinds, so the default
end-to-end path (synth -> parse -> feature) exercises real decoding.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = "media_id long, kind string, payload binary, width int, height int, duration_ms int"
FEATURES_SCHEMA = "media_id long, kind string, n_bytes long, width int, height int, feature array<float>"
FRAMES_SCHEMA = "media_id long, frame_idx int, frame_feature array<float>"

_AVI_FPS = 4  # synth video frame rate (250 ms per frame)


# --------------------------------------------------------------------------
# container writers (used by synth_media; also handy as sinks)
# --------------------------------------------------------------------------

def bmp_encode(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP bytes (bottom-up BGR)."""
    h, w = pixels.shape[:2]
    stride = (3 * w + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = pixels[::-1, :, ::-1].reshape(h, 3 * w)  # flip+BGR
    size = 54 + h * stride
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, h * stride, 2835, 2835, 0, 0)
    return hdr + dib + rows.tobytes()


def wav_encode(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 PCM mono samples -> RIFF/WAVE bytes."""
    data = samples.astype("<i2").tobytes()
    return (
        struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + len(data), b"WAVE",
            b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
            b"data", len(data),
        )
        + data
    )


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _riff_list(fourcc: bytes, data: bytes) -> bytes:
    return b"LIST" + struct.pack("<I", len(data) + 4) + fourcc + data


def avi_encode(frames: list[np.ndarray], fps: int = _AVI_FPS) -> bytes:
    """List of (h, w, 3) uint8 RGB frames -> uncompressed-DIB AVI bytes."""
    h, w = frames[0].shape[:2]
    stride = (3 * w + 3) // 4 * 4
    frame_size = h * stride
    avih = struct.pack(
        "<10I", 1_000_000 // fps, frame_size * fps, 0, 0x10,
        len(frames), 0, 1, frame_size, w, h,
    ) + b"\x00" * 16
    strh = (
        b"vidsDIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), frame_size, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = _riff_list(
        b"hdrl",
        _chunk(b"avih", avih) + _riff_list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_frames = []
    for f in frames:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : 3 * w] = f[::-1, :, ::-1].reshape(h, 3 * w)
        movi_frames.append(_chunk(b"00db", rows.tobytes()))
    movi = _riff_list(b"movi", b"".join(movi_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray, level: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG bytes (8-bit truecolor, filter 0 per
    scanline). Default compression level 0 emits deflate STORED blocks,
    so the container size is a closed formula the driver-gate oracle
    re-derives independently: 68 + h*(3w+1) bytes while the filtered
    scanlines fit one stored block (<= 65531 bytes)."""
    import zlib

    h, w = pixels.shape[:2]
    raw = b"".join(
        b"\x00" + pixels[y].astype(np.uint8).tobytes() for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, level))
        + _png_chunk(b"IEND", b"")
    )


def png_decode(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB — stdlib zlib inflate + pure
    numpy/python unfiltering, ALL five scanline filters (None/Sub/Up/
    Average/Paeth), so PNGs from external writers decode too. 8-bit
    truecolor (color type 2), non-interlaced only — the variants a
    synth/feature pipeline emits; others refuse like the BMP guards."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, w, h, idat = 8, None, None, b""
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} interlace={interlace}: "
                    "only 8-bit truecolor non-interlaced"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    stride = 3 * w
    raw = zlib.decompress(idat)
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub: per-channel cumulative sum mod 256
            rec = line.copy()
            for ch in range(3):
                rec[ch::3] = np.cumsum(line[ch::3]) % 256
        elif ftype == 2:  # Up
            rec = (line + prior) % 256
        elif ftype in (3, 4):  # Average / Paeth: sequential in x
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - 3] if x >= 3 else 0
                up = prior[x]
                if ftype == 3:
                    pred = (left + up) // 2
                else:
                    ul = prior[x - 3] if x >= 3 else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                rec[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"PNG scanline filter {ftype} invalid")
        out[y] = rec
        prior = rec.astype(np.int32)
    return out.reshape(h, w, 3)


# --------------------------------------------------------------------------
# container parsers (pure numpy/struct — the real decode path)
# --------------------------------------------------------------------------

def _dib_rows_to_rgb(raw: bytes, w: int, h: int) -> np.ndarray:
    stride = (3 * w + 3) // 4 * 4
    rows = np.frombuffer(raw, np.uint8, count=h * stride).reshape(h, stride)
    return rows[:, : 3 * w].reshape(h, w, 3)[::-1, :, ::-1]  # bottom-up BGR -> RGB


def bmp_decode(payload: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB. 24-bit BI_RGB only."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}: only 24-bit BI_RGB")
    if h < 0:
        # top-down BMP (negative biHeight): rows are NOT bottom-up, so
        # the flip in _dib_rows_to_rgb would mirror the image — refuse
        # like the other unsupported-variant guards (ADVICE r3)
        raise NotImplementedError("top-down BMP (negative biHeight) not supported")
    return _dib_rows_to_rgb(payload[off:], w, h)


def _riff_chunks(data: bytes) -> Iterator[tuple[bytes, bytes]]:
    pos = 0
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size % 2)


def wav_decode(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, int16 sample array). PCM16 mono only."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    rate, samples = None, None
    for fourcc, body in _riff_chunks(payload[12:]):
        if fourcc == b"fmt ":
            fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt != 1 or ch != 1 or bits != 16:
                raise NotImplementedError(f"WAV fmt={fmt} ch={ch} bits={bits}: only PCM16 mono")
        elif fourcc == b"data":
            samples = np.frombuffer(body, dtype="<i2")
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, samples


def avi_decode(payload: bytes) -> tuple[int, int, int, list[np.ndarray]]:
    """AVI bytes -> (width, height, usec_per_frame, [RGB frames])."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    w = h = uspf = None
    frames: list[np.ndarray] = []
    for fourcc, body in _riff_chunks(payload[12:]):
        if fourcc != b"LIST":
            continue
        kind, body = body[:4], body[4:]
        if kind == b"hdrl":
            for cc, chunk in _riff_chunks(body):
                if cc == b"avih":
                    vals = struct.unpack_from("<10I", chunk, 0)
                    uspf, w, h = vals[0], vals[8], vals[9]
        elif kind == b"movi":
            for cc, chunk in _riff_chunks(body):
                if cc in (b"00db", b"00dc"):
                    frames.append(_dib_rows_to_rgb(chunk, w, h))
    if w is None:
        raise ValueError("AVI missing avih header")
    return w, h, uspf, frames


_CODEC_MAGICS = {
    b"\xff\xd8\xff": "JPEG",
    b"OggS": "Ogg",
    b"\x1a\x45\xdf\xa3": "Matroska/WebM",
}


def _codec_seam(payload: bytes) -> None:
    """The exact seam a codec library would occupy: recognized
    compressed formats raise with the format name."""
    for magic, name in _CODEC_MAGICS.items():
        if payload[: len(magic)] == magic:
            raise NotImplementedError(
                f"{name} decode requires a codec library (PIL/ffmpeg), "
                "not in this container; plug the decoder in here"
            )
    if len(payload) > 11 and payload[4:8] == b"ftyp":
        raise NotImplementedError(
            "MP4/MOV decode requires ffmpeg, not in this container; "
            "plug the decoder in here"
        )
    raise NotImplementedError(f"unrecognized media container: {payload[:8]!r}")


# --------------------------------------------------------------------------
# synthetic media + feature extraction
# --------------------------------------------------------------------------

def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table with VALID containers: BMP and PNG
    images (ids alternate: i%6==0 -> BMP, i%6==3 -> PNG), PCM16 WAV
    audio, uncompressed-DIB AVI video (seeded content)."""

    def gen(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in pdf_iter:
            rows = []
            for i in pdf["id"].tolist():
                rng = np.random.default_rng(seed * 1_000_003 + i)
                kind = kinds[i % 3]
                w, h = int(16 + (i % 64)), int(16 + (i % 48))
                if kind == "image":
                    pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                    payload = png_encode(pix) if i % 6 == 3 else bmp_encode(pix)
                    meta = (w, h, 0)
                elif kind == "audio":
                    dur = int(1000 + 37 * (i % 100))
                    payload = wav_encode(
                        rng.integers(-(1 << 15), 1 << 15, size=dur * 8, dtype=np.int16), 8000
                    )
                    meta = (0, 0, dur)
                else:
                    nf = 2 + (i % 3)
                    payload = avi_encode(
                        [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(nf)],
                        _AVI_FPS,
                    )
                    meta = (w, h, nf * 1000 // _AVI_FPS)
                rows.append((i, kind, payload, *meta))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "width", "height", "duration_ms"]
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fold(arr: np.ndarray, dim: int) -> list[float]:
    """Fold a float array into a fixed-size feature by block means."""
    arr = arr.astype(np.float32).ravel()
    pad = (-len(arr)) % dim
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, np.float32)])
    return arr.reshape(-1, dim).mean(axis=0).tolist()


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic byte-fold stand-in for fully opaque payloads."""
    return _fold(np.frombuffer(payload, dtype=np.uint8) / 255.0, dim)


def _image_decode(payload: bytes) -> np.ndarray:
    """Dispatch BMP/PNG still-image payloads to their parser."""
    if payload[:2] == b"BM":
        return bmp_decode(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return png_decode(payload)
    raise ValueError(f"not a supported still-image container: {payload[:8]!r}")


def _image_encode(pixels: np.ndarray, like: bytes) -> bytes:
    """Re-encode pixels in the same container family as ``like``."""
    return png_encode(pixels) if like[:8] == b"\x89PNG\r\n\x1a\n" else bmp_encode(pixels)


def _real_decode_row(payload: bytes, dim: int) -> tuple[int, int, list[float]]:
    """Parse the container, return (width, height, feature) from the
    DECODED pixels/samples — not from metadata columns."""
    if payload[:2] == b"BM" or payload[:8] == b"\x89PNG\r\n\x1a\n":
        pix = _image_decode(payload)
        return pix.shape[1], pix.shape[0], _fold(pix / 255.0, dim)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        _, samples = wav_decode(payload)
        x = samples.astype(np.float32) / 32768.0
        n = max(len(x) // dim, 1)
        rms = [float(np.sqrt(np.mean(x[j * n : (j + 1) * n] ** 2))) for j in range(dim)]
        return 0, 0, rms
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        w, h, _, frames = avi_decode(payload)
        feats = np.array([_fold(f / 255.0, dim) for f in frames], dtype=np.float32)
        return w, h, feats.mean(axis=0).tolist()
    _codec_seam(payload)
    raise AssertionError("unreachable")


def decode_features(
    media: DataFrame, dim: int = 16, real_decode: bool = True
) -> DataFrame:
    """Per-item feature extraction from DECODED media (BMP pixels, WAV
    samples, AVI frames — pure-numpy parsers; compressed formats raise
    at the codec seam). ``real_decode=False`` byte-folds the payload
    instead (opaque-format stand-in). Arrow-batched mapInPandas."""

    def batch(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            if real_decode:
                decoded = [_real_decode_row(p, dim) for p in pdf["payload"]]
                widths = [d[0] for d in decoded]
                heights = [d[1] for d in decoded]
                feats = [d[2] for d in decoded]
            else:
                widths, heights = pdf["width"], pdf["height"]
                feats = [_fake_decode(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": widths,
                    "height": heights,
                    "feature": feats,
                }
            )

    return media.mapInPandas(batch, schema=FEATURES_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, real_decode: bool = True
) -> DataFrame:
    """Resize every image row to (width, height) — decode the BMP/PNG,
    nearest-neighbor resample in one numpy take, re-encode in the same
    container family; non-image
    rows pass through untouched. Arrow-batched; same media schema out,
    so resize stages compose with decode/feature stages."""

    def batch(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            rows = []
            for mid, kind, payload, w0, h0, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"],
                pdf["width"], pdf["height"], pdf["duration_ms"],
            ):
                if kind != "image":
                    rows.append((mid, kind, payload, w0, h0, dur))
                    continue
                if not real_decode:
                    rows.append((mid, kind, payload, width, height, dur))
                    continue
                pix = _image_decode(payload)
                h_src, w_src = pix.shape[:2]
                yi = (np.arange(height) * h_src) // height
                xi = (np.arange(width) * w_src) // width
                resized = pix[yi][:, xi]
                rows.append((mid, kind, _image_encode(resized, payload), width, height, dur))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "width", "height", "duration_ms"],
            )

    return media.mapInPandas(batch, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 500, dim: int = 8, real_decode: bool = True
) -> DataFrame:
    """One feature row per sampled video frame. Real path: parse the
    AVI, pick frames on an ``every_ms`` grid (by the container's
    frame period), feature = fold of the frame's decoded pixels."""

    def batch(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            out_id, out_idx, out_feat = [], [], []
            for mid, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["duration_ms"]
            ):
                if kind != "video":
                    continue
                if real_decode:
                    _, _, uspf, frames = avi_decode(payload)
                    period_ms = max(uspf // 1000, 1)
                    step = max(every_ms // period_ms, 1)
                    for fi in range(0, len(frames), step):
                        out_id.append(mid)
                        out_idx.append(fi)
                        out_feat.append(_fold(frames[fi] / 255.0, dim))
                else:
                    if dur <= 0:
                        continue
                    for fi in range(int(max(1, dur // every_ms))):
                        lo = (fi * 31) % max(len(payload) - dim, 1)
                        out_id.append(mid)
                        out_idx.append(fi)
                        out_feat.append(_fake_decode(payload[lo : lo + dim * 4], dim))
            if out_id:  # an all-empty batch would mistype the list column
                yield pd.DataFrame(
                    {"media_id": out_id, "frame_idx": out_idx, "frame_feature": out_feat}
                )

    return media.mapInPandas(batch, schema=FRAMES_SCHEMA)
