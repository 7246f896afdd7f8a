"""Pure-numpy codecs for library-free media formats.

The sandbox ships no PIL/ffmpeg/torchaudio, but two real interchange
formats need nothing beyond byte arithmetic, so their decode paths are
REAL here (not stubbed): RIFF/WAVE PCM-16 audio and uncompressed
24-bit BI_RGB BMP images — and PNG, whose only compressor is
DEFLATE (stdlib zlib), is decoded for real too (8-bit grey/RGB/RGBA,
non-interlaced, all five row filters). JPEG/MP4 stay honestly stubbed
in multimodal.py — wiring a real library on a real
cluster swaps only the per-format branch, the Spark plumbing is
identical.

Also defines GSV1, a minimal documented frame container (magic +
frame interval + length-prefixed BMP frames) so video frame-sampling
exercises real byte-level demuxing + per-frame decode instead of a
pretend plan.

Everything is deterministic and endian-explicit (little-endian, as
both formats specify), so encoded bytes and decoded features are
stable across platforms — which is what lets the driver's DuckDB
oracle reproduce decoded statistics analytically.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# WAV (RIFF / PCM signed 16-bit little-endian)
# ---------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, sample_rate: int = 16000,
               n_channels: int = 1) -> bytes:
    """Encode int16 samples (interleaved if multi-channel) as PCM WAV."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    if s.size % n_channels:
        raise ValueError("sample count not divisible by channel count")
    data = s.tobytes()
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_channels,
                                sample_rate, byte_rate, block_align, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def wav_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a PCM-16 WAV: (sample_rate, n_channels, int16 samples).

    Walks the RIFF chunk list properly (fmt/data may be preceded by
    LIST/fact chunks in the wild); rejects non-PCM / non-16-bit.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    sample_rate = n_channels = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, n_channels, sample_rate = struct.unpack_from(
                "<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_tag != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM-16 supported (fmt={fmt_tag}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)          # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return sample_rate, n_channels, np.frombuffer(data, dtype="<i2")


def audio_features(payload: bytes) -> dict:
    """Exact-integer audio statistics from a PCM WAV payload.

    ``sumsq`` is the exact int64 sum of squared samples so downstream
    RMS = sqrt(sumsq/n) is bit-reproducible across engines (no
    accumulation-order float drift); zcr counts sign boundaries over
    the interleaved stream.
    """
    sr, nch, s = wav_decode(payload)
    n = int(s.size)
    frames = n // nch if nch else 0
    s64 = s.astype(np.int64)
    sumsq = int((s64 * s64).sum())
    peak = int(np.abs(s64).max()) if n else 0
    zc = int(((s64[:-1] >= 0) != (s64[1:] >= 0)).sum()) if n > 1 else 0
    return {
        "sample_rate": sr, "n_channels": nch, "n_samples": n,
        "duration_ms": frames * 1000 // sr if sr else 0,
        "sumsq": sumsq, "peak": peak, "zero_crossings": zc,
    }


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit BI_RGB)
# ---------------------------------------------------------------------------


def bmp_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a bottom-up 24-bit BMP."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    file_hdr = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                           len(data), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + data


def bmp_decode(payload: bytes) -> np.ndarray:
    """Decode a 24-bit BI_RGB BMP into an (h, w, 3) uint8 RGB array.

    Handles bottom-up (positive height) and top-down (negative height)
    layouts and 4-byte row padding; rejects palettes/compression."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=h * stride, offset=data_off)
    rows = raw.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]                    # BGR -> RGB
    return rgb if top_down else rgb[::-1]


def image_features(payload: bytes) -> dict:
    """Exact-integer image statistics from a BMP or PNG payload
    (PNG: real zlib+unfilter decode, png_decode below; grey/RGBA
    normalize to RGB first).

    Channel sums are exact int64 (the oracle divides later if it wants
    means). ``ahash`` is an 8×8 average hash computed entirely in
    integer arithmetic so it is bit-identical cross-engine: luminance
    = 299R+587G+114B (×1000 fixed point, no division), block sums over
    the integer partition boundaries i*h//8, bit set iff
    64·blocksum·blockarea_total > totalsum·blockarea·64 — reduced to
    the cross-multiplied integer comparison below.
    """
    if payload[:8] == _PNG_MAGIC:
        px = _to_rgb(png_decode(payload)).astype(np.int64)
    else:
        px = bmp_decode(payload).astype(np.int64)
    h, w, _ = px.shape
    sums = px.sum(axis=(0, 1))
    lum = 299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
    ys = [i * h // 8 for i in range(9)]
    xs = [j * w // 8 for j in range(9)]
    blocks = np.empty((8, 8), dtype=np.int64)
    areas = np.empty((8, 8), dtype=np.int64)
    for i in range(8):
        for j in range(8):
            blk = lum[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
            blocks[i, j] = blk.sum()
            areas[i, j] = blk.size
    total = int(lum.sum())
    # bit set iff block mean > image mean, cross-multiplied exact:
    #   blocksum / area > total / (h*w)   ≡   blocksum*h*w > total*area
    bits = (blocks * (h * w)) > (total * areas)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64).reshape(8, 8)
    ahash = int((bits.astype(np.uint64) * weights).sum(dtype=np.uint64)
                .view(np.int64))
    return {
        "width": w, "height": h,
        "sum_r": int(sums[0]), "sum_g": int(sums[1]), "sum_b": int(sums[2]),
        "ahash": ahash,
    }


# ---------------------------------------------------------------------------
# GSV1 — minimal frame container (length-prefixed BMP frames)
# ---------------------------------------------------------------------------

_GSV1_MAGIC = b"GSV1"


def gsv1_encode(frames: list[np.ndarray], frame_interval_ms: int) -> bytes:
    """Pack RGB frames into the GSV1 container:
    magic | u32 n_frames | u32 frame_interval_ms | (u32 len | BMP)*"""
    out = [_GSV1_MAGIC,
           struct.pack("<II", len(frames), frame_interval_ms)]
    for f in frames:
        b = bmp_encode(f)
        out.append(struct.pack("<I", len(b)))
        out.append(b)
    return b"".join(out)


def gsv1_frames(payload: bytes):
    """Demux GSV1: yields (frame_index, frame_ts_ms, bmp_bytes)."""
    if payload[:4] != _GSV1_MAGIC:
        raise ValueError("not a GSV1 payload")
    n_frames, interval = struct.unpack_from("<II", payload, 4)
    pos = 12
    for i in range(n_frames):
        (sz,) = struct.unpack_from("<I", payload, pos)
        yield i, i * interval, payload[pos + 4:pos + 4 + sz]
        pos += 4 + sz


def gsv1_sample_frames(payload: bytes, every_ms: int):
    """Frame sampling: the frames whose timestamp crosses each
    every_ms boundary (first frame at/after k*every_ms, k=0,1,…)."""
    next_ts = 0
    for i, ts, bmp in gsv1_frames(payload):
        if ts >= next_ts:
            yield i, ts, bmp
            next_ts = (ts // every_ms + 1) * every_ms


# ---------------------------------------------------------------------------
# PNG (8-bit greyscale / RGB / RGBA, non-interlaced)
# ---------------------------------------------------------------------------
#
# "Compressed formats need libraries absent from this sandbox" is true
# for JPEG/MP4 (DCT/entropy coders) but NOT for PNG: its only
# compressor is DEFLATE, and zlib is in the Python standard library.
# The rest of the format is chunk framing (CRC32 = zlib.crc32) and the
# five per-row byte-prediction filters — plain numpy. So PNG decode is
# REAL here; only JPEG/MP4 remain honestly stubbed.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode (h, w) grey, (h, w, 3) RGB or (h, w, 4) RGBA uint8 as a
    non-interlaced 8-bit PNG (filter 0 rows, one IDAT)."""
    import zlib
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = np.zeros((h, 1 + w * c), dtype=np.uint8)
    rows[:, 1:] = px.reshape(h, w * c)          # filter byte 0 per row
    idat = zlib.compress(rows.tobytes(), 6)
    return (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def _png_unfilter(raw: np.ndarray, h: int, w: int, c: int) -> np.ndarray:
    """Reverse the five PNG row filters (spec §9): per-row filter byte
    then w*c filtered bytes. None/Up/Sub are fully vectorized (Sub's
    x-recurrence is a plain prefix sum mod 256 per byte lane);
    Average/Paeth keep only the inherent w-step recurrence, each step
    a length-c numpy op — O(h*w) tiny vector ops instead of the
    O(h*w*c) per-byte interpreter loop the r4 advice flagged (libpng
    favors Paeth, so real images hit the slow path every row)."""
    stride = 1 + w * c
    raw = raw.reshape(h, stride)
    out = np.zeros((h, w * c), dtype=np.uint8)
    for y in range(h):
        f = int(raw[y, 0])
        cur = raw[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(
            w * c, dtype=np.int32)
        if f == 0:                                   # None
            rec = cur
        elif f == 2:                                 # Up
            rec = (cur + prior) & 0xFF
        elif f == 1:                                 # Sub: prefix sum
            rec = (np.cumsum(cur.reshape(w, c), axis=0,
                             dtype=np.int64) & 0xFF).reshape(-1)
        elif f in (3, 4):                            # Average / Paeth
            cur2 = cur.reshape(w, c)
            prior2 = prior.reshape(w, c)
            rec2 = np.empty((w, c), dtype=np.int32)
            left = np.zeros(c, dtype=np.int32)
            ul = np.zeros(c, dtype=np.int32)
            for x in range(w):
                up = prior2[x]
                if f == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - ul
                    pa = np.abs(p - left)
                    pb = np.abs(p - up)
                    pc_ = np.abs(p - ul)
                    pred = np.where((pa <= pb) & (pa <= pc_), left,
                                    np.where(pb <= pc_, up, ul))
                left = (cur2[x] + pred) & 0xFF
                rec2[x] = left
                ul = up
            rec = rec2.reshape(-1)
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, c)


def png_decode(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit grey/RGB/RGBA PNG to an
    (h, w, c) uint8 array (c = 1, 3 or 4). Walks the chunk list,
    inflates the concatenated IDATs, reverses all five row filters.
    Palette/16-bit/interlaced variants are rejected explicitly."""
    import zlib
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, n = 8, len(payload)
    w = h = color_type = None
    idat = []
    while pos + 8 <= n:
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or interlace or color_type not in (0, 2, 6):
                raise NotImplementedError(
                    f"PNG variant unsupported (depth={depth}, "
                    f"color_type={color_type}, interlace={interlace})")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    c = {0: 1, 2: 3, 6: 4}[color_type]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (1 + w * c):
        raise ValueError("PNG row data size mismatch")
    return _png_unfilter(raw, h, w, c)


def _to_rgb(px: np.ndarray) -> np.ndarray:
    """(h, w, c) → (h, w, 3): grey replicates, RGBA drops alpha."""
    if px.shape[2] == 1:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3]
