"""Pure-stdlib media codecs (zlib / struct / wave + numpy) — the honest
``decode='real'`` path for operators/multimodal.py in a container with no
PIL/ffmpeg.

Scope (documented, deliberate):
- PNG: 8-bit greyscale / RGB / RGBA, non-interlaced. All five scanline
  filters are decoded correctly; filter-0 rows (what :func:`encode_png`
  emits) take a fully vectorized path, other filters fall back to a per-row
  reconstruction loop — correctness first, codec-library throughput is a
  deploy-time swap at the same call site.
- PPM (P6 binary): trivial struct-free parse.
- WAV: PCM 16-bit via the stdlib ``wave`` module.

Everything is deterministic and round-trips (``encode_* -> decode_*`` is
identity), which is what lets the driver query put a CLOSED-FORM DuckDB
oracle on real decode output (__spark_entry__.q_multimodal_decode).

No reference analog: SMQTK-Indexing consumes pre-computed float descriptors
(``/root/reference/smqtk_indexing/interfaces/lsh_functor.py:29-41``); this
is the raw-asset edge of the training-data pipeline in front of it.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channel count (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W) or (H, W, C in {1,3,4}) uint8 -> non-interlaced 8-bit PNG,
    filter 0 on every scanline (keeps our own decode on the vectorized
    path)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * c)], axis=1
    ).tobytes()
    idat = zlib.compress(raw, 6)

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8. 8-bit depth, color types 0/2/6,
    no interlace (the overwhelmingly common training-data case)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, ihdr, idat = 8, None, []
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, "
            f"interlace={interlace}); supported: 8-bit grey/RGB/RGBA"
        )
    c = _PNG_CHANNELS[color]
    stride = w * c
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    body = rows[:, 1:]
    if not ftypes.any():
        return body.reshape(h, w, c).copy()
    # general path: reconstruct row-by-row (Up vectorized; Sub/Avg/Paeth
    # have a left-dependence and run a per-byte loop on that row only)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = int(ftypes[y])
        line = body[y].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if ft == 0:
            rec = line
        elif ft == 2:  # Up
            rec = (line + prev) & 0xFF
        else:
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - c] if x >= c else 0
                ul = prev[x - c] if x >= c else 0
                if ft == 1:  # Sub
                    pred = left
                elif ft == 3:  # Average
                    pred = (left + prev[x]) // 2
                elif ft == 4:  # Paeth
                    pred = _paeth(int(left), int(prev[x]), int(ul))
                else:
                    raise ValueError(f"bad PNG filter {ft}")
                rec[x] = (line[x] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, c)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6)."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("PPM is RGB")
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM")
    # header = magic, width, height, maxval, single whitespace, raster
    parts, pos, tokens = [], 2, 3
    while len(parts) < tokens:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment line
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        parts.append(int(data[start:pos]))
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    pos += 1  # the single whitespace after maxval
    return (
        np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """(n,) or (n, ch) int16 -> PCM WAV bytes (stdlib ``wave``)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(s.shape[1])
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, ch) int16 samples, sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as wv:
        if wv.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        n, ch, rate = wv.getnframes(), wv.getnchannels(), wv.getframerate()
        s = np.frombuffer(wv.readframes(n), dtype=np.int16).reshape(n, ch)
    return s.copy(), rate


# ---------------------------------------------------------------------------
# Deterministic fixed-width features over decoded assets — the real-path
# twins of the byte-histogram stand-in (same 256-dim contract, so decoded
# features feed the SAME ANN operators as text embeddings).
# ---------------------------------------------------------------------------

def image_feature(arr: np.ndarray, grid: int = 16) -> np.ndarray:
    """(H, W, C) uint8 -> 256-dim float32: grid x grid mean-pooled
    greyscale thumbnail, scaled to [0, 1]."""
    a = np.asarray(arr, dtype=np.float64)
    grey = a.mean(axis=2)
    h, w = grey.shape
    ys = (np.arange(grid + 1) * h) // grid
    xs = (np.arange(grid + 1) * w) // grid
    out = np.empty((grid, grid), dtype=np.float64)
    for i in range(grid):
        for j in range(grid):
            cell = grey[ys[i] : max(ys[i + 1], ys[i] + 1),
                        xs[j] : max(xs[j + 1], xs[j] + 1)]
            out[i, j] = cell.mean()
    return (out / 255.0).astype(np.float32).ravel()


def audio_feature(samples: np.ndarray, n_bins: int = 256) -> np.ndarray:
    """(n, ch) int16 -> 256-dim float32: log-magnitude rFFT of the mono
    mix, mean-pooled into ``n_bins`` bands and max-normalized."""
    mono = np.asarray(samples, dtype=np.float64).mean(axis=1)
    if mono.size == 0:
        return np.zeros(n_bins, dtype=np.float32)
    mag = np.abs(np.fft.rfft(mono))
    spec = np.log1p(mag)
    edges = (np.arange(n_bins + 1) * spec.size) // n_bins
    out = np.zeros(n_bins, dtype=np.float64)
    for i in range(n_bins):
        seg = spec[edges[i] : max(edges[i + 1], edges[i] + 1)]
        out[i] = seg.mean() if seg.size else 0.0
    peak = out.max()
    return (out / peak if peak > 0 else out).astype(np.float32)
