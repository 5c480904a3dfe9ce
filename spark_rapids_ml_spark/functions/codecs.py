"""Dependency-free media codecs (pure numpy) for the multimodal path.

Real parsers for two uncompressed container formats:

- **PPM (P6)** — the netpbm binary RGB image format: ASCII header
  ``P6 <width> <height> <maxval>`` (whitespace/comment separated)
  followed by ``height*width*3`` raw bytes.
- **WAV (RIFF/PCM)** — canonical RIFF container: ``fmt `` chunk
  (PCM, mono/stereo, 8- or 16-bit) + ``data`` chunk of raw samples.

These make the decode stages real end-to-end pipelines — bytes with a
genuine on-disk format are parsed, validated, and turned into arrays —
while staying hermetic (no PIL/libsndfile in this build; compressed
codecs like JPEG/FLAC would slot in at the same call sites).

Writers (``encode_ppm`` / ``encode_wav``) exist so the testdata's text
corpus can be deterministically transcoded into valid media payloads,
and for round-trip tests.
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------------ PPM

def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB, got {img.shape}")
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def _ppm_tokens(buf: bytes, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integers after the magic,
    skipping ``#`` comments; return (values, offset past final token's
    single trailing whitespace byte)."""
    vals: list[int] = []
    i = 2  # past 'P6'
    while len(vals) < n:
        if i >= len(buf):
            raise ValueError("truncated PPM header")
        c = buf[i : i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"#":
            while i < len(buf) and buf[i : i + 1] != b"\n":
                i += 1
        elif c.isdigit():
            j = i
            while j < len(buf) and buf[j : j + 1].isdigit():
                j += 1
            vals.append(int(buf[i:j]))
            i = j
        else:
            raise ValueError(f"bad PPM header byte {c!r}")
    # the P6 spec allows exactly ONE whitespace byte between maxval and
    # the raster; verify it IS whitespace — a CRLF-written header
    # ('255\\r\\n') would otherwise silently shift the pixel data by one
    # byte and decode garbage
    if i >= len(buf) or buf[i : i + 1] not in b" \t\r\n":
        raise ValueError(
            f"expected one whitespace byte after PPM maxval, got "
            f"{buf[i:i + 1]!r}"
        )
    return vals, i + 1


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (H, W, 3) uint8. Raises ValueError on
    malformed input (wrong magic, bad header, short pixel data)."""
    if payload[:2] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {payload[:2]!r})")
    (w, h, maxval), off = _ppm_tokens(payload, 3)
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    need = h * w * 3
    if len(payload) - off < need:
        raise ValueError(f"short pixel data: {len(payload) - off} < {need}")
    px = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    return px.reshape(h, w, 3)


# ------------------------------------------------------------------ WAV

def encode_wav(samples: np.ndarray, sample_rate: int = 8000, bits: int = 8) -> bytes:
    """1-D sample array -> mono PCM WAV. bits=8: uint8 samples;
    bits=16: int16 samples."""
    if bits == 8:
        data = np.ascontiguousarray(samples, dtype=np.uint8).tobytes()
    elif bits == 16:
        data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    block = bits // 8
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Mono/stereo PCM WAV -> (centered float64 samples, sample_rate).

    Walks the RIFF chunk list (tolerating extra chunks like LIST),
    validates the PCM fmt chunk, and centers samples at 0: uint8 data
    maps to [-128, 127], int16 stays as-is. Stereo is averaged to mono.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file (magic {payload[:4]!r})")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    fmt = None
    data = None
    while pos + 8 <= min(end, len(payload)):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _byte_rate, _block, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM supported, got format {audio_format}")
    if bits == 8:
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
    elif bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64)
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    if channels == 2:
        x = x.reshape(-1, 2).mean(axis=1)
    elif channels != 1:
        raise ValueError(f"unsupported channel count {channels}")
    return x, sample_rate
