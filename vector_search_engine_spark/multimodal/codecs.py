"""Vendored pure-Python/NumPy media codecs — real decode with zero
native dependencies.

The container has no PIL/libav, but "real decode" does not require
them for the classic trivially-parseable formats; these are complete,
spec-faithful implementations (not fakes):

  * PPM/PGM (netpbm P6/P5, binary, maxval <= 255): header of 2-3
    whitespace-separated integers + raw big-endian samples.
  * BMP (Windows BITMAPINFOHEADER, uncompressed BI_RGB, 24-bit BGR or
    8-bit with palette): rows bottom-up, 4-byte padded.
  * WAV (RIFF PCM, 8-bit unsigned / 16-bit signed LE): chunked
    container, ``fmt `` + ``data`` chunks.

Encoders for the same formats exist so tests can round-trip pixels /
samples through REAL bytes end-to-end.  Formats outside this set
(JPEG/PNG/MP4...) raise ``ValueError`` from ``sniff``/``decode_image``
— a genuine unsupported-input error; when PIL happens to be
installed, ``payload.decode_real`` extends image coverage with it at
call time.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "sniff",
    "decode_image",
    "decode_wav",
    "encode_ppm",
    "encode_pgm",
    "encode_bmp",
    "encode_wav",
]


def sniff(buf: bytes) -> str:
    """Codec id from magic bytes: 'ppm' | 'pgm' | 'bmp' | 'wav';
    ``ValueError`` for anything else."""
    if buf[:2] == b"P6":
        return "ppm"
    if buf[:2] == b"P5":
        return "pgm"
    if buf[:2] == b"BM":
        return "bmp"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "wav"
    raise ValueError(
        f"unsupported media codec (magic {buf[:4]!r}); built-in decoders "
        "cover PPM/PGM/BMP/WAV — install PIL for JPEG/PNG coverage"
    )


# ---------------------------------------------------------------------------
# netpbm (PPM P6 / PGM P5)
# ---------------------------------------------------------------------------


def _pnm_header(buf: bytes, n_fields: int) -> tuple[list[int], int]:
    """Parse ``n_fields`` whitespace-separated ints after the magic,
    honoring ``#`` comment lines; returns (fields, data_offset)."""
    fields: list[int] = []
    i = 2  # past magic
    while len(fields) < n_fields:
        if i >= len(buf):
            raise ValueError("truncated netpbm header")
        c = buf[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < len(buf) and buf[i : i + 1] != b"\n":
                i += 1
            i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(buf) and not buf[j : j + 1].isspace():
                j += 1
            fields.append(int(buf[i:j]))
            i = j
    # exactly one whitespace byte separates the header from raster data
    return fields, i + 1


def _decode_pnm(buf: bytes, channels: int) -> np.ndarray:
    (w, h, maxval), off = _pnm_header(buf, 3)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported (maxval > 255)")
    need = w * h * channels
    data = np.frombuffer(buf, dtype=np.uint8, count=need, offset=off)
    return data.reshape(h, w, channels) if channels > 1 else data.reshape(h, w)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6) bytes."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("PPM is 3-channel")
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def encode_pgm(pixels: np.ndarray) -> bytes:
    """(h, w) uint8 → binary PGM (P5) bytes."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w = px.shape
    return b"P5\n%d %d\n255\n" % (w, h) + px.tobytes()


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, BI_RGB)
# ---------------------------------------------------------------------------


def _decode_bmp(buf: bytes) -> np.ndarray:
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"BMP header size {hdr_size} (need BITMAPINFOHEADER)")
    w, h = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if compression != 0:
        raise ValueError(f"BMP compression {compression} (only BI_RGB)")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * bpp // 8 + 3) & ~3  # rows pad to 4 bytes
    if bpp == 24:
        rows = np.frombuffer(
            buf, dtype=np.uint8, count=row_bytes * h, offset=data_off
        ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        img = rows[:, :, ::-1]  # BGR → RGB
    elif bpp == 8:
        n_colors = struct.unpack_from("<I", buf, 46)[0] or 256
        pal = np.frombuffer(
            buf, dtype=np.uint8, count=n_colors * 4, offset=14 + hdr_size
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRA → RGB
        idx = np.frombuffer(
            buf, dtype=np.uint8, count=row_bytes * h, offset=data_off
        ).reshape(h, row_bytes)[:, :w]
        img = pal[idx]
    else:
        raise ValueError(f"BMP bpp {bpp} (only 24/8-bit BI_RGB)")
    return (img[::-1] if bottom_up else img).copy()


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP bytes."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_bmp expects RGB")
    row_bytes = (w * 3 + 3) & ~3
    raster = np.zeros((h, row_bytes), dtype=np.uint8)
    raster[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB→BGR
    data = raster.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + info + data


def decode_image(buf: bytes) -> np.ndarray:
    """Decode PPM/PGM/BMP bytes to a uint8 pixel array ((h, w[, c]))."""
    kind = sniff(bytes(buf))
    if kind == "ppm":
        return _decode_pnm(buf, 3)
    if kind == "pgm":
        return _decode_pnm(buf, 1)
    if kind == "bmp":
        return _decode_bmp(buf)
    raise ValueError(f"payload is {kind}, not an image")


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM bytes → (samples, sample_rate).  8-bit
    unsigned stays uint8; 16-bit signed LE comes back int16; stereo
    interleaving is preserved as shape (n, channels)."""
    if sniff(bytes(buf)) != "wav":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, pos)
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"WAV format {audio_fmt} (only PCM)")
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8)
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    else:
        raise ValueError(f"WAV bits {bits} (only 8/16)")
    if n_ch > 1:
        samples = samples[: len(samples) - len(samples) % n_ch].reshape(
            -1, n_ch
        )
    return samples, rate


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """uint8 or int16 sample array (mono 1-D or (n, channels)) → RIFF
    PCM WAV bytes."""
    s = np.asarray(samples)
    if s.dtype == np.uint8:
        bits = 8
    elif s.dtype == np.int16:
        bits = 16
    else:
        raise ValueError("encode_wav expects uint8 or int16 samples")
    n_ch = 1 if s.ndim == 1 else s.shape[1]
    data = np.ascontiguousarray(s.astype(f"<i{bits // 8}" if bits == 16 else np.uint8)).tobytes()
    byte_rate = sample_rate * n_ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, byte_rate, n_ch * bits // 8, bits
    )
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
