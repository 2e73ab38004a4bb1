"""Deterministic image codecs for the ``bytes`` binary column.

The sandbox has no real image libraries (no PIL/libjpeg), so — per the build
brief — the *decode step is a deterministic fake* while all Spark-side
plumbing (binary columns, Arrow batching, UDF signatures) is real:

  - ``png``  : lossless — zlib over raw interleaved RGB rows.
  - ``jpeg`` : lossy — uniform quantization (step derived from quality) then
               zlib. Quantization step <= 4 keeps PSNR >= 40 dB vs the source
               pixels, satisfying the per-row invariant in
               BASELINE.json:input_hint ("decoded-pixel allclose, PSNR>=40dB
               for lossy formats").

Swapping in real codecs later only replaces this module; every UDF that
consumes it is codec-agnostic. A real-JPEG path would raise
``NotImplementedError`` here, clearly marked below.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"ASIM"  # apollo-spark image container
_HEADER = struct.Struct("<4sHHBB")  # magic, w, h, channels, quant_step


def encode(pixels: np.ndarray, fmt: str, quality: int = 90) -> bytes:
    """Encode an (h, w, 3) uint8 array. fmt in {"png", "jpeg"}."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 pixels")
    h, w, c = pixels.shape
    if fmt == "png":
        step = 1
        payload = pixels
    elif fmt == "jpeg":
        # quality 85..95 -> step 4..2; max per-pixel error step/2 -> PSNR
        # >= 20*log10(255 / (step/sqrt(12))) > 46 dB for step=4.
        step = max(2, (100 - int(quality)) // 4)
        payload = (pixels.astype(np.int32) // step * step + step // 2)
        payload = np.clip(payload, 0, 255).astype(np.uint8)
    else:
        # Real codecs are intentionally not implemented in this sandbox.
        raise NotImplementedError(f"real codec for fmt={fmt!r} not available; "
                                  "stubbed per build brief")
    header = _HEADER.pack(MAGIC, w, h, c, step)
    return header + zlib.compress(payload.tobytes(), level=1)


def decode(data: bytes) -> np.ndarray:
    """Decode ``bytes`` back to an (h, w, 3) uint8 array."""
    magic, w, h, c, _step = _HEADER.unpack_from(data)
    if magic != MAGIC:
        raise NotImplementedError("non-ASIM payload: real image decoding is "
                                  "stubbed in this sandbox (no libjpeg/PIL)")
    raw = zlib.decompress(data[_HEADER.size:])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, c)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 pixel arrays."""
    if a.shape != b.shape:
        raise ValueError("shape mismatch")
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))
