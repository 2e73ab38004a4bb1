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


def decode_features_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-batch body of decode_features — also the HOST TWIN the
    literal-injection oracle replays (same device as
    oracle.flagship_signatures_local): one pandas batch of the images
    schema in, the decoded-stats frame out, no Spark. Keeping the Spark
    kernel and the oracle on the same function means the driver's hash
    compare verifies the mapInPandas ORCHESTRATION (batching, schema,
    row completeness); the decode math itself is pinned separately by
    pytest (PSNR invariant, codec round-trip tests)."""
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
    return pd.DataFrame(rows)


def decode_features(images: DataFrame) -> DataFrame:
    """Decode each payload and emit pixel statistics
    (image_id, w, h, mean_px, std_px, decoder).

    With PIL present this is a real decode; otherwise the deterministic
    stub (marked in the ``decoder`` column) keeps the pipeline runnable.
    Input: the images schema (image_id, bytes, w, h, fmt)."""

    def kernel(it):
        for pdf in it:
            yield decode_features_pdf(pdf)

    return images.select("image_id", "bytes", "w", "h", "fmt") \
        .mapInPandas(kernel, schema=DECODE_SCHEMA)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR in dB between two uint8 pixel arrays (the input_hint's
    lossy-format row invariant: PSNR >= 40 dB)."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


# ---------------------------------------------------------------------------
# resize (image) and frame sampling (video) — the remaining two operators of
# the multimodal plumbing quartet (decode / feature-extract / resize /
# frame-sample). Both are Arrow-batched kernels whose METADATA outputs
# (dimensions, frame indices, checksums) are integer-exact and therefore
# SQL-oracle-able, while the pixel work is real NumPy over the deterministic
# container (or the stub decoder when a payload is not ASIM-encoded).
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = ("image_id string, out_w int, out_h int, out_mean double, "
                 "resizer string")


def target_dims(w: int, h: int, max_side: int) -> tuple[int, int]:
    """Aspect-preserving fit into max_side, never upscale — INTEGER math
    only ((w*max_side) // longest) so the distributed kernel and the SQL
    oracle agree bit-for-bit."""
    longest = max(int(w), int(h))
    if longest <= max_side:
        return int(w), int(h)
    return (max(1, (int(w) * max_side) // longest),
            max(1, (int(h) * max_side) // longest))


def resize_dims(images: DataFrame, max_side: int = 64) -> DataFrame:
    """Catalyst-only resize PLAN: (image_id, w, h, out_w, out_h) — the
    dimension half of resize_images as whole-stage-codegen column math
    (no payload read: parquet prunes the bytes column entirely)."""
    longest = F.greatest(F.col("w"), F.col("h"))
    return images.select(
        "image_id", "w", "h",
        F.when(longest <= max_side, F.col("w")).otherwise(
            F.greatest(F.lit(1), F.expr(f"(w * {max_side}) div greatest(w, h)"))
        ).cast("int").alias("out_w"),
        F.when(longest <= max_side, F.col("h")).otherwise(
            F.greatest(F.lit(1), F.expr(f"(h * {max_side}) div greatest(w, h)"))
        ).cast("int").alias("out_h"))


def _nn_resize(px: np.ndarray, ow: int, oh: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample (pixel-center sampling),
    vectorized; channels preserved."""
    ih, iw = px.shape[0], px.shape[1]
    ys = np.minimum(((np.arange(oh) + 0.5) * ih / oh).astype(np.int64),
                    ih - 1)
    xs = np.minimum(((np.arange(ow) + 0.5) * iw / ow).astype(np.int64),
                    iw - 1)
    return px[np.ix_(ys, xs)]


def resize_images(images: DataFrame, max_side: int = 64) -> DataFrame:
    """Distributed resize: decode each payload (ASIM container / stub),
    nearest-neighbor-resample into an aspect-preserving max_side fit, emit
    the RESIZED array's measured shape plus its pixel mean.

    The emitted out_w/out_h come from the resized ndarray's .shape — not
    recomputed arithmetic — so hash-matching them against the resize_dims
    SQL oracle genuinely checks the kernel. Reference has no resize (it
    ingests pre-extracted features); this is the training-data-pipeline
    extension the build brief names."""

    def kernel(it):
        from apollo_spark.functions import codecs
        for pdf in it:
            rows = {k: [] for k in ("image_id", "out_w", "out_h",
                                    "out_mean", "resizer")}
            for rid, raw, w, h in zip(pdf["image_id"], pdf["bytes"],
                                      pdf["w"], pdf["h"]):
                raw = bytes(raw)
                if raw.startswith(codecs.MAGIC):
                    px, resizer = codecs.decode(raw), "asim-nn"
                else:
                    px, resizer = _fake_decode(raw, int(w), int(h)), "stub-nn"
                ow, oh = target_dims(px.shape[1], px.shape[0], max_side)
                out = _nn_resize(px, ow, oh)
                rows["image_id"].append(rid)
                rows["out_w"].append(out.shape[1])
                rows["out_h"].append(out.shape[0])
                rows["out_mean"].append(float(out.mean()))
                rows["resizer"].append(resizer)
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes", "w", "h") \
        .mapInPandas(kernel, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = ("video_id string, frame_idx int, frame_sum_mod long, "
                "n_frame_bytes long")


def sample_frame_indices(n_frames: int, k: int) -> list[int]:
    """Uniform-stride sample of min(k, n_frames) indices: floor(j*n/m).
    Strictly increasing (n >= m implies gaps >= 1), integer-exact."""
    m = min(k, n_frames)
    return [(j * n_frames) // m for j in range(m)]


def sample_frames(videos: DataFrame, k: int = 4) -> DataFrame:
    """Video frame-sampling plumbing: each payload is a container of
    ``n_frames`` fixed-size frames (``frame_bytes`` each, back to back;
    trailing partial bytes ignored). Uniformly samples min(k, n_frames)
    frames per video and emits per-frame checksums over the SLICED bytes
    (NumPy view, no copy) — integer-exact, so the whole operator is
    oracle-able with SQL substring math.

    Input schema: (video_id string, payload binary, n_frames int,
    frame_bytes int). Real video decode (codec parsing, keyframe seeks)
    would replace the fixed-size slicing; the partitioning, Arrow batch
    shape, and fan-out (one row per sampled frame) are the real thing."""

    def kernel(it):
        for pdf in it:
            rows = {key: [] for key in ("video_id", "frame_idx",
                                        "frame_sum_mod", "n_frame_bytes")}
            for vid, raw, nf, fb in zip(pdf["video_id"], pdf["payload"],
                                        pdf["n_frames"],
                                        pdf["frame_bytes"]):
                buf = np.frombuffer(bytes(raw), dtype=np.uint8)
                nf, fb = int(nf), int(fb)
                if nf <= 0 or fb <= 0 or buf.size < fb:
                    continue
                for idx in sample_frame_indices(nf, k):
                    frame = buf[idx * fb:(idx + 1) * fb]
                    rows["video_id"].append(vid)
                    rows["frame_idx"].append(idx)
                    rows["frame_sum_mod"].append(
                        int(frame.sum(dtype=np.int64)) % 997)
                    rows["n_frame_bytes"].append(frame.size)
            yield pd.DataFrame(rows)

    return videos.select("video_id", "payload", "n_frames", "frame_bytes") \
        .mapInPandas(kernel, schema=FRAME_SCHEMA)
