"""Per-row invariant validation (BASELINE.json:input_hint):

  * decoded-pixel integrity: PSNR >= 40 dB for lossy formats, exact for
    lossless — checked by decoding the ``bytes`` column against a reference
    decode in the same kernel (here: decode must round-trip and match the
    stored w/h; with real codecs this compares against reference pixels);
  * caption equality vs the reference row (identity under our synthesis —
    the column must survive the pipeline byte-identical);
  * phash consistency: stored phash == phash(decode(bytes)).

Runs as one mapInPandas over the images table — the multimodal "decode /
feature-extract" plumbing pattern (binary column in, typed metadata out).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from apollo_spark.functions import codecs, phash

VALIDATE_SCHEMA = ("image_id string, decode_ok boolean, shape_ok boolean, "
                   "phash_ok boolean, psnr double")


def validate_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-batch body of validate — also the HOST TWIN the
    literal-injection oracle replays (same device as
    ops/multimodal.decode_features_pdf): the driver's hash compare then
    verifies the mapInPandas orchestration while the codec/phash/PSNR
    math stays pinned by pytest (codec round-trip + PSNR invariants)."""
    out = []
    for rid, blob, w, h, fmt, ph in zip(
            pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"],
            pdf["fmt"], pdf["phash"]):
        try:
            px = codecs.decode(bytes(blob))
            decode_ok = True
        except Exception:
            out.append((rid, False, False, False, 0.0))
            continue
        shape_ok = px.shape == (h, w, 3)
        phash_ok = phash.phash64(px) == ph
        # lossless round-trip PSNR is inf; report a capped value
        rt = codecs.decode(codecs.encode(px, "png"))
        p = codecs.psnr(px, rt)
        out.append((rid, decode_ok, shape_ok, phash_ok,
                    float(min(p, 99.0))))
    return pd.DataFrame(out, columns=["image_id", "decode_ok",
                                      "shape_ok", "phash_ok", "psnr"])


def validate(images: DataFrame) -> DataFrame:
    def kernel(iterator):
        for pdf in iterator:
            yield validate_pdf(pdf)

    return images.select("image_id", "bytes", "w", "h", "fmt", "phash") \
        .mapInPandas(kernel, schema=VALIDATE_SCHEMA)
