"""Image transform operators: feature extraction and resize.

Completes the multimodal surface (decode → feature-extract → resize →
frame-sample; the last lives in functions/media.py): Arrow-batched
``mapInPandas`` kernels over the ``bytes`` column, same contract as the
decode/PSNR check in ``image_udfs.py``:

* map-only — payload bytes never cross a shuffle and never enter a cache;
* codec state per task, not per row;
* feature extraction emits a NARROW frame (the 10^12-row rule: anything
  that survives past the decoding task must be small).

``resize_images`` is the one op whose output is again binary; at scale its
result is written straight to the sink from the same map stage (document
pipeline: scan → decode → resize → encode → write, zero shuffles).

Both kernels are real (no stubs): the repo ships a pure-stdlib PNG codec
plus a deterministic mock-lossy codec (functions/png.py), so decode,
resample, and re-encode are executable and tested in this container.

Reference analog: the R app has no image path — this is engine-added
capability for the image/caption table (BASELINE.json input_hint); the
per-record scoring loop shape it vectorizes is PRIME_App/utils.R:243-272.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from anomalydetection_spark.functions.png import decode_image, encode_png

FEATURE_SCHEMA = (
    "image_id string, fmt string, decode_ok boolean, "
    "mean_r double, mean_g double, mean_b double, "
    "brightness double, contrast double, edge_density double"
)

RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def _features_of(px: np.ndarray) -> dict[str, float]:
    f = px.astype(np.float64)
    luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    gx = np.abs(np.diff(luma, axis=1))
    gy = np.abs(np.diff(luma, axis=0))
    edges = (gx > 24.0).mean() * 0.5 + (gy > 24.0).mean() * 0.5
    return {
        "mean_r": float(f[..., 0].mean()),
        "mean_g": float(f[..., 1].mean()),
        "mean_b": float(f[..., 2].mean()),
        "brightness": float(luma.mean()),
        "contrast": float(luma.std()),
        "edge_density": float(edges),
    }


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ("image_id", "fmt", "decode_ok", "mean_r", "mean_g", "mean_b",
            "brightness", "contrast", "edge_density")
    for pdf in batches:
        out = {k: [] for k in cols}
        for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
            row: dict = {"image_id": image_id, "fmt": fmt, "decode_ok": True}
            try:
                row.update(_features_of(decode_image(bytes(data), fmt)))
            except Exception:
                row["decode_ok"] = False
                row.update({k: None for k in cols[3:]})
            for k in cols:
                out[k].append(row[k])
        yield pd.DataFrame(out)


def image_features(images: DataFrame) -> DataFrame:
    """(image_id, fmt, decode_ok, channel means, brightness, contrast,
    edge_density) — narrow feature frame, one map-only stage."""
    return images.select("image_id", "bytes", "fmt").mapInPandas(
        _extract_features, FEATURE_SCHEMA
    )


def nn_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample by integer index maps (pure numpy)."""
    h, w = px.shape[0], px.shape[1]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[ys][:, xs]


def _resize_kernel(out_w: int, out_h: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt")}
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    small = nn_resize(decode_image(bytes(data), fmt), out_w, out_h)
                    blob = encode_png(small)
                except Exception:
                    continue  # undecodable rows are the decode check's job
                out["image_id"].append(image_id)
                out["bytes"].append(blob)
                out["w"].append(out_w)
                out["h"].append(out_h)
                out["fmt"].append("png")
            yield pd.DataFrame(out)

    return run


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode → nearest-neighbor resize → lossless re-encode. Output rows
    keep the input schema's payload shape (bytes, w, h, fmt='png') so the
    result is sink-ready; write it from this stage — do not shuffle it."""
    return images.select("image_id", "bytes", "fmt").mapInPandas(
        _resize_kernel(out_w, out_h), RESIZE_SCHEMA
    )
