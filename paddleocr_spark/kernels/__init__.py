"""Pure-NumPy kernels (no Spark imports) — safe to ship to executors."""

from . import (  # noqa: F401
    audio,
    cls,
    ctc,
    db,
    det_eval,
    eval_det_iou,
    geometry,
    imgcodec,
    jpeg,
    master_match,
    matcher,
    nms,
    pdf,
    preprocess,
    reading_order,
    ser,
    sr,
    table,
    tiff,
    video,
)
