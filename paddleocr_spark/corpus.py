"""Deterministic synthesizer for the interleaved text+media corpus.

Produces the exact ``BASELINE.json`` ``input_hint`` shape:

    docs(doc_id: string,
         spans: array<struct<kind:string, text:string,
                             media_ref:string, offset:int>>)

plus a ``media`` fixture store keyed by ``media_ref`` that stands in for
decoded images and model forward passes (synthetic DB probability maps,
CTC logits, direction-classifier probs, table-structure tensors) — the
model-free analogue of the reference's det/rec/cls/tab tensors
(``toddleocr/engine.py:326-391``, ``toddleocr/config.py:294-439``).

Every value is a pure function of ``(seed, doc index)`` or of the
``media_ref`` string, so generation is distributed (``mapInPandas``),
reproducible, and independent of partition count — the property that
lets the same generator run at SF=1e-6 locally and at 10^12-doc scale
on a real cluster.

No Spark imports at module top level beyond types — the per-row
generators are plain NumPy and are reused by the pure-Python reference
path in ``paddleocr_spark.reference_path`` (the pytest oracle).
"""

from __future__ import annotations

import hashlib

import numpy as np

from .kernels.ctc import DEFAULT_CHARS, build_charset, ctc_decode
from .kernels.db import db_postprocess
from .kernels.reading_order import sorted_boxes
from .kernels.table import TABLE_TOKENS, TableVocab

__all__ = [
    "BOILERPLATE",
    "BOILERPLATE_RE",
    "VOCAB",
    "LAYOUT_CLASSES",
    "doc_record",
    "media_record",
    "dequantize_map",
    "dequantize_logits",
    "synthesize_docs",
    "synthesize_media",
    "docs_schema",
    "media_schema",
]

# ---------------------------------------------------------------------------
# Constants

# Boilerplate phrases injected into text spans; the cleaner strips them.
# (The reference's analogue is the don't-care ignore-tag mechanism,
# toddleocr/transforms/custom/label_ops.py:39-42.)
BOILERPLATE = [
    "cookie consent banner",
    "all rights reserved",
    "subscribe to our newsletter",
    "privacy policy terms of use",
    "click here to accept",
]
# Regex used by BOTH the Spark cleaner and the DuckDB oracle.
BOILERPLATE_RE = "|".join(BOILERPLATE)

VOCAB = (
    "the a spark table scan join filter sort merge window batch stream "
    "query row column value key order part line data agg group hash "
    "vector small big fast slow customer dup"
).split()

LAYOUT_CLASSES = ["text_block", "table", "figure"]

# Detection probability-map geometry (multiples of 32, as
# DetResizeForTest guarantees; toddleocr/transforms/operators.py:277-278).
MAP_H, MAP_W = 64, 96
SRC_H, SRC_W = 128, 192  # "source image" size; ratio 0.5 each axis
SHAPE_LIST = [float(SRC_H), float(SRC_W), MAP_H / SRC_H, MAP_W / SRC_W]

REC_T = 40  # logit timesteps (fits 12 chars at <=2 repeats + blanks)
CHARSET = build_charset(DEFAULT_CHARS)
REC_C = len(CHARSET)

_TEXT_CHARS = [c for c in DEFAULT_CHARS if c != " "]


def _key(*parts) -> np.random.Generator:
    """Seeded RNG from string/int parts — stable across processes."""
    h = hashlib.md5("|".join(str(p) for p in parts).encode()).digest()
    return np.random.default_rng(np.frombuffer(h, dtype=np.uint64))


# ---------------------------------------------------------------------------
# Document rows


def doc_record(doc_idx: int, seed: int = 42, heavy_frac: float = 0.01,
               media_pool: int | None = None) -> dict:
    """One (doc_id, spans) row. ~1% of docs are media-heavy (120-400
    media spans) to exercise salted repartitioning (skew; north rule)."""
    rng = _key("doc", seed, doc_idx)
    heavy = rng.random() < heavy_frac
    if heavy:
        n_spans = int(rng.integers(120, 400))
        media_p = 0.9
    else:
        n_spans = int(rng.integers(1, 12))
        media_p = 0.4
    spans = []
    for off in range(n_spans):
        if rng.random() < media_p:
            mid = int(rng.integers(0, media_pool)) if media_pool else int(
                rng.integers(0, 1 << 30))
            spans.append({
                "kind": "media",
                "text": "",
                "media_ref": f"m{mid:08d}",
                "offset": off,
            })
        else:
            n_words = int(rng.integers(5, 30))
            words = [VOCAB[int(i)] for i in rng.integers(0, len(VOCAB), n_words)]
            if rng.random() < 0.5:
                # inject boilerplate at a random word boundary
                pos = int(rng.integers(0, n_words + 1))
                words.insert(pos, BOILERPLATE[int(rng.integers(0, len(BOILERPLATE)))])
            spans.append({
                "kind": "text",
                "text": " ".join(words),
                "media_ref": "",
                "offset": off,
            })
    return {"doc_id": f"doc{doc_idx:010d}", "spans": spans}


# ---------------------------------------------------------------------------
# Media fixture rows


def _gen_text(rng: np.random.Generator) -> str:
    n = int(rng.integers(3, 13))
    chars = [_TEXT_CHARS[int(i)] for i in rng.integers(0, len(_TEXT_CHARS), n)]
    # occasional interior space (never leading/trailing)
    if n >= 5 and rng.random() < 0.3:
        chars[n // 2] = " "
    return "".join(chars)


def _gen_logits(rng: np.random.Generator, text: str) -> np.ndarray:
    """(REC_T, REC_C) float32 whose greedy-CTC decode equals ``text``,
    exercising repeat-collapse and blank-drop (rec.py:77-94)."""
    logits = rng.random((REC_T, REC_C), dtype=np.float32) * 0.05
    t = 0
    for k, ch in enumerate(text):
        idx = CHARSET.index(ch)
        remaining = len(text) - k
        budget = REC_T - t - 2 * remaining  # 1 step + 1 blank per char left
        reps = int(rng.integers(1, 3)) if budget >= 1 else 1
        for _ in range(reps):
            logits[t, idx] = 0.8 + 0.19 * float(rng.random())
            t += 1
        # blank separator (mandatory between repeats of the same char)
        logits[t, 0] = 0.8 + 0.19 * float(rng.random())
        t += 1
    for tt in range(t, REC_T):
        logits[tt, 0] = 0.8 + 0.19 * float(rng.random())
    return logits


def dequantize_map(raw: bytes, h: int, w: int) -> np.ndarray:
    """uint8-stored prob map -> float32 in [0,1]. The store carries
    uint8 (as a real pipeline stores uint8 image bytes, not float
    tensors); generator goldens and the pipeline decode BOTH consume
    this dequantized form, so results stay bit-exact."""
    return (np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
            .astype(np.float32) / 255.0)


def dequantize_logits(raw: bytes, t: int, c: int) -> np.ndarray:
    """float16-stored logits -> float32 (same on both paths)."""
    return np.frombuffer(raw, dtype=np.float16).reshape(t, c) \
        .astype(np.float32)


def _gen_det_map(rng: np.random.Generator):
    """Synthetic DB prob map with K grid-placed rectangles, including
    boxes that fail box_thresh / min_size filters (db.py:109-118)."""
    pm = (rng.random((MAP_H, MAP_W), dtype=np.float32) * 0.15).astype(np.float32)
    rows, cols = 3, 2
    ch, cw = MAP_H // rows, MAP_W // cols
    k = int(rng.integers(0, rows * cols + 1))
    cells = list(rng.permutation(rows * cols)[:k])
    for c in cells:
        r, q = divmod(int(c), cols)
        y0, x0 = r * ch, q * cw
        roll = rng.random()
        if roll < 0.12:
            # low-score box: binarizes (>0.3) but fails box_thresh 0.7
            val = 0.4 + 0.2 * float(rng.random())
            h = int(rng.integers(8, ch - 4))
            w = int(rng.integers(12, cw - 4))
        elif roll < 0.22:
            # tiny box: fails min_size
            val = 0.9
            h, w = 2, 2
        else:
            val = 0.85 + 0.13 * float(rng.random())
            h = int(rng.integers(8, ch - 4))
            w = int(rng.integers(12, cw - 4))
        yy = y0 + int(rng.integers(1, max(2, ch - h - 1)))
        xx = x0 + int(rng.integers(1, max(2, cw - w - 1)))
        pm[yy:yy + h, xx:xx + w] = val
    return pm


def _table_tokens(rows: int, cols: int) -> list[str]:
    toks = ["<thead>", "<tr>"] + ["<td></td>"] * cols + ["</tr>", "</thead>",
                                                         "<tbody>"]
    for _ in range(rows - 1):
        toks += ["<tr>"] + ["<td></td>"] * cols + ["</tr>"]
    toks.append("</tbody>")
    return toks


def _gen_structure(rng: np.random.Generator, vocab: TableVocab):
    """Token-prob tensor decoding to an R x C table (table.py:43-74) +
    per-<td> normalized cell bboxes aligned to the det grid."""
    rows, cols = int(rng.integers(2, 4)), 2
    tokens = _table_tokens(rows, cols)
    steps = len(tokens) + 1  # + eos
    probs = (rng.random((steps, len(vocab.character))) * 0.05).astype(np.float32)
    locs = np.zeros((steps, 8), dtype=np.float32)
    ch, cw = 1.0 / 3, 1.0 / 2  # grid cells in normalized coords (3x2 grid)
    cell_i = 0
    for t, tok in enumerate(tokens):
        probs[t, vocab.dict[tok]] = 0.9 + 0.09 * float(rng.random())
        if tok == "<td></td>":
            r, q = divmod(cell_i, cols)
            x0, y0 = q * cw, r * ch
            x1, y1 = x0 + cw, y0 + ch
            locs[t] = [x0, y0, x1, y0, x1, y1, x0, y1]
            cell_i += 1
    probs[len(tokens), vocab.eos] = 0.95
    return probs, locs, tokens


def media_record(media_ref: str, seed: int = 42) -> dict:
    """Full fixture row for one media_ref — a pure function of the ref
    string. The generator itself runs the det kernel so rec logits align
    1:1 with the boxes the pipeline will detect, in reading order."""
    rng = _key("media", seed, media_ref)
    kind = LAYOUT_CLASSES[int(rng.choice(3, p=[0.7, 0.15, 0.15]))]
    scores = (rng.random(3) * 0.2).astype(np.float32)
    scores[LAYOUT_CLASSES.index(kind)] = 0.7 + 0.29 * float(rng.random())

    # quantize to the stored form FIRST; all downstream results (golden
    # and pipeline) derive from the dequantized tensors
    pm_q = np.round(_gen_det_map(rng) * 255.0).astype(np.uint8)
    pm = pm_q.astype(np.float32) / 255.0
    boxes = db_postprocess(pm, SHAPE_LIST)  # (K,4,2) float32, src coords
    boxes = sorted_boxes(boxes)
    texts = [_gen_text(rng) for _ in range(len(boxes))]
    logits_q = [_gen_logits(rng, t).astype(np.float16) for t in texts]
    logits = [lq.astype(np.float32) for lq in logits_q]
    for lq, txt in zip(logits, texts):
        got, _ = ctc_decode(lq, CHARSET)
        assert got == txt, (got, txt)
    # direction-classifier probs: ~10% predicted "180" (config.py:375-378)
    cls = []
    for _ in range(len(boxes)):
        if rng.random() < 0.1:
            cls.append([0.15 + 0.1 * float(rng.random()), 0.75])
        else:
            cls.append([0.9, 0.05 + 0.1 * float(rng.random())])

    rec = {
        "media_ref": media_ref,
        "media_kind": kind,
        "gt_boxes": [[float(v) for v in b.reshape(8)] for b in boxes],
        "gt_structure": "",
        "layout_scores": [float(s) for s in scores],
        "det_map": pm_q.tobytes(),  # uint8 H*W
        "det_h": MAP_H,
        "det_w": MAP_W,
        "shape_list": [float(x) for x in SHAPE_LIST],
        "n_boxes": len(boxes),
        "rec_logits": [lq.tobytes() for lq in logits_q],  # float16 T*C
        "rec_t": REC_T,
        "rec_c": REC_C,
        "cls_probs": cls,
        "gt_texts": texts,
        "structure_probs": None,
        "struct_t": 0,
        "struct_v": 0,
        "loc_preds": None,
    }
    if kind == "table":
        vocab = TableVocab(TABLE_TOKENS)
        sp, lp, toks = _gen_structure(rng, vocab)
        rec["structure_probs"] = sp.astype(np.float16).tobytes()  # float16
        rec["struct_t"] = sp.shape[0]
        rec["struct_v"] = sp.shape[1]
        rec["loc_preds"] = lp.tobytes()  # float32 (tiny)
        rec["gt_structure"] = "".join(toks)
    return rec


def _self_check():  # pragma: no cover — used by tests
    """Generator invariant: logits decode back to their text."""
    r = media_record("m00000042")
    for lg_bytes, txt in zip(r["rec_logits"], r["gt_texts"]):
        lg = dequantize_logits(lg_bytes, REC_T, REC_C)
        got, _ = ctc_decode(lg, CHARSET)
        assert got == txt, (got, txt)


# ---------------------------------------------------------------------------
# Spark-side distributed synthesis


def docs_schema():
    from pyspark.sql import types as T

    span = T.StructType([
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ])
    return T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(span)),
    ])


def media_schema():
    from pyspark.sql import types as T

    return T.StructType([
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("gt_boxes", T.ArrayType(T.ArrayType(T.FloatType()))),
        T.StructField("gt_structure", T.StringType()),
        T.StructField("layout_scores", T.ArrayType(T.FloatType())),
        T.StructField("det_map", T.BinaryType()),
        T.StructField("det_h", T.IntegerType()),
        T.StructField("det_w", T.IntegerType()),
        T.StructField("shape_list", T.ArrayType(T.FloatType())),
        T.StructField("n_boxes", T.IntegerType()),
        T.StructField("rec_logits", T.ArrayType(T.BinaryType())),
        T.StructField("rec_t", T.IntegerType()),
        T.StructField("rec_c", T.IntegerType()),
        T.StructField("cls_probs", T.ArrayType(T.ArrayType(T.FloatType()))),
        T.StructField("gt_texts", T.ArrayType(T.StringType())),
        T.StructField("structure_probs", T.BinaryType()),
        T.StructField("struct_t", T.IntegerType()),
        T.StructField("struct_v", T.IntegerType()),
        T.StructField("loc_preds", T.BinaryType()),
    ])


def synthesize_docs(spark, n_docs: int, seed: int = 42,
                    heavy_frac: float = 0.01, media_pool: int | None = None):
    """Distributed, partition-independent corpus generation:
    spark.range drives per-index mapInPandas; each row derives only
    from (seed, id)."""
    if media_pool is None:
        media_pool = max(16, n_docs * 2)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = [doc_record(int(i), seed, heavy_frac, media_pool)
                    for i in pdf["id"]]
            yield pd.DataFrame({
                "doc_id": [r["doc_id"] for r in rows],
                "spans": [[(s["kind"], s["text"], s["media_ref"], s["offset"])
                           for s in r["spans"]] for r in rows],
            })

    return spark.range(n_docs).mapInPandas(gen, schema=docs_schema())


def synthesize_media(spark, docs_df, seed: int = 42,
                     partitions: int | None = None):
    """Media store for exactly the refs the corpus uses: distinct
    media_ref → explicit repartition → mapInPandas content generation.

    The explicit repartition AFTER distinct matters: the distinct's
    shuffle carries only tiny media_ref strings, so AQE coalesces it to
    ~1 partition — and the expensive generation (and any downstream
    write) would run on one core. Cheap-rows-in / fat-rows-out UDF
    stages must set their own parallelism."""
    from pyspark.sql import functions as F

    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism * 2
    refs = (docs_df
            .select(F.explode("spans").alias("s"))
            .where(F.col("s.kind") == "media")
            .select(F.col("s.media_ref").alias("media_ref"))
            .distinct()
            .repartition(partitions, "media_ref"))

    def gen(batches):
        import pandas as pd

        cols = [f.name for f in media_schema().fields]
        for pdf in batches:
            # chunk the fat output rows so each yielded frame stays
            # ~10 MB regardless of the session's Arrow input batch size
            refs_list = list(pdf["media_ref"])
            for i in range(0, len(refs_list), 256):
                rows = [media_record(ref, seed)
                        for ref in refs_list[i:i + 256]]
                yield pd.DataFrame({c: [r[c] for r in rows] for c in cols})

    return refs.mapInPandas(gen, schema=media_schema())
