"""Deterministic label-file fixture store + oracle-checked queries for
the PubTab JSONL and PGNet tab-delimited label sources.

Round 2 left ``PubTabDataSet`` (``toddleocr/datasets/pubtab.py:9-91``)
and ``PGDataSet`` (``toddleocr/datasets/pgnet.py:8-60``) pytest-only;
this module gives each a CORRECTNESS query in the ``page_store``
pattern: a tiny deterministic store whose EXPECTED parse results are
known at generation time, with a pure ``VALUES`` DuckDB oracle — the
Spark leg runs the real source (schema'd ``spark.read.json`` /
``read.text`` + JVM-side ``from_json``), the oracle never parses.

The fixtures exercise every reject branch the sources implement:
corrupt JSON lines (PERMISSIVE ``_corrupt_record`` / null ``from_json``),
token counts outside [1, max_len], empty cell lists, missing structure,
tab-less label lines, and the ``"*"``/``"###"`` ignore tags. The PGNet
per-source ratio sample is replicated in the generator with the SAME
md5-bucket formula the source computes JVM-side (hashlib md5 ==
Spark ``md5``; ``int(hex16, 16) % 1e6`` == ``conv(_, 16, 10) % 1e6``),
so the expected membership is exact, not approximate.
"""

from __future__ import annotations

import hashlib
import json
import os

from paddleocr_spark.cachedir import cache_root

__all__ = ["PUBTAB_SPEC", "PGNET_SPEC", "MAX_TOKENS", "ensure_label_store",
           "pubtab_valid", "pgnet_labels",
           "pubtab_oracle_sql", "pgnet_oracle_sql"]

MAX_TOKENS = 20     # query-level max_structure_len (forces a reject row)
_RATIO = 0.5        # file 1's sample ratio
_SEED = 42


def _tokens(i: int) -> list[str]:
    return [f"<td{j}>" for j in range(1 + (7 * i) % 5)]


def _pub_rows():
    """(jsonl_line, expected_or_None) per row of pubtab.jsonl."""
    rows = []
    for i in range(8):
        fn = f"tab_{i:02d}.png"
        toks = _tokens(i)
        cells = [{"tokens": [f"c{k}"], "bbox": [k, 0, k + 1, 1]}
                 for k in range(1 + i % 3)]
        rows.append((json.dumps({"filename": fn, "html": {
            "cells": cells, "structure": {"tokens": toks}}}),
            (fn, "|".join(toks), len(cells))))
    # reject branches, one each:
    rows.append((json.dumps({"filename": "r_empty_tokens.png", "html": {
        "cells": [{"tokens": ["x"], "bbox": [0, 0, 1, 1]}],
        "structure": {"tokens": []}}}), None))           # size 0
    rows.append((json.dumps({"filename": "r_too_long.png", "html": {
        "cells": [{"tokens": ["x"], "bbox": [0, 0, 1, 1]}],
        "structure": {"tokens": ["<td>"] * (MAX_TOKENS + 5)}}}), None))
    rows.append((json.dumps({"filename": "r_no_cells.png", "html": {
        "cells": [], "structure": {"tokens": ["<td>"]}}}), None))
    rows.append((json.dumps({"filename": "r_no_structure.png", "html": {
        "cells": [{"tokens": ["x"], "bbox": [0, 0, 1, 1]}]}}), None))
    rows.append(('{"filename": "r_corrupt.png", "html": {', None))
    return rows


PUBTAB_SPEC = [exp for _, exp in _pub_rows() if exp is not None]


def _pg_text(f: int, r: int) -> str:
    if (f + r) % 5 == 3:
        return "*"
    if (f + r) % 5 == 4:
        return "###"
    return f"word{f}{r}"


def _pg_boxes(f: int, r: int):
    n = 1 + (f + r) % 2
    return [{"transcription": _pg_text(f, r + b),
             "points": [[float(10 * b + r), 0.0], [float(10 * b + r + 5), 0.0],
                        [float(10 * b + r + 5), 4.0], [float(10 * b + r), 4.0]]}
            for b in range(n)]


def _sampled(img_path: str) -> bool:
    """The source's deterministic md5 bucket, restated byte-for-byte
    (dedup.ratio_keep's pure-Python twin — the +0.5 floor is half-up:
    int() truncation lands one bucket low for ~0.1% of exact
    micro-ratios, round() is banker's half-even on .5 buckets)."""
    h = hashlib.md5(f"{_SEED}:{img_path}".encode()).hexdigest()[:15]
    return int(h, 16) % 1000000 < int(_RATIO * 1000000 + 0.5)


def _pg_rows(f: int):
    """(line, expected_or_None) per row of pgnet_<f>.txt."""
    rows = []
    n = 4 if f == 0 else 8
    for r in range(n):
        img = f"imgs/e2e_{f}_{r:03d}.jpg"
        boxes = _pg_boxes(f, r)
        exp = (img, len(boxes),
               sum(1 for b in boxes if b["transcription"] in ("*", "###")),
               "|".join(b["transcription"] for b in boxes),
               f"pgnet_{f}.txt")
        if f == 1 and not _sampled(img):
            exp = None
        rows.append((img + "\t" + json.dumps([
            {"transcription": b["transcription"], "points": b["points"]}
            for b in boxes]), exp))
    rows.append((f"imgs/e2e_{f}_corrupt.jpg\t[{{bad json", None))
    rows.append((f"imgs/e2e_{f}_notab.jpg", None))
    return rows


PGNET_SPEC = [exp for f in (0, 1) for _, exp in _pg_rows(f)
              if exp is not None]


def ensure_label_store(root: str) -> str:
    store = os.path.join(root, "labelstore_v1")
    marker = os.path.join(store, "_DONE")
    if os.path.exists(marker):
        return store
    os.makedirs(store, exist_ok=True)
    with open(os.path.join(store, "pubtab.jsonl"), "w") as fh:
        fh.write("\n".join(line for line, _ in _pub_rows()) + "\n")
    for f in (0, 1):
        with open(os.path.join(store, f"pgnet_{f}.txt"), "w") as fh:
            fh.write("\n".join(line for line, _ in _pg_rows(f)) + "\n")
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return store


def pubtab_valid(spark, sf_dir: str):
    """CORRECTNESS query for the PubTab source: JSONL scan + the
    validity predicate; every reject branch is present in the store."""
    from pyspark.sql import functions as F

    from paddleocr_spark.sources.pubtab import read_pubtab

    store = ensure_label_store(cache_root())
    df = read_pubtab(spark, os.path.join(store, "pubtab.jsonl"),
                     max_structure_len=MAX_TOKENS)
    return (df.select(
                "filename",
                F.concat_ws("|", "structure_tokens").alias("structure_sig"),
                F.col("n_cells").cast("long").alias("n_cells"))
            .orderBy("filename"))


def pgnet_labels(spark, sf_dir: str):
    """CORRECTNESS query for the PGNet source: two label files unioned
    with a 0.5 deterministic ratio sample on the second, malformed rows
    dropped (the reference's resample-skip), ignore tags counted."""
    from pyspark.sql import functions as F

    from paddleocr_spark.sources.pgnet import read_pgnet_sources

    store = ensure_label_store(cache_root())
    df = read_pgnet_sources(
        spark,
        [os.path.join(store, "pgnet_0.txt"),
         os.path.join(store, "pgnet_1.txt")],
        ratio_list=[1.0, _RATIO], seed=_SEED)
    return (df.where(F.col("polys").isNotNull())
            .select(
                "img_path",
                F.size("polys").cast("long").alias("n_boxes"),
                F.size(F.filter("ignore_tags", lambda x: x))
                 .cast("long").alias("n_ignored"),
                F.concat_ws("|", "texts").alias("texts_sig"),
                F.element_at(F.split("source_file", "/"), -1)
                 .alias("source"))
            .orderBy("img_path"))


def pubtab_oracle_sql() -> str:
    rows = ",\n  ".join(
        f"('{fn}', '{sig}', CAST({n} AS BIGINT))"
        for fn, sig, n in PUBTAB_SPEC)
    return ("SELECT * FROM (VALUES\n  " + rows +
            ") AS t(filename, structure_sig, n_cells)")


def pgnet_oracle_sql() -> str:
    rows = ",\n  ".join(
        f"('{img}', CAST({nb} AS BIGINT), CAST({ni} AS BIGINT), "
        f"'{sig}', '{src}')"
        for img, nb, ni, sig, src in PGNET_SPEC)
    return ("SELECT * FROM (VALUES\n  " + rows +
            ") AS t(img_path, n_boxes, n_ignored, texts_sig, source)")
