"""PGNet e2e label-file source — re-creation of ``PGDataSet``
(``toddleocr/datasets/pgnet.py:8-60``): tab-delimited label files of
``img_path<TAB>json`` lines, one per annotated image, where the JSON
is ``[{"transcription": str, "points": [[x,y],...]}, ...]``, with
per-source-file ratio sampling and multi-file union.

Spark-first: ``spark.read.text`` + ``F.split`` + ``F.from_json``
keep the parse entirely JVM-side (no per-row Python), and the label
semantics of ``E2ELabelEncodeTrain``
(``toddleocr/transforms/custom/label_ops.py:212-238``) — polys,
texts, and the ``"*"``/``"###"`` ignore tags — become array columns
computed with ``F.transform``. The reference's ``random.sample``
ratio subsetting (``pgnet.py:38-39``) is replaced by the repo's
deterministic hash filter (same mechanism as
``load_documents_sampled``): identical membership on every engine,
partition layout, and rerun, so an oracle can reproduce the sample.
"""

from __future__ import annotations

__all__ = ["read_pgnet_labels", "read_pgnet_sources"]

# [{"transcription": ..., "points": [[x, y], ...]}, ...]
_LABEL_JSON = ("array<struct<transcription:string,"
               "points:array<array<double>>>>")


def read_pgnet_labels(spark, label_file: str, delimiter: str = "\t"):
    """One label file → DataFrame (img_path, polys, texts,
    ignore_tags, source_file). Malformed JSON yields a null ``polys``
    row (filterable) instead of the reference's silent resample-loop
    skip (``pgnet.py:43-60`` try/except continue)."""
    from pyspark.sql import functions as F

    lines = spark.read.text(label_file).select(
        F.col("value"), F.lit(label_file).alias("source_file"))
    first_tab = F.instr("value", delimiter)
    # pure column API (no SQL-string splicing: a quote or backslash in
    # the delimiter must reach instr as DATA, not the SQL parser).
    # The payload starts len(delimiter) past the match — `+ 1` assumed
    # a 1-char delimiter, so a multi-char one (PGDataSet supports any)
    # left delimiter bytes in front of the JSON and nulled EVERY label.
    rest = F.col("value").substr(first_tab + len(delimiter),
                                 F.length("value"))
    parsed = lines.select(
        F.substring_index("value", delimiter, 1).alias("img_path"),
        F.from_json(rest, _LABEL_JSON).alias("label"),
        "source_file",
    ).where(first_tab > 0)
    return parsed.select(
        "img_path",
        F.transform("label", lambda b: b["points"]).alias("polys"),
        F.transform("label", lambda b: b["transcription"]).alias("texts"),
        # label_ops.py:228-231: "*" / "###" transcriptions are ignored
        F.transform(
            "label",
            lambda b: b["transcription"].isin("*", "###"),
        ).alias("ignore_tags"),
        "source_file",
    )


def read_pgnet_sources(spark, label_files, ratio_list=None,
                       delimiter: str = "\t", seed: int = 42):
    """Multi-source union with per-source ratio sampling — the
    ``label_files``/``ratio_list`` mechanism (``pgnet.py:12-41``).
    Sampling is a deterministic md5 bucket on (seed, img_path) so the
    subset is stable across partitionings and reruns."""
    from pyspark.sql import functions as F

    if isinstance(label_files, str):
        label_files = [label_files]
    if ratio_list is None:
        ratio_list = [1.0] * len(label_files)
    if isinstance(ratio_list, (int, float)):
        ratio_list = [float(ratio_list)] * len(label_files)
    assert len(ratio_list) == len(label_files), \
        "The length of ratio_list should be the same as the file_list."

    from paddleocr_spark.sources.tables import union_sources

    parts = []
    for path, ratio in zip(label_files, ratio_list):
        df = read_pgnet_labels(spark, path, delimiter)
        if ratio < 1.0:
            from paddleocr_spark.operators.dedup import ratio_keep

            df = df.where(ratio_keep(F, F.col("img_path"), ratio, seed))
        parts.append(df)
    return union_sources(*parts)
