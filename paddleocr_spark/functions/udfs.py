"""Arrow-batched UDFs for the extraction stages.

The hot path is ``decode_media``: one ``mapInPandas`` stage that runs
det (DB binarize + box post-process, ``toddleocr/postprocess/db.py``),
reading-order sort (``utils/utility.py:170-192``), cls decode
(``postprocess/cls.py``), CTC rec decode (``postprocess/rec.py``) and
table-structure decode + match (``postprocess/table.py``,
``postprocess/matcher.py``) per distinct media item, emitting one row
per output fragment (a UDTF in Spark terms: 1 media row → N fragment
rows, like the reference's one-image→many-boxes det stage).

Doing all stages in ONE Python crossing (instead of det / cls / rec as
separate UDF stages, as a literal port would) halves Arrow serialization
traffic and keeps the fat tensor columns from ever entering a shuffle:
only small string fragments leave this stage.
"""

from __future__ import annotations

__all__ = ["MEDIA_FRAGMENT_SCHEMA", "ERROR_KIND", "decode_media",
           "decode_errors"]

# out_kind of quarantined poison rows (decode raised); never a real
# layout label, filtered out of span assembly
ERROR_KIND = "__error__"

MEDIA_FRAGMENT_SCHEMA = (
    "media_ref string, frag_idx int, box_idx int, out_kind string, "
    "out_text string, conf double, cls_label string, cls_score double, "
    "aux string"
)

_MEDIA_COLS = [
    "media_ref", "cand_boxes", "cand_scores", "det_map", "det_h", "det_w",
    "shape_list", "rec_logits", "rec_t", "rec_c", "cls_probs",
    "structure_probs", "struct_t", "struct_v", "loc_preds",
]

_FRAG_COLS = ["frag_idx", "box_idx", "out_kind", "out_text", "conf",
              "cls_label", "cls_score", "aux"]


def _make_decode_batches(bundle_bc=None):
    """Build the mapInPandas body, closing over an optional
    ``sc.broadcast(MODEL_BUNDLE)`` handle — the charset/drop_score
    "weights" ship to each executor once via the broadcast machinery
    (torrent-style at cluster scale), not once per task in the
    serialized closure, mirroring the reference's load-model-once-per-
    process (toddleocr/engine.py:317-324)."""

    def _decode_batches(batches):
        # import inside the worker so only executors pay the import
        import pandas as pd

        from paddleocr_spark.extract_core import decode_media_row

        bundle = bundle_bc.value if bundle_bc is not None else None
        for pdf in batches:
            out = {c: [] for c in ["media_ref", *_FRAG_COLS]}
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                try:
                    frags = decode_media_row(d, bundle)
                except Exception as exc:  # poison-row quarantine:
                    # at 10^12 docs one corrupt media row must not
                    # kill the job (the reference resamples on parse
                    # error, simple.py:78-84); it becomes an ERROR_KIND
                    # fragment — excluded from spans, countable via
                    # decode_errors()
                    frags = [{
                        "frag_idx": -1, "box_idx": -1,
                        "out_kind": ERROR_KIND, "out_text": "",
                        "conf": 0.0, "cls_label": "", "cls_score": 0.0,
                        "aux": f"{type(exc).__name__}: {exc}"[:200],
                    }]
                for frag in frags:
                    out["media_ref"].append(d["media_ref"])
                    for c in _FRAG_COLS:
                        out[c].append(frag[c])
            yield pd.DataFrame(out)

    return _decode_batches


# default body (module-level defaults; used where no SparkContext is
# at hand, e.g. direct tests of the batch function)
_decode_batches = _make_decode_batches(None)


def _broadcast_bundle(spark):
    from paddleocr_spark.extract_core import MODEL_BUNDLE

    return spark.sparkContext.broadcast(MODEL_BUNDLE)


def decode_media(media_df, repartition: int | None = None):
    """media store DataFrame → fragment DataFrame.

    ``repartition`` round-robins the (unkeyed) media rows so decode cost
    spreads evenly across executors regardless of upstream file layout —
    the fixture-world analogue of the reference's DataLoader sharding.
    """
    df = media_df.select(*_MEDIA_COLS)
    if repartition:
        df = df.repartition(repartition)
    bc = _broadcast_bundle(media_df.sparkSession)
    return df.mapInPandas(_make_decode_batches(bc),
                          schema=MEDIA_FRAGMENT_SCHEMA)


# ---------------------------------------------------------------------------
# Fast path: pointer-passing media decode.
#
# Shipping ~60 KB of tensor bytes per row from the JVM to Python through
# the Arrow python-runner measures at ~8 MB/s/core (the row-to-Arrow
# copy of large binaries dominates; a passthrough mapInPandas over the
# fat columns costs 68 s for 540 MB at local[8] while the actual decode
# is 32 core-seconds). The reference never ships pixels either — it
# passes image PATHS and reads executor-side (toddleocr/datasets/
# simple.py:68). We do the same: the driver plans over FILE POINTERS
# (at production scale, Iceberg manifest entries) and each task reads
# its parquet split directly with pyarrow — vectorized, no JVM copy.

def list_store_files(path: str) -> list[str]:
    """Data files of a parquet store directory. Local listing here; on
    a real deployment this comes from the Iceberg manifest (which also
    gives size/row-count for balanced assignment)."""
    import glob as _glob
    import os as _os

    if _os.path.isfile(path):
        return [path]
    return sorted(_glob.glob(_os.path.join(path, "*.parquet")))


def map_media_store(spark, store_path: str, batch_fn, schema,
                    columns: list[str] | None = None):
    """Run ``batch_fn(iter_of_pandas)`` over the media store with
    executor-side pyarrow reads: one input row per data file, decode
    parallelism = file count (set by the store's write partitioning)."""
    files = list_store_files(store_path)
    # pack files into ~2 tasks/core: fewer task boundaries than
    # one-task-per-file, still enough for stragglers to rebalance
    n_tasks = min(len(files),
                  spark.sparkContext.defaultParallelism * 2)
    files_df = spark.createDataFrame([(f,) for f in files], "path string") \
        .repartition(n_tasks)
    cols = columns

    def per_file(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            for path in pdf["path"]:
                # stream row-group batches instead of whole-file
                # to_pandas: bounds per-task transient memory to ~tens
                # of MB regardless of file size (whole-file pandas at
                # full task concurrency caused reclaim stalls), and
                # use_threads=False so workers don't each spin up
                # Arrow's cpu_count-wide pool (~32x oversubscription)
                pf = pq.ParquetFile(path)
                for rb in pf.iter_batches(batch_size=512, columns=cols,
                                          use_threads=False):
                    yield from batch_fn(iter([rb.to_pandas()]))

    return files_df.mapInPandas(per_file, schema=schema)


def decode_media_store(spark, store_path: str):
    """media store directory → fragment DataFrame (fast path)."""
    return map_media_store(spark, store_path,
                           _make_decode_batches(_broadcast_bundle(spark)),
                           MEDIA_FRAGMENT_SCHEMA, columns=_MEDIA_COLS)


# TableMaster variant: same det+rec, 3-rule cascade match instead of
# TableMatch (config.py:846-851); one row per table-bearing media.

_MASTER_COLS = [c for c in _MEDIA_COLS if c != "cls_probs"]


def _master_html_batches(batches):
    import pandas as pd

    from paddleocr_spark.extract_core import master_html_for_row

    for pdf in batches:
        refs, htmls = [], []
        for row in pdf.itertuples(index=False):
            d = row._asdict()
            html = master_html_for_row(d)
            if html is not None:
                refs.append(d["media_ref"])
                htmls.append(html)
        yield pd.DataFrame({"media_ref": refs, "master_html": htmls})


def master_html_store(spark, store_path: str):
    return map_media_store(spark, store_path, _master_html_batches,
                           "media_ref string, master_html string",
                           columns=_MASTER_COLS)


def decode_errors(fragments_df):
    """Quarantined decode failures: (media_ref, error). Zero rows on a
    healthy corpus; at scale this is the per-run data-quality report
    the lineage/checkpoint rows point at."""
    from pyspark.sql import functions as F

    return (fragments_df.where(F.col("out_kind") == ERROR_KIND)
            .select("media_ref", F.col("aux").alias("error")))
