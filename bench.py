"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": <sf>, "docs_per_sec": ...}

Env knobs:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  SPARK_GRAFT_SCALING  if set, additionally run the flagship extract at
                       local[8] and local[32] on the SAME cached corpus
                       and report throughput at both + scaling
                       efficiency (the sandbox substitute for the
                       N-vs-4N-executor criterion; see BASELINE.md)

Corpus synthesis is cached under .cache/ and excluded from timings —
the benchmark measures the extraction/query jobs, not data generation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# override corpus size (docs); default = |documents| at SF_DIR
NDOCS = int(os.environ.get("SPARK_GRAFT_NDOCS", "0")) or None

BENCH_QUERIES = [
    "extract_full",
    "extract_media_fragments",
    "corpus_det_metric",
    "clean_boilerplate",
    "quality_scores",
    "table_master_html",
    "ser_entities",
    "re_pairs",
    "ser_token_metric",
    "kie_node_metric",
    "ct_metric",
    "exact_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "near_dup_pairs",
    "simhash32",
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
    "cosine_topk_ivf",
    "embedding_near_dups",
    "rec_metric_pairs",
    "pricing_summary",
    "revenue_by_region",
    "top_customers_per_nation",
    "event_sessions",
]


def _warm_workers(spark, cores: int) -> None:
    """Pre-fork python workers and pay the heavy-import cost (numpy/
    pandas/pyarrow + kernels, ~2.5 s/worker) outside the timings — a
    cold job otherwise spends ~cores×2.5 core-seconds on an import
    storm before any real work."""

    def warm(batches):
        import pandas as pd  # noqa: F401

        import paddleocr_spark.extract_core  # noqa: F401

        for pdf in batches:
            yield pdf

    (spark.range(cores * 4).repartition(cores * 4)
     .mapInPandas(warm, schema="id long")
     .write.mode("overwrite").format("noop").save())


def _sf_of(path: str) -> float:
    name = os.path.basename(path.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def _tmpfs_media(media_path: str, n_docs: int) -> str:
    """Copy the media store to tmpfs for the scaling study. The sandbox
    VM's single virtio disk sustains ~40 MB/s cold reads — a fixed
    budget that one process saturates, flattening any CPU scaling. A
    real N-executor cluster reads from object storage whose aggregate
    bandwidth scales with N; tmpfs emulates that property so the study
    measures the JOB's scalability, not this VM's disk. (Disk-bound
    numbers are reported alongside in BENCH/BASELINE.md.)"""
    import shutil

    # key by the versioned cache dir (…/v4_seed42_nN/media) so fixture
    # schema bumps never reuse a stale copy
    version = os.path.basename(os.path.dirname(media_path.rstrip("/")))
    dst = f"/dev/shm/paddleocr_media_{version}"
    if not os.path.exists(os.path.join(dst, "_SUCCESS")):
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(media_path, dst)
    # relocate the manifest sibling too (file names are relative, so
    # the copied manifest plans the copied store)
    from paddleocr_spark.functions.udfs import manifest_path

    src_man, dst_man = manifest_path(media_path), manifest_path(dst)
    if (os.path.exists(os.path.join(src_man, "_SUCCESS"))
            and not os.path.exists(os.path.join(dst_man, "_SUCCESS"))):
        shutil.rmtree(dst_man, ignore_errors=True)
        shutil.copytree(src_man, dst_man)
    return dst


def _run_extract_throughput(master_cores: int, n_docs: int) -> float:
    """Fresh session at local[N]; returns STEADY-STATE docs/sec for the
    flagship extract job over the cached corpus: workers pre-forked, one
    untimed warm pass (fork/import ramp, page cache), then the timed
    pass. A settle delay after stop() keeps the next session from
    contending with this JVM's shutdown."""
    import __spark_entry__ as entry_mod
    from paddleocr_spark.session import get_spark

    spark = get_spark(f"bench_scaling_{master_cores}",
                      master=f"local[{master_cores}]",
                      shuffle_partitions=master_cores)
    try:
        docs_path, media_path = entry_mod.corpus_paths(spark, SF_DIR,
                                                       n_docs=n_docs)
        if os.environ.get("SPARK_GRAFT_SCALING_TMPFS"):
            media_path = _tmpfs_media(media_path, n_docs)
        from paddleocr_spark.operators.extract import extract_spans

        _warm_workers(spark, master_cores)
        docs = spark.read.parquet(docs_path)
        extract_spans(docs, media_path).write.mode("overwrite") \
            .format("noop").save()  # warm pass, untimed
        t0 = time.time()
        extract_spans(docs, media_path).write.mode("overwrite") \
            .format("noop").save()
        dt = time.time() - t0
        return n_docs / dt
    finally:
        spark.stop()
        time.sleep(10)


def main() -> None:
    import __spark_entry__ as entry_mod
    from paddleocr_spark.session import get_spark

    sf = _sf_of(SF_DIR)
    spark = get_spark("bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    n_docs = entry_mod._corpus_size(spark, SF_DIR)
    # warm the corpus cache and python workers outside the timings
    entry_mod.corpus_paths(spark, SF_DIR, n_docs=n_docs)
    _warm_workers(spark, CPUS)

    from paddleocr_spark.operators._cache import release_persisted

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        queries[name](spark, SF_DIR).write.mode("overwrite") \
            .format("noop").save()
        timings[name] = round(time.time() - t0, 3)
        # tracked intermediate caches (kie/dedup eager persists) don't
        # accumulate across the suite
        release_persisted(spark)

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_docs / timings["extract_full"], 1)
    out = {
        "metric": "end-to-end extract + analytics suite wall-clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec": docs_per_sec,
        "cpus": CPUS,
    }
    spark.stop()

    if os.environ.get("SPARK_GRAFT_SCALING"):
        pair = os.environ.get("SPARK_GRAFT_SCALING_PAIR", "8,32")
        lo, hi = (int(x) for x in pair.split(","))
        scale_docs = NDOCS or n_docs
        tp_lo = _run_extract_throughput(lo, scale_docs)
        tp_hi = _run_extract_throughput(hi, scale_docs)
        out["scaling"] = {
            "n_docs": scale_docs,
            f"docs_per_sec_local[{lo}]": round(tp_lo, 1),
            f"docs_per_sec_local[{hi}]": round(tp_hi, 1),
            "efficiency": round((tp_hi / tp_lo) / (hi / lo), 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
