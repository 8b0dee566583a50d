"""corpus_profile: the exact percentile profile is the oracle-checked
query; this test pins the SKETCH path (approx_percentile / HLL
approx_count_distinct — the 10^12-row form) to its error envelope vs
the exact aggregates, since sketch internals are engine-specific and
deliberately excluded from the DuckDB oracle."""

from pyspark.sql import functions as F

from paddleocr_spark.operators.text import corpus_profile

SF = "/root/testdata/sf0.01"


def test_sketch_path_within_error_envelope(spark):
    exact = {r.lang: r.asDict() for r in
             corpus_profile(spark, SF).collect()}

    df = spark.read.parquet(f"{SF}/documents.parquet")
    approx = {r["lang"]: r.asDict() for r in (
        df.groupBy("lang")
        .agg(F.expr("approx_percentile(n_chars, array(0.25D, 0.5D, "
                    "0.75D, 0.95D), 1000)").alias("pct"),
             F.approx_count_distinct("source").alias("srcs"))
        .collect())}

    assert set(approx) == set(exact)
    for lang, e in exact.items():
        a = approx[lang]
        # approx_percentile(accuracy=1000): rank error <= n/1000 — on
        # these group sizes that is < 1 rank, so the sketch must land
        # within the neighbouring order statistics; a generous value
        # bound of 5% covers interpolation differences
        for i, key in enumerate(("chars_p25", "chars_p50",
                                 "chars_p75", "chars_p95")):
            assert abs(float(a["pct"][i]) - e[key]) <= 0.05 * e[key], (
                lang, key, a["pct"][i], e[key])
        # HLL relative standard deviation defaults to 5%
        assert abs(a["srcs"] - e["n_sources"]) <= max(
            2, 0.15 * e["n_sources"]), (lang, a["srcs"], e["n_sources"])


def test_profile_totals_consistent(spark):
    prof = corpus_profile(spark, SF)
    tot = prof.agg(F.sum("n_docs").alias("n")).collect()[0].n
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert tot == n
