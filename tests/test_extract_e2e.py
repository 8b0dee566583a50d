"""End-to-end span-sequence equality: the distributed Spark pipeline
must produce EXACTLY the per-document ordered (kind, text, media_ref,
order) sequence of the sequential pure-Python reference path — the
BASELINE.json per-row invariant, verified per FIXTURES.md §3."""

import pytest

from paddleocr_spark.corpus import synthesize_docs, synthesize_media
from paddleocr_spark.operators.extract import extract_spans
from paddleocr_spark.reference_path import golden_corpus

N_DOCS = 40
SEED = 42
HEAVY = 0.05  # force at least one media-heavy doc into the small corpus


def _golden_key_rows(golden):
    return sorted((r["doc_id"], r["order"], r["kind"], r["text"],
                   r["media_ref"]) for r in golden)


@pytest.fixture(scope="module")
def pipeline_result(spark):
    docs = synthesize_docs(spark, N_DOCS, seed=SEED, heavy_frac=HEAVY)
    media = synthesize_media(spark, docs, seed=SEED)
    out = extract_spans(docs, media).collect()
    _, _, golden = golden_corpus(N_DOCS, seed=SEED, heavy_frac=HEAVY)
    return out, golden


def test_span_sequence_equality(pipeline_result):
    out, golden = pipeline_result
    got = sorted((r.doc_id, r.order, r.kind, r.text, r.media_ref) for r in out)
    assert got == _golden_key_rows(golden)


def test_confidences_match(pipeline_result):
    out, golden = pipeline_result
    got = {(r.doc_id, r.order): round(r.conf, 6) for r in out}
    want = {(r["doc_id"], r["order"]): round(r["conf"], 6) for r in golden}
    assert got == want


def test_partition_count_independence(spark):
    """Same results at different parallelism (FIXTURES.md §3 invariant:
    local[2]-vs-local[8] analogue via shuffle partition counts)."""
    docs = synthesize_docs(spark, 15, seed=7, heavy_frac=0.0)
    media = synthesize_media(spark, docs, seed=7)
    a = extract_spans(docs.repartition(1), media.repartition(1)).collect()
    # salt_width=3 forces multi-bucket salted ordering even on these
    # small docs (every doc with >3 spans spans several buckets)
    b = extract_spans(docs.repartition(7), media.repartition(5),
                      decode_partitions=3, salt_width=3).collect()
    key = lambda rows: sorted((r.doc_id, r.order, r.kind, r.text, r.media_ref)
                              for r in rows)
    assert key(a) == key(b)


def test_salted_ordering_equals_window_on_pathological_doc(spark):
    """The salted two-phase ordering must be bit-identical to the
    plain per-doc window, including on a pathological media-heavy doc
    that spans many offset buckets (the skew case it exists for)."""
    docs = synthesize_docs(spark, 10, seed=11, heavy_frac=0.0,
                           patho_docs=1, patho_spans=3000, patho_pool=4)
    media = synthesize_media(spark, docs, seed=11)
    rows = lambda out: sorted(
        (r.doc_id, r.order, r.kind, r.text, r.media_ref, round(r.conf, 9))
        for r in out)
    plain = rows(extract_spans(docs, media, salt_width=0).collect())
    salted = rows(extract_spans(docs, media, salt_width=256).collect())
    assert plain == salted
    # the pathological doc really exercised multiple buckets
    assert sum(r[0].startswith("patho") for r in plain) > 256


def test_auto_salt_decision():
    """salt_width="auto" must pick the plain window for ordinary
    corpora and the salted path when a doc exceeds SALT_WIDTH spans —
    asserted via the physical plan's Window node count (plain = 1 big
    window; salted = rank window + tiny running-sum window)."""
    from paddleocr_spark.operators.extract import SALT_WIDTH

    assert SALT_WIDTH == 4096


def test_rotated_components_exercised_in_fixtures():
    """The corpus must contain ROTATED det components (VERDICT r2
    fidelity gap): some media's detected quad has non-axis-aligned
    corners, so min_area_rect / polygon_mask_mean / unclip_rect run on
    rotated geometry inside the oracle-checked pipeline."""
    import numpy as np

    from paddleocr_spark.corpus import media_record

    rotated = 0
    axis = 0
    for i in range(40):
        rec = media_record(f"m{i:08d}")
        for b in rec["gt_boxes"]:
            quad = np.asarray(b).reshape(4, 2)
            ys = sorted(quad[:, 1])
            # an axis-aligned quad has two pairs of equal y
            if abs(ys[0] - ys[1]) > 1.5 or abs(ys[2] - ys[3]) > 1.5:
                rotated += 1
            else:
                axis += 1
    assert rotated >= 5, (rotated, axis)
    assert axis >= 5, (rotated, axis)  # both regimes still covered


def test_order_is_dense_per_doc(pipeline_result):
    out, _ = pipeline_result
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.order)
    for orders in by_doc.values():
        assert sorted(orders) == list(range(len(orders)))


def test_fast_path_equals_generic_path(spark, tmp_path):
    """Pointer-passing decode (decode_media_store) must equal the
    generic DataFrame path row-for-row."""
    from paddleocr_spark.functions.udfs import decode_media, decode_media_store

    docs = synthesize_docs(spark, 12, seed=21, heavy_frac=0.0)
    media = synthesize_media(spark, docs, seed=21, partitions=3)
    store = str(tmp_path / "media_store")
    media.write.mode("overwrite").parquet(store)
    media_df = spark.read.parquet(store)

    key = lambda rows: sorted((r.media_ref, r.box_idx, r.out_kind,
                               r.out_text, round(r.conf, 9), r.aux)
                              for r in rows)
    a = key(decode_media(media_df).collect())
    b = key(decode_media_store(spark, store).collect())
    assert a == b

    # extract_spans accepts either form with identical results
    ra = extract_spans(docs, media_df).collect()
    rb = extract_spans(docs, store).collect()
    k2 = lambda rows: sorted((r.doc_id, r.order, r.kind, r.text,
                              r.media_ref) for r in rows)
    assert k2(ra) == k2(rb)


def test_model_bundle_roundtrip():
    """The broadcast model bundle must resolve to exactly the module
    defaults — otherwise the Spark decode (bundle path) and the
    sequential golden (None path) silently diverge."""
    from paddleocr_spark.extract_core import (
        _CHARSET,
        DROP_SCORE,
        MODEL_BUNDLE,
        resolve_bundle,
    )

    cs, ds = resolve_bundle(MODEL_BUNDLE)
    assert cs == _CHARSET and ds == DROP_SCORE
    assert resolve_bundle(None) == (_CHARSET, DROP_SCORE)


def test_poison_media_row_quarantined(spark):
    """A corrupt media row must not kill the decode job: it becomes an
    ERROR_KIND fragment (countable via decode_errors), is excluded
    from span assembly, and every other row decodes unchanged."""
    from pyspark.sql import functions as F

    from paddleocr_spark.functions.udfs import (
        ERROR_KIND,
        decode_errors,
        decode_media,
    )

    docs = synthesize_docs(spark, 8, seed=33, heavy_frac=0.0)
    media = synthesize_media(spark, docs, seed=33, partitions=2)
    victim = media.select("media_ref").orderBy("media_ref").first()[0]
    # truncate the victim's det_map so dequantize/reshape raises
    poisoned = media.withColumn(
        "det_map",
        F.when(F.col("media_ref") == victim,
               F.substring(F.col("det_map"), 1, 3))
        .otherwise(F.col("det_map")))

    frags = decode_media(poisoned)
    errs = decode_errors(frags).collect()
    assert [e["media_ref"] for e in errs] == [victim]
    assert errs[0]["error"]  # non-empty reason string

    # all other media decode exactly as before
    key = lambda rows: sorted((r.media_ref, r.box_idx, r.out_kind,
                               r.out_text, round(r.conf, 9))
                              for r in rows if r.media_ref != victim)
    clean = decode_media(media).collect()
    assert key([r for r in frags.collect()
                if r.out_kind != ERROR_KIND]) == key(clean)

    # span assembly drops the quarantined media silently
    spans = extract_spans(docs, poisoned).collect()
    assert all(r.media_ref != victim for r in spans)
    assert not any(r.kind == ERROR_KIND for r in spans)


def test_clean_text_python_twin_matches_spark_on_control_chars(spark):
    """The pure-Python clean_text (golden path) and the JVM
    clean_text_col must agree on adversarial edges: control characters
    outside Java's ASCII \\s class (\\x00, \\x1c-\\x1f) survive BOTH
    sides (SQL trim strips U+0020 only), and \\t/\\n/\\v edges collapse
    to a stripped space on both."""
    from pyspark.sql import functions as F

    from paddleocr_spark.extract_core import clean_text
    from paddleocr_spark.operators.extract import clean_text_col

    cases = [
        "\x1cfoo", "foo\x00", "\x1ffoo bar\x1d", "\tfoo\n", " foo ",
        "\vfoo\f", "foo\x00bar", "a  \t b", "\x00", "", "  ",
        "\x1c \x1d", "foo \x1e", "\x1e foo",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = [r.c for r in
           df.select(clean_text_col(F.col("t")).alias("c")).collect()]
    want = [clean_text(c) for c in cases]
    assert got == want, list(zip(cases, got, want))


def test_duplicate_offsets_order_deterministically(spark):
    """The schema allows two spans at the SAME offset; the ordering
    tie must break deterministically (kind/media_ref/text tiebreak) and
    identically on the plain and salted paths."""
    from paddleocr_spark.corpus import docs_schema, synthesize_docs, synthesize_media
    from paddleocr_spark.operators.extract import extract_spans

    docs = synthesize_docs(spark, 4, seed=7, heavy_frac=0.0)
    media = synthesize_media(spark, docs, seed=7)
    dup = spark.createDataFrame(
        [("dup_doc", [("text", "zz ties last", "", 5),
                      ("text", "aa ties first", "", 5),
                      ("text", "mm ties mid", "", 5)])], docs_schema())
    docs2 = docs.unionByName(dup)

    key = lambda df: sorted((r.doc_id, r.order, r.kind, r.text,
                             r.media_ref) for r in df.collect())
    plain = key(extract_spans(docs2, media, salt_width=0))
    salted = key(extract_spans(docs2, media, salt_width=2))
    assert plain == salted
    dup_rows = [(o, t) for (d, o, k, t, m) in plain if d == "dup_doc"]
    assert dup_rows == [(0, "aa ties first"), (1, "mm ties mid"),
                        (2, "zz ties last")]
    # and stable across repeated runs
    assert plain == key(extract_spans(docs2, media, salt_width=0))
