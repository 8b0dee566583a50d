"""LMDBDataSetSR source: str_filt parity with the reference's
pure-Python semantics, paired scan, and the decode→PSNR hookup to the
SR metric kernels."""

import string

import numpy as np
import pytest

from paddleocr_spark.sources.lmdb_sr import read_sr_pairs, str_filt_col


def _ref_str_filt(str_, voc_type):
    """Line-for-line port of the reference semantics
    (toddleocr/datasets/lmdb.py:116-128) as the test oracle."""
    alpha_dict = {
        "digit": string.digits,
        "lower": string.digits + string.ascii_lowercase,
        "upper": string.digits + string.ascii_letters,
        "all": string.digits + string.ascii_letters + string.punctuation,
    }
    if voc_type == "lower":
        str_ = str_.lower()
    for char in str_:
        if char not in alpha_dict[voc_type]:
            str_ = str_.replace(char, "")
    return str_


LABELS = ["Hello, World! 42", "ABC def 123", "...", "Ωmega-3 ücase",
          "a b\tc\nd", "42!?", ""]


@pytest.mark.parametrize("voc", ["digit", "lower", "upper", "all"])
def test_str_filt_matches_reference(spark, voc):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in LABELS], "label string")
    got = [r.f for r in
           df.select(str_filt_col(F.col("label"), voc).alias("f"))
           .collect()]
    want = [_ref_str_filt(s, voc) for s in LABELS]
    assert got == want


def _write_pairs(spark, tmp_path, rows):
    from paddleocr_spark.kernels.imgcodec import encode_png

    data = []
    for idx, label in rows:
        rng = np.random.default_rng(idx)
        hr = rng.integers(0, 256, (32, 128, 3), dtype=np.uint8)
        # LR = 2x2 block-mean of HR (the 64x16 pairing, lmdb.py:137-138)
        lr = hr.reshape(16, 2, 64, 2, 3).mean(axis=(1, 3)) \
            .astype(np.uint8)
        data.append((idx, encode_png(hr), encode_png(lr), label))
    path = str(tmp_path / "sr_pairs")
    spark.createDataFrame(
        data, "idx long, image_hr binary, image_lr binary, label string"
    ).write.mode("overwrite").parquet(path)
    return path


def test_paired_scan_filters(spark, tmp_path):
    path = _write_pairs(spark, tmp_path, [
        (0, "Good Label 1"),
        (1, "x" * 101),       # raw label over max_len -> dropped
        (2, "..."),           # filters to empty under upper -> dropped
        (3, "Keep-Me_42"),
    ])
    out = {r.idx: r.label
           for r in read_sr_pairs(spark, path).collect()}
    assert out == {0: "GoodLabel1", 3: "KeepMe42"}
    # "all" keeps punctuation: row 2 survives
    out_all = {r.idx: r.label
               for r in read_sr_pairs(spark, path, voc_type="all")
               .collect()}
    assert out_all[2] == "..."


def test_pairs_feed_sr_psnr(spark, tmp_path):
    """Decode both sides executor-side and compute the SR metric's
    PSNR kernel per pair — identical images → inf-free high PSNR for
    the HR-vs-HR control, lower for LR-upsampled-vs-HR."""
    path = _write_pairs(spark, tmp_path, [(0, "abc"), (1, "def")])

    def psnr_rows(batches):
        import pandas as pd

        from paddleocr_spark.kernels.imgcodec import decode_image
        from paddleocr_spark.kernels.sr import psnr

        for pdf in batches:
            rows = []
            for idx, hr_b, lr_b in zip(pdf["idx"], pdf["image_hr"],
                                       pdf["image_lr"]):
                hr = decode_image(bytes(hr_b)).astype(np.float64) / 255
                lr = decode_image(bytes(lr_b)).astype(np.float64) / 255
                up = np.repeat(np.repeat(lr, 2, 0), 2, 1)
                rows.append((int(idx), float(psnr(hr, up)),
                             float(psnr(hr, hr.copy()))))
            yield pd.DataFrame(rows,
                               columns=["idx", "psnr_up", "psnr_self"])

    out = (read_sr_pairs(spark, path)
           .mapInPandas(psnr_rows,
                        schema="idx long, psnr_up double, psnr_self double")
           .collect())
    assert len(out) == 2
    for r in out:
        assert r.psnr_self > r.psnr_up > 5.0
