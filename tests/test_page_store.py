"""Page-explode CORRECTNESS fixtures: the paged-container store's
decoded pages must match the ANALYTIC spec (constant-color formulas),
and the DuckDB VALUES oracle must agree — codec-independent both ways.
Reference: check_and_read (toddleocr/utils/utility.py:92-123)."""

import os

import duckdb
import pytest

from paddleocr_spark.kernels.imgcodec import decode_image
from paddleocr_spark.sources.media_files import _split_pages
from paddleocr_spark.sources.page_store import (
    PAGE_SPEC,
    ensure_page_store,
    pages_oracle_sql,
)


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    return ensure_page_store(str(tmp_path_factory.mktemp("pages")))


def test_store_pages_match_analytic_spec(store):
    got = []
    for name in sorted(f for f in os.listdir(store)
                       if not f.startswith("_")):
        with open(os.path.join(store, name), "rb") as fh:
            content = fh.read()
        for idx, page_bytes, multi in _split_pages(content):
            img = decode_image(page_bytes)
            got.append((name, idx, multi, img.shape[0], img.shape[1],
                        float(img.mean())))
    exp = [(n, p, m, h, w, float(v)) for n, p, m, h, w, v in PAGE_SPEC]
    assert sorted(got) == sorted(exp)


def test_oracle_values_match_spec():
    rows = duckdb.sql(pages_oracle_sql()).fetchall()
    exp = [(n, p, m, h, w, float(v)) for n, p, m, h, w, v in PAGE_SPEC]
    assert sorted(rows) == sorted(exp)


def test_dct_pages_check_pixel_values_not_just_shapes():
    # the DCTDecode PDF must carry a non-trivial pixel expectation —
    # guards against the spec degenerating into shape-only checks
    dct = [r for r in PAGE_SPEC if r[0] == "pages_01.pdf"]
    assert len(dct) == 2 and {r[5] for r in dct} != {0}


def test_store_is_idempotent(store):
    assert ensure_page_store(os.path.dirname(store)) == store
