"""SR-source CORRECTNESS fixture: the paired-scan query must match the
analytic spec (restated str_filt twin) and both drop rules must fire.
Reference: toddleocr/datasets/lmdb.py:107-160."""

import duckdb

from paddleocr_spark.sources.sr_store import (
    _LABELS,
    SR_SPEC,
    sr_oracle_sql,
    sr_pairs_filtered,
)

SF = "/root/testdata/sf0.001"


def test_oracle_values_match_spec():
    assert sorted(duckdb.sql(sr_oracle_sql()).fetchall()) == sorted(SR_SPEC)


def test_fixture_is_not_vacuous():
    # both drop rules fire, and the survivors exercise the projection
    assert 0 < len(SR_SPEC) < len(_LABELS)
    dropped = len(_LABELS) - len(SR_SPEC)
    assert dropped == 3  # empty-after-filter x2 + too-long x1
    assert any(lab != raw for (_, lab, _, _), raw
               in zip(SR_SPEC, _LABELS))  # projection changed something


def test_spark_leg_matches_oracle(spark):
    sdf = sr_pairs_filtered(spark, SF).toPandas()
    odf = duckdb.sql(sr_oracle_sql()).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = odf[cols].sort_values(cols).reset_index(drop=True)
    assert s.equals(d), (s, d)
