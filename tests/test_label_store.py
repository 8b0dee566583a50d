"""Label-source CORRECTNESS fixtures: the PubTab/PGNet stores' parsed
results must match the analytic spec, the VALUES oracles must agree,
and every reject branch must actually reject (non-vacuous fixtures).
References: toddleocr/datasets/pubtab.py:60-77 (validity predicate),
toddleocr/datasets/pgnet.py:38-60 (ratio sample + skip-on-error)."""

import duckdb
import pytest

from paddleocr_spark.sources.label_store import (
    PGNET_SPEC,
    PUBTAB_SPEC,
    _pg_rows,
    _pub_rows,
    pgnet_labels,
    pgnet_oracle_sql,
    pubtab_oracle_sql,
    pubtab_valid,
)

SF = "/root/testdata/sf0.001"


def test_oracle_values_match_spec():
    assert sorted(duckdb.sql(pubtab_oracle_sql()).fetchall()) == \
        sorted(PUBTAB_SPEC)
    assert sorted(duckdb.sql(pgnet_oracle_sql()).fetchall()) == \
        sorted(PGNET_SPEC)


def test_fixtures_exercise_every_reject_branch():
    pub_rejected = sum(1 for _, e in _pub_rows() if e is None)
    assert pub_rejected == 5  # size0, too-long, no-cells, no-struct, corrupt
    pg0 = [e for _, e in _pg_rows(0)]
    pg1 = [e for _, e in _pg_rows(1)]
    assert pg0.count(None) == 2          # corrupt + tab-less only
    assert pg1.count(None) > 2           # plus ratio-sampled-out rows
    assert any(e for e in pg1 if e)      # and the sample kept some
    # the ignore tags are present somewhere in the kept rows
    assert any(e[2] > 0 for e in PGNET_SPEC)


def test_spark_legs_match_oracles(spark):
    for q, osql in ((pubtab_valid, pubtab_oracle_sql()),
                    (pgnet_labels, pgnet_oracle_sql())):
        sdf = q(spark, SF).toPandas()
        odf = duckdb.sql(osql).df()
        cols = sorted(sdf.columns)
        assert cols == sorted(odf.columns)
        s = sdf[cols].sort_values(cols).reset_index(drop=True)
        d = odf[cols].sort_values(cols).reset_index(drop=True)
        assert s.equals(d), (s, d)
