"""training_stats operator vs an independent pure-Python twin of the
reference's deque semantics (toddleocr/utils/stats.py SmoothedValue /
utils/utility.py AverageMeter)."""

import collections
import decimal

import numpy as np
import pytest

from paddleocr_spark.operators.metrics import LOG_WINDOW_SIZE, training_stats


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_matches_reference_deque_semantics(spark, sf_dir):
    rows = training_stats(spark, sf_dir).collect()
    events = (spark.read.parquet(f"{sf_dir}/events.parquet")
              .select("event_type", "ts", "event_id", "value").collect())
    by_key = {}
    for r in sorted(events, key=lambda r: (r.event_type, r.ts, r.event_id)):
        by_key.setdefault(r.event_type, []).append(r.value)

    expected = {}
    q6 = decimal.Decimal("1e-6")

    def spark_round6(x: float) -> float:
        # Spark's round() on doubles goes through the SHORTEST decimal
        # string (Double.toString) then HALF_UP — repr() is Python's
        # shortest-repr equivalent
        return float(decimal.Decimal(repr(x)).quantize(
            q6, rounding=decimal.ROUND_HALF_UP))

    for key, series in by_key.items():
        dq = collections.deque(maxlen=LOG_WINDOW_SIZE)  # SmoothedValue
        # AverageMeter accumulates in float; the operator accumulates
        # in exact decimal(28,6) for engine-independence — mirror that
        # here (the two differ only at round-to-6 boundaries)
        total = decimal.Decimal(0)
        for step, v in enumerate(series, start=1):
            dq.append(v)
            total += decimal.Decimal(v).quantize(
                q6, rounding=decimal.ROUND_HALF_UP)
            expected[(key, step)] = (spark_round6(float(np.median(dq))),
                                     spark_round6(float(total) / step))

    assert len(rows) == len(expected)
    for r in rows:
        exp_sm, exp_avg = expected[(r.event_type, r.step)]
        assert r.smoothed == pytest.approx(exp_sm, abs=1e-6)
        assert r.avg_meter == pytest.approx(exp_avg, abs=1e-6)


def test_smoothing_window_evicts_old_values(spark, tmp_path):
    """The smoothed value must depend ONLY on the last LOG_WINDOW_SIZE
    values — deque(maxlen) eviction, not a growing-prefix median."""
    import datetime

    w = LOG_WINDOW_SIZE
    rows = [(i, datetime.datetime(2026, 1, 1) +
             datetime.timedelta(seconds=i), 0, "loss",
             100.0 if i < w else 1.0, "")
            for i in range(2 * w)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/events.parquet")
    out = {r.step: r for r in training_stats(spark, d).collect()}
    assert out[w].smoothed == 100.0          # window full of the old value
    assert out[2 * w].smoothed == 1.0        # old value fully evicted
    # mid-transition the window is half old/half new: even-count
    # interpolation (1+100)/2, then the first new-majority step flips
    assert out[w + w // 2].smoothed == (1.0 + 100.0) / 2
    assert out[w + w // 2 + 1].smoothed == 1.0
    # AverageMeter never evicts: cumulative mean over ALL values
    assert out[2 * w].avg_meter == pytest.approx((100.0 + 1.0) / 2, 1e-9)
