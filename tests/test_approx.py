"""Approximate-aggregate variants (SURVEY.md §7.2 P7).

The declared/oracle query set deliberately uses only exact aggregates;
the approx twins (what ES actually runs: HLL cardinality, t-digest
percentiles) are the 100 TB path and are verified here by tolerance
against their exact counterparts on the same data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafana_spark import query
from kafana_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_SMOKE, "events")


def test_approx_cardinality_within_rsd(spark, events):
    exact = query.cardinality(events, "user_id", by=("event_type",),
                              exact=True)
    approx = query.cardinality(events, "user_id", by=("event_type",),
                               rsd=0.05)
    e = {r.event_type: r.cardinality for r in exact.collect()}
    a = {r.event_type: r.cardinality for r in approx.collect()}
    assert set(e) == set(a)
    for k in e:
        # 5% rsd ⇒ generous 3-sigma band
        assert abs(a[k] - e[k]) <= max(2, 0.15 * e[k]), (k, a[k], e[k])


def test_approx_percentiles_close_to_exact(spark, events):
    ev = events.where(F.col("value").isNotNull())
    exact = query.percentiles(ev, "value", exact=True).first()
    approx = query.percentiles(ev, "value").first()
    spread = (exact.p99 - exact.p50) or 1.0
    for c in ("p50", "p95", "p99"):
        assert abs(getattr(approx, c) - getattr(exact, c)) <= 0.1 * spread


def test_approx_cardinality_plan_is_partial_aggregable(spark, events):
    """HLL sketches must merge map-side (partial aggregation) — that is
    the whole reason to prefer them over exact distinct at scale, which
    needs a full shuffle of the distinct keys."""
    plan = (query.cardinality(events, "user_id", by=("event_type",))
            ._jdf.queryExecution().executedPlan().toString())
    # two HashAggregates (partial + final) and no Expand/distinct shuffle
    assert plan.count("HashAggregate") >= 2
    assert "approx_count_distinct" in plan
