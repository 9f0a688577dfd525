"""Hypothesis property tests for the operators built in r9: random
frames checked against pure-Python models. Random source/traffic/text
distributions exercise the mixing quota arithmetic, the heavy-hitter
thresholds and the hopping-window coverage far harder than the fixture
corpus does."""

from __future__ import annotations

import datetime
import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- mixture plan/sample: random (doc_id, source) corpora ------------

corpus = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),
        st.sampled_from(["sA", "sB", "sC", "sD"]),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


def _token_hash_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@_SETTINGS
@given(corpus)
def test_mixture_plan_and_sample_match_model_on_random_corpora(spark, rows):
    from cdc_cascade_spark.llm.mixing import (
        MIX_BUDGET,
        _mixture_plan_frame,
        _SALT,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "doc_id long, source string")
    counts: dict[str, int] = {}
    for _d, s in rows:
        counts[s] = counts.get(s, 0) + 1
    quota = MIX_BUDGET // len(counts)
    want = {
        s: (n, quota, min(1_000_000, quota * 1_000_000 // n))
        for s, n in counts.items()
    }
    plan = _mixture_plan_frame(df.select("source"))
    got = {r.source: (r.n_docs, r.quota, r.rate_ppm) for r in plan.collect()}
    assert got == want
    # the registered sample's admission rule, replayed on the random
    # corpus through the same plan join
    admitted = (
        df.join(F.broadcast(plan.select("source", "rate_ppm")), "source")
        .withColumn(
            "ppm",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(_SALT),
                                F.col("source"),
                                F.lit(":"),
                                F.col("doc_id").cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint")
            )
            % 1_000_000,
        )
        .filter(F.col("ppm") < F.col("rate_ppm"))
    )
    got_ids = {r.doc_id for r in admitted.collect()}
    want_ids = {
        d
        for d, s in rows
        if _token_hash_py(f"{_SALT}{s}:{d}") % 1_000_000 < want[s][2]
    }
    assert got_ids == want_ids


# --- hot_keys_frame: random traffic, threshold + ppm share model -----

traffic = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # day index
        st.sampled_from(["u1", "u2", "u3"]),
    ),
    min_size=1,
    max_size=60,
)


@_SETTINGS
@given(traffic, st.integers(min_value=1, max_value=6))
def test_hot_keys_frame_matches_model_on_random_traffic(spark, rows, min_count):
    from cdc_cascade_spark.operators.heavyhitters import hot_keys_frame

    base = datetime.datetime(2024, 3, 1)
    data = [
        (base + datetime.timedelta(days=day, minutes=i % 90), key)
        for i, (day, key) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "ts timestamp, key string")
    got = {
        (r.window_start.date(), r.key): (r.n_events, r.share_ppm)
        for r in hot_keys_frame(
            df, ts_col="ts", key_col="key", min_count=min_count
        ).collect()
    }
    counts: dict[tuple, int] = {}
    totals: dict = {}
    for day, key in rows:
        d = (base + datetime.timedelta(days=day)).date()
        counts[(d, key)] = counts.get((d, key), 0) + 1
        totals[d] = totals.get(d, 0) + 1
    want = {
        (d, k): (n, n * 1_000_000 // totals[d])
        for (d, k), n in counts.items()
        if n >= min_count
    }
    assert got == want
    # global-window form: same counts with the day dimension collapsed
    gotg = {
        r.key: r.n_events
        for r in hot_keys_frame(
            df, ts_col=None, key_col="key", min_count=min_count
        ).collect()
    }
    gcounts: dict[str, int] = {}
    for _day, key in rows:
        gcounts[key] = gcounts.get(key, 0) + 1
    assert gotg == {k: n for k, n in gcounts.items() if n >= min_count}


# --- hopping windows: every event lands in exactly two windows -------

events = st.lists(
    st.integers(min_value=0, max_value=10_000),  # minutes offset
    min_size=1,
    max_size=50,
)


@_SETTINGS
@given(events)
def test_hopping_coverage_on_random_event_times(spark, offsets):
    from pyspark.sql import functions as F

    from cdc_cascade_spark.operators.hopping import q33_hopping_windows

    # replicate the operator body over a synthetic frame via the same
    # expression (the registered query is table-bound; the property is
    # about the window arithmetic)
    base = datetime.datetime(2024, 5, 1)
    data = [
        (base + datetime.timedelta(minutes=m), f"u{m % 5}") for m in offsets
    ]
    df = spark.createDataFrame(data, "ts timestamp, user_id string")
    h = F.date_trunc("hour", F.col("ts"))
    out = (
        df.select(
            F.explode(F.array(h - F.expr("INTERVAL 1 HOUR"), h)).alias("ws"),
            "user_id",
        )
        .groupBy("ws")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # exact double-count, and each window's count equals the events
    # whose hour-truncation falls in {ws, ws+1h}
    assert sum(r.n for r in out) == 2 * len(offsets)
    hours = [
        (base + datetime.timedelta(minutes=m)).replace(
            minute=0, second=0, microsecond=0
        )
        for m in offsets
    ]
    for r in out:
        want = sum(
            1
            for hh in hours
            if hh == r.ws or hh == r.ws + datetime.timedelta(hours=1)
        )
        assert r.n == want


def test_budget_filter_rejects_token_less_documents(spark):
    """Regression (r9 review): a raw \\s+ split of '' is [''] — size 1
    — so without the non-empty-token filter an empty-text survivor
    (reachable via the segment stage's full-rewrite case) would be
    admitted FIRST in its stratum at quality 1000. It must instead be
    rejected by the explicit zero-token guard, in both engines."""
    import duckdb

    from cdc_cascade_spark.llm.selection import budget_filter

    df = spark.createDataFrame(
        [(1, "en", ""), (2, "en", "   "), (3, "en", "real tokens here")],
        "doc_id long, lang string, text string",
    )
    got = {(r.doc_id, r.n_tokens, r.quality) for r in budget_filter(df).collect()}
    assert got == {(3, 3, 1000)}
    # the oracle's d-CTE arithmetic agrees on the same rows
    from cdc_cascade_spark.llm.selection import _NE_TOKS

    rows = duckdb.sql(
        "SELECT doc_id FROM (VALUES (1, ''), (2, '   '), "
        "(3, 'real tokens here')) v(doc_id, text) "
        f"WHERE len({_NE_TOKS}) > 0"
    ).fetchall()
    assert {r[0] for r in rows} == {3}
