"""Property-based checks (hypothesis): the temporal operators against
brute-force Python references on adversarial small inputs — tie timestamps,
singleton keys, empty sides, duplicate values — the corners the fixed test
data can't be trusted to contain."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pulsar_pekko_streams_example_spark.operators import temporal

BASE = dt.datetime(2024, 1, 1)

events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # user/key
        st.integers(min_value=0, max_value=40),     # seconds offset
        st.booleans(),                              # is_click (else error)
        st.integers(min_value=0, max_value=99),     # value
    ),
    min_size=1,
    max_size=14,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (i, k, BASE + dt.timedelta(seconds=s), bool(c), float(v))
            for i, (k, s, c, v) in enumerate(rows)
        ],
        "event_id long, user_id long, ts timestamp, is_click boolean, value double",
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events)
def test_asof_join_matches_bruteforce(spark, rows):
    df = _df(spark, rows)
    err = df.filter("not is_click").select("event_id", "user_id", "ts")
    clk = df.filter("is_click").select("user_id", "ts", "value")
    got = {
        r.event_id: r.asof_value
        for r in temporal.asof_join_last(err, clk, "user_id", "ts", ["value"]).collect()
    }

    clicks = [(k, s, v) for (k, s, c, v) in rows if c]
    for i, (k, s, c, v) in enumerate(rows):
        if c:
            continue
        eligible = [(cs, cv) for (ck, cs, cv) in clicks if ck == k and cs <= s]
        expected = float(max(eligible)[1]) if eligible else None
        # at tied timestamps any of the tied clicks is a valid as-of answer
        tied = {float(cv) for (cs, cv) in eligible if cs == max(eligible)[0]} if eligible else {None}
        assert got[i] in tied, (i, got[i], expected, rows)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events)
def test_sessionize_matches_bruteforce(spark, rows):
    gap = 10
    df = _df(spark, rows)
    out = temporal.sessionize(df, "user_id", "ts", gap_s=gap).collect()
    got = {}
    for r in out:
        got.setdefault(r.user_id, []).append((r.ts, r.event_id, r.session_id))

    per_key: dict = {}
    for i, (k, s, c, v) in enumerate(rows):
        per_key.setdefault(k, []).append((s, i))
    for k, items in per_key.items():
        items.sort()
        sess, last = 0, None
        expected = {}
        for s, i in items:
            if last is None or s - last > gap:
                sess += 1
            expected[i] = sess
            last = s
        actual = {eid: sid for (_, eid, sid) in got[k]}
        assert actual == expected, (k, actual, expected, rows)
