"""Registry export-order contract.

The driver walks ``queries()`` in dict order under a ~50-query wall-clock
budget, so the order IS the coverage policy: families interleave round-robin
and queries without a green driver CORRECTNESS row sort before ones already
confirmed (see registry._export_order).
"""

from __future__ import annotations

import json
import re

from pulsar_pekko_streams_example_spark.plans.registry import (
    REGISTRY,
    _driver_checked,
    _export_order,
)


def _write(path, payload):
    path.write_text(json.dumps(payload))


def test_driver_checked_counts_only_green_rows(tmp_path):
    _write(
        tmp_path / "CORRECTNESS_r01.json",
        {
            "green": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
            "rows_only": {"rows_match": None, "schema_match": None, "hash_match": None, "err": "no_oracle"},
            "red_hash": {"rows_match": True, "schema_match": True, "hash_match": False, "err": None},
            "errored": {"rows_match": None, "schema_match": None, "hash_match": None, "err": "boom"},
            # rows-only check that the driver DID pass (no oracle by design):
            # hash_match absent entirely, err null
            "weak_green": {"rows_match": True, "schema_match": True, "err": None},
        },
    )
    checked = _driver_checked(tmp_path)
    assert checked == {"green", "weak_green"}


def test_driver_checked_unions_rounds_and_survives_garbage(tmp_path):
    _write(
        tmp_path / "CORRECTNESS_r01.json",
        {"a": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}},
    )
    _write(
        tmp_path / "CORRECTNESS_r02.json",
        {"b": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}},
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text("{not json")
    _write(tmp_path / "CORRECTNESS_r04.json", ["not", "a", "dict"])
    assert _driver_checked(tmp_path) == {"a", "b"}


def test_driver_checked_empty_when_no_files(tmp_path):
    assert _driver_checked(tmp_path) == frozenset()


def test_export_order_fronts_unchecked_queries():
    order = _export_order()
    assert set(order) == set(REGISTRY), "export order must cover the registry exactly"
    checked = _driver_checked()
    flags = [name in checked for name in order]
    # once the first checked query appears, every later query is checked too
    if True in flags:
        first_checked = flags.index(True)
        assert all(flags[first_checked:]), (
            "a never-driver-checked query sorts after a checked one: "
            + str([n for n in order[first_checked:] if n not in checked][:5])
        )


def test_export_order_interleaves_families_within_partition():
    """Inside the unchecked partition the round-robin interleave survives:
    no family contributes twice before every family with remaining queries
    contributed once (checked against module of each query)."""
    order = _export_order()
    checked = _driver_checked()
    front = [n for n in order if n not in checked]
    if len(front) < 3:
        return  # nothing meaningful to assert late in the build
    mods = [REGISTRY[n].build.__module__ for n in front[:3]]
    assert len(set(mods)) == len(mods), (
        "first unchecked queries should come from distinct families: " + str(mods)
    )


def test_unchecked_partition_orders_longest_waiting_first():
    """Queries added in a later round (tag added-rN) must not displace
    unchecked queries carried over from earlier rounds — the driver budget
    pays down coverage debt before trying anything new."""
    checked = _driver_checked()
    order = [n for n in _export_order() if n not in checked]

    def added(n):
        for t in REGISTRY[n].tags:
            if t.startswith("added-r"):
                body = t[7:]
                m = re.match(r"(\d+)(.*)", body)
                if m:
                    return (int(m.group(1)), m.group(2))
        return (0, "")

    rounds = [added(n) for n in order]
    assert rounds == sorted(rounds), "unchecked queries out of added-round order"
