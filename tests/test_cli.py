"""CLI surface: list/oracle run in-process; check shares the package's
verify.compare with the test suite (tests/parity.py is a shim over it)."""

from __future__ import annotations

import pytest

from pulsar_pekko_streams_example_spark.__main__ import main


def test_list_runs_and_filters(capsys):
    assert main(["list", "--tag", "window"]) == 0
    out = capsys.readouterr().out
    assert "rolling_revenue_7d" in out
    assert "dedup_minhash_lsh" not in out


def test_oracle_prints_sql(capsys):
    assert main(["oracle", "q1_pricing_summary"]) == 0
    assert "SELECT" in capsys.readouterr().out.upper()


def test_oracle_rows_only_exits_nonzero():
    assert main(["oracle", "ann_cosine_topk_vectorized"]) == 1


def test_unknown_query_rejected():
    with pytest.raises(SystemExit):
        main(["run", "no_such_query"])
