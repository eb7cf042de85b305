"""python -m etl_stream_spark: list/oracle parse paths (run/check spawn
Spark sessions and are covered by the smoke-level subprocess checks the
CLI delegates to)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from etl_stream_spark.__main__ import main


def test_list_filters_by_substring():
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["list", "--grep", "privacy"]) == 0
    lines = buf.getvalue().strip().splitlines()
    assert any(line.startswith("privacy_k_anonymity") for line in lines)
    assert all("privacy" in line for line in lines)


def test_oracle_prints_sql():
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["oracle", "q1_pricing_summary"]) == 0
    assert "l_returnflag" in buf.getvalue()


def test_unknown_entry_fails():
    assert main(["oracle", "no_such_entry"]) == 1
