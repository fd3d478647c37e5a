"""tools/check.py must be at least as strict as the driver's hash gate
(VERDICT r6 item 3): a Spark DECIMAL column vs the oracle's float64
bridge previously slid through the float branch within 1e-9 and passed
locally while the driver failed — local PASS must predict driver PASS.
"""

from __future__ import annotations

import decimal

import pandas as pd

from tools.check import cells_equal, compare


class _FakeSparkDF:
    def __init__(self, pdf: pd.DataFrame):
        self._pdf = pdf

    def toPandas(self) -> pd.DataFrame:
        return self._pdf


def test_decimal_vs_float_column_fails():
    """The exact round-6 failure shape: values equal within 1e-9, dtypes
    diverge (Decimal objects vs float64) — the driver hashes these
    differently, so the local checker must FAIL them."""
    got = _FakeSparkDF(
        pd.DataFrame({"k": [1, 2], "total": [decimal.Decimal("1524135.00"),
                                             decimal.Decimal("7.10")]})
    )
    want = pd.DataFrame({"k": [1, 2], "total": [1524135.0, 7.1]})
    verdict = compare("t", got, want)
    assert verdict.startswith("FAIL dtype"), verdict


def test_stringified_decimal_passes():
    """The convention's fix — identical strings on both sides — passes."""
    got = _FakeSparkDF(pd.DataFrame({"k": [1], "total": ["1524135.00"]}))
    want = pd.DataFrame({"k": [1], "total": ["1524135.00"]})
    assert compare("t", got, want).startswith("PASS")


def test_int_vs_float_column_fails():
    """The round-7 ``kaplan_meier_retention`` failure shape: Spark int64
    against DuckDB HUGEINT→float64 — reprs ``3`` vs ``3.0`` mismatch the
    driver hash on every row even though the float branch calls them
    equal. The hardened checker must FAIL the dtype divergence."""
    got = _FakeSparkDF(pd.DataFrame({"k": [1, 2], "n_at_risk": [3, 9549]}))
    want = pd.DataFrame({"k": [1, 2], "n_at_risk": [3.0, 9549.0]})
    verdict = compare("t", got, want)
    assert verdict.startswith("FAIL dtype"), verdict


def test_matching_int_columns_pass():
    got = _FakeSparkDF(pd.DataFrame({"k": [1], "n": [3]}))
    want = pd.DataFrame({"k": [1], "n": [3]})
    assert compare("t", got, want).startswith("PASS")


def test_float_tolerance_unchanged():
    """Genuine double columns still compare within 1e-9 (both engines
    round on both sides; tiny representation noise is not a defect)."""
    assert cells_equal(0.3333333333, 0.33333333330000004)
    assert not cells_equal(0.3333, 0.3343)
