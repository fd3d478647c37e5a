"""NL→SQL guardrail layer (N1–N4, W5)."""

import pytest

from dopams_etl_spark.nlq import extract_limit, match_tables, plan_query, validate_sql
from dopams_etl_spark.nlq.validator import ThreatLevel, sanitize_error


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    from dopams_etl_spark.catalog import register_views

    register_views(spark, "/root/testdata/sf0.001")


def test_validator_allows_select_and_cte(spark):
    assert validate_sql("SELECT * FROM orders").is_safe
    assert validate_sql("WITH x AS (SELECT 1) SELECT * FROM x").is_safe


@pytest.mark.parametrize(
    "sql,level",
    [
        ("DROP TABLE orders", ThreatLevel.CRITICAL),
        ("DELETE FROM orders", ThreatLevel.CRITICAL),
        ("UPDATE orders SET o_totalprice = 0", ThreatLevel.HIGH),
        ("INSERT INTO orders VALUES (1)", ThreatLevel.HIGH),
        ("GRANT ALL ON orders TO x", ThreatLevel.HIGH),
        ("CREATE TABLE t AS SELECT 1", ThreatLevel.MEDIUM),
    ],
)
def test_validator_blocks_non_select(sql, level):
    r = validate_sql(sql)
    assert not r.is_safe and r.threat_level == level


def test_validator_blocks_injection_and_stacking():
    assert not validate_sql("SELECT * FROM orders WHERE x = '' OR '1'='1'").is_safe
    assert not validate_sql("SELECT 1; DROP TABLE orders").is_safe
    assert not validate_sql("SELECT * FROM orders -- hidden").is_safe


def test_validator_no_false_positive_on_column_names():
    # UPDATE as a substring of an identifier must not trip the gate
    assert validate_sql("SELECT last_updated FROM orders").is_safe


def test_limit_extraction_default_and_cap():
    assert extract_limit("show everything") == 100
    assert extract_limit("top 25 orders") == 25
    assert extract_limit("first 99999 rows") == 10_000


def test_table_matching_live_catalog(spark):
    assert match_tables(spark, "how many orders per customer?") == ["customer", "orders"]
    assert "documents" in match_tables(spark, "find duplicate documents")
    assert match_tables(spark, "total crimes this year") == ["orders"]  # alias


def test_plan_query_features(spark):
    p = plan_query(spark, "count orders per customer named 'Ravi', top 10")
    assert p.intent == "count_aggregate" and p.needs_aggregation
    assert p.needs_join and p.limit == 10 and "Ravi" in p.search_terms


def test_executor_caps_rows_and_rejects(spark):
    from dopams_etl_spark.nlq.executor import execute_guarded

    r = execute_guarded(spark, "SELECT * FROM orders", max_rows=10)
    assert r.ok and r.row_count == 10 and r.truncated

    r2 = execute_guarded(spark, "DROP TABLE orders")
    assert not r2.ok and "rejected" in r2.error

    r3 = execute_guarded(spark, "SELECT nope_col FROM orders")
    assert not r3.ok and "nope_col" not in r3.error  # sanitized


def test_sanitize_error_strips_paths_and_identifiers():
    msg = sanitize_error(Exception("Failure at /opt/spark/x.py: column `secret_col` missing"))
    assert "/opt" not in msg and "secret_col" not in msg
