"""Gold analytic pipelines + the oracle-checked query catalog."""
