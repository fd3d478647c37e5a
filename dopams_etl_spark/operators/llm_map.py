"""``llm_map`` — batch LLM-extraction stage as a ``mapInPandas`` operator
(SURVEY §2.10, D5/D6).

The reference runs one LLM call per crime row from a thread pool
(``brief_facts_ai/main.py:586–840``, ``extractor_accused.py``,
``extractor_drugs.py:197–980``). Spark restatement: the non-deterministic
provider is isolated behind a callable so the *stage* is a plain
Arrow-batched ``mapInPandas`` — executors stream record batches through the
provider, and tests/oracles use a deterministic stub (SURVEY §7.4
"Non-deterministic stages").

Scale notes: batches arrive Arrow-encoded (no per-row Python overhead
beyond the provider itself); provider calls are per-partition-parallel, so
throughput scales with executors, and ``maxRecordsPerBatch`` bounds memory.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

# A provider maps one input batch to one output batch (same row order /
# count). It must be picklable — a top-level function or functools.partial.
Provider = Callable[[pd.DataFrame], pd.DataFrame]


def llm_map(
    df: DataFrame,
    input_cols: list[str],
    output_schema: str,
    provider: Provider,
    passthrough_cols: list[str] | None = None,
) -> DataFrame:
    """Apply ``provider`` to Arrow batches of ``input_cols``.

    ``output_schema`` is a DDL string for the FULL output (passthrough +
    provider columns), e.g. ``"doc_id long, extracted string"``.
    ``passthrough_cols`` are carried through unchanged (default: first
    input col, assumed to be the row key).
    """
    keep = passthrough_cols if passthrough_cols is not None else [input_cols[0]]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = provider(batch[input_cols])
            for c in keep:
                out[c] = batch[c].values
            yield out

    return df.select(*dict.fromkeys([*keep, *input_cols])).mapInPandas(run, output_schema)


def regex_extract_stub(pattern: str, text_col: str, out_col: str = "extracted") -> Provider:
    """Deterministic stand-in for an LLM extractor: per row, the sorted
    distinct regex matches over the lowercased text, comma-joined. Used by
    tests and the DuckDB oracle (same regex runs on both engines)."""
    rx = re.compile(pattern)

    def provider(batch: pd.DataFrame) -> pd.DataFrame:
        # NULL text extracts '' — the no-matches shape, so downstream
        # consumers never see an extraction-side NULL (oracle: COALESCE)
        vals = [
            ",".join(sorted(set(rx.findall(str(v).lower())))) if v is not None else ""
            for v in batch[text_col]
        ]
        return pd.DataFrame({out_col: vals})

    return provider
