"""Training-sequence packing: fill fixed token-budget sequences with whole
documents (next-fit), sharded for parallelism.

LLM pretraining wants sequences near the context length with minimal
padding; concatenating documents into budget-sized bins is the standard
packing step (the "sequence packing" in public T5/GPT data pipelines).
Packing is inherently sequential — bin state depends on every prior doc —
so it cannot be a window expression; the Spark shape is: derive the token
count JVM-side, shard deterministically by an md5 of the id (so results
are reproducible across runs AND engines, unlike partition-dependent
``spark_partition_id`` sharding), then run the O(n) next-fit fold
per-shard in one Arrow-batched ``applyInPandas`` pass. Each shard's work
is independent; at 100 TB you raise ``shards`` so each group stays
executor-sized, and the shard column doubles as the ``partitionBy`` of
the output write.

Next-fit (not first-fit-decreasing) is deliberate: it preserves document
order within a shard, is O(n) with O(1) state, and — because it never
revisits earlier bins — an independent engine can replay it exactly
(the DuckDB oracle walks the same fold with a recursive CTE). A doc
larger than the budget gets a bin of its own, oversize (truncation is
the chunker's job, ``doc_chunks``).

Reference analog: none (the reference ships no training-data packing);
closest is the deterministic output sharding in ``training_shard_pack``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int = 256,
    shards: int = 16,
) -> DataFrame:
    """Pack documents (ordered by ``id_col`` within each md5 shard) into
    next-fit bins of ``budget`` tokens. Returns one row per packed
    sequence: (shard, seq_num, n_docs, seq_tokens, doc_ids) where
    ``doc_ids`` is a JSON array string in pack order."""
    import pandas as pd
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    # Fail fast on non-integral ids: a silent cast-to-long would NULL out
    # string ids AFTER the md5 shard was computed from the original value,
    # corrupting pack order and the emitted doc_ids.
    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"pack_sequences requires an integral id column; {id_col!r} is "
            f"{id_type.simpleString()}"
        )

    skinny = df.select(
        (
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 2), 16, 10)
            .cast("int")
            % shards
        ).alias("shard"),
        F.col(id_col).cast("long").alias("doc_id"),
        # NULL-safe (r14 nullhalf census): a doc with no token count
        # (NULL text upstream) packs as zero tokens — int(NaN) otherwise
        # aborts the Arrow fold; the oracle's fold carries the same
        # COALESCE so bin boundaries still replay exactly
        F.coalesce(F.col(token_count_col).cast("long"), F.lit(0)).alias("tok"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        out: list[tuple[int, int, int, int, str]] = []
        shard = int(pdf["shard"].iloc[0])
        bin_id, fill, ids = 0, 0, []

        def close() -> None:
            if ids:
                out.append(
                    (shard, bin_id, len(ids), fill, "[" + ",".join(map(str, ids)) + "]")
                )

        for doc_id, tok in zip(pdf["doc_id"], pdf["tok"]):
            if bin_id == 0 or fill + tok > budget:
                close()
                bin_id, fill, ids = bin_id + 1, 0, []
            fill += int(tok)
            ids.append(int(doc_id))
        close()
        return pd.DataFrame(
            out, columns=["shard", "seq_num", "n_docs", "seq_tokens", "doc_ids"]
        )

    return skinny.groupBy("shard").applyInPandas(
        _pack, "shard int, seq_num int, n_docs long, seq_tokens long, doc_ids string"
    )
