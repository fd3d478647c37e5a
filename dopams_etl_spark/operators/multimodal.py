"""Multimodal (binary) column operators — decode / feature-extract plumbing
(north-star "multimodal columns"; reference analog: the media/file sink
S12, ``etl_files_media_server/main.py:137–400``).

Media payloads are opaque ``binary`` columns plus typed metadata. The
Spark-side plumbing (schema, Arrow batching, partitioning) is real; the
actual byte decoding is behind a ``Decoder`` callable because image/audio
libraries are not in this container — ``stub_decoder`` is the
deterministic fake, and a real deployment passes e.g. a PIL/ffmpeg-backed
decoder with the same signature.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# bytes -> dict of metadata fields
Decoder = Callable[[bytes], dict]


def attach_media_meta(df: DataFrame, binary_col: str, kind: str = "image") -> DataFrame:
    """Typed metadata columns for an opaque media column — pure JVM
    expressions (no decode): byte size, content hash, media kind."""
    b = F.col(binary_col)
    return (
        df.withColumn("media_kind", F.lit(kind))
        .withColumn("media_bytes", F.octet_length(b).cast("long"))
        .withColumn("media_sha", F.sha2(b, 256))
    )


def unsupported_decoder(_: bytes) -> dict:
    """Placeholder for a real image/audio decoder (not in this container)."""
    raise NotImplementedError(
        "real media decoding needs an image/audio library; pass a custom "
        "Decoder or use stub_decoder for deterministic tests"
    )


def stub_decoder(payload: bytes) -> dict:
    """Deterministic fake decode: derives 'dimensions' from the payload
    bytes so tests and oracles can replicate it."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": n % 640,
        "height": n % 480,
        "checksum": hashlib.sha256(payload).hexdigest()[:16],
    }


DECODE_META_SCHEMA = "n_bytes long, width int, height int, checksum string"


def decode_media(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    decoder: Decoder = unsupported_decoder,
    meta_schema: str = DECODE_META_SCHEMA,
) -> DataFrame:
    """Decode/feature-extract stage over ``mapInPandas`` — Arrow-batched,
    partition-parallel; one decoder call per row, never per-element Python
    in the JVM expression path."""
    schema = f"{id_col} long, {meta_schema}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            metas = [decoder(bytes(v)) for v in batch[binary_col]]
            out = pd.DataFrame(metas)
            out[id_col] = batch[id_col].values
            yield out[[id_col] + [c.split()[0] for c in meta_schema.split(", ")]]

    return df.select(id_col, binary_col).mapInPandas(run, schema)
