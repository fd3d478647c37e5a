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

    # split on ',' + strip, not ', ': a caller writing 'w int,h int'
    # (no space) must not silently produce wrong column names for the
    # NULL-row dict and the output projection (r14 ADVICE)
    meta_cols = [c.strip().split()[0] for c in meta_schema.split(",")]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            # NULL payload -> NULL metadata row (r14 nullhalf census):
            # bytes(None) otherwise aborts the whole Arrow batch; the
            # oracle's strlen(NULL) keeps the row with NULL fields
            metas = [
                dict.fromkeys(meta_cols) if v is None else decoder(bytes(v))
                for v in batch[binary_col]
            ]
            out = pd.DataFrame(metas)
            out[id_col] = batch[id_col].values
            yield out[[id_col] + meta_cols]

    return df.select(id_col, binary_col).mapInPandas(run, schema)


# bytes -> resized bytes
Resizer = Callable[[bytes, int, int], bytes]


def stub_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: the 'resized image' is the first
    ``min(len, width*height // 8)`` bytes of the payload — replicable by an
    oracle via substring, while exercising the real binary-out plumbing."""
    return payload[: min(len(payload), (width * height) // 8)]


def resize_media(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    width: int,
    height: int,
    resizer: Resizer = stub_resizer,
) -> DataFrame:
    """Resize stage over ``mapInPandas``: binary in → binary out plus size
    metadata, Arrow-batched. A real deployment passes a PIL/opencv-backed
    ``Resizer`` with the same signature."""
    schema = f"{id_col} long, resized binary, out_w int, out_h int, n_bytes long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            # NULL payload -> NULL bytes/size, target dims kept (r14
            # nullhalf census) — mirrors the oracle's NULL strlen/md5
            # beside its literal out_w/out_h
            resized = [
                None if v is None else resizer(bytes(v), width, height)
                for v in batch[binary_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: batch[id_col].values,
                    "resized": resized,
                    "out_w": width,
                    "out_h": height,
                    # 0 (not NULL) so the int column never NaN-floats
                    # through the pandas bridge; the NULL resized/md5
                    # still marks the missing payload
                    "n_bytes": [0 if r is None else len(r) for r in resized],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, schema)


def stub_frame_count(payload: bytes) -> int:
    """Deterministic fake 'video length' in frames (1–7)."""
    return len(payload) % 7 + 1


def sample_frames(
    df: DataFrame, id_col: str, binary_col: str, every_n: int = 2
) -> DataFrame:
    """Frame-sampling stage (video analog): one input row fans out to one
    row per sampled frame — the one-to-many ``mapInPandas`` shape a real
    ffmpeg-backed sampler needs. Frame k's payload is the k-th equal chunk
    of the binary (deterministic stub; oracle-replicable via substring)."""
    import hashlib as _hl

    schema = f"{id_col} long, frame_idx int, frame_bytes long, frame_md5 string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, idxs, sizes, sums = [], [], [], []
            for rid, v in zip(batch[id_col].values, batch[binary_col]):
                if v is None:
                    # NULL payload has no frames (r14 nullhalf census) —
                    # the oracle's range(0, NULL) unnests to zero rows
                    continue
                payload = bytes(v)
                n_frames = stub_frame_count(payload)
                chunk = len(payload) // n_frames
                for k in range(0, n_frames, every_n):
                    frame = payload[k * chunk : (k + 1) * chunk]
                    ids.append(rid)
                    idxs.append(k)
                    sizes.append(len(frame))
                    sums.append(_hl.md5(frame).hexdigest())
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_bytes": sizes, "frame_md5": sums}
            )

    return df.select(id_col, binary_col).mapInPandas(run, schema)
