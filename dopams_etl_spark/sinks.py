"""Keyed-table sink: real ``MERGE INTO`` when Delta Lake is on the
classpath, atomic dedup-union-overwrite parquet otherwise.

The reference's sinks are change-detecting ``INSERT ... ON CONFLICT``
upserts (``etl-crimes/etl_crimes.py:654–789``). On Spark that maps 1:1 to
Delta ``MERGE`` — ``whenMatchedUpdateAll`` guarded by a newer-than
predicate (I4) + ``whenNotMatchedInsertAll`` — which at 100 TB is the
right sink: transactional, file-level data skipping on the merge keys, no
full-table rewrite. This container has no Delta, so the merge path is
feature-gated behind an import-try and exercised as the parquet fallback:
``upsert_latest_wins`` (same latest-wins semantics, verified against the
same oracle) + a staging-dir write with a filesystem-level swap so a
failed job never leaves a half-written table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from dopams_etl_spark.operators.merge import upsert_latest_wins


def delta_available() -> bool:
    """True when the delta-spark package is importable (the session must
    additionally be built with the Delta SQL extension to actually use it)."""
    try:
        import delta  # noqa: F401
        return True
    except ImportError:
        return False


class KeyedTableSink:
    """Upsert sink over a keyed table at ``path``.

    ``fmt``: ``"auto"`` (Delta when available, else parquet), ``"delta"``
    (raise if Delta is missing — never silently downgrade a caller that
    asked for transactional semantics), or ``"parquet"``.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: str | Sequence[str],
        version_col: str,
        fmt: str = "auto",
    ) -> None:
        if fmt not in ("auto", "delta", "parquet"):
            raise ValueError(f"unknown sink format {fmt!r}")
        if fmt == "delta" and not delta_available():
            raise RuntimeError(
                "fmt='delta' requested but delta-spark is not installed; "
                "install it and build the session with the Delta extension, "
                "or use fmt='auto' to fall back to the parquet merge"
            )
        self.spark = spark
        self.path = path.rstrip("/")
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.version_col = version_col
        self.fmt = "delta" if fmt == "auto" and delta_available() else (
            fmt if fmt != "auto" else "parquet"
        )

    # -- filesystem helpers (Hadoop FS API — works for local, HDFS, s3a) --

    def _fs_and_path(self, p: str):
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, hpath

    def exists(self) -> bool:
        fs, hpath = self._fs_and_path(self.path)
        return bool(fs.exists(hpath))

    def read(self) -> DataFrame:
        if self.fmt == "delta":
            return self.spark.read.format("delta").load(self.path)
        return self.spark.read.parquet(self.path)

    # -- upsert ----------------------------------------------------------

    def upsert(self, incoming: DataFrame) -> None:
        """Latest-wins upsert of ``incoming`` into the table (creates it on
        first write). Equal-version re-sends replace in place, matching the
        reference's in-chunk duplicate handling (``etl_crimes.py:853–871``).
        """
        if not self.exists():
            self._initial_write(incoming)
            return
        if self.fmt == "delta":
            self._delta_merge(incoming)
        else:
            self._parquet_merge(incoming)

    def _initial_write(self, df: DataFrame) -> None:
        # First batch may itself carry duplicate keys — collapse them the
        # same way a merge would.
        deduped = upsert_latest_wins(
            df.limit(0), df, self.keys, self.version_col
        )
        writer = deduped.write.mode("overwrite")
        if self.fmt == "delta":
            writer.format("delta").save(self.path)
        else:
            writer.parquet(self.path)

    def _delta_merge(self, incoming: DataFrame) -> None:
        """True MERGE INTO: update-when-newer-or-equal (I4 guard),
        insert-when-absent. Runs only with delta-spark on the classpath."""
        from delta.tables import DeltaTable

        target = DeltaTable.forPath(self.spark, self.path)
        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in self.keys)
        newer = f"s.{self.version_col} >= t.{self.version_col}"
        (
            target.alias("t")
            .merge(incoming.alias("s"), cond)
            .whenMatchedUpdateAll(condition=newer)
            .whenNotMatchedInsertAll()
            .execute()
        )

    def _parquet_merge(self, incoming: DataFrame) -> None:
        """Fallback: merge into a staging dir, then swap directories via
        the Hadoop FileSystem API. The staged result is fully written
        before the live path is touched, so readers never see a partial
        table; the swap itself is two renames (not atomic across them —
        Delta is the answer where that window matters)."""
        merged = upsert_latest_wins(self.read(), incoming, self.keys, self.version_col)
        staging = f"{self.path}__staging"
        retired = f"{self.path}__retired"
        merged.write.mode("overwrite").parquet(staging)
        fs, live = self._fs_and_path(self.path)
        _, stage_p = self._fs_and_path(staging)
        _, retired_p = self._fs_and_path(retired)
        if fs.exists(retired_p):
            fs.delete(retired_p, True)
        if not fs.rename(live, retired_p):
            raise OSError(f"could not retire {self.path}")
        if not fs.rename(stage_p, live):
            fs.rename(retired_p, live)  # roll back
            raise OSError(f"could not publish {staging}")
        fs.delete(retired_p, True)
