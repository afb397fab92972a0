"""Custom Structured Streaming source tailing the CDC log (SURVEY §2.A1).

A Python DataSource (PySpark 4.x `pyspark.sql.datasource`) that tails the
ordered segment directory written by ``gen.write_log`` (the binlog/WAL
analogue). Offsets are replayable segment indexes:

- ``initialOffset`` = {"segment": 0}
- ``latestOffset``  = number of segments currently on disk
- ``partitions(start, end)`` = one InputPartition per segment in range — so a
  microbatch over k new segments reads with k-way parallelism;
- ``read(partition)`` yields **Arrow record batches** (vectorized end-to-end:
  parquet → Arrow → JVM, never per-row Python);
- ``commit(offset)`` is a no-op: the engine's exactly-once lives in the lake
  snapshot chain + ledger, not in source-side state.

Replay from any checkpoint works because offsets are pure positions in an
immutable log (same property Kafka offsets have).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
from pyspark.sql.types import StructType

from maestro_spark.schema import CHANGE_EVENT_SCHEMA

FORMAT_NAME = "cdc_binlog"


@dataclass
class SegmentPartition(InputPartition):
    path: str


def _segments(log_dir: str) -> list[str]:
    return sorted(
        f for f in os.listdir(log_dir) if f.startswith("segment-") and f.endswith(".parquet")
    )


class CdcLogStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self.log_dir = options.get("path") or options.get("log_dir")
        if not self.log_dir:
            raise ValueError("cdc_binlog requires option 'path' (the log directory)")
        self.max_segments_per_batch = int(options.get("maxsegmentsperbatch", 0)) or None
        self._cursor: int | None = None  # last batch end seen this run

    def initialOffset(self) -> dict:
        return {"segment": 0}

    def latestOffset(self) -> dict:
        """Admission control lives HERE, never in partitions(): Spark commits
        whatever range latestOffset announces, so truncating the partition
        list instead would silently skip the tail of the range (data loss).
        The clamp is relative to the last end seen via partitions(); the
        first trigger of a (re)started query is unclamped because the
        checkpointed start isn't known yet — one large catch-up batch, then
        bounded batches.
        """
        n = len(_segments(self.log_dir))
        if self.max_segments_per_batch and self._cursor is not None:
            n = min(n, self._cursor + self.max_segments_per_batch)
        return {"segment": n}

    def partitions(self, start: dict, end: dict):
        segs = _segments(self.log_dir)
        lo, hi = start["segment"], end["segment"]
        self._cursor = max(self._cursor or 0, hi)
        return [
            SegmentPartition(os.path.join(self.log_dir, s)) for s in segs[lo:hi]
        ] or [SegmentPartition("")]

    def read(self, partition: SegmentPartition):
        if not partition.path:
            return iter(())
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        from maestro_spark.schema import conform_arrow_table

        # conform each segment to the declared stream schema: pre-evolution
        # segments lack the newer columns (null-filled here), and the JVM
        # scan node requires batches that match the declared schema exactly
        table = conform_arrow_table(
            pq.read_table(partition.path), to_arrow_schema(self._schema)
        )
        return iter(table.to_batches(max_chunksize=65536))

    def commit(self, end: dict) -> None:
        pass  # exactly-once is owned by the lake snapshot chain / ledger


class CdcLogDataSource(DataSource):
    """spark.readStream.format("cdc_binlog").option("path", log_dir).load()"""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        sj = self.options.get("schema_json")
        if sj:
            import json

            return StructType.fromJson(json.loads(sj))
        return CHANGE_EVENT_SCHEMA

    def streamReader(self, schema: StructType) -> CdcLogStreamReader:
        return CdcLogStreamReader(schema, dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(CdcLogDataSource)
