"""Spark 4 Python DataSource: a deterministic AIS wire-JSON stream source.

The reference generated its stream with a hand-rolled TCP server replaying
CSV rows at ≤100 msg/s (``server.py:43-100``) into a Kafka producer
(``client.py``). Spark 4's Python DataSource API makes that harness a
first-class, restartable, PARTITIONED streaming source instead of a
socket: offsets are plain row counters checkpointed by the engine (restart
resumes exactly where the last commit left off), each micro-batch's row
range splits into N input partitions read concurrently on executors, and
the payload is the same 17-field wire JSON envelope the Kafka topic
carried — so the whole preprocess chain runs against it unchanged.

Register + read:

    spark.dataSource.register(AisWireReplaySource)
    stream = (spark.readStream.format("ais_wire_replay")
              .option("rows", 100_000)
              .option("numPartitions", 8).load())

Scale note: generation cost is spread across ``numPartitions`` executor
tasks per batch; the driver holds only an integer offset. A real feed
would swap `_wire_row` for a socket/HTTP fetch per partition range — the
offset/partition/commit plumbing is the part this module demonstrates.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

# kept inside the reference bbox (lat 7–23, lon 105–123) so the pipeline's
# bbox filter keeps every generated row — tests can assert exact counts.
_MESSAGE_TYPES = (1, 2, 3, 18, 27)


def _wire_row(i: int) -> tuple[int, str]:
    """Deterministic wire envelope for global row index ``i``."""
    minute, second = divmod(i, 60)
    payload = {
        "timestamp_utc": f"2024-01-01 {10 + minute // 60:02d}:{minute % 60:02d}:{second:02d}Z",
        "mmsi": 200_000_000 + i % 50,
        "position": f"POINT({105.25 + (i % 17)} {7.5 + (i % 15)})",
        "navigation_status": float(i % 16),
        "speed_over_ground": round(float(i % 400) / 10.0, 1),
        "course_over_ground": float(i * 7 % 360),
        "message_type": _MESSAGE_TYPES[i % 5],
        "source_identifier": "pysource-replay",
        "true_heading": float(i % 360),
        "rate_of_turn": float(i % 20 - 10),
    }
    return i, json.dumps(payload, sort_keys=True)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _AisReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.total = int(options.get("rows", 1000))
        self.parts = int(options.get("numpartitions", 4))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        # everything up to the configured corpus size is available;
        # latestOffset must be an idempotent "what exists now" report (the
        # engine may call it several times per cycle — using it as
        # admission control yields engine-dependent batch sizes). The
        # engine checkpoints committed offsets, so a restarted query with
        # a LARGER corpus resumes exactly at the previous high-water mark
        # — see tests/test_pysource.py's restart test.
        return {"offset": self.total}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["offset"], end["offset"]
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        step = max(1, (hi - lo + self.parts - 1) // self.parts)
        return [
            _RangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _wire_row(i)

    def commit(self, end: dict) -> None:
        pass


class AisWireReplaySource(DataSource):
    """``format("ais_wire_replay")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "ais_wire_replay"

    def schema(self) -> str:
        return "offset bigint, value string"

    def streamReader(self, schema):
        return _AisReplayStreamReader(self.options)
