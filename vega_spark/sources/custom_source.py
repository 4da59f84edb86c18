"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`).

The reference's source abstraction is `read_source(config, decoder)`:
a `ReaderConfiguration` plans partitions and a per-item decode fn maps
raw records to rows (reference `src/context.rs:445-455`,
`src/io/mod.rs:11-16`, partition planning
`src/io/local_file_reader.rs:221-295`). Spark 4's Python DataSource
API is the 1:1 idiomatic mapping: `partitions()` plans the splits,
`read(partition)` yields decoded rows on the executor.

Two sources:

- ``SyntheticEventsDataSource`` ("vega_synth"): deterministic
  arithmetic event generator — N rows split over P partitions, each
  row derived purely from its global index, so any external engine
  can replay the content exactly (the registry oracle does).
- ``decoder`` hook: like the reference, the source accepts a named
  decode variant so the same reader config yields different row
  shapes.

Scale notes: `partitions()` runs on the driver and must stay
metadata-only (here: P range descriptors); all row materialization
happens in `read()` on executors. Arrow-batches the rows back
(`spark.sql.execution.pythonUDF.arrow` applies); throughput is that
of a Python source — use it for connectors, not for bulk columnar
data that parquet/ORC readers handle natively.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("rows", 1000))
        self.p = int(options.get("partitions", 4))
        self.decoder = options.get("decoder", "full")

    def partitions(self):
        step = (self.n + self.p - 1) // self.p
        return [_RangePartition(i, min(i + step, self.n))
                for i in range(0, self.n, step)]

    def read(self, partition: _RangePartition):
        # deterministic decode: every field is pure arithmetic on the
        # global row index (engine-replayable, seed-free)
        for i in range(partition.start, partition.end):
            uid = (i * 2_654_435_761) % 97
            etype = ("view", "click", "purchase")[i % 3]
            value = round((i % 1000) * 0.25, 2)
            if self.decoder == "full":
                yield (i, uid, etype, value)
            else:  # "kv" decoder: (key, value) pair shape
                yield (uid, value)


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("vega_synth").option("rows", N)..."""

    @classmethod
    def name(cls) -> str:
        return "vega_synth"

    def schema(self) -> str:
        if self.options.get("decoder", "full") == "kv":
            return "user_id long, value double"
        return "event_id long, user_id long, event_type string, value double"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    """Idempotent registration of all custom sources."""
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(JsonlSinkDataSource)


# --- custom SINK: Python DataSource writer (two-phase commit) ----------------

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str):
        self.tmp_path = tmp_path


class JsonlWriter(DataSourceWriter):
    """Executor-side writer with the standard two-phase commit: each
    task writes a ``.tmp-`` file and reports it; the driver-side
    ``commit`` renames every reported file to its final name in one
    pass (so readers never observe a partial job), and ``abort``
    deletes the temporaries. The same protocol Spark's file sinks
    use, expressed through the Python DataSource API — the idiomatic
    mapping of the reference's save/sink surface
    (src/rdd/rdd.rs:254-272 save_as_text_file)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("vega_jsonl writer requires option 'path'")

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.jsonl")
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
        return _JsonlCommit(tmp)

    def commit(self, messages):
        import os

        for m in messages:
            final = os.path.join(
                os.path.dirname(m.tmp_path),
                os.path.basename(m.tmp_path)[len(".tmp-"):])
            os.rename(m.tmp_path, final)

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(m.tmp_path)
            except OSError:
                pass


class JsonlSinkDataSource(DataSource):
    """df.write.format("vega_jsonl").option("path", dir).save()"""

    @classmethod
    def name(cls) -> str:
        return "vega_jsonl"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return JsonlWriter(self.options)
