"""Spark 4 Python DataSource wrapping the pure-Python Avro codec —
``spark.read.format("avro_py").load(dir)`` / ``df.write.format("avro_py")``.

The reference ships custom Hadoop InputFormats for its Avro IO
(JobExtractFeature.java:96-118 reads the -a 1 stage's container files);
this is the engine-native Spark 4 equivalent: the SAME spec-level codec
(sources/avro_python.py — object-container parsing, null/deflate/snappy)
mounted behind the DataSource V2 Python API, so Avro becomes an ordinary
format string with planner-visible schema instead of a helper-function
call.

Execution model:
- ``schema()`` sniffs ONE container header (driver) and maps the writer
  schema to Spark types (``spark_schema_for``).
- Read: one :class:`InputPartition` per ``*.avro`` file — decode runs in
  the executors, files never funnel through the driver; at 100 TB the
  parallelism is the file count, same as the binaryFile path.
- Write: each task encodes its partition into one container file under
  the output dir (``part-<taskid>-<uuid>.avro``), committing the
  standard way (write then driver-side commit listing); ``codec`` option
  selects null/deflate/snappy.

POSIX paths only (executor-side ``open()``) — the schemed-URI seam stays
with io.write_avro's Hadoop-FS route.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class _FilePartition(InputPartition):
    path: str


@dataclass
class _WriteDone(WriterCommitMessage):
    path: str
    rows: int


def _avro_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".avro") and not f.startswith((".", "_"))
    )


class AvroPyReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._path = options["path"]

    def partitions(self):
        return [_FilePartition(p) for p in _avro_files(self._path)]

    def read(self, partition: _FilePartition):
        from .avro_python import read_container

        with open(partition.path, "rb") as fh:
            _, records = read_container(fh.read())
        names = [f.name for f in self._schema.fields]
        for rec in records:
            yield tuple(rec.get(n) for n in names)


class AvroPyWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._path = options["path"]
        self._codec = options.get("codec", "deflate")

    def write(self, iterator):
        import uuid

        from pyspark import TaskContext

        from .avro_python import avro_schema_for, write_container_stream

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        os.makedirs(self._path, exist_ok=True)
        out = os.path.join(
            self._path, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.avro"
        )
        names = [f.name for f in self._schema.fields]
        schema_json = avro_schema_for(self._schema)
        n = 0

        def recs():
            nonlocal n
            for row in iterator:
                n += 1
                yield dict(zip(names, row))

        with open(out, "wb") as fh:
            write_container_stream(schema_json, recs(), fh, codec=self._codec)
        return _WriteDone(out, n)


class AvroPyDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self):
        from .avro_python import read_container, spark_schema_for

        files = _avro_files(self.options["path"])
        if not files:
            raise FileNotFoundError(f"no .avro files under {self.options['path']}")
        with open(files[0], "rb") as fh:
            schema_json, _ = read_container(fh.read())
        return spark_schema_for(schema_json)

    def reader(self, schema: StructType):
        return AvroPyReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool):
        if overwrite:
            for f in _avro_files(self.options["path"]):
                os.remove(f)
        return AvroPyWriter(schema, self.options)


def register(spark) -> None:
    """Register the format for this session:
    ``spark.dataSource.register(AvroPyDataSource)``."""
    spark.dataSource.register(AvroPyDataSource)
