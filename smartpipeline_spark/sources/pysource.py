"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API).

The reference's extension point for new inputs is subclassing
``Source`` and pulling items on the driver
(/root/reference/smartpipeline/stage.py — pull-based ``pop()``); the
idiomatic Spark 4 equivalent is a registered Python data source:
partition-parallel executor-side reads, schema declared up front,
and (new in Spark 4.1) Python-side FILTER PUSHDOWN, so a WHERE
clause prunes work inside the generator instead of post-filtering.

``SynthDocsDataSource`` ("synthdocs") is the dbgen-style deterministic
corpus generator built on that API: every (partition, row) pair derives
its document from a hash, so the corpus is reproducible at any
parallelism, any size, with NO driver-side data and no shuffle — the
way you synthesize a 100 TB test corpus on a 1000-executor cluster
(each executor generates its shard; nothing is ever collected).

Usage::

    spark.dataSource.register(SynthDocsDataSource)
    df = (spark.read.format("synthdocs")
          .option("numPartitions", 32)
          .option("rowsPerPartition", 10_000)
          .load())
    df.filter(df.lang == "en")   # pushed into the generator
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

LANGS = ("en", "de", "fr", "es", "zh")
_WORDS = (
    "data spark table row batch key value scan merge sort window "
    "agg join filter fast slow part line hash the a"
).split()

SCHEMA_DDL = "doc_id bigint, lang string, text string, n_chars bigint"


class _Shard(InputPartition):
    def __init__(self, idx: int, rows: int, lang: str | None):
        self.idx = idx
        self.rows = rows
        self.lang = lang


def _h(*parts: int | str) -> int:
    raw = ":".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(raw).digest()[:8], "big")


def _doc(pid: int, row: int) -> tuple[int, str, str, int]:
    doc_id = pid * 1_000_000 + row
    lang = LANGS[_h(doc_id, "lang") % len(LANGS)]
    n_words = 20 + _h(doc_id, "len") % 40
    words = [_WORDS[_h(doc_id, i) % len(_WORDS)] for i in range(n_words)]
    text = " ".join(words)
    return doc_id, lang, text, len(text)


class SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_parts = int(options.get("numPartitions", "8"))
        self.rows_per = int(options.get("rowsPerPartition", "1000"))
        self.lang: str | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept ``lang = '<x>'`` equality; everything else is
        returned as unsupported and Spark re-applies it on top —
        exactly the JVM DSv2 pushdown contract, now crossing into
        Python."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("lang",) and self.lang is None:
                self.lang = f.value
            else:
                yield f

    def partitions(self):
        return [_Shard(i, self.rows_per, self.lang) for i in range(self.n_parts)]

    def read(self, partition: _Shard):
        for row in range(partition.rows):
            doc = _doc(partition.idx, row)
            if partition.lang is not None and doc[1] != partition.lang:
                continue
            yield doc


class SynthDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> SynthDocsReader:
        return SynthDocsReader(self.options)


# ---------------------------------------------------------------- stream

class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked synthetic event stream: each micro-batch emits
    ``rowsPerBatch`` deterministic events and advances the offset, so
    restarts replay exactly (the checkpoint stores ``{"i": n}``).
    The 'simple' reader variant pulls on the driver — right for
    control-plane-sized feeds (the reference's pull ``Source``
    contract); for executor-parallel streams implement
    ``DataSourceStreamReader.partitions()`` instead."""

    def __init__(self, options):
        self.rows = int(options.get("rowsPerBatch", "100"))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = lo + self.rows
        return iter(self._gen(lo, hi)), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._gen(start["i"], end["i"]))

    def _gen(self, lo: int, hi: int):
        # a LIST, not a generator: Spark's prefetch cache copies the
        # returned iterator (generators don't pickle)
        return [
            (i, _h(i, "u") % 50, float(_h(i, "v") % 1000) / 10.0)
            for i in range(lo, hi)
        ]


class SynthEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthevents"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, value double"

    def simpleStreamReader(self, schema: StructType) -> SynthEventsStreamReader:
        return SynthEventsStreamReader(self.options)


# ----------------------------------------------------------------- sink

class JsonlShardWriter(DataSourceWriter):
    """Partition-parallel custom sink with the DSv2 commit protocol:
    every task writes its shard to a temp name and returns a commit
    message; ``commit()`` publishes shards only after ALL tasks
    succeed, ``abort()`` cleans up — the exactly-once handshake a
    custom external sink (the reference's Elasticsearch ``Indexer``)
    needs, without foreachPartition's at-least-once semantics.

    A task dying MID-WRITE never returns a commit message, so its
    temp shard is invisible to ``abort()`` and survives on disk
    (harmless — readers skip dot-files). The standing maintenance
    job for that litter is
    :func:`smartpipeline_spark.operators.scale.reap_temp_litter`."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator) -> "WriterCommitMessage":
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"._tmp-{uuid.uuid4().hex}-{pid}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return JsonlCommit(tmp=tmp, part=pid, rows=n)

    def commit(self, messages) -> None:
        import os

        for m in messages:
            final = os.path.join(self.path, f"part-{m.part:05d}.jsonl")
            os.replace(m.tmp, final)

    def abort(self, messages) -> None:
        import os

        # PySpark passes None for each FAILED task's slot — only the
        # tasks that succeeded before the job aborted have real commit
        # messages (the streaming twin below guards identically; a
        # missing guard here abandoned cleanup of the successful tasks'
        # temp shards on a mixed success/failure abort)
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.tmp)
            except OSError:
                pass


@dataclass
class JsonlCommit(WriterCommitMessage):
    tmp: str
    part: int
    rows: int


class JsonlStreamShardWriter(DataSourceStreamWriter):
    """Streaming twin of :class:`JsonlShardWriter`: one committed file
    per (micro-batch, partition). The commit message carries the temp
    name; ``commit(messages, batchId)`` publishes them under the batch
    id, so a failed batch leaves only temp litter that ``abort``
    removes — idempotent re-runs of a batch replace the same final
    names (exactly-once on top of Spark's offset log)."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator) -> "WriterCommitMessage":
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"._tmp-{uuid.uuid4().hex}-{pid}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return JsonlCommit(tmp=tmp, part=pid, rows=n)

    def commit(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is None:
                continue
            final = os.path.join(self.path, f"batch-{batchId:05d}-part-{m.part:05d}.jsonl")
            os.replace(m.tmp, final)

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.tmp)
            except OSError:
                pass


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def schema(self) -> str:  # writer-only source; schema comes from the df
        return "placeholder string"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlShardWriter:
        return JsonlShardWriter(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool) -> JsonlStreamShardWriter:
        return JsonlStreamShardWriter(self.options)
