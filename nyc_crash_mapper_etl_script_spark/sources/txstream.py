"""TxTable STREAMING SOURCE: ``readStream`` over the commit log.

The reference's nightly is a chain of stages each consuming the
previous stage's committed state (main.py:1132-1200: ingest ->
enrichment -> tallies -> blame, each a separate server-side batch job
over the table the prior stage just mutated).  The Spark-native form
of "a downstream pipeline consumes a table's committed changes" is a
streaming source whose OFFSETS are the table format's commit
versions -- Delta's ``readStream`` / Change Data Feed.  This module
implements that for :class:`~.txtable.TxTable` with Spark 4's Python
Data Source API (``pyspark.sql.datasource``): ``plans/continuous.py``
can now chain table-to-table instead of sharing one driver loop.

Offset/batch contract
---------------------
An offset is ``{"version": n}``.  ``latestOffset`` is the table's
current committed version (one pure log read, no Spark job); a
micro-batch (start, end] replays the log entries for versions
start+1..end as FILE-level changes: each file an entry ADDED yields
its rows tagged ``_change_type='insert'`` / each file REMOVED yields
its rows tagged ``'delete'``, both carrying ``_commit_version``.
Planning is pure log arithmetic -- cost is O(changed files in the
range), never O(table) -- and each file is one input partition, so a
large commit scans in parallel while untouched partitions are never
read.  The log is append-only and versions are immutable, so a batch
replayed after a restart (Spark re-runs the last unCOMMITted batch
from its checkpointed offset) produces byte-identical rows --
exactly-once composes with any idempotent / batch-id-aware sink.

File-level vs row-level deltas
------------------------------
``TxTable.changes()`` (the BATCH CDC read) post-processes the same
two file sets with ``exceptAll`` so rows untouched by a partition
rewrite cancel exactly.  The stream deliberately skips that shuffle
and emits the raw signed feed: a rewritten-but-unchanged row appears
as one delete + one insert WITH EQUAL VALUES, which cancels exactly
in any signed consumer (``operators.mv.refresh_signed_mv`` treats
+1/-1 of identical rows as a no-op).  Consumers that need the
minimal row-level diff apply ``exceptAll`` per micro-batch; rollup
maintenance -- the dominant use -- gets exactness for free without
it.

Reading removed files requires ``retain_history=True`` on the
producing table (files retire to ``_archive/``, same requirement as
``changes()``); the reader resolves both locations.

Executors read the parquet files directly with pyarrow (Arrow
RecordBatches cross into Spark with zero row-wise Python), so this
source never nests a Spark job inside a stream planner.
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

from nyc_crash_mapper_etl_script_spark.sources.txtable import (
    _ARCHIVE_DIR,
    TxTable,
)

CHANGE_COL = "_change_type"
VERSION_COL = "_commit_version"

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


class _ChangeFilePartition(InputPartition):
    """One changed file of one commit: everything read() needs,
    driver-resolved and picklable."""

    def __init__(
        self,
        candidates: list[str],
        change: str,
        version: int,
        part_values: dict[str, str | None],
    ) -> None:
        self.candidates = candidates
        self.change = change
        self.version = version
        self.part_values = part_values


def _partition_values(rel: str) -> dict[str, str | None]:
    """Parse hive-style ``col=val`` components out of a relative file
    path (Spark URL-escapes special chars on write)."""
    from urllib.parse import unquote

    out: dict[str, str | None] = {}
    for comp in rel.split(os.sep)[:-1]:
        if "=" in comp:
            col, _, raw = comp.partition("=")
            out[col] = None if raw == _HIVE_NULL else unquote(raw)
    return out


def stream_schema(table: TxTable) -> StructType:
    """The source schema: the table's logged schema plus the change
    tag and commit version."""
    logged = table.logged_schema()
    if logged is None:
        raise ValueError(
            f"{table.root}: no logged schema -- write through TxTable first"
        )
    return StructType(
        list(logged.fields)
        + [
            StructField(CHANGE_COL, StringType(), False),
            StructField(VERSION_COL, LongType(), False),
        ]
    )


class TxTableStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.root = options["path"].rstrip("/")
        self.starting_version = int(options.get("startingversion", 0))
        #: bound on commits per micro-batch (the ReadLimit /
        #: maxFilesPerTrigger analog -- the Python DataSource API has
        #: no ReadLimit hook, so the cap lives in latestOffset, which
        #: Spark calls BEFORE initialOffset at query start).  Pacing
        #: seeds at starting_version so a fresh query's FIRST batch is
        #: already bounded; every partitions() call then advances it
        #: to that batch's range, so a RESTARTED query (whose
        #: checkpointed start may be far past starting_version) jumps
        #: to the true position after at most one empty micro-batch.
        mv = options.get("maxversionsperbatch")
        self.max_versions = int(mv) if mv is not None else None
        self._paced_from: int | None = self.starting_version
        self.schema = schema

    def _table(self) -> TxTable:
        return TxTable(self.root)

    def _dbg(self, *a):
        import os as _os
        p = _os.environ.get("TXSTREAM_DEBUG_LOG")
        if p:
            with open(p, "a") as f:
                f.write(" ".join(map(str, a)) + f" pid={_os.getpid()}\n")

    def initialOffset(self) -> dict:
        self._paced_from = self.starting_version
        self._dbg("initialOffset", self.starting_version, "mv=", self.max_versions)
        return {"version": self.starting_version}

    def latestOffset(self) -> dict:
        current = self._table()._snapshot_version()
        if self.max_versions is None or self._paced_from is None:
            self._dbg("latestOffset uncapped", current, "mv=", self.max_versions, "paced=", self._paced_from)
            return {"version": current}
        end = min(current, self._paced_from + self.max_versions)
        end = max(end, self._paced_from)  # never step backwards
        self._dbg("latestOffset capped", end, "paced=", self._paced_from)
        return {"version": end}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        lo, hi = int(start["version"]), int(end["version"])
        # advance pacing to the true batch range: on restart, lo is
        # the checkpointed offset starting_version knows nothing about
        self._paced_from = max(self._paced_from or 0, lo, hi)
        t = self._table()
        parts: list[InputPartition] = []
        for e in t._entries():
            v = e["version"]
            if v <= lo or v > hi:
                continue
            for rels, change in ((e.get("add", []), "insert"), (e.get("remove", []), "delete")):
                for rel in rels:
                    parts.append(
                        _ChangeFilePartition(
                            [
                                os.path.join(self.root, rel),
                                os.path.join(self.root, _ARCHIVE_DIR, rel),
                            ],
                            change,
                            v,
                            _partition_values(rel),
                        )
                    )
        return parts

    def read(self, partition: _ChangeFilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        path = next(
            (p for p in partition.candidates if os.path.exists(p)), None
        )
        if path is None:
            raise FileNotFoundError(
                f"{partition.candidates[0]}: changed file unreadable -- was "
                "the table created with retain_history=True (and not vacuumed "
                "past this version)?"
            )
        raw = pq.read_table(path)
        n = raw.num_rows
        target = to_arrow_schema(self.schema)
        arrays = []
        for field in target:
            name = field.name
            if name == CHANGE_COL:
                arrays.append(pa.array([partition.change] * n, type=field.type))
            elif name == VERSION_COL:
                arrays.append(pa.array([partition.version] * n, type=field.type))
            elif name in raw.column_names:
                col = raw.column(name)
                if col.type != field.type:
                    col = col.cast(field.type)
                arrays.append(col)
            elif name in partition.part_values:
                v = partition.part_values[name]
                if v is None:
                    arrays.append(pa.nulls(n, type=field.type))
                else:
                    arrays.append(
                        pa.array([v] * n, type=pa.string()).cast(field.type)
                    )
            else:
                # evolved column absent from this (older) file
                arrays.append(pa.nulls(n, type=field.type))
        yield from pa.Table.from_arrays(arrays, schema=target).to_batches()

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass


class TxTableChangesDataSource(DataSource):
    """``spark.readStream.format("txtable-changes").option("path", root)``."""

    @classmethod
    def name(cls) -> str:
        return "txtable-changes"

    def schema(self) -> StructType:
        return stream_schema(TxTable(self.options["path"].rstrip("/")))

    def streamReader(self, schema: StructType) -> TxTableStreamReader:
        opts = {k.lower(): v for k, v in dict(self.options).items()}
        return TxTableStreamReader(schema, opts)


def read_txtable_stream(
    spark: SparkSession,
    root: str,
    starting_version: int = 0,
    max_versions_per_batch: int | None = None,
) -> DataFrame:
    """Register the source (idempotent) and open the change stream.
    ``starting_version=0`` replays from the init commit (the initial
    snapshot arrives as inserts -- Delta's startingVersion=0); a
    caller that already holds a snapshot as of version v passes
    ``starting_version=v`` to receive only subsequent changes.
    ``max_versions_per_batch`` bounds each micro-batch to that many
    commits (backlog catch-up in right-sized pieces; pair with a
    processing-time trigger -- availableNow snapshots the capped
    offset at start and would stop early)."""
    spark.dataSource.register(TxTableChangesDataSource)
    reader = (
        spark.readStream.format("txtable-changes")
        .option("path", root)
        .option("startingVersion", str(starting_version))
    )
    if max_versions_per_batch is not None:
        reader = reader.option("maxVersionsPerBatch", str(max_versions_per_batch))
    return reader.load()
