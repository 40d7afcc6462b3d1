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
range), never O(table) -- and changed files map to input partitions
with Spark's file-scan size packing (small files bin-pack to
~maxBytesPerPartition per task, large files parallelize), so a large
commit scans in parallel while untouched partitions are never read
and a many-small-files commit is not a task-per-file scheduler storm.  The log is append-only and versions are immutable, so a batch
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

Deletion vectors (``delete_where(dv=True)``) keep the feed exact
without any file churn: a dv commit emits exactly its positions as
``delete`` rows; removed/re-added files emit only their
then-visible rows (the dv'd positions were already emitted when the
dv committed); a restore that retires a dv while its file stays live
emits the resurfacing rows as ``insert``.  Signed consumers stay
exact through any mix of dv deletes, rewrites, and restores.

Executors read the parquet files directly with pyarrow (Arrow
RecordBatches cross into Spark with zero row-wise Python), so this
source never nests a Spark job inside a stream planner.
"""

from __future__ import annotations

import json
import os
import re
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
    _DV_DIR,
    _TXDV_FILE,
    _TXDV_POS,
    TxTable,
)

CHANGE_COL = "_change_type"
VERSION_COL = "_commit_version"

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


class _ChangeFilePartition(InputPartition):
    """One changed file of one commit: everything read() needs,
    driver-resolved and picklable.

    Deletion-vector interplay (both lists hold driver-resolved dv
    parquet paths; ``rel`` is the data file's logged rel the dv rows
    key on):

    - ``dv_subtract``: positions ALREADY deleted as of the change --
      a removed file emits only its then-visible rows as ``delete``
      (its dv'd rows were emitted as deletes when their dv
      committed; re-emitting them would double-count in a signed
      consumer), and a re-added file (restore) emits only the rows
      visible under the restored dv set.
    - ``dv_only``: emit ONLY these positions -- the row form of a dv
      commit itself (``delete``) or of a dv retired by restore while
      its file stays live (``insert``: those rows resurface)."""

    def __init__(
        self,
        candidates: list[str],
        change: str,
        version: int,
        part_values: dict[str, str | None],
        rel: str = "",
        dv_subtract: "list[str] | None" = None,
        dv_only: "list[str] | None" = None,
    ) -> None:
        self.candidates = candidates
        self.change = change
        self.version = version
        self.part_values = part_values
        self.rel = rel
        self.dv_subtract = dv_subtract
        self.dv_only = dv_only


class _PackedChangesPartition(InputPartition):
    """Several changed files bin-packed into ONE input partition --
    Spark's ``FilePartition`` size packing applied to the change
    feed.  A commit that touched many small files (partition rewrites
    under merge_update/delete_where produce task-count x
    partition-count small parquet files) would otherwise cost one
    task + one Python-worker invocation PER FILE, which is pure
    scheduler overhead at micro-batch scale; packing bounds the batch
    at ~maxBytesPerPartition of real data per task with an
    openCostBytes floor per file (tiny files cannot collapse into one
    serial task).  Large files still get their own partition, so a
    big commit scans in parallel exactly as before."""

    def __init__(self, files: list[_ChangeFilePartition]) -> None:
        self.files = files


class _BucketChangesPartition(InputPartition):
    """ALL changed files of ONE BUCKET across the batch's commits
    (bucket-aware reads over a cluster_by table): Spark partition
    index == bucket id, so a batch always has exactly n_buckets
    partitions and every row of a bucket key lands in the same one --
    the co-partitioning a downstream stateful consumer inherits
    from the table layout (see ``sources.bucketed.bucket_local_agg``
    for the zero-Exchange aggregation it enables)."""

    def __init__(
        self, bucket: int, files: list[_ChangeFilePartition]
    ) -> None:
        self.bucket = bucket
        self.files = files


#: Spark bucketed-write filename: ``part-00000-<uuid>_00003.c000...``
#: -- the ``_NNNNN`` before the extension dot is the bucket id.
_BUCKET_RE = re.compile(r"_(\d{5})\.")


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


def stream_schema(
    table: TxTable, columns: Sequence[str] | None = None
) -> StructType:
    """The source schema: the table's logged schema plus the change
    tag and commit version.  ``columns`` prunes the data columns (a
    consumer that rolls up two columns should not ship the whole row
    through Arrow -- the Python DataSource API has no automatic
    column-pushdown hook, so the projection rides an explicit
    option); the two metadata columns always ride along, and unknown
    names fail fast here on the driver."""
    logged = table.logged_schema()
    if logged is None:
        raise ValueError(
            f"{table.root}: no logged schema -- write through TxTable first"
        )
    if table._column_map():
        # the executor read path binds parquet footer names to this
        # schema directly; carrying the physical->logical aliasing
        # through a stream whose schema is FIXED at query start would
        # additionally need Delta's schema-tracking contract.  Refuse
        # loudly (the mid-stream analog lives in partitions()).
        raise ValueError(
            f"{table.root}: streaming a column-mapped table is not "
            "supported -- materialize the mapping with compact() "
            "after dropping the map, or consume via changes()"
        )
    fields = list(logged.fields)
    if columns is not None:
        # the metadata columns always ride along, so a caller listing
        # them explicitly is stating the obvious, not an error
        want = set(columns) - {CHANGE_COL, VERSION_COL}
        unknown = want - {f.name for f in fields}
        if unknown:
            raise ValueError(
                f"{table.root}: unknown columns {sorted(unknown)} -- "
                f"table has {[f.name for f in fields]}"
            )
        fields = [f for f in fields if f.name in want]
    return StructType(
        fields
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
        #: no ReadLimit hook, so the cap lives in latestOffset).
        #: Pacing position: ``_paced_from`` starts ``None`` and is
        #: seeded by initialOffset (fresh query) or partitions()
        #: (restart).  A cap anchored at starting_version when the
        #: query's checkpointed offset is already PAST it would hand
        #: Spark an offset BELOW the committed one, which Spark WALs
        #: and the next batch re-delivers (regressed, head] -- so the
        #: anchor must be the true position.  Call-order invariant
        #: (probed on Spark 4.1, pinned by
        #: tests/test_txstream.py::test_restart_with_max_versions_*):
        #: on EVERY restart Spark calls partitions() before the first
        #: latestOffset -- partitions(start, end) to re-run an
        #: uncommitted batch, or partitions(end, end) as the
        #: position-re-init hook when the last batch committed (the
        #: DSv2 analog of the legacy Source.getBatch(end, end)
        #: convention) -- and either call seeds the true position.
        #: Hence ``_paced_from is None`` inside latestOffset implies a
        #: FRESH query, where starting_version IS the position and a
        #: first-batch cap is safe (initial-backlog catch-up is the
        #: headline use of pacing).
        mv = options.get("maxversionsperbatch")
        self.max_versions = int(mv) if mv is not None else None
        #: byte-based pacing (Delta's maxBytesPerTrigger analog): cap
        #: each micro-batch at commits totalling ~this many bytes of
        #: changed files.  A SOFT cap -- the first pending commit is
        #: always taken whole, however large, so progress never
        #: stalls; subsequent commits join the batch only while the
        #: running total stays under the cap.  Versions differ wildly
        #: in size (a one-row upsert vs a full-partition rewrite), so
        #: a version count alone cannot bound batch memory; at scale
        #: this is the knob that keeps a catch-up consumer's batches
        #: executor-sized.  Composes with maxVersionsPerBatch
        #: (whichever cap binds first wins).  Costs O(changed files)
        #: getsize calls per trigger, cached per immutable version.
        mb = options.get("maxbytesperbatch")
        self.max_bytes = int(mb) if mb is not None else None
        self._version_bytes_cache: dict[int, int] = {}
        #: lazily-created long-lived TxTable handle (see _table)
        self._t: "TxTable | None" = None
        #: bucket-aware reads over cluster_by tables (default on):
        #: partitions() groups changed files by bucket id -- see there
        self.bucket_aware = (
            str(options.get("bucketaware", "true")).lower() != "false"
        )
        #: size packing of small changed files (default on, Spark's
        #: maxPartitionBytes/openCostInBytes analog for the change
        #: feed); 0 disables (one partition per file, the r5 layout)
        self.max_bytes_per_partition = int(
            options.get("maxbytesperpartition", 128 * 1024 * 1024)
        )
        self.open_cost_bytes = int(
            options.get("opencostbytes", 4 * 1024 * 1024)
        )
        #: the cluster's core count, passed by read_txtable_stream --
        #: the packer's bytesPerCore clamp (FilePartition's
        #: minPartitionNum) so packing never shrinks a batch below
        #: the available parallelism.  Fallback for direct
        #: ``format("txtable-changes")`` users: this planner's host
        #: core count (the local-mode truth; a cluster user should
        #: pass the option -- read_txtable_stream always does)
        mp = options.get("minpartitions")
        self.min_partitions = int(mp) if mp is not None else (os.cpu_count() or 1)
        #: commit-protocol backend by REGISTERED NAME (logstore.py):
        #: options are strings, so the seam crosses the DataSource
        #: boundary as a registry lookup re-resolved inside the
        #: planner process.  All log reads this planner does
        #: (_entries/_snapshot_version via _table()) go through it;
        #: executor-side DATA file reads stay outside the seam by the
        #: documented contract.
        self.log_store_name = options.get("logstore", "posix")
        self._paced_from: int | None = None
        self.schema = schema

    def _table(self) -> TxTable:
        # ONE long-lived handle per planner: TxTable's parsed-entry
        # and folded-state caches are keyed by immutable names/
        # versions, so reuse across triggers is always correct and
        # turns steady-state planning (seed-state fold + batch entry
        # reads, every trigger) from O(tail re-parse) into O(new
        # commits).  Freshness still comes from the per-call log
        # LISTING (_list_log), never from the caches.
        t = self._t
        if t is None:
            t = self._t = TxTable(self.root, log_store=self._make_store())
        return t

    def _make_store(self):
        from nyc_crash_mapper_etl_script_spark.sources.logstore import (
            make_log_store,
        )

        return make_log_store(self.log_store_name)

    def initialOffset(self) -> dict:
        # only called for FRESH queries (a restart resumes from the
        # checkpointed offset without consulting us), so seeding here
        # is safe: the position IS starting_version.
        self._paced_from = self.starting_version
        return {"version": self.starting_version}

    @staticmethod
    def _entries_range(
        t: TxTable, lo: int, hi: int, require_contiguous: bool = False
    ) -> list[dict]:
        """Commit entries for versions in (lo, hi], read individually
        by name -- O(range), never O(history): a long-lived stream's
        per-trigger planning cost must not grow with the table's
        commit count.

        ``require_contiguous`` guards correctness against
        ``cleanup_log``: versions are dense, so a hole in the range
        means retention deleted part of this batch's history -- a
        fresh query starting at the default version 0, or a consumer
        lagging past the producer's retention window, must FAIL
        loudly here rather than silently emit a partial feed (the
        offset would advance past rows that were never delivered)."""
        entry_names, _ = t._list_log()
        out = []
        for name in entry_names:
            v = t._entry_version(name)
            if lo < v <= hi:
                out.append(t._read_entry(name))
        if require_contiguous:
            got = [e["version"] for e in out]
            if got != list(range(lo + 1, hi + 1)):
                raise FileNotFoundError(
                    f"{t.root}: commit entries for ({lo}, {hi}] are "
                    f"incomplete (have {got}) -- cleanup_log removed "
                    "history this stream still needs; restart from a "
                    "version at or above the retention cutoff"
                )
        return out

    def latestOffset(self) -> dict:
        t = self._table()
        current = t._snapshot_version()  # one listing, no entry reads
        if self.max_bytes is None and self.max_versions is None:
            return {"version": current}
        # None here => fresh query (see the __init__ call-order
        # invariant: any restart seeds via partitions() first), so
        # starting_version is the true position and capping the first
        # batch from it is safe.
        anchor = (
            self._paced_from
            if self._paced_from is not None
            else self.starting_version
        )
        end = current
        if self.max_versions is not None:
            end = min(end, anchor + self.max_versions)
        if self.max_bytes is not None and end > anchor:
            # byte pacing sizes only the PENDING range (anchor, end]
            end = self._cap_by_bytes(
                self._entries_range(t, anchor, end), anchor, end
            )
        return {"version": max(end, anchor)}  # never step backwards

    def _version_bytes(self, entry: dict) -> int:
        """Total bytes of a version's changed files (adds AND removes
        -- both are read back as change rows), resolved live-or-archive
        like the partitions; cached, versions are immutable."""
        v = entry["version"]
        cached = self._version_bytes_cache.get(v)
        if cached is not None:
            return cached
        total = 0
        # dv commits change rows without changing file sets: their
        # read cost is the referenced data files (emitted as position
        # rows) plus the sidecars themselves
        dv_rels = set(entry.get("dv_add", {})) | set(entry.get("dv_remove", []))
        dv_data = {
            f
            for fr in entry.get("dv_add", {}).values()
            for f in fr
        }
        for rel in sorted(dv_rels):
            try:
                total += os.path.getsize(os.path.join(self.root, rel))
            except OSError:
                pass  # gc'd/vacuumed dv -- emits nothing
        for rel in (
            list(entry.get("add", []))
            + list(entry.get("remove", []))
            + sorted(dv_data)
        ):
            for cand in (
                os.path.join(self.root, rel),
                os.path.join(self.root, _ARCHIVE_DIR, rel),
            ):
                try:
                    total += os.path.getsize(cand)
                    break
                except OSError:
                    continue
            else:
                # neither live nor archived: vacuumed history.  Sizing
                # it as 0 would over-admit a catch-up batch that then
                # dies in read() with a bare FileNotFoundError -- warn
                # HERE so the eventual failure has a named cause (the
                # batch still proceeds: pacing is a soft cap, and the
                # read path owns the hard vacuumed-history error).
                import warnings

                warnings.warn(
                    f"byte pacing: changed file {rel!r} of v{v} at "
                    f"{self.root} is neither live nor archived "
                    "(vacuumed history?); sizing it as 0 bytes",
                    stacklevel=2,
                )
        self._version_bytes_cache[v] = total
        return total

    def _cap_by_bytes(self, entries: list[dict], anchor: int, hi: int) -> int:
        """Greatest end version in (anchor, hi] whose cumulative
        changed-file bytes stay under max_bytes -- soft: the first
        pending version is always included whole, so an oversized
        commit forms its own batch instead of stalling the stream."""
        took = anchor
        cum = 0
        for e in sorted(
            (e for e in entries if anchor < e["version"] <= hi),
            key=lambda e: e["version"],
        ):
            size = self._version_bytes(e)
            if took > anchor and cum + size > self.max_bytes:
                break
            cum += size
            took = e["version"]
        return took

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        lo, hi = int(start["version"]), int(end["version"])
        # advance pacing to the true batch range: on restart, lo is
        # the checkpointed offset starting_version knows nothing about
        self._paced_from = max(self._paced_from or 0, lo, hi)
        if self._version_bytes_cache:
            # versions at or below the paced anchor are never sized
            # again (_cap_by_bytes only walks (anchor, head]) -- drop
            # them so a long-lived query's cache stays O(pending
            # versions), not O(history)
            anchor = self._paced_from
            self._version_bytes_cache = {
                v: b for v, b in self._version_bytes_cache.items() if v > anchor
            }
        t = self._table()
        parts: list[_ChangeFilePartition] = []
        # the live-file and live-dv state the dv emission rules need
        # is SEEDED from the checkpointed state at the batch's start
        # version and folded forward over only the range entries --
        # O(batch), never O(history), however long the table has been
        # running.  ``dv_for_of`` registers dvs by their file lists (a
        # restore's dv_remove can name dvs retired from the live set
        # within the range); dvs retired BEFORE the range start can
        # never be re-removed, so the seed's live map suffices.
        seed = t._state(lo)
        live: set[str] = set(seed["live"])
        dv_live: set[str] = set(seed["dv_live"])
        dv_for_of: dict[str, list[str]] = dict(seed["dv_live"])
        batch_entries = self._entries_range(t, lo, hi, require_contiguous=True)

        def _dv_paths(rels) -> list[str]:
            return [os.path.join(self.root, r) for r in sorted(rels)]

        def _part(rel, change, v, dv_subtract=None, dv_only=None):
            return _ChangeFilePartition(
                [
                    os.path.join(self.root, rel),
                    os.path.join(self.root, _ARCHIVE_DIR, rel),
                ],
                change,
                v,
                _partition_values(rel),
                rel=rel,
                dv_subtract=dv_subtract,
                dv_only=dv_only,
            )

        def _dvs_for(rel) -> list[str]:
            return _dv_paths(d for d in dv_live if rel in dv_for_of[d])

        # mid-stream schema-loss guard baseline: the schema in force
        # at the batch's start.  None for a fresh replay from v0 --
        # early entries legitimately predate later add-column
        # evolutions (their files NULL-fill, the correct answer), so
        # only a LOSING/RETYPING TRANSITION inside the batch fails.
        prev_schema: "str | None" = seed.get("schema")
        bound_fields = {
            f.name for f in self.schema.fields
        } - {CHANGE_COL, VERSION_COL}
        for e in batch_entries:
            if e.get("column_map"):
                # a rename (or a drop of a previously-renamed column)
                # landed mid-stream: the fixed query schema no longer
                # matches the table's logical one, and the executor
                # read binds footer names directly -- fail the stream
                # instead of NULLing renamed columns
                raise ValueError(
                    f"{self.root}: commit v{e['version']} introduced "
                    "column mapping under a running stream; restart "
                    "the consumer against the new schema"
                )
            dropped_hit = sorted(
                set(e.get("dropped_physical") or [])
                & {f.name for f in self.schema.fields}
            )
            if dropped_hit:
                # drop_column on a never-renamed column logs NO
                # column_map key (the map stays empty), so the guard
                # above never fires for it -- but post-drop files no
                # longer carry the column and this stream's FIXED
                # schema would silently emit NULL for it.  Fail
                # loudly, symmetric with the rename case.  Keyed on
                # the INTERSECTION with this stream's schema because
                # dropped_physical is cumulative: a consumer restarted
                # against the post-drop schema must sail past the old
                # tombstones (streamed tables are never column-mapped,
                # so the stream's logical names ARE physical names).
                raise ValueError(
                    f"{self.root}: commit v{e['version']} dropped "
                    f"column(s) {dropped_hit} this stream's fixed "
                    "schema still binds; restart the consumer "
                    "against the new schema"
                )
            if "schema" in e:
                # any OTHER mid-stream schema change that loses or
                # retypes a field this stream emits (a narrowing
                # overwrite/restore, a future metadata op) gets the
                # same loud failure -- the fixed query schema cannot
                # track it, and NULL-filling a column the table LOST
                # is a silent wrong answer.  Identical schema strings
                # (the steady same-schema append case) skip the parse
                # entirely.
                if prev_schema is not None and e["schema"] != prev_schema:
                    have = TxTable._schema_fields(e["schema"])
                    prev = TxTable._schema_fields(prev_schema)
                    for name in sorted(bound_fields & set(prev)):
                        if have.get(name) != prev[name]:
                            raise ValueError(
                                f"{self.root}: commit v{e['version']} "
                                f"({e.get('op', '?')}) lost or retyped "
                                f"column {name!r} present in this "
                                "stream's fixed schema; restart the "
                                "consumer against the new schema"
                            )
                prev_schema = e["schema"]
            v = e["version"]
            dv_added = e.get("dv_add", {})
            dv_removed = e.get("dv_remove", [])
            # removed files emit their rows still VISIBLE at v-1 (dv
            # state before this entry applies): their dv'd rows were
            # already emitted as deletes when the dv committed, and
            # re-emitting would double-count in a signed consumer
            for rel in e.get("remove", []):
                parts.append(
                    _part(rel, "delete", v, dv_subtract=_dvs_for(rel) or None)
                )
            dv_live.difference_update(dv_removed)
            dv_live.update(dv_added)
            dv_for_of.update(dv_added)
            live.difference_update(e.get("remove", []))
            live.update(e.get("add", []))
            # added files emit rows visible at v: a restore re-adding
            # a dv'd file must not re-emit its deleted rows
            for rel in e.get("add", []):
                parts.append(
                    _part(rel, "insert", v, dv_subtract=_dvs_for(rel) or None)
                )
            # dv-level deltas apply only to files that were live
            # ACROSS this entry: a file (re-)added at v already
            # emitted its rows under the post-entry dv state, so
            # emitting its dv delta too would double-count (a restore
            # both re-adds files and moves the dv set in one entry)
            added_now = set(e.get("add", []))
            # a dv commit's rows ARE the delta: its positions, tagged
            # delete, per referenced file still live at v
            if dv_added:
                dv_paths = _dv_paths(dv_added)
                for rel in sorted({f for fr in dv_added.values() for f in fr}):
                    if rel in live and rel not in added_now:
                        parts.append(
                            _part(rel, "delete", v, dv_only=dv_paths)
                        )
            # a dv retired while its file stays live (restore across
            # a dv commit) RESURFACES those rows as inserts; inert-gc
            # dv_removes reference only dead files and emit nothing
            if dv_removed:
                gone_paths = _dv_paths(dv_removed)
                referenced = sorted(
                    {f for d in dv_removed for f in dv_for_of.get(d, [])}
                )
                for rel in referenced:
                    if rel in live and rel not in added_now:
                        parts.append(
                            _part(rel, "insert", v, dv_only=gone_paths)
                        )
        spec = t.cluster_spec() if self.bucket_aware else None
        if not parts:
            return parts
        if spec is None:
            return self._pack(parts)
        # BUCKET-AWARE layout (cluster_by tables): group the batch's
        # changed files by the bucket id in their filename and emit
        # exactly n_buckets partitions, index == bucket id (untouched
        # buckets ride as empty partitions so the partition->bucket
        # mapping is stable across batches).  A filename without a
        # bucket tag (shouldn't exist under a cluster spec) falls the
        # whole batch back to per-file partitions -- layout is an
        # optimization, never a correctness gate.
        n_buckets = spec[2]
        grouped: list[list[_ChangeFilePartition]] = [
            [] for _ in range(n_buckets)
        ]
        for p in parts:
            m = _BUCKET_RE.search(os.path.basename(p.candidates[0]))
            if m is None or int(m.group(1)) >= n_buckets:
                return parts
            grouped[int(m.group(1))].append(p)
        return [
            _BucketChangesPartition(b, files) for b, files in enumerate(grouped)
        ]

    def _pack(
        self, parts: list[_ChangeFilePartition]
    ) -> Sequence[InputPartition]:
        """Greedy size packing of the batch's changed files in their
        deterministic (version, path) build order -- a replayed batch
        re-plans the identical layout PER ENVIRONMENT: the bin target
        depends on minPartitions (defaultParallelism, or the planner
        host's cpu_count for direct users), so a cluster resize
        between crash and replay yields a different partition layout.
        The replay contract is ROW-LEVEL, not partition-level -- the
        row multiset is identical either way, which is all
        exactly-once with idempotent sinks requires.  The bin target mirrors FilePartition's
        maxSplitBytes: ``min(maxBytes, max(openCost, (totalBytes +
        openCost x nFiles) / minPartitions))`` -- so a tiny-file storm
        packs down to ~core-count partitions while a batch with fewer,
        larger files keeps one task per file (packing never SHRINKS
        available parallelism, it only caps scheduler overhead).
        Sizes come from one driver stat call per file (O(changed
        files), same cost class as the log read that listed them); a
        vanished file costs the open floor here and fails properly in
        read()."""
        if self.max_bytes_per_partition <= 0:
            return parts
        sizes: list[int] = []
        for p in parts:
            sz = 0
            for c in p.candidates:
                try:
                    sz = os.path.getsize(c)
                    break
                except OSError:
                    continue
            sizes.append(sz)
        total_cost = sum(sizes) + self.open_cost_bytes * len(parts)
        target = min(
            self.max_bytes_per_partition,
            max(
                self.open_cost_bytes,
                total_cost // max(1, self.min_partitions),
            ),
        )
        bins: list[list[_ChangeFilePartition]] = []
        cur: list[_ChangeFilePartition] = []
        cur_bytes = 0
        for p, sz in zip(parts, sizes):
            cost = sz + self.open_cost_bytes
            if cur and cur_bytes + cost > target:
                bins.append(cur)
                cur, cur_bytes = [], 0
            cur.append(p)
            cur_bytes += cost
        if cur:
            bins.append(cur)
        return [
            b[0] if len(b) == 1 else _PackedChangesPartition(b) for b in bins
        ]

    def read(self, partition) -> Iterator:
        if isinstance(partition, (_BucketChangesPartition, _PackedChangesPartition)):
            for f in partition.files:
                yield from self._read_file(f)
            return
        yield from self._read_file(partition)

    def _read_file(self, partition: _ChangeFilePartition) -> Iterator:
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
        target = to_arrow_schema(self.schema)
        pf = pq.ParquetFile(path)
        # read ONLY the projected data columns (the source schema may
        # be column-pruned via the `columns` option): parquet is
        # columnar, so unselected columns cost zero I/O and zero
        # Arrow transport
        avail = set(pf.schema_arrow.names)
        want = [
            f.name
            for f in target
            if f.name not in (CHANGE_COL, VERSION_COL) and f.name in avail
        ]
        raw = pf.read(columns=want)
        if partition.dv_subtract or partition.dv_only:
            # deletion-vector interplay: keep only the positions the
            # partition's emission rule names (see _ChangeFilePartition)
            # -- dv sidecars are position-keyed by this file's rel, so
            # one filtered dv read + one arrow take, no join
            import numpy as np

            pos = self._dv_positions(
                partition.dv_subtract or partition.dv_only, partition.rel
            )
            if partition.dv_only is not None:
                raw = raw.take(pa.array(sorted(pos), type=pa.int64()))
            elif pos:
                mask = np.ones(pf.metadata.num_rows, dtype=bool)
                mask[np.fromiter(pos, dtype=np.int64)] = False
                raw = raw.take(pa.array(np.flatnonzero(mask)))
        n = raw.num_rows
        arrays = []
        for field in target:
            name = field.name
            if name == CHANGE_COL:
                # pa.repeat: C-level constant column, no python list
                arrays.append(pa.repeat(pa.scalar(partition.change, field.type), n))
            elif name == VERSION_COL:
                arrays.append(pa.repeat(pa.scalar(partition.version, field.type), n))
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
                        pa.repeat(pa.scalar(v, pa.string()), n).cast(field.type)
                    )
            else:
                # evolved column absent from this (older) file
                arrays.append(pa.nulls(n, type=field.type))
        yield from pa.Table.from_arrays(arrays, schema=target).to_batches()

    @staticmethod
    def _dv_positions(dv_paths: list[str], rel: str) -> set[int]:
        """The row positions a set of dv sidecars name for one data
        file rel -- a row-group-pruned pyarrow read of the two key
        columns (dv files are written repartitioned by file rel, so
        the equality filter usually skips whole files)."""
        import pyarrow.parquet as pq

        pos: set[int] = set()
        for p in dv_paths:
            tbl = pq.read_table(
                p,
                columns=[_TXDV_POS],
                filters=[(_TXDV_FILE, "==", rel)],
            )
            pos.update(tbl.column(_TXDV_POS).to_pylist())
        return pos

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass


class TxTableChangesDataSource(DataSource):
    """``spark.readStream.format("txtable-changes").option("path", root)``."""

    @classmethod
    def name(cls) -> str:
        return "txtable-changes"

    def schema(self) -> StructType:
        opts = {k.lower(): v for k, v in dict(self.options).items()}
        cols = opts.get("columns")
        return stream_schema(
            TxTable(opts["path"].rstrip("/")),
            columns=[c.strip() for c in cols.split(",")] if cols else None,
        )

    def streamReader(self, schema: StructType) -> TxTableStreamReader:
        opts = {k.lower(): v for k, v in dict(self.options).items()}
        return TxTableStreamReader(schema, opts)


def read_txtable_stream(
    spark: SparkSession,
    root: str,
    starting_version: int = 0,
    max_versions_per_batch: int | None = None,
    max_bytes_per_batch: int | None = None,
    bucket_aware: bool = True,
    max_bytes_per_partition: int | None = None,
    columns: Sequence[str] | None = None,
    log_store: str = "posix",
) -> DataFrame:
    """Register the source (idempotent) and open the change stream.
    ``starting_version=0`` replays from the init commit (the initial
    snapshot arrives as inserts -- Delta's startingVersion=0); a
    caller that already holds a snapshot as of version v passes
    ``starting_version=v`` to receive only subsequent changes.
    ``max_versions_per_batch`` bounds each micro-batch to that many
    commits (backlog catch-up in right-sized pieces; pair with a
    processing-time trigger -- availableNow snapshots the capped
    offset at start and would stop early).
    ``max_bytes_per_batch`` bounds each micro-batch by the SIZE of
    its commits' changed files instead (Delta's maxBytesPerTrigger):
    commit sizes vary by orders of magnitude (one-row upsert vs
    full-partition rewrite), so this is the cap that keeps catch-up
    batches executor-sized at scale.  Soft -- the first pending
    commit always ships whole, so an oversized commit becomes its own
    batch rather than a stall.  Composes with the version cap
    (whichever binds first wins) and shares its trigger caveat.  Over a ``cluster_by``
    table, each micro-batch arrives as exactly n_buckets partitions
    with partition index == bucket id (``bucket_aware=False`` for the
    per-file layout), so per-bucket-key work needs no shuffle --
    ``sources.bucketed.bucket_local_agg``.  Over non-clustered tables
    small changed files bin-pack into size-targeted input partitions
    (``max_bytes_per_partition``, default 128 MiB; 0 = one partition
    per file) so a partition-rewrite commit of many small files costs
    a few tasks, not one per file.  ``columns`` prunes the DATA
    columns at the source (the metadata columns always ride): the
    Python DataSource API has no automatic projection pushdown, so a
    rollup consumer that needs two columns should say so and skip the
    parquet I/O and Arrow transport of the rest.  ``log_store`` names
    the commit-protocol backend (``logstore.register_log_store``) the
    PLANNER reads the table's log through -- the streaming half of the
    TxTable LogStore seam; default POSIX."""
    spark.dataSource.register(TxTableChangesDataSource)
    reader = (
        spark.readStream.format("txtable-changes")
        .option("path", root)
        .option("startingVersion", str(starting_version))
        .option("bucketAware", "true" if bucket_aware else "false")
        .option("minPartitions", str(spark.sparkContext.defaultParallelism))
        .option("logstore", log_store)
    )
    if max_versions_per_batch is not None:
        reader = reader.option("maxVersionsPerBatch", str(max_versions_per_batch))
    if max_bytes_per_batch is not None:
        reader = reader.option("maxBytesPerBatch", str(max_bytes_per_batch))
    if max_bytes_per_partition is not None:
        reader = reader.option(
            "maxBytesPerPartition", str(max_bytes_per_partition)
        )
    if columns is not None:
        reader = reader.option("columns", ",".join(columns))
    return reader.load()
