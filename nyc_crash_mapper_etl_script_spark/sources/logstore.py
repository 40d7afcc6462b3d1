"""Pluggable commit-protocol backend for :class:`TxTable` (Delta's
LogStore seam).

The transactional table's crash/concurrency story rests on exactly ONE
atomic storage primitive: **put-if-absent** of a small immutable log
object (the version file).  Everything else the protocol does --
listing the log, reading entries, moving finalized data files into
place, retiring superseded files -- tolerates non-atomic,
crash-interruptible implementations, because :meth:`TxTable._recover`
replays the log to repair any half-done post-publish work.  That is
the same contract Delta Lake states for its ``LogStore`` interface
(``org.apache.spark.sql.delta.storage.LogStore``: "atomic visibility
of files", put-if-absent via ``write(path, overwrite=false)``), and it
is what lets one protocol run on POSIX filesystems, HDFS, and object
stores with conditional PUT (S3 ``If-None-Match``, GCS
``ifGenerationMatch=0``, Azure ETag preconditions).

What a backend MUST provide:

 - :meth:`put_if_absent`: publish ``data`` at ``path`` iff no object
   exists there, atomically with respect to every concurrent caller
   on any host, raising :class:`FileExistsError` otherwise.  This is
   THE commit point; its atomicity is the table's serializability.
 - :meth:`list_dir` / :meth:`read_bytes`: a published object is
   visible to a subsequent list/read (read-after-write for the
   object itself).  A LAGGING list is tolerated -- the publish loop
   discovers a taken version by put-if-absent failure and bumps, so a
   stale listing costs retries, never a lost or duplicated commit
   (pinned by the listing-lag fault test).
 - :meth:`move` / :meth:`link_or_copy` / :meth:`delete`: data-file
   plumbing that need NOT be atomic; a crash between any two calls is
   repaired by recovery from the log.  ``move`` may be copy+delete;
   ``link_or_copy`` may always copy (object stores have no links).

What a backend need NOT provide: atomic rename, hard links, locking,
consistent directory listings.  Data-file *writes* (Spark's staged
parquet output) and *reads* (Spark's scans) are outside the seam --
they go through Spark's own Hadoop filesystem layer, which already
abstracts the storage; this seam covers only the driver-side commit
protocol.

Reference scale note: the reference mutates rows over CARTO's hosted
PostgreSQL (main.py:944-960) and has no storage portability question;
at 100 TB the table format IS the store, so the commit point must not
silently assume ``link(2)`` -- this seam is that assumption made
explicit and swappable.
"""

from __future__ import annotations

import os
import shutil
import uuid


class LogStore:
    """Interface; see the module docstring for the contract."""

    def put_if_absent(self, path: str, data: bytes) -> None:
        """Publish ``data`` at ``path`` iff nothing exists there, as
        one atomic action across all concurrent writers on all hosts;
        raise :class:`FileExistsError` if the path is taken.  Never
        leaves a partially-visible object."""
        raise NotImplementedError

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def list_dir(self, path: str) -> list[str]:
        """Entry NAMES under ``path`` ([] for a missing dir).  May lag
        recent puts; must never show partially-written objects."""
        raise NotImplementedError

    def move(self, src: str, dst: str) -> None:
        """Relocate a data file.  Need not be atomic (may be
        copy+delete); callers only invoke it AFTER the commit point,
        and recovery repairs an interrupted move from the log."""
        raise NotImplementedError

    def link_or_copy(self, src: str, dst: str) -> None:
        """Make ``src``'s bytes available at ``dst`` without touching
        ``src``: a hard link where the store has them (O(1) metadata),
        a byte copy where it does not."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError


class PosixLogStore(LogStore):
    """Default backend: local/POSIX filesystems (and NFS with working
    ``link(2)`` semantics).  put-if-absent is the hard-link CAS --
    ``link(2)`` fails with EEXIST if another writer got there first --
    which is atomic across processes and hosts sharing the mount."""

    def put_if_absent(self, path: str, data: bytes) -> None:
        tmp = os.path.join(
            os.path.dirname(path), f".tmp-{uuid.uuid4().hex}"
        )
        try:
            with open(tmp, "wb") as f:
                f.write(data)
            os.link(tmp, path)  # EEXIST -> FileExistsError, the CAS
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def list_dir(self, path: str) -> list[str]:
        if not os.path.isdir(path):
            return []
        return os.listdir(path)

    def move(self, src: str, dst: str) -> None:
        # rename() between two hard links of ONE inode is a POSIX
        # no-op (returns success, removes nothing) -- after a
        # link-based restore, retiring the restored file to its
        # still-present archive twin would otherwise leave the source
        # live forever.  Same inode at both names IS the move's
        # post-condition, so just drop the source name.
        if os.path.exists(dst) and os.path.samefile(src, dst):
            os.unlink(src)
            return
        os.rename(src, dst)

    def link_or_copy(self, src: str, dst: str) -> None:
        try:
            os.link(src, dst)  # O(1) metadata, the common case
        except OSError:
            # cross-device (EXDEV) or a filesystem without links --
            # fall back to bytes
            shutil.copyfile(src, dst)

    def delete(self, path: str) -> None:
        os.unlink(path)


#: name -> zero-arg factory.  The streaming source can only carry
#: STRINGS through its options, so backends register here by name and
#: ``read_txtable_stream(..., log_store="myname")`` reaches the
#: planner process (which re-imports this module and re-resolves the
#: name -- a custom backend must therefore register at import time of
#: a module the planner also imports, exactly Delta's
#: spark.delta.logStore.class contract).
_REGISTRY: dict = {}


def register_log_store(name: str, factory) -> None:
    """Register a LogStore backend under a stream-option-addressable
    name.  ``factory`` is a zero-arg callable returning a LogStore."""
    _REGISTRY[name] = factory


def make_log_store(name: str) -> LogStore:
    try:
        return _REGISTRY[name]()
    except KeyError:
        raise ValueError(
            f"unknown log store {name!r}; registered: "
            f"{sorted(_REGISTRY)} (register_log_store adds backends)"
        ) from None


class FakeObjectStore(LogStore):
    """Test double with OBJECT-STORE semantics and fault injection:
    no hard links, no atomic rename, moves are copy+delete with an
    injectable crash window, listings can lag.  put-if-absent models
    a conditional PUT (S3 ``If-None-Match: *``): atomic at the object
    level, cross-process.

    Internal mechanics (emulating the store's server side on a local
    disk): a writer atomically claims the key with an O_EXCL sidecar
    (``<path>.claim``) -- the stand-in for the server serializing
    conditional PUTs -- writes the full payload into the claim, then
    renames it onto the key.  The rename here plays the role of the
    server's atomic object swap, NOT a filesystem primitive the code
    under test may use: nothing outside this class sees a partial
    object (claims are hidden from ``list_dir``), and the code under
    test never calls rename/link itself.

    Fault injection (each a countdown; -1 = off):

     - ``fail_put_before``: raise before anything is written -- a
       rejected/failed PUT, nothing published.
     - ``fail_put_after``: complete the publish, THEN raise -- the
       PUT landed but the client saw an error (times out on the
       response).  Exercises the post-publish honesty paths
       (``_head_is_ours``, recovery finishing the finalize).
     - ``fail_move_after_copy``: ``move`` copies ``dst`` fully, then
       raises WITHOUT deleting ``src`` -- the non-atomic-rename crash
       window object stores actually have.
     - ``lag_hidden``: basenames ``list_dir`` omits until
       :meth:`settle` -- an eventually-consistent LIST.

    Counters (``puts``, ``moves``, ``copies``) let tests assert the
    protocol's call shape.
    """

    def __init__(self) -> None:
        self.fail_put_before = -1
        self.fail_put_after = -1
        self.fail_move_after_copy = -1
        self.lag_hidden: set[str] = set()
        self.puts = 0
        self.moves = 0
        self.copies = 0

    # -- fault plumbing ---------------------------------------------------

    def _countdown(self, attr: str) -> bool:
        n = getattr(self, attr)
        if n < 0:
            return False
        if n == 0:
            setattr(self, attr, -1)
            return True
        setattr(self, attr, n - 1)
        return False

    def settle(self) -> None:
        """The lagging listing catches up."""
        self.lag_hidden.clear()

    # -- the interface ----------------------------------------------------

    def put_if_absent(self, path: str, data: bytes) -> None:
        if self._countdown("fail_put_before"):
            raise IOError("injected: PUT failed before acceptance")
        claim = path + ".claim"
        if os.path.exists(path):
            raise FileExistsError(path)
        try:
            fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # a peer's conditional PUT is in flight for this key --
            # the server would serialize us behind it and then reject
            raise FileExistsError(path) from None
        try:
            # a peer may have published between the exists check and
            # our claim (its claim was renamed away, freeing the name)
            if os.path.exists(path):
                raise FileExistsError(path)
            with os.fdopen(fd, "wb") as f:
                fd = -1
                f.write(data)
            os.rename(claim, path)  # the server's atomic object swap
        except FileExistsError:
            if fd >= 0:
                os.close(fd)
            if os.path.exists(claim):
                os.unlink(claim)
            raise
        self.puts += 1
        if self._countdown("fail_put_after"):
            raise IOError("injected: PUT landed but the response was lost")

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def list_dir(self, path: str) -> list[str]:
        if not os.path.isdir(path):
            return []
        return [
            n
            for n in os.listdir(path)
            if not n.endswith(".claim") and n not in self.lag_hidden
        ]

    def move(self, src: str, dst: str) -> None:
        # the destination appears ATOMICALLY (unique temp + rename =
        # the server's object swap, same mechanism as put_if_absent):
        # a real store's PUT is never partially visible, and two
        # concurrent movers of the same immutable object (a writer's
        # finalize racing a peer's recovery) must each land a complete
        # copy.  The modeled crash window stays copy-then-delete.
        import uuid as _uuid

        tmp = f"{dst}.{_uuid.uuid4().hex}.claim"
        shutil.copyfile(src, tmp)
        os.replace(tmp, dst)
        if self._countdown("fail_move_after_copy"):
            raise IOError(
                "injected: crashed after copy, before source delete"
            )
        os.unlink(src)
        self.moves += 1

    def link_or_copy(self, src: str, dst: str) -> None:
        shutil.copyfile(src, dst)  # object stores have no links
        self.copies += 1

    def delete(self, path: str) -> None:
        os.unlink(path)


register_log_store("posix", PosixLogStore)
register_log_store("fake_object_store", FakeObjectStore)
