"""Z-order (Morton) clustering for multi-column scan pruning.

A 100 TB table is usually filtered on more than one column, but a
single sort order only prunes for its leading column.  Interleaving
the bits of several columns into one Morton key and range-writing by
that key gives every participating column locality inside each file —
parquet row-group min/max stats then prune scans for predicates on ANY
of the z-ordered columns (the technique Delta/Iceberg expose as
`OPTIMIZE ZORDER BY`; plain Spark has no built-in).

Everything is JVM-side bit arithmetic (`shiftleft`/`&`/`|` chains
inside whole-stage codegen) — no UDFs — and the only exchange is the
range partition the clustered write needs anyway.

Scale notes:
- `zorder_key` is a pure projection; `write_zordered` adds exactly one
  exchange (repartitionByRange's sample pass + shuffle) — the same
  cost as any sorted write.
- skewed/unbounded columns should be rank- or bucket-mapped into the
  key domain first (`bits` clamps, it does not rebalance); id-like and
  bounded numeric columns work directly.
- pruning is engine-native: the written files are ordinary parquet
  whose row-group stats are tight on every z-ordered column, so ANY
  reader (Spark, DuckDB, Trino) prunes them without knowing about
  z-order.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(*cols: Column | str, bits: int = 21) -> Column:
    """Morton-interleave the low ``bits`` of each column into one
    BIGINT key.  ``bits × len(cols)`` must fit a signed 64-bit value
    (≤ 63); values are clamped into [0, 2^bits) after a floor at 0.

    Bit layout: output bit ``i*len(cols)+j`` = bit ``i`` of column
    ``j`` — adjacent key values differ in low-order bits of every
    column, which is exactly what makes per-file min/max ranges tight
    on all of them."""
    ncols = len(cols)
    if ncols < 2:
        raise ValueError("z-order needs at least two columns")
    if bits * ncols > 63:
        raise ValueError(
            f"bits={bits} × {ncols} columns exceeds a signed 64-bit key")
    out = F.lit(0).cast("long")
    max_v = F.lit((1 << bits) - 1).cast("long")
    for j, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        v = F.least(F.greatest(col.cast("long"), F.lit(0)), max_v)
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)),
                            i * ncols + j))
    return out


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int = 32, bits: int = 21,
                   fmt: str = "parquet") -> None:
    """Cluster ``df`` by the Morton key of ``cols`` and write
    ``n_files`` range-partitioned, internally-sorted files.  One
    exchange total; the key column itself is not persisted."""
    keyed = df.withColumn("_zkey", zorder_key(*cols, bits=bits))
    (keyed.repartitionByRange(n_files, "_zkey")
          .sortWithinPartitions("_zkey")
          .drop("_zkey")
          .write.mode("overwrite").format(fmt).save(path))


def write_bucketed(df: DataFrame, path: str, table: str,
                   bucket_by: tuple[str, ...], n_buckets: int,
                   sort_by: tuple[str, ...] = ()) -> None:
    """Write ``df`` as a hash-BUCKETED external parquet table: every
    file belongs to exactly one bucket of ``bucket_by`` (Spark encodes
    the bucket id in the file name), optionally sorted inside each
    bucket.

    This is the storage-layout half of co-located execution: a table
    that is merged / joined / re-aggregated on the same key every day
    should pay the partitioning shuffle ONCE at write time — every
    subsequent groupBy/join whose keys contain ``bucket_by`` then
    reads a scan that already satisfies its clustering and Catalyst
    plans ZERO exchanges (see ``bucketed_table``).  At 100 TB this
    converts the recurring dominant shuffle of a pipeline into a
    one-time layout cost, exactly like the z-order write above
    converts recurring scan cost into a one-time range write.

    The catalog entry is transient (bucket metadata lives in the
    catalog, not the files): the writer registers a throwaway
    uniquely-suffixed name (safe under concurrent writers in one
    session; never collides with a user table) to reach Spark's
    bucketed-write path, then drops it, keeping the files;
    ``bucketed_table`` re-declares the table over the same files in
    any later session."""
    import uuid

    spark = df.sparkSession
    tmp = f"{table}_writer_{uuid.uuid4().hex[:8]}"
    w = df.write.bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    try:
        w.option("path", path).mode("overwrite").saveAsTable(tmp)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tmp}")  # external: files remain


def bucket_id(n_buckets: int, *cols) -> "Column":
    """The bucket-id EXPRESSION of Spark's bucketed writer, usable in
    any plan: ``pmod(murmur3(cols), n_buckets)``.  ``F.hash`` is
    Murmur3 with the same seed (42) Spark's ``HashPartitioning.
    partitionIdExpression`` uses when assigning rows to bucket files,
    so this computes — executor-side, in codegen — exactly the bucket
    a row lives in (asserted against real file names in
    tests/test_extensions.py)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.pmod(F.hash(*cs), F.lit(n_buckets))


_BUCKET_FILE_RE = re.compile(r"^part-\d+-.+_(\d{5})(?:\.c\d+)?\..*parquet$")


#: In-table commit marker for the upsert swap below: its presence means
#: "every staged file landed; finish the swap", its absence means any
#: dot-prefixed part files are a torn stage to roll back.
UPSERT_MARKER = ".upsert-commit.json"

#: Writer-lease SUFFIX enforcing the table's single-writer contract.
#: The lease lives NEXT TO the table dir (``<path>.upsert-lock.json``),
#: not inside it — Spark's CTAS ``mode('overwrite')`` bootstrap clears
#: the table dir's contents, and an in-table lease would be deleted
#: mid-hold (review r7, empirically confirmed).
UPSERT_LOCK = ".upsert-lock.json"


def _lock_path(path: str) -> str:
    return path.rstrip("/") + UPSERT_LOCK


def _is_dot_staged(name: str) -> bool:
    """A dot-prefixed STAGED part file (hidden mid-swap copy).  The
    ``name[1:]`` re-anchor is load-bearing: Hadoop ``.part-*.crc``
    checksum siblings must NOT be read as staged data files (the regex
    requires the ``part-`` prefix and a ``.parquet`` suffix)."""
    return name.startswith(".") and bool(_BUCKET_FILE_RE.search(name[1:]))


def _torn_artifacts(names) -> tuple[bool, bool]:
    """(commit-marker present, dot-staged files present) — THE torn-
    table definition, shared by the reader guard (``bucket_files``),
    the fsck (``table_health``) and recovery (``recover_upsert``)."""
    names = set(names)
    return (UPSERT_MARKER in names,
            any(_is_dot_staged(n) for n in names))


class TableLockedError(RuntimeError):
    """Another writer holds (or recently held) the table's upsert
    lease — concurrent upserts would corrupt the swap protocol."""


def _acquire_table_lock(path: str, ttl_sec: float) -> tuple[str, str]:
    """Best-effort single-writer lease; returns ``(lock_path, token)``.

    Fresh-table acquire is genuinely atomic on local filesystems
    (``open(..., 'x')``).  A lease older than ``ttl_sec`` — or held by
    a provably-dead same-host pid — is STOLEN.  Local-path steals are
    SERIALIZED under an OS advisory lock (``flock``) on a sibling
    arbitration file, and staleness is re-validated inside that
    critical section, so two thieves racing the same stale lease can
    never both claim it (review r8: the previous replace+settle+
    read-back left a window where a slow thief's replace landed after
    a fast thief's verification, and both proceeded).  Cross-host
    ``flock`` over NFS and object-store leases stay best-effort
    (write + settle + read-back); the pre-commit
    :func:`_assert_lease_held` check is the backstop there, and a
    table-format transaction log is the real multi-writer answer, as
    the upsert docstring notes."""
    import json
    import socket
    import time
    import uuid

    from sstable_hadoop_spark.sources import fs

    fs.makedirs(path)  # the lease may precede the table's first write
    lock = _lock_path(path)
    token = uuid.uuid4().hex

    def payload() -> bytes:
        return json.dumps({"pid": os.getpid(),
                           "host": socket.gethostname(),
                           "token": token,
                           "acquired_at": time.time()}).encode()

    def provably_dead(info: dict) -> bool:
        # same-host holder whose pid is gone is provably dead — steal
        # immediately instead of blocking a crash-restart for ttl_sec
        if info.get("host") != socket.gethostname():
            return False
        try:
            os.kill(int(info.get("pid", -1)), 0)
        except ProcessLookupError:
            return True
        except (OSError, ValueError, TypeError):
            pass  # exists-but-unsignalable / garbage pid: not provably dead
        return False

    def fresh_create() -> tuple[str, str]:
        try:
            with open(lock, "xb") as f:  # atomic on POSIX
                f.write(payload())
            return lock, token
        except FileExistsError:
            raise TableLockedError(
                f"table {path}: lost the lease race to a concurrent "
                f"writer") from None

    def steal_local() -> tuple[str, str]:
        import fcntl
        import tempfile

        with open(lock + ".arb", "ab") as arb:
            fcntl.flock(arb, fcntl.LOCK_EX)  # one thief at a time
            # re-validate INSIDE the critical section: a faster thief
            # may have claimed (fresh payload → back off), or the
            # holder may have healthily released (absent → race the
            # atomic fresh-create instead of replacing blind)
            try:
                info = json.loads(fs.read_bytes(lock))
            except OSError:
                return fresh_create()
            except ValueError:
                info = {}  # torn payload: stale by definition
            age = time.time() - float(info.get("acquired_at", 0))
            if info and age < ttl_sec and not provably_dead(info):
                raise TableLockedError(
                    f"table {path}: lost the lease-steal race to a "
                    f"concurrent writer ({info})")
            fd, tmp = tempfile.mkstemp(dir=os.path.dirname(lock) or ".",
                                       prefix=".lock-claim-")
            with os.fdopen(fd, "wb") as f:
                f.write(payload())
            os.replace(tmp, lock)
        return lock, token

    def steal_remote() -> tuple[str, str]:
        # object store: no flock — write + settle + read-back narrows
        # but cannot close the race (documented best-effort; the
        # pre-commit _assert_lease_held is the backstop)
        fs.write_bytes(lock, payload())
        time.sleep(0.05)  # let racing claims land before verifying
        try:
            winner = json.loads(fs.read_bytes(lock)).get("token")
        except (OSError, ValueError):
            winner = None
        if winner != token:
            raise TableLockedError(
                f"table {path}: lost the lease-steal race to a "
                f"concurrent writer")
        return lock, token

    if fs.exists(lock):
        try:
            info = json.loads(fs.read_bytes(lock))
        except (OSError, ValueError):
            # released (or torn) between the exists() check and the
            # read: treat as stale and claim with verification below
            info = {}
        age = time.time() - float(info.get("acquired_at", 0))
        if age < ttl_sec and not provably_dead(info):
            raise TableLockedError(
                f"table {path} is locked by {info} ({age:.0f}s ago); "
                f"a concurrent upsert would corrupt the swap — wait, "
                f"or raise lock_ttl_sec only if that writer is dead")
        return (steal_local() if not fs.has_scheme(lock)
                else steal_remote())
    if not fs.has_scheme(lock):
        return fresh_create()
    return steal_remote()


def _assert_lease_held(lock: str, token: str, when: str) -> None:
    """Re-assert ownership before a critical section: a writer that
    outlived its TTL and was stolen from must fail LOUDLY before
    mutating the table, not corrupt the thief's swap."""
    import json

    from sstable_hadoop_spark.sources import fs

    try:
        holder = json.loads(fs.read_bytes(lock)).get("token")
    except (OSError, ValueError):
        holder = None
    if holder != token:
        raise TableLockedError(
            f"lease for {os.path.dirname(lock)} was lost before "
            f"{when} (held now by token {holder!r}) — this upsert "
            f"outlived lock_ttl_sec and another writer took over; "
            f"no table files were modified by this writer's swap")


def _release_table_lock(lock: str, token: str) -> None:
    """Release only a lease we still own — never delete a thief's."""
    import json

    from sstable_hadoop_spark.sources import fs

    try:
        if json.loads(fs.read_bytes(lock)).get("token") == token:
            fs.remove(lock)
    except (OSError, ValueError):
        pass


def bucket_files(path: str) -> dict[int, list[str]]:
    """Map bucket id → data files under a ``write_bucketed`` dir, from
    the ``part-*-<uuid>_NNNNN[.cK].parquet`` name convention (bucket id
    is the ``_NNNNN`` infix).  A bucket may own several files (one per
    writer task that held its rows); absent buckets are empty.

    Scheme'd URIs list through :mod:`sources.fs` (ADVICE r6: the
    local-only ``os.listdir`` silently returned ``{}`` on remote
    tables, which the streaming sink would read as "not bootstrapped"
    and OVERWRITE).  An interrupted upsert is surfaced loudly: readers
    must not silently serve a table whose swapped buckets are still
    hidden under dot-names — run :func:`recover_upsert` (the writer
    does this automatically on entry)."""
    from sstable_hadoop_spark.sources import fs

    out: dict[int, list[str]] = {}
    entries = fs.list_dir(path)
    names = {os.path.basename(p) for p in entries}
    if any(_torn_artifacts(names)):
        raise RuntimeError(
            f"interrupted bucketed upsert detected in {path} "
            f"(commit marker or orphan dot-staged files present) — "
            f"run operators.layout.recover_upsert(path) (it takes the "
            f"writer lease, so it will refuse while a live writer is "
            f"mid-swap) or wait for the writer to finish")
    for p in entries:
        m = _BUCKET_FILE_RE.search(os.path.basename(p))
        if m:
            out.setdefault(int(m.group(1)), []).append(p)
    return out


def recover_upsert(path: str, *, lock_ttl_sec: float = 600.0,
                   held_lease: tuple[str, str] | None = None) -> str:
    """Finish or undo an interrupted :func:`bucketed_upsert` swap.

    The swap protocol stages every file under a dot-name, then writes
    ``UPSERT_MARKER`` (the commit point), then removes old files and
    renames dots into place, then drops the marker.  Recovery is
    therefore unambiguous under the table's single-writer contract:

    - marker present and parseable → every staged file landed; ROLL
      FORWARD by re-executing the marker's removes + renames (both
      idempotent).
    - marker present but torn (unparseable JSON) → the commit write
      itself crashed, so removes cannot have started: drop the torn
      marker and roll back like the no-marker case.
    - marker absent but dot-staged part files exist → the stage was
      torn mid-landing; ROLL BACK by deleting the dots (old files are
      all still present — removes only ever happen after the marker).

    Recovery MUTATES the table, so it runs under the writer lease:
    against a live writer mid-swap it raises :class:`TableLockedError`
    instead of deleting that writer's healthy staged files (review
    r7).  Callers already holding the lease (the upsert itself, the
    streaming sink) pass it via ``held_lease``.

    Returns ``"rolled_forward"``, ``"rolled_back"``, or ``"clean"``."""
    if held_lease is not None:
        return _locked_recover(path)
    lease = _acquire_table_lock(path, lock_ttl_sec)
    try:
        return _locked_recover(path)
    finally:
        _release_table_lock(*lease)


def _locked_recover(path: str) -> str:
    import json

    from sstable_hadoop_spark.sources import fs

    marker = os.path.join(path, UPSERT_MARKER)
    torn_marker = False
    if fs.exists(marker):
        try:
            plan = json.loads(fs.read_bytes(marker))
        except ValueError:
            # Torn marker.  Since r8 the marker is published with an
            # fsync'd atomic temp+rename, so OUR writer can no longer
            # produce one (a crash mid-publish just strands a hidden
            # temp, reaped below) — a torn marker means a pre-r8
            # writer's power loss, where the removes MAY have already
            # persisted and the dots may be the data's ONLY copies
            # (review r8).  Roll-forward is impossible (the plan is
            # unreadable), so roll back — but QUARANTINE the dots
            # instead of deleting them, preserving a copy either way.
            fs.remove(marker)
            plan = None
            torn_marker = True
        if plan is not None:
            return _roll_forward(path, plan)
    dots, temps = [], []
    for p in fs.list_dir(path):
        name = os.path.basename(p)
        if _is_dot_staged(name):
            dots.append(p)
        elif name.startswith("." + UPSERT_MARKER + ".tmp-"):
            temps.append(p)  # stranded atomic-publish temp (pre-rename)
    for p in temps:
        fs.remove(p)
    for p in dots:
        if torn_marker:
            # hidden (leading dot) but no longer dot-STAGED (the
            # .parquet suffix anchor fails), so readers, bucket_files
            # and table_health's torn check all ignore it; table_health
            # surfaces a note for the operator to inspect/remove
            fs.rename(p, p + ".quarantined")
        else:
            fs.remove(p)
    return "rolled_back" if dots else "clean"


def table_health(spark, path: str, n_buckets: int) -> DataFrame:
    """Read-only fsck for a bucketed table — the "is my 100 TB winners
    table sound?" check an operator runs before trusting or repairing
    it (pairs with :func:`recover_upsert`, which mutates; this never
    does).  One row per bucket id in [0, n_buckets) plus one ``_table``
    summary row:

    - per bucket: file count, total bytes, ``empty`` flag (an empty
      bucket is legal — no keys hash there — but a sudden empty bucket
      after an upsert is the data-loss signature);
    - ``_table`` row: files/bytes totals, and the ``note`` field names
      any torn-swap artifacts (commit marker, orphan dot-staged files,
      live lease, quarantined copies from an ambiguous torn-marker
      recovery) that make readers raise until recovery runs.

    Driver-side listing only — no data bytes are read, but the cost IS
    proportional to the table's FILE COUNT (one listing + one stat per
    file).  Healthy tables hold ≤ a few files per bucket so this is
    cheap even at 100 TB of data; a pathological 100k+-file directory
    makes this fsck slow but still safe — compact the table (rewrite
    via ``write_bucketed``) rather than parallelizing the fsck."""
    from sstable_hadoop_spark.sources import fs

    entries = fs.list_dir(path)
    names = {os.path.basename(p): p for p in entries}
    by_bucket: dict[int, list[str]] = {}
    for name, p in names.items():
        m = _BUCKET_FILE_RE.search(name)
        if m:
            by_bucket.setdefault(int(m.group(1)), []).append(p)
    notes = []
    has_marker, has_dots = _torn_artifacts(names)
    if has_marker:
        notes.append("commit-marker present (run recover_upsert)")
    if has_dots:
        notes.append("orphan dot-staged files (run recover_upsert)")
    if fs.exists(_lock_path(path)):
        notes.append("writer lease present")
    n_quarantined = sum(1 for n in names if n.endswith(".quarantined"))
    if n_quarantined:
        notes.append(
            f"{n_quarantined} quarantined file(s) from an ambiguous "
            f"torn-marker recovery (inspect, then remove manually)")
    rows = []
    total_files = total_bytes = 0
    for b in range(n_buckets):
        files = by_bucket.get(b, [])
        nbytes = sum(fs.file_size(f) for f in files)
        total_files += len(files)
        total_bytes += nbytes
        rows.append((str(b), len(files), nbytes, not files, ""))
    rows.append(("_table", total_files, total_bytes, total_files == 0,
                 "; ".join(notes)))
    return spark.createDataFrame(
        rows, "bucket string, n_files int, n_bytes long, "
              "empty boolean, note string")


def _roll_forward(path: str, plan: dict) -> str:
    """Re-execute a committed swap's removes + renames (idempotent)."""
    from sstable_hadoop_spark.sources import fs

    for f in plan["removes"]:
        if fs.exists(f):
            fs.remove(f)
    for dot, final in plan["renames"]:
        if fs.exists(dot):
            fs.rename(dot, final)
    fs.remove(os.path.join(path, UPSERT_MARKER))
    return "rolled_forward"


def bucketed_upsert(spark, path: str, delta: DataFrame,
                    merge, bucket_by: tuple[str, ...],
                    n_buckets: int,
                    sort_by: tuple[str, ...] = (),
                    lock_ttl_sec: float = 600.0,
                    held_lease: tuple[str, str] | None = None
                    ) -> list[int]:
    """Apply a delta batch to a ``write_bucketed`` table by rewriting
    ONLY the buckets that contain a delta key — the merge-on-write
    upsert a daily 100 TB pipeline needs: cost is O(affected buckets +
    delta), not O(table).

    ``merge(stored, delta) -> DataFrame`` defines the reconciliation
    (e.g. ``lww.lww_refresh`` — any associative, idempotent merge makes
    the whole upsert idempotent: re-applying a committed batch rewrites
    the same bytes).

    Plan shape: the affected-bucket set is ``pmod(hash(key), n)`` over
    the delta — distinct ≤ n_buckets values, the one (bounded) driver
    collect.  Stored rows of OTHER buckets are never read: the scan is
    an explicit file list from the bucket-id file names.  The merged
    result is staged with the same bucketed writer (only affected
    buckets produce files, since every merged key hashes into one),
    then swapped in with a marker-committed crash-safe ordering:
    staged files first land INSIDE the table dir under dot-prefixed
    names (invisible to Spark/Hadoop readers and to
    :func:`bucket_files`), then the ``UPSERT_MARKER`` commit record is
    written (the commit point), then old files are removed and the
    dot-names renamed in place, then the marker is dropped.  A crash
    before the marker rolls BACK (old files are untouched); a crash
    after it rolls FORWARD (the marker lists every remove+rename, all
    idempotent) — :func:`recover_upsert` runs automatically on entry,
    and readers that hit a torn table get a loud error from
    ``bucket_files`` instead of silently missing buckets (ADVICE r6).

    All file manipulation routes through :mod:`sources.fs`, so the
    table may live on any mounted store (``file://`` end-to-end
    today; object-store URIs need Spark itself to read/write parquet
    there, and renames on such stores are copy+delete — the marker
    ordering is what keeps that weaker atomicity recoverable).
    ONE writer per table: entry acquires the ``UPSERT_LOCK`` lease —
    enforced on local filesystems (atomic ``open('x')`` fresh-acquire;
    ``flock``-serialized stale-lease steal, r8), best-effort on object
    stores (write + read-back) — and a live concurrent writer raises
    :class:`TableLockedError` instead of corrupting the swap.  A
    crashed writer's lease goes stale after ``lock_ttl_sec`` and is
    stolen.  A writer that outlives its own TTL and is stolen from is
    still safe: before the commit marker it re-asserts the lease and
    aborts with nothing final touched; after the marker its remaining
    removes/renames are exists-guarded and its file names are unique,
    so they are no-ops once the thief's entry recovery has rolled the
    committed plan forward — the thief's own marker carries a
    different token and is never deleted by this writer.  A true
    multi-writer deployment still wants a table-format transaction
    log in front — Delta/Iceberg journal exactly this swap as a
    metadata commit.

    ``held_lease``: a ``(lock_path, token)`` already acquired by the
    caller (the streaming sink holds one lease across its whole
    recover→bootstrap-or-upsert batch); the upsert then neither
    re-acquires nor releases it.

    Returns the sorted affected bucket ids."""
    if held_lease is not None:
        return _locked_upsert(spark, path, delta, merge, bucket_by,
                              n_buckets, sort_by, held_lease)
    lease = _acquire_table_lock(path, lock_ttl_sec)
    try:
        return _locked_upsert(spark, path, delta, merge, bucket_by,
                              n_buckets, sort_by, lease)
    finally:
        _release_table_lock(*lease)


def _locked_upsert(spark, path, delta, merge, bucket_by, n_buckets,
                   sort_by, lease) -> list[int]:
    import json
    import shutil
    import tempfile

    from sstable_hadoop_spark.sources import fs

    # finish/undo any interrupted prior swap (we already hold the lease)
    recover_upsert(path, held_lease=lease)
    affected = sorted(
        r[0] for r in
        delta.select(bucket_id(n_buckets, *bucket_by).alias("b"))
             .distinct().collect())
    by_bucket = bucket_files(path)
    old_files = [f for b in affected for f in by_bucket.get(b, [])]
    schema = spark.read.parquet(path).schema  # footer-only
    stored = (spark.read.schema(schema).parquet(*old_files)
              if old_files else
              spark.createDataFrame([], schema))
    merged = merge(stored, delta)

    stage = tempfile.mkdtemp(prefix="bucketed_upsert_")
    hidden: list[tuple[str, str]] = []  # (dot-path, final path)
    try:
        write_bucketed(merged, stage, "bucketed_upsert_stage",
                       bucket_by=bucket_by, n_buckets=n_buckets,
                       sort_by=sort_by)
        staged = bucket_files(stage)
        bad = set(staged) - set(affected)
        if bad:  # merge() injected keys outside the delta's buckets
            raise ValueError(
                f"merge produced rows in unaffected buckets {sorted(bad)}")
        for b in affected:  # land hidden copies next to the old files
            for f in staged.get(b, ()):
                name = os.path.basename(f)
                dot = os.path.join(path, "." + name)
                fs.put_file(f, dot)
                hidden.append((dot, os.path.join(path, name)))
        # outlived-TTL guard: if the lease was stolen while we merged
        # and staged, abort BEFORE the commit point — nothing final
        # has been touched yet, the rollback below cleans the dots
        _assert_lease_held(*lease, when="the commit marker write")
        # commit point: from here the swap completes even across a
        # crash (recover_upsert replays this exact plan).  The marker
        # carries OUR lease token so the failure paths below can tell
        # our marker from a lease-thief's (never delete the thief's —
        # it is their roll-forward record).  Published ATOMICALLY with
        # an fsync'd temp+rename (review r8): a plain write gave no
        # durability ordering between the marker and the removes below,
        # so a power loss could persist the removes while tearing the
        # marker — recovery would then roll back a committed swap,
        # deleting the staged dots that were the data's only copies.
        fs.write_bytes_atomic(os.path.join(path, UPSERT_MARKER),
                              json.dumps({"removes": old_files,
                                          "renames": hidden,
                                          "token": lease[1]}).encode())
    except BaseException:
        # marker FIRST: if OUR complete marker landed before the
        # raise, deleting the dots while it survives would make a
        # later recover_upsert "roll forward" removes over a table
        # whose staged copies are gone.  A marker with a DIFFERENT
        # token belongs to the writer that stole our lease — leave it
        # untouched.  Only roll our dots back once no marker of ours
        # remains; our dot names are unique to this stage, so removing
        # them can never touch a thief's staged files.
        mine_gone = _remove_marker_if_token(path, lease[1])
        if mine_gone:
            for dot, _ in hidden:  # nothing removed yet: clean rollback
                try:
                    fs.remove(dot)
                except OSError:
                    pass
        raise
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    # Exists-guarded like _roll_forward: if the lease outlived its TTL
    # here, a thief's recovery may already have completed this exact
    # plan — re-executing it must be a no-op, not a crash that strands
    # the marker.
    for f in old_files:
        if fs.exists(f):
            fs.remove(f)
    for dot, final in hidden:
        if fs.exists(dot):
            fs.rename(dot, final)
    _remove_marker_if_token(path, lease[1])
    return affected


def _remove_marker_if_token(path: str, token: str) -> bool:
    """Remove the commit marker iff it carries ``token`` (or is
    already gone).  Returns True when no marker OF OURS remains —
    i.e. it is safe to treat our own staged dots as uncommitted."""
    import json

    from sstable_hadoop_spark.sources import fs

    marker = os.path.join(path, UPSERT_MARKER)
    try:
        if not fs.exists(marker):
            return True
        owner = json.loads(fs.read_bytes(marker)).get("token")
        if owner == token:
            fs.remove(marker)
            return not fs.exists(marker)
        return True  # a thief's marker: not ours, leave it alone
    except ValueError:
        return False  # torn marker: could be mid-write ours — leave dots
    except OSError:
        return False


def bucketed_table(spark, table: str, path: str, schema_ddl: str,
                   bucket_by: tuple[str, ...], n_buckets: int,
                   sort_by: tuple[str, ...] = ()) -> DataFrame:
    """(Re-)declare the external bucketed table written by
    ``write_bucketed`` — CREATE TABLE IF NOT EXISTS with the matching
    CLUSTERED BY spec over the existing files — and return it.  The
    declared spec must match the writer's (bucket columns and count),
    since Spark trusts the DDL when planning exchange elimination."""
    cols = ", ".join(bucket_by)
    sort = f"SORTED BY ({', '.join(sort_by)}) " if sort_by else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} ({schema_ddl}) "
        f"USING PARQUET CLUSTERED BY ({cols}) {sort}"
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'")
    return spark.table(table)
