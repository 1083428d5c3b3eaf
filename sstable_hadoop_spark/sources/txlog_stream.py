"""Structured Streaming SOURCE over a transaction-log table — the
Delta streaming-source analogue for `operators/txlog.py` tables:

    spark.readStream.format("txlog").load(table_path)

streams every row COMMITTED to the table, micro-batch = a window of
commit versions.  The offset IS the version number — exact, monotonic,
replayable by construction (the property file-mtime sources have to
approximate with seen-maps and grace windows; compare
`SSTableStreamReader`, datasource.py §2.8).

Because the log journals each commit's OPERATION, the source knows
which commits change nothing logically: `compact` / `zorder` /
`rebucket` rewrite bytes, not rows, and are skipped outright — where
Delta's source makes users choose between failing and replaying the
rewritten files (`ignoreChanges` dupes).  Content-CHANGING commits
(`upsert`, `delete_dv`, `restore`) still fail loudly by default — an
insert feed cannot represent them — with the Delta-shaped escape
hatches `ignore_deletes` / `ignore_changes`.

Options:
  path                     the logged table
  starting_version         first version to EMIT (default 1 = the
                           whole table as the first batch; "latest" =
                           tail only commits after stream start)
  max_versions_per_trigger backpressure: commits admitted per batch
                           (first trigger after restart is uncapped,
                           the same coverage-regression rule as the
                           sstable stream reader)
  ignore_deletes           skip delete_dv commits (their deleted rows
                           are never retracted from the feed)
  ignore_changes           additionally re-emit the ADDED files of
                           rewriting commits (upsert/restore) as
                           inserts — Delta `ignoreChanges` semantics,
                           duplicates included; implies ignore_deletes
  with_version             append a `_commit_version` long column

Reads run on executors (one partition per added file, pyarrow →
arrow-batch transfer); the driver only folds the log.  A commit that
journals deletion vectors ON ITS OWN ADDS (a clone of a vectored
table, a restore) has those vectors applied inside ``read()`` — the
feed emits only the live rows, with no ``ignore_deletes`` opt-in
needed, because nothing is being retracted (r12).  Vacuum retention
must cover stream lag: a replayed batch whose files were reclaimed
fails loudly, exactly like Delta.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StructField, StructType

from . import fs

#: Commits that change bytes or metadata but not ROWS: invisible to
#: a row feed (the stream's schema is pinned at query start, so
#: metadata-only schema/constraint changes don't reshape it either).
_DATA_IDENTICAL_OPS = frozenset({"compact", "zorder", "rebucket",
                                 "add_columns", "drop_columns",
                                 "rename_column",
                                 "set_check", "drop_check"})
#: Commits whose adds are purely NEW rows.
_ADDITIVE_OPS = frozenset({"create", "append", "clone", "adopt"})


@dataclass
class TxlogFeedPartition(InputPartition):
    file: str
    version: int
    #: the commit's deletion-vector journal ENTRY for this file
    #: (inline base64 blob or sidecar name), applied executor-side in
    #: read() — a clone/restore commit can journal vectors on the
    #: files it adds (ADVICE r11: scanning those adds raw would
    #: silently resurrect the deleted rows)
    dv: dict | None = None


def _table_schema(path: str) -> StructType:
    import json

    from sstable_hadoop_spark.operators.txlog import txlog_snapshot

    snap = txlog_snapshot(path)
    return StructType.fromJson(json.loads(snap["schema"]))


class TxlogFeedStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema: StructType) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("txlog stream source requires a path")
        self.schema = schema
        self.with_version = str(options.get(
            "with_version", "false")).lower() == "true"
        self.ignore_changes = str(options.get(
            "ignore_changes", "false")).lower() == "true"
        self.ignore_deletes = self.ignore_changes or str(options.get(
            "ignore_deletes", "false")).lower() == "true"
        raw = (options.get("max_versions_per_trigger")
               or options.get("maxVersionsPerTrigger")
               or options.get("maxversionspertrigger"))
        self.max_versions = int(raw) if raw is not None else None
        if self.max_versions is not None and self.max_versions <= 0:
            raise ValueError("max_versions_per_trigger must be "
                             f"positive, got {self.max_versions}")
        self.starting = str(options.get("starting_version", "1"))
        # logical → PHYSICAL column names at stream start: physical
        # names never change, so reading by them stays correct even
        # when a rename commits mid-stream (the stream's logical
        # schema is pinned at query start anyway)
        from sstable_hadoop_spark.operators.txlog import (
            txlog_snapshot,
        )

        self.colmap = dict(
            txlog_snapshot(self.path).get("column_map") or {})
        # capping needs the previous end; unknown right after a
        # checkpoint restart, where a capped offset could regress
        # below the committed coverage — first trigger is uncapped,
        # the same rule the sstable stream reader pins
        self._prev: int | None = None

    # -- offsets ---------------------------------------------------
    def initialOffset(self) -> dict:
        from sstable_hadoop_spark.operators.txlog import _list_log

        if self.starting == "latest":
            commits, _ = _list_log(self.path)
            if not commits:
                raise FileNotFoundError(
                    f"no transaction log at {self.path}")
            v = commits[-1]
        else:
            v = int(self.starting) - 1  # emit starting_version itself
            if v < 0:
                raise ValueError(
                    f"starting_version must be >= 1, got "
                    f"{self.starting}")
        self._prev = v
        return {"version": v}

    def latestOffset(self) -> dict:
        from sstable_hadoop_spark.operators.txlog import _list_log

        commits, _ = _list_log(self.path)
        head = commits[-1] if commits else 0
        if self.max_versions is not None and self._prev is not None:
            head = min(head, self._prev + self.max_versions)
            head = max(head, self._prev)  # never regress
        self._prev = head
        return {"version": head}

    # -- planning --------------------------------------------------
    def partitions(self, start: dict, end: dict):
        from sstable_hadoop_spark.operators.txlog import _read_commit

        s, e = int(start["version"]), int(end["version"])
        parts: list[TxlogFeedPartition] = []
        for v in range(s + 1, e + 1):
            c = _read_commit(self.path, v)
            op = c.get("op", "?")
            if op in _DATA_IDENTICAL_OPS:
                continue
            if op in _ADDITIVE_OPS:
                pass  # adds are new rows
            elif op == "delete_dv":
                if not self.ignore_deletes:
                    raise ValueError(
                        f"commit {v} at {self.path} is a deletion "
                        "(delete_dv): an insert feed cannot retract "
                        "rows — set ignore_deletes=true to skip "
                        "deletions, or consume txlog_diff batches "
                        "for a true change feed")
                continue
            else:  # upsert / restore / unknown future ops
                if not self.ignore_changes:
                    raise ValueError(
                        f"commit {v} at {self.path} rewrites data "
                        f"(op={op}): set ignore_changes=true to "
                        "re-emit its added files as inserts (Delta "
                        "ignoreChanges semantics, duplicates "
                        "included), or consume txlog_diff batches")
            dvs = c.get("dvs") or {}
            parts.extend(
                TxlogFeedPartition(os.path.join(self.path, name), v,
                                   dvs.get(name))
                for name, _b in c.get("adds", ()))
        return parts

    # -- execution (runs on executors) -----------------------------
    def read(self, partition: TxlogFeedPartition):
        import io

        import pyarrow as pa
        import pyarrow.parquet as pq

        try:
            if fs.has_scheme(partition.file):
                src = io.BytesIO(fs.read_bytes(partition.file))
                table = pq.read_table(src)
            else:
                table = pq.read_table(partition.file)
        except (FileNotFoundError, OSError) as exc:
            raise FileNotFoundError(
                f"{partition.file} (committed in version "
                f"{partition.version}) is gone — vacuum retention "
                "must cover streaming lag; restart the stream from a "
                "fresh checkpoint to resume from the current head"
            ) from exc
        if partition.dv:
            # the commit journaled a deletion vector on this added
            # file (clone/restore): emitting the file raw would
            # resurrect the vector-deleted rows, so subtract the
            # positions here — row order of a whole-file read matches
            # the journaled row indexes by construction
            import base64
            import zlib

            import numpy as np

            entry = partition.dv
            blob = (base64.b64decode(entry["v"]) if "v" in entry
                    else fs.read_bytes(os.path.join(
                        os.path.dirname(partition.file),
                        entry["sidecar"])))
            dead = np.frombuffer(zlib.decompress(blob), dtype="<i8")
            keep = np.setdiff1d(
                np.arange(table.num_rows, dtype="<i8"), dead,
                assume_unique=True)
            table = table.take(pa.array(keep))
        cols = []
        names = []
        for f in self.schema.fields:
            if f.name == "_commit_version":
                continue
            phys = self.colmap.get(f.name, f.name)
            if phys in table.column_names:
                cols.append(table.column(phys))
            else:  # schema widened after this file was written
                from pyspark.sql.pandas.types import to_arrow_type

                cols.append(pa.nulls(table.num_rows,
                                     type=to_arrow_type(f.dataType)))
            names.append(f.name)
        if self.with_version:
            cols.append(pa.array([partition.version] * table.num_rows,
                                 type=pa.int64()))
            names.append("_commit_version")
        out = pa.table(dict(zip(names, cols))).select(names)
        yield from out.to_batches(max_chunksize=1 << 16)

    def commit(self, end: dict) -> None:
        pass  # offsets are derivable from the log; nothing to prune


class TxlogFeedDataSource(DataSource):
    """``spark.readStream.format("txlog").load(path)`` — see module
    docstring.  Batch reads of a logged table should use
    ``operators.txlog.txlog_read`` (a JVM-side explicit-file parquet
    scan with zone-map/bloom pruning; a Python batch reader here
    would only be slower)."""

    @classmethod
    def name(cls) -> str:
        return "txlog"

    def schema(self) -> StructType:
        st = _table_schema(self.options["path"])
        if str(self.options.get("with_version",
                                "false")).lower() == "true":
            st = StructType(list(st.fields) + [
                StructField("_commit_version", LongType(), False)])
        return st

    def reader(self, schema: StructType):
        raise NotImplementedError(
            "batch-read logged tables with operators.txlog.txlog_read "
            "(explicit-file JVM parquet scan); format='txlog' is the "
            "STREAMING source")

    def streamReader(self, schema: StructType) -> TxlogFeedStreamReader:
        return TxlogFeedStreamReader(dict(self.options), schema)
