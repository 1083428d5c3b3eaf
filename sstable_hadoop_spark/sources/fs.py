"""Filesystem abstraction for the SSTable source/sink.

Bare paths (no URI scheme) take the built-in ``open``/``glob`` fast
path — zero overhead for executor-local disks and unit tests.  Any
path with a scheme (``file://``, ``s3://``, ``hdfs://``, ``gs://``,
...) routes through :mod:`pyarrow.fs`, the Spark-ecosystem equivalent
of the Hadoop ``FileSystem`` API the reference is built on
(FSSeekableDataInputStream.scala:3, SSTableDataInputFormat.scala:13-18,
GenerateSSTableDataSplits.scala:218-233): the driver lists the store
once to plan splits, and each executor opens its own byte-range read
directly against the object store / DFS.

Remote reads are wrapped in a 256 KiB ``io.BufferedReader`` so the
codec's many small ``struct`` reads coalesce into object-store-sized
GETs; the chunked decompressing reader on top of this already reads
64 KiB chunks, so a compressed scan does one buffered GET per few
chunks rather than one round trip per cell.

Filesystem instances are constructed per operation (``from_uri``),
which costs milliseconds — acceptable because the engine opens O(1)
files per planned split, never per row.  Schemes pyarrow does not know
can be injected with :func:`register_scheme` (used by tests to mount a
fake remote store; a production deployment would register an
fsspec-backed handler the same way).
"""

from __future__ import annotations

import io
import os
import glob as _glob
from urllib.parse import urlsplit

__all__ = [
    "has_scheme", "resolve", "open_input", "open_output", "exists",
    "is_file", "file_size", "mtime_ns", "list_files", "list_dir",
    "makedirs", "remove", "rename", "put_file", "touch", "read_bytes",
    "write_bytes", "register_scheme", "register_exclusive_writer",
    "ExclusiveWriteUnsupported",
]

_BUFFER_SIZE = 256 * 1024

# scheme → (pyarrow.fs.FileSystem, strip_prefix) injected by
# register_scheme(); consulted before FileSystem.from_uri so tests /
# deployments can mount stores pyarrow cannot construct from a URI.
_SCHEMES: dict[str, tuple] = {}

# scheme → callable(path, data) -> bool injected by
# register_exclusive_writer(); the conditional-PUT primitive
# write_bytes_exclusive() requires for non-local schemes.
_EXCLUSIVE: dict[str, object] = {}


class ExclusiveWriteUnsupported(RuntimeError):
    """``write_bytes_exclusive`` was asked to commit on a scheme with
    no registered conditional-create primitive.  Raised instead of
    degrading to check-then-write, because a lost-update there is
    silent data corruption — the one failure mode a commit protocol
    exists to prevent."""


def register_exclusive_writer(scheme: str, writer) -> None:
    """Mount the commit arbiter for ``scheme://`` paths:
    ``writer(path: str, data: bytes) -> bool`` must be a TRUE
    conditional create — among any set of racers for one ``path``,
    exactly one returns True, and the full ``data`` is visible to
    readers no later than that return (all-or-nothing PUT).  Real
    stores have this natively: S3 ``If-None-Match: *`` (supported
    since 2024), GCS ``x-goog-if-generation-match: 0``, ABFS
    conditional create — a deployment registers a thin wrapper over
    its store's client here and the transaction log's multi-writer
    guarantee carries over unchanged."""
    _EXCLUSIVE[scheme] = writer


def register_scheme(scheme: str, filesystem, strip_netloc: bool = True):
    """Mount ``filesystem`` (a ``pyarrow.fs.FileSystem``) at
    ``scheme://``.  With ``strip_netloc`` the authority component joins
    the in-filesystem path (``mem://bucket/a`` → ``bucket/a``),
    matching pyarrow's s3/gs convention."""
    _SCHEMES[scheme] = (filesystem, strip_netloc)


def has_scheme(path: str) -> bool:
    # Windows drive letters ("C:\\") never reach here (posix runtime);
    # a scheme is ALPHA *(ALPHA/DIGIT/+/-/.) "://"
    i = path.find("://")
    return i > 0 and path[:i].replace("+", "").replace("-", "") \
                         .replace(".", "").isalnum()


def resolve(path: str):
    """URI → (pyarrow FileSystem, in-filesystem path, prefix) with
    ``prefix + in_fs_path`` reconstructing the user-visible form, so
    listings round-trip back into open calls on executors."""
    from pyarrow import fs as pafs

    sp = urlsplit(path)
    if sp.scheme in _SCHEMES:
        filesystem, strip = _SCHEMES[sp.scheme]
        fspath = (f"{sp.netloc}{sp.path}" if strip and sp.netloc
                  else sp.path.lstrip("/") if strip else sp.path)
        prefix = path[:len(path) - len(fspath)]
        return filesystem, fspath, prefix
    filesystem, fspath = pafs.FileSystem.from_uri(path)
    if path.endswith(fspath):
        prefix = path[:len(path) - len(fspath)]
    else:  # %-encoded paths: fall back to scheme+authority
        prefix = f"{sp.scheme}://{sp.netloc}"
    return filesystem, fspath, prefix


class _ArrowRaw(io.RawIOBase):
    """RawIOBase adapter over a pyarrow NativeFile so io.BufferedReader
    can coalesce the codec's small struct reads."""

    def __init__(self, nf) -> None:
        self._nf = nf

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        data = self._nf.read(len(b))
        n = len(data)
        b[:n] = data
        return n

    def seek(self, off: int, whence: int = 0) -> int:
        return self._nf.seek(off, whence)

    def tell(self) -> int:
        return self._nf.tell()

    def close(self) -> None:
        try:
            self._nf.close()
        finally:
            super().close()


def open_input(path: str):
    """Seekable binary reader for ``path`` (buffered when remote)."""
    if not has_scheme(path):
        return open(path, "rb")
    filesystem, fspath, _ = resolve(path)
    return io.BufferedReader(_ArrowRaw(filesystem.open_input_file(fspath)),
                             buffer_size=_BUFFER_SIZE)


def open_output(path: str):
    """Binary writer supporting ``write``/``tell``/context manager."""
    if not has_scheme(path):
        return open(path, "wb")
    filesystem, fspath, _ = resolve(path)
    return filesystem.open_output_stream(fspath, compression=None)


def _info(path: str):
    filesystem, fspath, _ = resolve(path)
    return filesystem.get_file_info([fspath])[0]


def exists(path: str) -> bool:
    if not has_scheme(path):
        return os.path.exists(path)
    from pyarrow import fs as pafs

    return _info(path).type != pafs.FileType.NotFound


def is_file(path: str) -> bool:
    if not has_scheme(path):
        return os.path.isfile(path)
    from pyarrow import fs as pafs

    return _info(path).type == pafs.FileType.File


def file_size(path: str) -> int:
    if not has_scheme(path):
        return os.path.getsize(path)
    return _info(path).size


def mtime_ns(path: str) -> int:
    """Modification stamp in ns; stores without mtime report 0 (their
    files then sort oldest, which only affects streaming-offset order,
    never batch correctness)."""
    if not has_scheme(path):
        return os.stat(path).st_mtime_ns
    info = _info(path)
    if info.mtime_ns is not None:
        return info.mtime_ns
    return int(info.mtime.timestamp() * 1e9) if info.mtime else 0


def list_files(path: str, suffix: str) -> list[str]:
    """Recursive suffix-filtered listing of a directory (or the path
    itself if it is a file), sorted; returned entries keep the caller's
    scheme so they can be re-opened anywhere (driver plans, executors
    read)."""
    if not has_scheme(path):
        if os.path.isfile(path):
            return [path]
        return [p for p in sorted(
                    _glob.glob(os.path.join(path, "**", f"*{suffix}"),
                               recursive=True))
                if os.path.isfile(p)]
    from pyarrow import fs as pafs

    filesystem, fspath, prefix = resolve(path)
    info = filesystem.get_file_info([fspath])[0]
    if info.type == pafs.FileType.File:
        return [path]
    if info.type == pafs.FileType.NotFound:
        return []
    sel = pafs.FileSelector(fspath, recursive=True, allow_not_found=True)
    return sorted(prefix + fi.path
                  for fi in filesystem.get_file_info(sel)
                  if fi.type == pafs.FileType.File
                  and fi.path.endswith(suffix))


def makedirs(path: str) -> None:
    if not has_scheme(path):
        os.makedirs(path, exist_ok=True)
        return
    filesystem, fspath, _ = resolve(path)
    filesystem.create_dir(fspath, recursive=True)


def remove(path: str) -> None:
    if not has_scheme(path):
        os.remove(path)
        return
    filesystem, fspath, _ = resolve(path)
    filesystem.delete_file(fspath)


def list_dir(path: str) -> list[str]:
    """NON-recursive file listing of a directory, sorted; entries keep
    the caller's scheme.  A missing directory lists as empty.  Unlike
    :func:`list_files` this never descends — the merge-on-write layout
    (operators/layout.py) keeps its staging artifacts in dot-prefixed
    children and must not see inside them."""
    if not has_scheme(path):
        if not os.path.isdir(path):
            return []
        return sorted(os.path.join(path, f) for f in os.listdir(path)
                      if os.path.isfile(os.path.join(path, f)))
    from pyarrow import fs as pafs

    filesystem, fspath, prefix = resolve(path)
    sel = pafs.FileSelector(fspath, recursive=False, allow_not_found=True)
    return sorted(prefix + fi.path
                  for fi in filesystem.get_file_info(sel)
                  if fi.type == pafs.FileType.File)


def rename(src: str, dst: str) -> None:
    """SAME-filesystem move; raises ValueError on a cross-filesystem
    pair (a cross-scheme "rename" would otherwise execute on src's
    filesystem with dst's in-filesystem path and land somewhere
    unintended — use :func:`put_file` to copy across stores).  Atomic
    on POSIX local paths (``os.replace``); on object stores this is
    pyarrow's ``move`` — typically copy+delete, NOT atomic, which is
    why the layout code orders its swap so a torn rename is
    recoverable (see operators/layout.py ``recover_upsert``)."""
    if not has_scheme(src) and not has_scheme(dst):
        os.replace(src, dst)
        return
    if has_scheme(src) != has_scheme(dst):
        raise ValueError(
            f"rename() requires one filesystem, got {src!r} -> {dst!r}")
    filesystem, s, sprefix = resolve(src)
    _, d, dprefix = resolve(dst)
    if sprefix != dprefix:
        raise ValueError(
            f"rename() requires one filesystem, got {src!r} -> {dst!r}")
    filesystem.move(s, d)


def put_file(local_src: str, dst: str) -> None:
    """COPY a local file to ``dst`` (any scheme).  The source is left
    in place — callers that want move semantics remove it themselves
    (one contract regardless of destination scheme)."""
    with open(local_src, "rb") as src, open_output(dst) as out:
        while True:
            chunk = src.read(_BUFFER_SIZE)
            if not chunk:
                break
            out.write(chunk)


def touch(path: str) -> None:
    """Best-effort: set ``path``'s mtime to now.  Real filesystems
    (bare paths and ``file://``) get a true ``os.utime``; object
    stores are a no-op because a move/copy there already stamps the
    destination with the operation time."""
    if not has_scheme(path):
        os.utime(path, None)
        return
    sp = urlsplit(path)
    if sp.scheme == "file":
        os.utime(sp.path, None)


def read_bytes(path: str) -> bytes:
    with open_input(path) as f:
        return f.read()


def write_bytes(path: str, data: bytes) -> None:
    with open_output(path) as f:
        f.write(data)


def write_bytes_atomic(path: str, data: bytes) -> None:
    """Durably PUBLISH ``data`` at ``path``: write a hidden temp
    sibling, fsync it, then rename into place and fsync the directory
    — so a reader never observes a torn file and a power loss leaves
    either the old content or the new, never a prefix (plain
    ``write_bytes`` gives no such ordering; review r7 flagged the
    upsert commit marker for exactly this).  The RENAME is the commit
    point.  Object stores get the same write-temp + move with no-op
    fsyncs: their object PUT is already all-or-nothing, the temp+move
    only keeps the final name from naming a partial multipart upload.

    Composed from the module-level ``write_bytes``/``rename`` (not
    inlined syscalls) so fault-injection harnesses that wrap those
    functions see the same operation sequence a real crash cuts."""
    import uuid

    d, base = os.path.split(path.rstrip("/"))
    tmp = os.path.join(d, f".{base}.tmp-{uuid.uuid4().hex[:8]}")
    write_bytes(tmp, data)
    _fsync_file(tmp)
    rename(tmp, path)
    _fsync_dir(d)


def write_bytes_exclusive(path: str, data: bytes) -> bool:
    """CREATE ``path`` with ``data`` iff it does not already exist;
    returns True on the win, False when someone else's file is there.
    Name and content appear ATOMICALLY: a reader that sees the path
    sees the full bytes — never a zero-length or partial file.

    This is the compare-and-swap the transaction log's commit protocol
    rides on (operators/txlog.py).  On LOCAL paths (bare and
    ``file://``) the bytes are written and fsync'd into a hidden temp
    sibling first, then ``os.link(tmp, path)`` publishes them — the
    kernel arbitrates the link (EEXIST = lost the race) and the name
    cannot exist without its content, so a writer killed mid-commit
    leaves only an invisible temp, never a torn head commit.  On
    schemes, the arbiter registered via
    :func:`register_exclusive_writer` (the store's native conditional
    PUT) decides; a scheme without one raises
    :class:`ExclusiveWriteUnsupported` rather than degrading to a
    racy exists-check + write."""
    if not has_scheme(path) or urlsplit(path).scheme == "file":
        import uuid

        local = path if not has_scheme(path) else urlsplit(path).path
        d, base = os.path.split(local)
        tmp = os.path.join(d, f".{base}.excl-{uuid.uuid4().hex[:12]}")
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, local)
        except FileExistsError:
            return False
        except OSError:
            # filesystem without hard links (some FUSE/network mounts):
            # fall back to O_EXCL create + copy — the pre-link protocol,
            # which reintroduces a sub-ms name-before-content window but
            # only on stores that cannot do better
            try:
                fd = os.open(local,
                             os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
            except FileExistsError:
                return False
            with os.fdopen(fd, "wb") as f:
                f.write(data)
                f.flush()
                os.fsync(f.fileno())
            _fsync_dir(d)
            return True
        finally:
            try:
                os.remove(tmp)
            except OSError:
                pass
        _fsync_dir(d)
        return True
    scheme = urlsplit(path).scheme
    writer = _EXCLUSIVE.get(scheme)
    if writer is None:
        raise ExclusiveWriteUnsupported(
            f"no conditional-create primitive registered for "
            f"{scheme}:// — commits there would be vulnerable to lost "
            f"updates; wrap the store's conditional PUT (S3 "
            f"If-None-Match, GCS generation 0) and mount it with "
            f"fs.register_exclusive_writer({scheme!r}, writer)")
    return bool(writer(path, data))


def _fsync_file(path: str) -> None:
    """fsync a just-written LOCAL file (no-op for object stores —
    their write is durable at PUT completion)."""
    if has_scheme(path):
        return
    try:
        fd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
    except OSError:
        pass  # best-effort: some filesystems refuse


def _fsync_dir(d: str) -> None:
    """fsync a LOCAL directory so a completed rename inside it is
    durable, not just cached (no-op for object stores)."""
    if has_scheme(d):
        return
    try:
        dfd = os.open(d or ".", os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass  # best-effort: some filesystems refuse directory fsync
