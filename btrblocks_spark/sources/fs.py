"""Filesystem facade: one path-string API over local disk and object stores.

The reference scans straight from S3 with its own reader
(``/root/reference/tools/conversion/decompression-speed-s3.cpp:37-110`` —
preallocated buffers + async GetObject, no Hadoop). This module is the
analog: every metadata / manifest / block-file I/O in the engine goes
through ``resolve()``, which maps a path string to a
``pyarrow.fs.FileSystem`` + in-filesystem path:

- plain paths            -> LocalFileSystem
- ``s3://`` / ``gs://``  -> pyarrow's native object-store clients
  (credentials from the standard env/instance chains)
- registered schemes     -> test/plugin filesystems (``register_scheme``),
  e.g. the in-memory mock used by the test suite

Semantics notes per backend:

- *Atomic visibility*: local writes go to a temp name + ``move`` (rename
  is atomic on POSIX). Object-store PUTs are already atomic-visible
  (readers never see partial objects), so writes go direct — a rename
  would be a non-atomic copy+delete there.
- *Directories*: object stores have none; ``mkdirs`` is a no-op for them.

Executor tasks import this module and resolve paths themselves, so the
same job runs unchanged against ``/local/dir`` or ``s3://bucket/table``
(the north rule's multi-executor topology needs no shared POSIX mount).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyarrow import fs as pafs

# Test/plugin schemes: scheme -> zero-arg factory returning a FileSystem.
# Factories should return a process-wide singleton if state must be shared.
_SCHEMES: dict[str, object] = {}

# Schemes may also be aliased via env (JSON {"scheme": "local"}) — the env
# propagates to executor Python workers, so a test can route a
# remote-looking URI through LocalFileSystem in every process and prove no
# code path silently falls back to os.* on the raw string.
_ENV_MAP = "BTRSPARK_FS_SCHEME_MAP"


def register_scheme(scheme: str, factory) -> None:
    _SCHEMES[scheme] = factory


_LOCAL_FS = pafs.LocalFileSystem()
_FS_CACHE: dict[tuple[str, str], pafs.FileSystem] = {}


class _NoRenameHandler(pafs.FileSystemHandler):
    """Local-disk-backed emulation of OBJECT-STORE semantics: direct
    PUTs, list-after-write, and NO rename (S3 has none — a move is a
    copy+delete and never atomic). Routed via the scheme map
    (``{"s3like": "s3like"}``) so executor workers resolve it too.
    Every engine path that would rely on an atomic rename raises
    NotImplementedError here — the lifecycle test proves the
    commit/maintenance protocol works without one."""

    def __init__(self):
        self._fs = pafs.LocalFileSystem()

    def get_type_name(self):
        return "s3like"

    def normalize_path(self, path):
        return self._fs.normalize_path(path)

    def get_file_info(self, paths):
        return self._fs.get_file_info(paths)

    def get_file_info_selector(self, selector):
        return self._fs.get_file_info(selector)

    def create_dir(self, path, recursive):
        self._fs.create_dir(path, recursive=recursive)

    def delete_dir(self, path):
        self._fs.delete_dir(path)

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self._fs.delete_dir_contents(path, missing_dir_ok=missing_dir_ok)

    def delete_root_dir_contents(self):
        raise NotImplementedError("refusing to clear root")

    def delete_file(self, path):
        self._fs.delete_file(path)

    def move(self, src, dest):
        raise NotImplementedError(
            "object store semantics: no rename/move (use direct PUT)"
        )

    def copy_file(self, src, dest):
        self._fs.copy_file(src, dest)

    def open_input_stream(self, path):
        return self._fs.open_input_stream(path)

    def open_input_file(self, path):
        return self._fs.open_input_file(path)

    def open_output_stream(self, path, metadata):
        return self._fs.open_output_stream(path)

    def open_append_stream(self, path, metadata):
        return self._fs.open_append_stream(path)


_S3LIKE: pafs.FileSystem | None = None


def _s3like_fs() -> pafs.FileSystem:
    global _S3LIKE
    if _S3LIKE is None:
        _S3LIKE = pafs.PyFileSystem(_NoRenameHandler())
    return _S3LIKE


def resolve(path: str) -> tuple[pafs.FileSystem, str]:
    """Path string -> (filesystem, path-within-filesystem).

    Filesystem clients are cached per (scheme, authority) — object-store
    client construction is expensive and this runs on every marker probe.
    """
    if "://" in path:
        scheme, rest = path.split("://", 1)
        if scheme in _SCHEMES:
            return _SCHEMES[scheme](), rest
        env_map = json.loads(os.environ.get(_ENV_MAP, "{}"))
        if env_map.get(scheme) == "local":
            return _LOCAL_FS, "/" + rest.lstrip("/")
        if env_map.get(scheme) == "s3like":
            return _s3like_fs(), "/" + rest.lstrip("/")
        if scheme == "file":
            return _LOCAL_FS, "/" + rest.lstrip("/")
        if scheme in ("s3", "s3a", "gs", "gcs"):
            # object stores: in-filesystem path is bucket/key (what
            # from_uri returns), so the client can be cached per bucket
            authority = rest.split("/", 1)[0]
            key = (scheme, authority)
            f = _FS_CACHE.get(key)
            if f is None:
                endpoint = os.environ.get("BTRSPARK_S3_ENDPOINT")
                if scheme in ("s3", "s3a") and endpoint:
                    # alternate S3-compatible endpoint (minio, the
                    # tools/mini_s3.py wire-protocol server in tests):
                    # same real AWS-SDK client, different host
                    f = pafs.S3FileSystem(
                        endpoint_override=endpoint,
                        scheme=os.environ.get(
                            "BTRSPARK_S3_SCHEME", "http"
                        ),
                        access_key=os.environ.get(
                            "AWS_ACCESS_KEY_ID", "btr"
                        ),
                        secret_key=os.environ.get(
                            "AWS_SECRET_ACCESS_KEY", "btr"
                        ),
                        allow_bucket_creation=True,
                        allow_bucket_deletion=True,
                    )
                else:
                    f, _ = pafs.FileSystem.from_uri(path)
                _FS_CACHE[key] = f
            return f, rest
        f, p = pafs.FileSystem.from_uri(path)
        return f, p
    return _LOCAL_FS, os.path.abspath(path)


def is_local(path: str) -> bool:
    return "://" not in path or path.startswith("file://")


def join(base: str, *parts: str) -> str:
    return "/".join([base.rstrip("/"), *parts])


def exists(path: str) -> bool:
    f, p = resolve(path)
    return f.get_file_info(p).type != pafs.FileType.NotFound


def mkdirs(path: str) -> None:
    f, p = resolve(path)
    f.create_dir(p, recursive=True)


def file_size(path: str) -> int:
    f, p = resolve(path)
    return f.get_file_info(p).size


def list_files(path: str) -> list[str]:
    """Names (not full paths) of files directly under ``path``; [] if absent."""
    f, p = resolve(path)
    try:
        infos = f.get_file_info(pafs.FileSelector(p, recursive=False))
    except (FileNotFoundError, OSError):
        return []
    return sorted(
        os.path.basename(i.path) for i in infos if i.type == pafs.FileType.File
    )


def list_dirs(path: str) -> list[str]:
    """Names of directories directly under ``path``; [] if absent."""
    f, p = resolve(path)
    try:
        infos = f.get_file_info(pafs.FileSelector(p, recursive=False))
    except (FileNotFoundError, OSError):
        return []
    return sorted(
        os.path.basename(i.path)
        for i in infos
        if i.type == pafs.FileType.Directory
    )


def mtime(path: str) -> float:
    """Modification time (epoch seconds); 0.0 when the store has none."""
    f, p = resolve(path)
    info = f.get_file_info(p)
    if info.mtime is None:
        return 0.0
    return info.mtime.timestamp()


def read_bytes(path: str) -> bytes:
    f, p = resolve(path)
    with f.open_input_stream(p) as stream:
        return stream.read()


def write_bytes_atomic(path: str, data: bytes) -> int:
    """Write with atomic visibility (temp+rename locally, direct PUT remote)."""
    f, p = resolve(path)
    if isinstance(f, pafs.LocalFileSystem):
        tmp = f"{p}.tmp-{uuid.uuid4().hex}"
        with f.open_output_stream(tmp) as stream:
            stream.write(data)
        f.move(tmp, p)
    else:
        with f.open_output_stream(p) as stream:
            stream.write(data)
    return len(data)


def create_exclusive(path: str) -> bool:
    """Best-effort exclusive create (commit lock). True if we created it.

    Local: real O_EXCL. Object stores: emulated check-then-put — a real
    deployment swaps the whole commit pointer for a catalog CAS anyway
    (see table.py commit protocol notes).
    """
    f, p = resolve(path)
    if isinstance(f, pafs.LocalFileSystem):
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        os.close(fd)
        return True
    if f.get_file_info(p).type != pafs.FileType.NotFound:
        return False
    with f.open_output_stream(p) as stream:
        stream.write(b"lock")
    return True


def file_age(path: str) -> float | None:
    """Seconds since the file's mtime, or None if it doesn't exist (or
    the store reports no mtime). Used to break dead writers' commit
    locks."""
    import datetime

    f, p = resolve(path)
    info = f.get_file_info(p)
    if info.type == pafs.FileType.NotFound or info.mtime is None:
        return None
    mt = info.mtime
    if isinstance(mt, datetime.datetime):
        mt = mt.timestamp()
    return max(0.0, time.time() - mt)


def delete_file(path: str, missing_ok: bool = True) -> None:
    f, p = resolve(path)
    try:
        f.delete_file(p)
    except FileNotFoundError:
        if not missing_ok:
            raise


def delete_dir(path: str, missing_ok: bool = True) -> None:
    """Recursively delete a directory (no-op on object stores where the
    'directory' was only ever a key prefix that is now empty)."""
    f, p = resolve(path)
    try:
        f.delete_dir(p)
    except (FileNotFoundError, OSError):
        if not missing_ok:
            raise


def read_json(path: str) -> dict:
    return json.loads(read_bytes(path).decode())


def write_json_atomic(path: str, obj: dict) -> None:
    write_bytes_atomic(path, json.dumps(obj, indent=1, default=str).encode())


def read_parquet(
    path: str,
    columns: list[str] | None = None,
    filters: list | None = None,
) -> pa.Table:
    f, p = resolve(path)
    return pq.read_table(p, filesystem=f, columns=columns, filters=filters)


def read_parquet_schema(path: str) -> pa.Schema:
    """Footer-only schema read (no data pages) — cheap per-file probe
    for schema-evolution column selection."""
    f, p = resolve(path)
    return pq.read_schema(p, filesystem=f)


def write_parquet_atomic(
    table: pa.Table, path: str, compression: str = "zstd", **kwargs
) -> int:
    f, p = resolve(path)
    target = p
    if isinstance(f, pafs.LocalFileSystem):
        target = f"{p}.tmp-{uuid.uuid4().hex}"
    with f.open_output_stream(target) as stream:
        pq.write_table(table, stream, compression=compression, **kwargs)
    if target != p:
        f.move(target, p)
    return f.get_file_info(p).size
