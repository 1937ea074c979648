"""Filesystem abstraction for table METADATA IO.

The reference's deployment is entirely object storage — the Delta table
lives on ``gs://`` (/root/reference/README.md:1170,1176-1181) and the
CDC Avro input on ``gs://`` too (README.md:264). Data IO here already
goes through Spark (object-store-ready via the Hadoop connectors); this
module gives the table layer's *metadata* IO (commit manifests, meta
files, savepoints, vacuum listings, protocol exports) the same reach:

- **Local fast path**: paths without a URI scheme use plain ``os`` /
  ``open`` calls — zero overhead change for the common case and the
  perf-sensitive manifest hot loop.
- **Hadoop path**: any ``scheme://`` URI (``gs://``, ``s3a://``,
  ``hdfs://``, ``abfss://``, and ``file://`` — the in-tree test
  vehicle) routes through the JVM Hadoop ``FileSystem`` API of the
  active SparkSession, so exactly the connectors Spark's data IO uses
  serve the metadata too.

Atomicity contract by backend:

- ``publish_exclusive`` (the OCC commit publish) is put-if-absent.
  Locally it hard-links a unique temp file into place — ``link(2)`` is
  atomic AND exclusive, unlike ``rename(2)`` which silently replaces —
  so two racing writers get exactly one winner. On Hadoop it is
  ``create(path, overwrite=false)``: atomic on HDFS (namenode),
  a generation-match conditional insert on GCS, exclusive on
  ``file://``'s RawLocalFileSystem. **Caveat**: on S3 via plain
  ``s3a://`` *without* S3 conditional writes enabled, create-exclusive
  is check-then-act and a sub-second race can lose a commit; deploy a
  log-store/catalog-based commit coordinator there (the same caveat
  Delta documents for S3 multi-cluster writes).
- ``write_atomic`` (overwrite-style metadata: checkpoints, pointer
  files, savepoints) is temp + rename. Rename is atomic on POSIX and
  HDFS; on object stores it is copy+delete, but these files are
  single-writer pointers whose readers tolerate a stale (never torn)
  view — object PUTs themselves are all-or-nothing.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

#: ``scheme:/...`` with a 2+ char scheme: accepts both the canonical
#: ``file:///x`` and Hadoop's normalized single-slash ``file:/x`` form
#: (Path.toString() emits the latter), while a bare ``/x`` stays local.
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]+:/")


def is_remote(path: str) -> bool:
    """True for ``scheme:/`` URIs (routed through Hadoop FileSystem)."""
    return bool(_SCHEME_RE.match(path))


def absolutize(path: str) -> str:
    """``os.path.abspath`` for local paths; URIs pass through unchanged
    (abspath would mangle ``scheme://`` into ``/cwd/scheme:/...``)."""
    return path if is_remote(path) else os.path.abspath(path)


def join(path: str, *parts: str) -> str:
    """Path join that is URI-safe (``/`` separator either way)."""
    if is_remote(path):
        out = path.rstrip("/")
        for p in parts:
            out += "/" + p.strip("/")
        return out
    return os.path.join(path, *parts)


def uri_path(path: str) -> str:
    """The path component of a URI (scheme/authority stripped), or the
    path itself when local. ``file:///x`` and ``file:/x`` both -> /x."""
    if not is_remote(path):
        return path
    from urllib.parse import urlparse

    return urlparse(path).path


def relpath(child: str, base: str) -> str:
    """``child`` relative to ``base``; tolerant of scheme-form drift
    (``file:///x`` vs ``file:/x``) via path-component comparison."""
    if not is_remote(child) and not is_remote(base):
        return os.path.relpath(child, base)
    c, b = child.rstrip("/"), base.rstrip("/")
    if c.startswith(b + "/"):
        return c[len(b) + 1 :]
    from urllib.parse import unquote

    cp, bp = unquote(uri_path(c)), unquote(uri_path(b))
    if cp.startswith(bp + "/"):
        return cp[len(bp) + 1 :]
    raise ValueError(f"{child!r} is not under {base!r}")


# --------------------------------------------------------------------- #
# Hadoop FileSystem plumbing (remote paths only)
# --------------------------------------------------------------------- #


def _jfs(path: str):
    """(FileSystem, jvm, Path) for a URI, from the active SparkSession's
    Hadoop configuration — the same connectors the data IO uses."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"IO on {path!r} needs an active SparkSession "
            "(Hadoop FileSystem connectors live in its JVM)"
        )
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jvm, jpath


def _java_exc_name(exc) -> str:
    try:
        return exc.java_exception.getClass().getName()
    except Exception:
        return str(exc)


# --------------------------------------------------------------------- #
# operations
# --------------------------------------------------------------------- #


def exists(path: str) -> bool:
    if not is_remote(path):
        return os.path.exists(path)
    fs, _, p = _jfs(path)
    return bool(fs.exists(p))


def isdir(path: str) -> bool:
    if not is_remote(path):
        return os.path.isdir(path)
    fs, _, p = _jfs(path)
    return bool(fs.exists(p)) and bool(fs.getFileStatus(p).isDirectory())


def listdir(path: str) -> list[str]:
    """Child NAMES (not paths) of a directory."""
    if not is_remote(path):
        return os.listdir(path)
    fs, _, p = _jfs(path)
    return [st.getPath().getName() for st in fs.listStatus(p)]


def makedirs(path: str) -> None:
    if not is_remote(path):
        os.makedirs(path, exist_ok=True)
        return
    fs, _, p = _jfs(path)
    fs.mkdirs(p)


def read_text(path: str) -> str:
    if not is_remote(path):
        with open(path) as fh:
            return fh.read()
    fs, jvm, p = _jfs(path)
    if not fs.exists(p):
        raise FileNotFoundError(path)
    stream = fs.open(p)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def _hwrite(fs, p, data: bytes, overwrite: bool) -> None:
    out = fs.create(p, overwrite)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


def write_atomic(path: str, text: str) -> None:
    """Overwrite-style metadata write: readers see old or new bytes,
    never a torn file (see module docstring for per-backend nuance)."""
    data = text.encode("utf-8")
    if not is_remote(path):
        tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, path)
        return
    fs, jvm, p = _jfs(path)
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{path}.{uuid.uuid4().hex[:8]}.tmp"
    )
    _hwrite(fs, tmp, data, True)
    if fs.exists(p):
        fs.delete(p, False)
    if not fs.rename(tmp, p):
        fs.delete(tmp, False)
        raise OSError(f"rename failed publishing {path}")


def publish_exclusive(path: str, text: str) -> None:
    """Put-if-absent publish — the OCC commit primitive. Raises
    ``FileExistsError`` when a concurrent writer already owns ``path``.

    Local: write a UNIQUE temp file, then ``os.link`` it into place.
    link(2) is atomic and fails with EEXIST if the target exists —
    unlike ``os.replace``, which would silently clobber the racing
    winner's committed version (a lost commit the conflict rules never
    see)."""
    if not is_remote(path):
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as fh:
            fh.write(text)
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise
        finally:
            os.unlink(tmp)
        return
    from py4j.protocol import Py4JJavaError

    fs, _, p = _jfs(path)
    try:
        _hwrite(fs, p, text.encode("utf-8"), False)
    except Py4JJavaError as exc:
        name = _java_exc_name(exc)
        if "AlreadyExists" in name or "already exists" in str(exc):
            raise FileExistsError(path) from None
        raise


def remove(path: str) -> None:
    if not is_remote(path):
        os.remove(path)
        return
    fs, _, p = _jfs(path)
    fs.delete(p, False)


def rmtree(path: str) -> None:
    if not is_remote(path):
        shutil.rmtree(path)
        return
    fs, _, p = _jfs(path)
    fs.delete(p, True)


def move(src: str, dst: str) -> None:
    if not is_remote(src) and not is_remote(dst):
        shutil.move(src, dst)
        return
    fs, jvm, ps = _jfs(src)
    pd = jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(ps, pd):
        raise OSError(f"rename failed: {src} -> {dst}")


def walk_files(root: str, suffix: str = "") -> list[str]:
    """Every file under ``root`` (recursive) whose name ends with
    ``suffix``, as full paths. Missing root -> []. One recursive LIST
    call on object stores (flat-namespace listing), not a per-directory
    walk."""
    out: list[str] = []
    if not is_remote(root):
        for dirpath, _dn, filenames in os.walk(root):
            for fn in filenames:
                if fn.endswith(suffix):
                    out.append(os.path.join(dirpath, fn))
        return sorted(out)
    fs, _, p = _jfs(root)
    if not fs.exists(p):
        return []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        path = st.getPath().toString()
        if path.endswith(suffix):
            out.append(path)
    return sorted(out)


def stat_identity(path: str) -> tuple:
    """(mtime, size) identity for cache keys; raises FileNotFoundError
    on missing paths on every backend."""
    if not is_remote(path):
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    from py4j.protocol import Py4JJavaError

    fs, _, p = _jfs(path)
    try:
        st = fs.getFileStatus(p)
    except Py4JJavaError as exc:
        if "FileNotFound" in _java_exc_name(exc):
            raise FileNotFoundError(path) from None
        raise
    return (st.getModificationTime(), st.getLen())


def file_size(path: str) -> int:
    if not is_remote(path):
        return os.stat(path).st_size
    fs, _, p = _jfs(path)
    return int(fs.getFileStatus(p).getLen())
