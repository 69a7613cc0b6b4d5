"""Filesystem carrier interface for the raw-put sinks (K5-K9).

The reference talks to S3 directly from helper code
(S3FileHelper.scala:20-98: list/latest-prefix discovery, raw put,
gzip put, batched 1000-key delete); the DataFrame sinks go through
Hadoop committers and need no carrier. This module is the seam
between those raw-put semantics and the storage backend: products
call the K5-K9 functions in ``io.sinks``, which delegate to the
registered :class:`Filesystem` for the path's scheme (K7 scheme
dispatch). The local implementation ships here; an object-store
implementation (fsspec / boto3) plugs in via :func:`register_fs`
without touching any product code.

Contract notes mirrored from the reference:
- ``purge`` deletes in ≤``batch``-key batches and reports per-batch
  progress via the optional callback (S3FileHelper.scala:46-55 —
  the S3 DeleteObjects API cap; locally the batch is the unit of
  progress accounting that callers depend on).
- ``delete_prefix`` is the idempotent-overwrite primitive
  (JsonlDump.scala:72-74): remove whatever is at the path, return
  whether anything was removed.
- ``latest_prefix`` implements S4 catalog discovery: the
  lexicographically-greatest child directory (dated folders sort
  correctly — S3FileHelper.scala:27 ``.sorted.lastOption``).
"""

from __future__ import annotations

import glob as _glob
import gzip as _gzip
import os
import shutil
from collections.abc import Callable
from typing import Protocol


class Filesystem(Protocol):
    """Raw-put storage backend (K5-K9 + S4 surface)."""

    def put(self, key: str, text: str) -> str: ...

    def put_gzip(self, key: str, text: str) -> str: ...

    def read(self, key: str) -> str: ...

    def exists(self, key: str) -> bool: ...

    def delete_prefix(self, key: str) -> bool: ...

    def purge(
        self, keys: list[str], batch: int = 1000,
        on_batch: Callable[[int, int], None] | None = None,
    ) -> int: ...

    def list_prefix(self, prefix: str) -> list[str]: ...

    def latest_prefix(self, prefix: str) -> str | None: ...


class LocalFilesystem:
    """POSIX carrier — the only one runnable in this sandbox. All
    methods are executor-safe (stdlib only, no Spark imports)."""

    def put(self, key: str, text: str) -> str:
        os.makedirs(os.path.dirname(key) or ".", exist_ok=True)
        with open(key, "w", encoding="utf-8") as f:
            f.write(text)
        return key

    def put_gzip(self, key: str, text: str) -> str:
        os.makedirs(os.path.dirname(key) or ".", exist_ok=True)
        with _gzip.open(key, "wt", encoding="utf-8") as f:
            f.write(text)
        return key

    def read(self, key: str) -> str:
        opener = _gzip.open if key.endswith(".gz") else open
        with opener(key, "rt", encoding="utf-8") as f:  # type: ignore[operator]
            return f.read()

    def exists(self, key: str) -> bool:
        return os.path.exists(key)

    def delete_prefix(self, key: str) -> bool:
        if os.path.isdir(key):
            shutil.rmtree(key)
            return True
        if os.path.exists(key):
            os.remove(key)
            return True
        return False

    def purge(
        self, keys: list[str], batch: int = 1000,
        on_batch: Callable[[int, int], None] | None = None,
    ) -> int:
        removed = 0
        for i in range(0, len(keys), batch):
            n_before = removed
            for key in keys[i : i + batch]:
                if os.path.exists(key):
                    os.remove(key)
                    removed += 1
            if on_batch is not None:
                on_batch(i // batch, removed - n_before)
        return removed

    def list_prefix(self, prefix: str) -> list[str]:
        return sorted(_glob.glob(os.path.join(prefix, "*")))

    def latest_prefix(self, prefix: str) -> str | None:
        children = [p for p in self.list_prefix(prefix) if os.path.isdir(p)]
        return children[-1] if children else None


_REGISTRY: dict[str, Filesystem] = {"file": LocalFilesystem()}


def register_fs(scheme: str, fs: Filesystem) -> None:
    """Plug in a backend for a URI scheme ('s3', 'gs', …)."""
    _REGISTRY[scheme] = fs


def get_fs(path: str) -> Filesystem:
    """K7 scheme dispatch: pick the backend from the path's scheme;
    scheme-less paths are local files."""
    scheme = path.split("://", 1)[0] if "://" in path else "file"
    try:
        return _REGISTRY[scheme]
    except KeyError:
        raise NotImplementedError(
            f"no filesystem registered for scheme '{scheme}' "
            f"(register one via io.fs.register_fs)"
        ) from None


def strip_scheme(path: str) -> str:
    """Local keys for scheme-less/file paths ('file:///x' → '/x')."""
    if path.startswith("file://"):
        return path[len("file://"):]
    return path
