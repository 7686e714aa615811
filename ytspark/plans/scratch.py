"""Session-scoped scratch space for persisted index/store artifacts.

Registered queries that exercise the persisted-index serving shape
(MinHash store, LSH index, IVF index) need an on-disk location. A bare
``tempfile.mkdtemp`` per invocation leaks one parquet tree per run —
bench runs every query 3×, plus oracle/audit passes, so orphan
directories accumulate fast. Instead every invocation maps to ONE
stable path per (process, tag): writers use ``mode("overwrite")`` so
re-running a query rebuilds the artifact deterministically in place,
and the whole root is removed at interpreter exit.
"""

from __future__ import annotations

import atexit
import os
import re
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(tag: str) -> str:
    """Return a stable per-process scratch directory for ``tag``.

    The same tag always maps to the same path within a process, so
    repeated invocations overwrite rather than accumulate; the root is
    registered for ``atexit`` removal. Tags are sanitized to a flat
    directory name (no path traversal).
    """
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="ytspark_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    safe = re.sub(r"[^A-Za-z0-9_.-]+", "_", tag)
    path = os.path.join(_ROOT, safe)
    os.makedirs(path, exist_ok=True)
    return path
