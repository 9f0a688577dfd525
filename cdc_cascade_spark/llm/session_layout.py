"""Session-scoped on-disk layout cache for the probe-path faces.

One (applicationId, sf_dir) → directory map per layout family: the
deployment analogue is an index that lives on shared storage while
queries only probe it; locally the build runs once per session and the
bench publishes its cold cost under ``cache_backed_slots``. Shared by
``llm/retrieval_indexed.py`` and ``llm/ann_indexed.py`` (extracted in
r12 — the two modules previously carried verbatim copies of this
scaffold, which would have had to evolve in lockstep).

Bounded by construction: one entry per scale factor the session
touches. The losing builder of a race leaves an orphaned directory in
the OS tmp space (never half-used — the winner's directory is the one
published), reclaimed by tmp cleanup.
"""

from __future__ import annotations

import tempfile
import threading
from collections.abc import Callable

from pyspark.sql import SparkSession


class SessionDirCache:
    def __init__(self, prefix: str) -> None:
        self._prefix = prefix
        self._dirs: dict[tuple[str, str], str] = {}
        self._lock = threading.Lock()

    def get_or_build(
        self,
        spark: SparkSession,
        sf_dir: str,
        build: Callable[[str], None],
    ) -> str:
        """Return the session's layout dir for ``sf_dir``, running
        ``build(out_dir)`` first if this session has not built one.
        The build runs outside the lock (minutes-scale at production
        SF; it must not serialize other keys)."""
        key = (spark.sparkContext.applicationId, sf_dir)
        with self._lock:
            cached = self._dirs.get(key)
        if cached is not None:
            return cached
        out = tempfile.mkdtemp(prefix=self._prefix)
        build(out)
        with self._lock:
            return self._dirs.setdefault(key, out)
