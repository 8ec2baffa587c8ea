"""One-generation persist caches, one slot per query family.

The rule (CLAUDE.md, pinned in tests/test_cache_isolation.py): a driver
may build several query frames before collecting any, so a persist
cache shared across families lets one family's build unpersist
another's still-unexecuted frame. Each family owns a ``GenerationSlot``
— evict your own previous generation at build start, adopt the frames
your returned plan rides, never touch another slot.

``GenerationSlot`` subclasses ``list`` so existing call sites that
``append`` into a generation (e.g. ``dedup._lsh_pair_frame``'s ``gen``
parameter) work unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class GenerationSlot(list):
    """A list of persisted frames forming ONE cache generation."""

    def evict(self) -> None:
        """Best-effort unpersist of the previous generation (frames may
        belong to a stopped session)."""
        while self:
            try:
                self.pop().unpersist()
            except Exception:
                pass

    def adopt(self, df: DataFrame) -> DataFrame:
        """Track a persisted frame in this generation; returns it."""
        self.append(df)
        return df
