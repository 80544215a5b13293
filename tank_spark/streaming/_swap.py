"""Crash recovery for the compaction swap all three incremental-index
families share (text/media/semantic): the swap is write-tmp →
rename(live, live.old) → rename(tmp, live) → rmtree(live.old). A crash
between the two renames leaves NO live relation but a complete
``.old`` — every read or compaction start would then fail until
someone manually renamed it back (ADVICE r11). This helper detects
that exact window and restores the pre-compaction generation; the
interrupted compaction simply reruns later. (A surviving ``.compact``
tmp is NOT promoted — it may be half-written; the ``.old`` generation
is always a complete, valid index.)"""

from __future__ import annotations

import os


def recover_interrupted_swap(live: str) -> None:
    """If ``live`` is missing but ``live + '.old'`` survives, restore
    it. Idempotent; a no-op in every healthy state (both present =
    crash after the second rename, before the rmtree — the live
    generation is already the new one, and the compactor's own
    rmtree(old) clears the leftover)."""
    old = live + ".old"
    if not os.path.isdir(live) and os.path.isdir(old):
        os.rename(old, live)
