"""Shared bench protocol helpers (one definition — three bench scripts
previously carried verbatim copies of the /proc/stat parser, which is
exactly how protocol drift starts)."""

from __future__ import annotations


def steal_jiffies():
    """(total jiffies, steal jiffies) from /proc/stat line 1."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), (vals[7] if len(vals) > 7 else 0)
