"""Report-layer formatting utilities (SURVEY.md §2.2 M7/M8).

Driver-side only — never inside a Dataset op.  Grafts:
- ``byte_display``: byteCountToDisplaySize + the 1-decimal KB/MB/GB variant
  (EntryAccumulator.java:130-140);
- ``truncate_middle``: middle-ellipsis namespace truncation and
- ``max_width``: dynamic report column width
  (EntryAccumulator.java:117-128, TailCommand.java:1650-1670).
"""

from __future__ import annotations

_UNITS = ((1 << 30, "GB"), (1 << 20, "MB"), (1 << 10, "KB"))


def byte_display(n: int) -> str:
    """1-decimal human units; bytes below 1 KB stay integral."""
    for div, unit in _UNITS:
        if n >= div:
            return f"{n / div:.1f} {unit}"
    return f"{n} B"


def truncate_middle(s: str, width: int) -> str:
    """Middle-ellipsis to ``width`` chars (min width 5)."""
    if len(s) <= width:
        return s
    width = max(width, 5)
    half = (width - 3) // 2
    return s[:half] + "..." + s[len(s) - (width - 3 - half):]


def max_width(values, header: str = "", cap: int = 60) -> int:
    """Dynamic column width over result keys, capped."""
    w = max([len(header)] + [len(str(v)) for v in values]) if values else len(header)
    return min(w, cap)
