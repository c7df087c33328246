"""Input-file listing conveniences (S21/P8/O2).

The reference lists local input files natural-sorted (natsort) while
skipping dotfiles and ``.idx`` sidecars (utils/convenience.py:105-118), then
narrows by gridded-format extension and optional any-substring file filters
before kerchunking (utils/transform.py:74-86). Same behavior here with a
stdlib natural key — these helpers feed ``read_binary_gridded`` path lists
and keep a migrator's file-selection semantics intact.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Sequence
from pathlib import Path

#: the reference's gridded-file extension whitelist (transform.py:78-80)
GRIDDED_EXTENSIONS: tuple[str, ...] = (
    ".nc", ".nc4", ".grib", ".grib1", ".grib2", ".grb1", ".grb2",
)

_CHUNKS = re.compile(r"(\d+)")


def natural_key(s: str | Path) -> tuple:
    """Sort key treating digit runs as numbers: file2 < file10 (natsort
    analog, convenience.py:116)."""
    return tuple(
        int(part) if part.isdigit() else part.lower()
        for part in _CHUNKS.split(str(s))
    )


def natsorted(items: Iterable[str | Path]) -> list:
    """Natural-sorted list — O2's ordering guarantee for file inputs."""
    return sorted(items, key=natural_key)


def input_files(root: str | Path) -> list[Path]:
    """S21: natural-sorted regular files under ``root``, skipping dotfiles
    and ``.idx`` sidecars (convenience.py:105-118)."""
    rootp = Path(root)
    return [
        e
        for e in natsorted(rootp.iterdir())
        if e.is_file() and not e.name.startswith(".") and not e.name.endswith(".idx")
    ]


def filter_gridded(paths: Iterable[Path], extensions: Sequence[str] = GRIDDED_EXTENSIONS) -> list[Path]:
    """Keep paths with a gridded-format extension (transform.py:74-81)."""
    return [p for p in paths if p.suffix in extensions]


def filter_by_substrings(paths: Iterable[Path], file_filters: Sequence[str] | None) -> list[Path]:
    """P8: keep paths containing ANY of the filter substrings — the
    reference's ``file_filters`` semantics (transform.py:82-86). ``None`` or
    empty keeps everything."""
    if not file_filters:
        return list(paths)
    return [p for p in paths if any(f in str(p) for f in file_filters)]
