"""Filesystem helpers mirroring the reference's utils/util.py:10-59."""
from __future__ import annotations

import os
from datetime import datetime
from typing import Iterator, Optional, Tuple, Union


def get_timestamp() -> str:
    return datetime.now().strftime("%y%m%d-%H%M%S")


def mkdir_and_rename(path: str) -> None:
    """Create `path`; if it exists, archive the old one with a timestamp
    suffix first (reference utils/util.py:13-18)."""
    if os.path.exists(path):
        new_name = path + "_archived_" + get_timestamp()
        print(f"Path already exists. Rename it to [{new_name:s}]")
        os.rename(path, new_name)
    os.makedirs(path)


def scandir(
    dir_path: str,
    suffix: Optional[Union[str, Tuple[str, ...]]] = None,
    recursive: bool = False,
    full_path: bool = False,
) -> Iterator[str]:
    """Generator over files under dir_path, optionally filtered by suffix
    and recursive; dotfiles skipped (reference utils/util.py:21-59)."""
    if suffix is not None and not isinstance(suffix, (str, tuple)):
        raise TypeError('"suffix" must be a string or tuple of strings')
    root = dir_path

    def _scan(d):
        for entry in os.scandir(d):
            if not entry.name.startswith(".") and entry.is_file():
                p = entry.path if full_path else os.path.relpath(entry.path, root)
                if suffix is None or p.endswith(suffix):
                    yield p
            elif recursive and entry.is_dir():
                yield from _scan(entry.path)

    return _scan(dir_path)
