"""Small shared utilities."""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable


def write_once(final_dir: str, write_fn: Callable[[str], None], probe: str | None = None) -> None:
    """Build a cached directory exactly once, concurrency- and crash-safe:
    write into a UNIQUE temp sibling (mkdtemp — concurrent writers never share
    a tmp path), then atomically rename into place; losing the rename race is
    benign. ``probe`` is the completeness marker to check (e.g. a Spark
    ``_SUCCESS`` file); defaults to the directory itself, which is only safe
    when the directory appears atomically via this helper's rename."""
    probe = probe or final_dir
    if os.path.exists(probe):
        return
    if os.path.isdir(final_dir):  # exists but incomplete (stale half-write) → rebuild
        shutil.rmtree(final_dir, ignore_errors=True)
    parent = os.path.dirname(final_dir) or "."
    tmp = tempfile.mkdtemp(prefix=os.path.basename(final_dir) + ".", dir=parent)
    try:
        # write_fn gets a path INSIDE tmp so os.replace moves a fully-built dir
        target = os.path.join(tmp, "d")
        write_fn(target)
        try:
            os.replace(target, final_dir)
        except OSError:
            if not os.path.exists(probe):  # lost a benign race?
                raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
