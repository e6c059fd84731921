"""Process-scoped scratch directories for registry queries that
materialize intermediate data (snapshot tables, stream sinks, round-trip
files).

One construction site for the idiom previously copy-pasted across seven
queries (r4 review finding): pid-scoped so a concurrent driver + pytest
pair cannot clobber each other mid-run, keyed on crc32 of the sf_dir
(NOT the salted builtin hash()) so re-runs within one process reuse the
same dir, and atexit-removed so repeated driver runs don't accumulate
snapshots in tempdir.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import zlib


def scratch_dir(prefix: str, sf_dir: str,
                clean: tuple[str, ...] = ()) -> str:
    """Scratch base for (query ``prefix``, ``sf_dir``). ``clean`` names
    subdirectories to remove now (the per-invocation fresh-state subset —
    e.g. a stream checkpoint — while inputs may be reused)."""
    base = os.path.join(
        tempfile.gettempdir(),
        f"crawspark_{prefix}_{os.getpid()}_"
        f"{zlib.crc32(sf_dir.encode()):08x}")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    for sub in clean:
        shutil.rmtree(os.path.join(base, sub), ignore_errors=True)
    return base


def scratch_dir_fresh(prefix: str, sf_dir: str) -> str:
    """Like scratch_dir but the WHOLE base is cleared now (queries whose
    state must not survive a prior invocation, e.g. snapshot tables whose
    version counters would otherwise keep growing)."""
    base = scratch_dir(prefix, sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    return base
