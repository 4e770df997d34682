"""Crash-safe directory swaps for bucket/partition rewriters.

The naive ``rmtree(final); rename(tmp, final)`` has a window where the
directory is simply GONE — a crash there loses state that is not
re-derivable (index buckets accumulate merge history; compacted partitions
hold corpus rows). The replace-one-file trick used by the digest indexes
is not applicable where duplicate rows are semantically wrong (posting tf
would double-count), so rewriters of those dirs use the aside protocol:

1. ``recover_aside(final)`` — heal a previous crash: if ``final.old``
   exists without ``final``, the crash happened mid-swap → restore it;
   if both exist, the swap completed → drop the stale aside.
2. build the merged/rewritten content in a tmp dir,
3. ``swap_dir_in(tmp, final)`` — rename ``final`` aside, rename ``tmp``
   in, then drop the aside. Every crash point leaves either the old dir
   (recoverable) or the new dir (complete); readers of ``final`` never
   see a mixture.

Writers MUST call :func:`recover_aside` before reading ``final`` as merge
input (step 1), or a crashed predecessor's state would be silently
treated as empty.
"""

from __future__ import annotations

import os
import shutil

ASIDE_SUFFIX = ".old"


def recover_aside(final_dir: str) -> bool:
    """Heal a crashed swap. → True if an aside dir was restored."""
    old = final_dir + ASIDE_SUFFIX
    if not os.path.isdir(old):
        return False
    if os.path.isdir(final_dir):
        # swap completed before the crash — the aside is stale
        shutil.rmtree(old, ignore_errors=True)
        return False
    os.rename(old, final_dir)
    return True


def swap_dir_in(tmp_dir: str, final_dir: str) -> None:
    """Atomically-recoverable replacement of ``final_dir`` by ``tmp_dir``."""
    old = final_dir + ASIDE_SUFFIX
    if os.path.isdir(old):
        # only reachable when final also exists (recover_aside ran first)
        shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(final_dir):
        os.rename(final_dir, old)
    os.rename(tmp_dir, final_dir)
    shutil.rmtree(old, ignore_errors=True)


def recover_all(root: str, pattern: str = "*") -> int:
    """Scan ``root`` for aside dirs matching ``pattern + ASIDE_SUFFIX`` and
    heal each (a writer's startup pass). → number restored."""
    import glob as _glob

    healed = 0
    for old in _glob.glob(os.path.join(root, pattern + ASIDE_SUFFIX)):
        if recover_aside(old[: -len(ASIDE_SUFFIX)]):
            healed += 1
    return healed
