"""Crash-safe directory rewrite for persisted-index maintenance.

Every purge/compact rewrites a served directory in place. Two hazards
the one-off implementations this replaces had (r10 review):

1. **Discovery-visible temp names**: a temp sibling like
   ``sbkt=3.purge.tmp`` inside a partitioned table parses as a
   partition value — a crash between write and swap left the table
   serving DUPLICATE rows (and degraded the partition column to
   string). A name like ``_sbkt=3.tmp`` is no better: anything
   containing ``=`` participates in partition inference and raises
   CONFLICTING_PARTITION_COLUMN_NAMES (found empirically by the
   swap-heal test). Temps therefore live under a ``_rewrite_tmp/``
   subdirectory of the destination's parent — an underscore-prefixed
   name with no ``=``, which Spark's listing skips entirely (the
   bm25 ``_dl`` sidecar precedent).
2. **The swap window**: a directory rename cannot atomically replace a
   non-empty directory, so there is an unavoidable instant where the
   destination is absent. The temp holds the COMPLETE new data before
   that instant, and :func:`adopt_orphans` (run at the start of every
   maintenance pass) finishes any interrupted swap — missing dest →
   rename the orphan in (it is the new data); dest present → the
   orphan is pre-swap garbage (its write, or the dest removal, never
   completed), drop it. Net contract: readers see old data or new
   data; a crash inside the swap self-heals on the next pass.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

_TMP_DIR = "_rewrite_tmp"


def _tmp_path(dest: str) -> str:
    parent, name = os.path.split(dest.rstrip("/"))
    return os.path.join(parent, _TMP_DIR, name)


def atomic_rewrite(df: DataFrame, dest: str) -> None:
    """Materialize ``df`` fully under the discovery-invisible temp
    home, then swap it over ``dest``."""
    tmp = _tmp_path(dest)
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.dirname(tmp), exist_ok=True)
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(dest, ignore_errors=True)
    os.rename(tmp, dest)
    # drop the (now empty) temp home so readers' directory listings
    # stay exactly what the writers produced
    try:
        os.rmdir(os.path.dirname(tmp))
    except OSError:
        pass  # another rewrite's temp still lives there


def adopt_orphans(root: str) -> int:
    """Finish interrupted swaps anywhere under ``root``: an orphan in a
    ``_rewrite_tmp/`` home whose destination is missing IS the complete
    new data (the swap crashed between rmtree and rename) — rename it
    in; one whose destination exists is pre-swap garbage — drop it.
    Returns the number of orphans handled."""
    handled = 0
    for dirpath, dirnames, _ in os.walk(root):
        if _TMP_DIR not in dirnames:
            continue
        home = os.path.join(dirpath, _TMP_DIR)
        for name in os.listdir(home):
            tmp = os.path.join(home, name)
            dest = os.path.join(dirpath, name)
            if os.path.isdir(dest):
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                os.rename(tmp, dest)
            handled += 1
        try:
            os.rmdir(home)
        except OSError:
            pass
        dirnames.remove(_TMP_DIR)
    return handled
