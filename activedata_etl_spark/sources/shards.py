"""WebDataset-style tar shard sink — the training-loader export format.

Training dataloaders (WebDataset & friends) stream samples from .tar
shards: each sample is a group of files sharing a key stem
(``<key>.txt``, ``<key>.json``, ``<key>.bin``…), shards are iterated
sequentially with no random access. This sink turns a DataFrame into
that layout.

Plan shape: ONE shuffle (repartition by shard id) so each shard's rows
are co-located, then each task streams its rows straight into tar
archives — one open archive per shard, one row in memory at a time, no
per-task accumulation. Rows are sorted by key within the shard so shard
content is byte-deterministic regardless of upstream partitioning.

Cluster note: tasks write to ``path`` as the executor sees it. On a real
cluster, point it at a worker-mounted shared filesystem, or swap the
``open`` for an object-store streaming upload — the iteration contract
(shard-grouped, key-sorted, streamed) is the part that matters.
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame, functions as F


def write_tar_shards(df: DataFrame, path: str, shard_col: str, key_col: str,
                     payload_cols: dict[str, str]) -> None:
    """Write ``shard-<shard>.tar`` files under ``path``.

    ``payload_cols`` maps column name → file extension: each row becomes
    ``<key>.<ext>`` members (string columns utf-8 encoded, binary
    written as-is). Shard ids should be small ints (e.g. from
    text.pack_bins or a hash bucket).

    Tasks write each archive to a task-unique temp name and atomically
    rename it onto ``shard-<id>.tar`` when the shard is complete, so a
    retried or speculative attempt never interleaves bytes with another
    attempt's archive — last completed attempt wins, and both produce the
    same bytes (content is key-sorted and deterministic). Stale
    ``shard-*.tar`` from a previous larger run are removed up front so a
    rewrite over fewer shards can't mix old archives into the result —
    as are orphaned ``*.tmp`` attempts from executors killed without a
    Python exception (the except-branch cleanup never ran for those).
    ``path`` must be shared storage visible to BOTH the driver (this
    cleanup) and every executor (the writes) — see the module note."""
    os.makedirs(path, exist_ok=True)
    for name in os.listdir(path):  # clear stale shards + dead attempts
        if name.startswith("shard-") and (name.endswith(".tar")
                                          or name.endswith(".tmp")):
            os.unlink(os.path.join(path, name))
    cols = [shard_col, key_col, *payload_cols]
    ext = dict(payload_cols)

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        attempt = TaskContext.get().taskAttemptId() if TaskContext.get() else 0
        tars: dict = {}  # shard -> (tarfile, temp path, final path)
        try:
            for r in rows:
                shard = r[shard_col]
                entry = tars.get(shard)
                if entry is None:
                    final = os.path.join(path, f"shard-{shard}.tar")
                    tmp = f"{final}.attempt-{attempt}.tmp"
                    entry = tars[shard] = (tarfile.open(tmp, "w"), tmp, final)
                t = entry[0]
                for col, e in ext.items():
                    payload = r[col]
                    data = (payload.encode("utf-8")
                            if isinstance(payload, str) else bytes(payload))
                    info = tarfile.TarInfo(name=f"{r[key_col]}.{e}")
                    info.size = len(data)
                    info.mtime = 0  # fixed: shard bytes are reproducible
                    t.addfile(info, io.BytesIO(data))
        except BaseException:
            for t, tmp, _ in tars.values():
                t.close()
                os.unlink(tmp)
            raise
        else:
            for t, tmp, final in tars.values():
                t.close()
                os.replace(tmp, final)  # atomic: complete archives only

    (df.select(*cols)
     .repartition(F.col(shard_col))
     .sortWithinPartitions(shard_col, key_col)
     .foreachPartition(write_partition))


def read_tar_shards(path: str) -> dict[str, dict[str, bytes]]:
    """Driver-side shard reader for verification: {key: {ext: bytes}}.
    (A training loader streams instead; this materializes, tests only.)"""
    out: dict[str, dict[str, bytes]] = {}
    for name in sorted(os.listdir(path)):
        if not name.endswith(".tar"):
            continue
        with tarfile.open(os.path.join(path, name)) as t:
            for m in t.getmembers():
                key, _, e = m.name.rpartition(".")
                out.setdefault(key, {})[e] = t.extractfile(m).read()
    return out
