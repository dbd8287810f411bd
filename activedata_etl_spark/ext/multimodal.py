"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (north-star §2.11): the payload is a ``binary`` column; everything
the engine needs to route/partition/filter lives in a typed ``meta``
struct (mime, byte size, checksum, source). Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so the
heavy bytes never cross a Python row boundary — one pandas batch per
parquet row-group.

The actual codec step is STUBBED (image/audio libraries are not in this
environment): ``decode_stub`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake feature
vector from the bytes. The Spark-side plumbing — schema, batching,
partition behavior — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 8

FEATURES_SCHEMA = "id bigint, mime string, n_bytes bigint, features array<double>"


def pack(df: DataFrame, id_col: str, payload_text: str, mime: str) -> DataFrame:
    """Build a multimodal frame from raw content: binary payload + meta.
    (Testdata has no true binary media; utf-8 document bytes stand in —
    the engine treats payloads as opaque either way.)"""
    payload = F.encode(F.col(payload_text), "utf-8")
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
            F.md5(F.col(payload_text)).alias("checksum"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: first FEATURE_DIM bytes,
    scaled — stable across runs/engines, shaped like an embedding."""
    head = payload[:FEATURE_DIM].ljust(FEATURE_DIM, b"\0")
    return [b / 255.0 for b in head]


def decode_stub(payload: bytes, mime: str, fake: bool = False) -> list[float]:
    if fake:
        return _fake_features(payload)
    raise NotImplementedError(
        f"no codec for {mime} in this environment; pass fake=True for the "
        "deterministic test double"
    )


RESIZED_SCHEMA = "id bigint, mime string, payload binary, width int, height int"
FRAMES_SCHEMA = "id bigint, frame_idx int, payload binary"


def resize(mm: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Image resize as an Arrow-batched transform. The codec is stubbed
    (no image libs here): fake mode truncates/pads the payload to
    width·height bytes — shape-correct plumbing, deterministic bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError("no image codec in this environment")
            yield pd.DataFrame({
                "id": pdf["id"],
                "mime": [m["mime"] for m in pdf["meta"]],
                "payload": [bytes(p[:n]).ljust(n, b"\0") for p in pdf["payload"]],
                "width": width,
                "height": height,
            })

    return mm.mapInPandas(run, RESIZED_SCHEMA)


def frame_sample(mm: DataFrame, every_n_bytes: int = 64,
                 max_frames: int = 4, fake: bool = True) -> DataFrame:
    """Video frame sampling: one input row → N frame rows (1:N mapInPandas
    fan-out, the shape a real decoder uses). Fake mode slices the payload
    at fixed offsets."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("no video codec in this environment")
            ids, idxs, payloads = [], [], []
            for pid, p in zip(pdf["id"], pdf["payload"]):
                for k in range(min(max_frames, max(1, len(p) // every_n_bytes))):
                    ids.append(pid)
                    idxs.append(k)
                    payloads.append(bytes(p[k * every_n_bytes:(k + 1) * every_n_bytes]))
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "payload": payloads})

    return mm.mapInPandas(run, FRAMES_SCHEMA)


def extract_features(mm: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over (payload, meta).

    mapInPandas keeps batch shape = Arrow record batch; at scale tune
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound the bytes
    held per batch (payloads are large; 10k rows of 1 MB images is 10 GB).
    """

    dim = FEATURE_DIM

    # self-contained closure: references only locals + pandas, so
    # cloudpickle ships it BY VALUE — workers never need to import this
    # package (the driver may run from any cwd / without our PYTHONPATH)
    def decode(payload: bytes, mime: str) -> list[float]:
        if not fake:
            raise NotImplementedError(f"no codec for {mime} in this environment")
        head = payload[:dim].ljust(dim, b"\0")
        return [b / 255.0 for b in head]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "id": pdf["id"],
                "mime": [m["mime"] for m in pdf["meta"]],
                "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                "features": [decode(p, m["mime"])
                             for p, m in zip(pdf["payload"], pdf["meta"])],
            })

    return mm.mapInPandas(run, FEATURES_SCHEMA)


def frame_energy(mm: DataFrame, frame_bytes: int = 16,
                 max_frames: int = 8, fake: bool = True) -> DataFrame:
    """Audio-style frame energy: per fixed-size payload frame, the byte
    "power" (sum and sum-of-squares) — the silence/voice-activity
    segmentation primitive of an audio pipeline, with the codec stubbed
    exactly like resize/frame_sample. Fan-out and arithmetic are real:
    1:N mapInPandas rows with integer energies, so the fake path is
    fully ORACLE-PAIRED (the only multimodal ops with driver-grade
    evidence were single-row shapes until this one)."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("energy", T.LongType()),
        T.StructField("energy_sq", T.LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("no audio codec in this environment")
            ids, idxs, lens, es, e2s = [], [], [], [], []
            for pid, p in zip(pdf["id"], pdf["payload"]):
                n = min(max_frames,
                        max(1, (len(p) + frame_bytes - 1) // frame_bytes))
                for k in range(n):
                    fr = bytes(p[k * frame_bytes:(k + 1) * frame_bytes])
                    ids.append(pid)
                    idxs.append(k)
                    lens.append(len(fr))
                    es.append(sum(fr))
                    e2s.append(sum(b * b for b in fr))
            yield pd.DataFrame({"id": ids, "frame_idx": idxs,
                                "n_bytes": lens, "energy": es,
                                "energy_sq": e2s})

    return mm.mapInPandas(run, schema)
