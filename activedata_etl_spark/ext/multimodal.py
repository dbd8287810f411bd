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


#: aHash geometry: 64 "pixels" (the classic 8×8 average hash), split
#: into 4 bands of 16 bits for the LSH-style candidate join.
AHASH_PX = 64
AHASH_BANDS = 4
_BAND_BITS = AHASH_PX // AHASH_BANDS


def ahash_bands(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Perceptual average-hash (aHash — the classic 8×8 mean-threshold
    image fingerprint) over the multimodal payload, emitted as 4×16-bit
    band integers.

    Decode is stubbed per this module's convention: the "grayscale
    pixels" are the code points of the payload's first 64 characters
    (deterministic, engine-portable — with a real image codec the pixel
    extraction is the only stage that changes; the thresholding, band
    packing, and pair search below are codec-independent). bit_i =
    pixel_i ≥ mean, computed as ``v·64 ≥ Σv`` so the threshold is exact
    integer arithmetic with no division, and each band is Σ bit·2^j —
    everything scan-local, pure codegen, no shuffle.
    """
    c = F.rpad(F.col(text_col), AHASH_PX, " ")
    vals = [F.ascii(F.substring(c, i + 1, 1)) for i in range(AHASH_PX)]
    total = vals[0]
    for v in vals[1:]:
        total = total + v
    bands = []
    for b in range(AHASH_BANDS):
        e = None
        for j in range(_BAND_BITS):
            bit = (vals[b * _BAND_BITS + j] * AHASH_PX >= total) \
                .cast("bigint") * F.lit(1 << j)
            e = bit if e is None else e + bit
        bands.append(e.alias(f"band{b}"))
    return df.select(F.col(id_col).alias("id"), *bands)


def ahash_pairs(df: DataFrame, id_col: str, text_col: str,
                max_hamming: int = 6) -> DataFrame:
    """Perceptual near-dup pairs: documents whose aHashes differ in at
    most ``max_hamming`` of 64 bits AND share at least one exact 16-bit
    band. The band condition is the standard pigeonhole blocker (any
    pair within hamming 6 < 4 bands MUST agree on ≥1 full band... when
    the 6 flips hit ≤3 bands; a worst-case spread of ≥4 flips across all
    4 bands is missed — the documented LSH-style recall trade), so
    candidates materialize from 4 equi-joins' worth of rows, never the
    |corpus|² product.

    One-pass dedup of multi-band matches: a candidate row survives only
    where the matched band is the FIRST shared band (array_position on
    the zipped equality vector) — no distinct, no second shuffle (the
    interval-overlap first-shared-bin pattern). Output (id_a, id_b,
    hamming), exact integers end to end.
    """
    h = ahash_bands(df, id_col, text_col)
    arr = h.select("id", F.array(*[f"band{b}"
                                   for b in range(AHASH_BANDS)]).alias("bands"))
    ex = arr.select("id", "bands",
                    F.posexplode("bands").alias("bidx", "bval"))
    a = ex.select(F.col("id").alias("id_a"), F.col("bands").alias("__ba__"),
                  "bidx", "bval")
    b = ex.select(F.col("id").alias("id_b"), F.col("bands").alias("__bb__"),
                  "bidx", "bval")
    eq = F.zip_with("__ba__", "__bb__", lambda x, y: x == y)
    hamming = F.aggregate(
        F.zip_with("__ba__", "__bb__",
                   lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("bigint"), lambda acc, v: acc + v)
    return (a.join(b, ["bidx", "bval"])
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(F.array_position(eq, True) == F.col("bidx") + 1)
            .withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
