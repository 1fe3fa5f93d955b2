"""Multimodal column handling (BASELINE.json:6): opaque binary payloads
+ typed metadata, with decode/feature-extraction as Arrow-batched
mapInPandas.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic stub (`_fake_decode`) — but everything
Spark-side is real and tested: BinaryType columns, schema declaration,
Arrow batch shapes, partition-preserving mapInPandas plumbing, and the
metadata path in pure built-ins.

Scale notes: binary payloads stay opaque bytes end-to-end (never cast
to string); mapInPandas streams Arrow batches so one task never holds
its partition's payloads as Python objects all at once; feature columns
come back as typed arrays ready for the similarity operators.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_hadoop_loader_spark.catalog import managed_persist, spread, table
from kafka_hadoop_loader_spark.registry import register


@register(
    "multimodal_meta",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS payload_bytes,
               CASE CAST(octet_length(encode(text)) % 3 AS INTEGER)
                    WHEN 0 THEN 'image/png'
                    WHEN 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS mime_guess,
               (octet_length(encode(text)) > 256) AS is_large
        FROM documents
        ORDER BY doc_id
    """,
    doc="""Typed metadata over an opaque binary column: documents' text
    re-encoded as a BinaryType payload (stand-in for image/audio bytes),
    metadata derived without ever decoding — length, mime bucketing,
    size flags.  The pattern: keep payloads opaque, compute on metadata.""",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    blen = F.length(payload).cast("bigint")
    return (
        d.select(
            "doc_id",
            blen.alias("payload_bytes"),
            F.when((blen % 3).cast("int") == 0, "image/png")
            .when((blen % 3).cast("int") == 1, "audio/wav")
            .otherwise("video/mp4")
            .alias("mime_guess"),
            (blen > 256).alias("is_large"),
        )
        .orderBy("doc_id")
    )


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("fake_width", LongType()),
        StructField("fake_height", LongType()),
        StructField("feature", ArrayType(DoubleType())),
        StructField("decoder", StringType()),
    ]
)


def _fake_decode_batches(batches):
    """DECODE STUB — deterministic fake decoder.

    A real deployment would decode image/audio bytes here (PIL/ffmpeg
    are not in this container).  The stub derives stable pseudo-features
    from the bytes so the Spark-side plumbing (Arrow batches, schema,
    array columns) is fully exercised and testable.
    """
    import numpy as np
    import pandas as pd

    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(payload, dtype=np.uint8)
            mean = float(b.mean()) if b.size else 0.0
            # fake dims: deterministic function of content length/sum
            w = int(b.size % 640) + 1
            h = int(b.sum() % 480) + 1
            feat = (b[:8].astype(np.float64) / 255.0) if b.size >= 8 else np.zeros(8)
            out.append(
                {
                    "doc_id": int(doc_id),
                    "payload_bytes": int(b.size),
                    "mean_byte": mean,
                    "fake_width": w,
                    "fake_height": h,
                    "feature": feat.tolist(),
                    "decoder": "stub-v1",
                }
            )
        yield pd.DataFrame(out)


@register(
    "multimodal_decode",
    oracle="""
        WITH b AS (
            SELECT doc_id,
                   hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS n
            FROM documents
        ),
        bytes AS (
            SELECT doc_id, i,
                   CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS INTEGER) AS v,
                   n
            FROM b, unnest(generate_series(1, n)) AS u(i)
        ),
        feat AS (
            SELECT doc_id,
                   string_agg(
                       printf('%.6f', CAST(v AS DOUBLE) / 255.0),
                       ',' ORDER BY i
                   ) AS feature_csv
            FROM bytes
            WHERE n >= 8 AND i <= 8
            GROUP BY doc_id
        )
        SELECT bytes.doc_id,
               CAST(max(n) AS BIGINT) AS payload_bytes,
               CAST(SUM(v) AS DOUBLE) / max(n) AS mean_byte,
               CAST(max(n) % 640 + 1 AS BIGINT) AS fake_width,
               CAST(SUM(v) % 480 + 1 AS BIGINT) AS fake_height,
               COALESCE(
                   max(feat.feature_csv),
                   '0.000000,0.000000,0.000000,0.000000,'
                   || '0.000000,0.000000,0.000000,0.000000'
               ) AS feature_csv,
               'stub-v1' AS decoder
        FROM bytes LEFT JOIN feat USING (doc_id)
        GROUP BY bytes.doc_id
        ORDER BY bytes.doc_id
    """,
    doc="""Decode / feature-extract via mapInPandas over binary payloads:
    Arrow-batched, schema-declared, returns typed feature vectors.  The
    decoder itself is a deterministic stub (no codecs in container, see
    _fake_decode_batches) — which makes it fully oracle-checkable: the
    oracle re-derives the byte statistics and the normalized first-8-byte
    feature vector from the hex expansion of the same payload.  The raw
    array<double> feature stays internal; the output serializes it as
    `%.6f`-formatted CSV (k/255 doubles never land on a half-ulp decimal
    boundary, so Spark's HALF_UP and C's printf agree) — collected arrays
    are unhashable in the harness's pandas canonicalization, strings sort
    fine.""",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    payloads = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    decoded = payloads.mapInPandas(_fake_decode_batches, schema=_DECODE_SCHEMA)
    return decoded.select(
        "doc_id",
        "payload_bytes",
        "mean_byte",
        "fake_width",
        "fake_height",
        F.array_join(
            F.transform("feature", lambda x: F.format_string("%.6f", x)), ","
        ).alias("feature_csv"),
        "decoder",
    ).orderBy("doc_id")


def _frame_sample_batches(batches: "Iterator") -> "Iterator":
    """FRAME-SAMPLE STUB: emit one row per sampled 'frame' (every 64th
    byte window) — the explode-shaped UDTF pattern for video."""
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            for off in range(0, n, 64):
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "frame_no": off // 64,
                        "frame_bytes": int(min(64, n - off)),
                    }
                )
        yield pd.DataFrame(rows)


@register(
    "multimodal_frame_sample",
    oracle="""
        WITH t AS (
            SELECT doc_id, octet_length(encode(text)) AS n FROM documents
        )
        SELECT doc_id, CAST(i AS BIGINT) AS frame_no,
               CAST(least(64, n - i * 64) AS BIGINT) AS frame_bytes
        FROM t, unnest(generate_series(0, CAST(ceil(n / 64.0) AS BIGINT) - 1))
                    AS u(i)
        ORDER BY doc_id, frame_no
    """,
    doc="""Frame sampling over binary payloads (video pattern): one output
    row per fixed-size window — implemented as a Pandas-batched UDTF via
    mapInPandas; the oracle reproduces the windowing arithmetic in SQL.
    Verifies the Python plumbing produces exactly the declared rows.""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    payloads = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_no", LongType()),
            StructField("frame_bytes", LongType()),
        ]
    )
    return payloads.mapInPandas(_frame_sample_batches, schema=schema).orderBy(
        "doc_id", "frame_no"
    )


_AUDIO_FRAME = 64  # "samples" (bytes) per analysis frame


_AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("energy_scaled", LongType()),
    ]
)


def _audio_energy_batches(batches):
    """AUDIO STUB — frame-energy extraction over pseudo-PCM bytes.

    A real deployment would decode compressed audio and window true PCM
    samples (no codecs in this container).  The stub treats the UTF-8
    payload bytes as 8-bit samples — the fixtures are pure ASCII, so
    byte == codepoint and the DuckDB oracle can replay the exact
    integer arithmetic with string functions.  The windowing, Arrow
    batch flow, and exact-integer energy math are the real plumbing.
    """
    import numpy as np
    import pandas as pd

    for pdf in batches:
        # fully vectorized: per-frame sums via bincount on the frame id
        # (a python dict per frame measured ~6x slower at sf0.1).  The
        # bincount weights are float64 but exact: |d*d| <= 160^2 and a
        # frame sums <= 64 of them, far inside the 2^53 integer range.
        ids, fids, ns, es = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            if b.size == 0:
                continue
            fid = np.arange(b.size) // _AUDIO_FRAME
            d = b - 96
            e = np.bincount(fid, weights=d * d).astype(np.int64)
            n = np.bincount(fid)
            ids.append(np.full(e.size, int(doc_id)))
            fids.append(np.arange(e.size))
            ns.append(n)
            es.append(e)
        if ids:
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids),
                    "frame_id": np.concatenate(fids),
                    "n_samples": np.concatenate(ns),
                    "energy_scaled": np.concatenate(es),
                }
            )
        else:
            yield pd.DataFrame(
                {"doc_id": [], "frame_id": [], "n_samples": [], "energy_scaled": []}
            ).astype("int64")


@register(
    "multimodal_audio_energy",
    oracle=f"""
        SELECT doc_id,
               (i - 1) // {_AUDIO_FRAME} AS frame_id,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(SUM(CAST(unicode(substr(text, i, 1)) - 96 AS BIGINT)
                        * CAST(unicode(substr(text, i, 1)) - 96 AS BIGINT)) AS BIGINT)
                   AS energy_scaled
        FROM documents, unnest(generate_series(1, length(text))) AS u(i)
        GROUP BY doc_id, frame_id
        ORDER BY doc_id, frame_id
    """,
    doc="""Audio-style frame feature extraction: window the payload into
    64-sample frames and compute per-frame energy Σ(sample-96)² — the
    RMS-energy shape of a voice-activity / silence-trim pass, run as
    Arrow-batched mapInPandas (numpy per batch, never per-row Python).
    Energy is EXACT integer arithmetic, so unlike the float feature
    stub (multimodal_decode) this one is fully oracle-checked: the
    fixtures are ASCII, byte == codepoint, and DuckDB replays the same
    sums with string ops.

    Scale: mapInPandas streams frames out as rows — a 10-minute clip
    becomes ~9k rows, never one giant array; partition-preserving, no
    shuffle until a consumer aggregates.  The frame grid is the time
    axis the session/window operators then work over.""",
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (unlike multimodal_arrow_checksum, this kernel fans OUT — several
    # frame rows per payload — so the wider spread pays for itself;
    # measured: warm minimum 1.07s at 32 tasks vs 1.25s at 8)
    d = spread(table(spark, sf_dir, "documents"))
    payloads = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return payloads.mapInPandas(_audio_energy_batches, _AUDIO_SCHEMA).orderBy(
        "doc_id", "frame_id"
    )


_POOL_W = 16  # fake image width in pixels (bytes)
_POOL_K = 4  # pooling kernel (KxK average pool)

_POOL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("py", LongType()),
        StructField("px", LongType()),
        StructField("n_px", LongType()),
        StructField("sum_byte", LongType()),
        StructField("mean_byte", DoubleType()),
    ]
)


def _pool_batches(batches):
    """RESIZE STUB — deterministic average-pool 'thumbnail'.

    A real deployment decodes image bytes and resizes via PIL/opencv
    (absent in this container); the stub treats the payload as a
    row-major {W}-wide grayscale grid and {K}x{K} average-pools it with
    numpy bincount — same Arrow-batched mapInPandas plumbing, schema,
    and batch shape a real resize kernel would use.  Integer sums stay
    exact (uint8 sums << 2^53), so the emitted mean is a single exact
    division both engines reproduce bitwise.
    """
    import numpy as np
    import pandas as pd

    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(payload, dtype=np.uint8)
            if b.size == 0:
                continue
            idx = np.arange(b.size)
            py = (idx // _POOL_W) // _POOL_K
            px = (idx % _POOL_W) // _POOL_K
            nx = _POOL_W // _POOL_K
            key = py * nx + px
            sums = np.bincount(key, weights=b).astype(np.int64)
            cnts = np.bincount(key)
            present = np.nonzero(cnts)[0]
            out.append(
                pd.DataFrame(
                    {
                        "doc_id": np.full(present.size, int(doc_id)),
                        "py": present // nx,
                        "px": present % nx,
                        "n_px": cnts[present],
                        "sum_byte": sums[present],
                        "mean_byte": sums[present] / cnts[present],
                    }
                )
            )
        yield pd.concat(out) if out else pd.DataFrame(
            {f.name: [] for f in _POOL_SCHEMA}
        )


@register(
    "multimodal_image_pool",
    oracle=f"""
        WITH b AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS n
            FROM documents
        ),
        bytes AS (
            SELECT doc_id, i - 1 AS idx,
                   CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS INTEGER) AS v
            FROM b, unnest(generate_series(1, n)) AS u(i)
        )
        SELECT doc_id,
               CAST((idx // {_POOL_W}) // {_POOL_K} AS BIGINT) AS py,
               CAST((idx % {_POOL_W}) // {_POOL_K} AS BIGINT) AS px,
               CAST(COUNT(*) AS BIGINT) AS n_px,
               CAST(SUM(v) AS BIGINT) AS sum_byte,
               CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_byte
        FROM bytes
        GROUP BY doc_id, py, px
        ORDER BY doc_id, py, px
    """,
    doc=f"""Image resize (average-pool {_POOL_K}x{_POOL_K}) over opaque
    binary payloads: the downsample/thumbnail step of a multimodal
    training pipeline, run as Arrow-batched mapInPandas with a numpy
    bincount kernel — one row per pooled pixel, exact integer sums.
    The pixel 'decode' is the deterministic stub (no codecs in the
    container, see _pool_batches), which is precisely what makes the
    kernel oracle-checkable: DuckDB replays it from the hex expansion.
    Scale: payloads never leave the executor, output is ~1/{_POOL_K**2}
    of input bytes, and the kernel is O(bytes) with no shuffle before
    the presentation sort.""",
)
def multimodal_image_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    payloads = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return payloads.mapInPandas(_pool_batches, schema=_POOL_SCHEMA).orderBy(
        "doc_id", "py", "px"
    )


_ARROW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_bytes", LongType()),
        StructField("crc_like", LongType()),
    ]
)


def _arrow_checksum_batches(batches):
    """mapInArrow kernel: zero-copy pyarrow RecordBatch in, RecordBatch
    out — no pandas materialization at all.  Computes payload length
    and a positional byte checksum Σ (i+1)·byte[i] mod 2^31 per row
    (CRC stand-in; exact integer arithmetic, oracle-replayable)."""
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        arr = batch.column("payload")
        if len(arr) == 0:
            continue
        # buffer-level vectorization, no per-row Python: an Arrow binary
        # array is (offsets, one contiguous value buffer), so all rows'
        # bytes process as one numpy pass + a reduceat on row starts.
        # (the to_pylist per-row loop measured ~3x slower under bench
        # contention.)  Upstream filter guarantees every payload is
        # non-empty, which reduceat requires.
        odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
            arr.offset : arr.offset + len(arr) + 1
        ].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        starts, ends = offs[:-1] - offs[0], offs[1:] - offs[0]
        seg = data[offs[0] : offs[-1]].astype(np.int64)
        lens = ends - starts
        weights = np.arange(seg.size) - np.repeat(starts, lens) + 1
        sums = np.add.reduceat(seg * weights, starts)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(lens),
                pa.array(sums % (1 << 31)),
            ],
            names=["doc_id", "payload_bytes", "crc_like"],
        )


@register(
    "multimodal_arrow_checksum",
    oracle="""
        WITH b AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS n
            FROM documents
        ),
        bytes AS (
            SELECT doc_id, i, n,
                   CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS BIGINT) AS v
            FROM b, unnest(generate_series(1, n)) AS u(i)
        )
        SELECT doc_id,
               CAST(COALESCE(MAX(n), 0) AS BIGINT) AS payload_bytes,
               CAST(COALESCE(SUM(v * i), 0) % 2147483648 AS BIGINT)
                   AS crc_like
        FROM bytes
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc="""mapInArrow over binary payloads: the third Python-execution
    tier after pandas UDFs and mapInPandas — the Arrow RecordBatch
    flows straight from the JVM into pyarrow with NO pandas conversion,
    which is the right interface when the kernel is numpy/pyarrow-
    native and per-batch pandas boxing would only add copies (binary
    columns especially: pandas wraps each payload in a Python bytes
    object; Arrow keeps one contiguous buffer).  Computes a positional
    checksum per payload — the integrity fingerprint a multimodal
    ingest writes next to each blob.  Exact integer math, oracle
    replayed from the hex expansion.  Zero shuffle before the
    presentation sort.""",
)
def multimodal_arrow_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Partitioning sized to DATA, not cores: the kernel is a single
    # vectorized pass, so per-task cost is dominated by the fixed
    # Arrow-stream + Python-task overhead (~30-100 ms each) — a 32-way
    # spread of a few MB measured 2x SLOWER than 8 tasks (straggler
    # tail of 32 tiny tasks under host load).  At 100 TB the scan
    # supplies thousands of adequately-sized partitions and no
    # repartition happens at all; 8 here keeps every task near the
    # overhead-amortizing batch size.
    d = table(spark, sf_dir, "documents").repartition(8, "doc_id")
    payloads = d.where(F.length("text") > 0).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return payloads.mapInArrow(_arrow_checksum_batches, _ARROW_SCHEMA).orderBy(
        "doc_id"
    )


_SHOT_THRESH = 20_000  # |Δ energy| boundary threshold (scaled integer)


@register(
    "multimodal_shot_boundaries",
    oracle=f"""
        WITH frames AS (
            SELECT doc_id,
                   (i - 1) // {_AUDIO_FRAME} AS frame_id,
                   CAST(SUM(CAST(unicode(substr(text, i, 1)) - 96 AS BIGINT)
                            * CAST(unicode(substr(text, i, 1)) - 96
                                   AS BIGINT)) AS BIGINT) AS energy
            FROM documents, unnest(generate_series(1, length(text))) AS u(i)
            GROUP BY doc_id, frame_id
        ),
        deltas AS (
            SELECT doc_id, frame_id, energy,
                   abs(energy - lag(energy) OVER (PARTITION BY doc_id
                                                  ORDER BY frame_id))
                       AS delta
            FROM frames
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(SUM(CASE WHEN delta > {_SHOT_THRESH} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_boundaries,
               CAST(MIN(CASE WHEN delta > {_SHOT_THRESH} THEN frame_id END)
                    AS BIGINT) AS first_boundary,
               CAST(MAX(delta) AS BIGINT) AS max_delta
        FROM deltas
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc=f"""Shot-boundary detection — the temporal segmentation step of a
    video/audio pipeline: per-frame energies (the multimodal_audio_energy
    features) diffed with lag() per document; a jump above
    {_SHOT_THRESH} marks a boundary (scene cut / silence break).  Emits
    the per-asset segmentation summary a media-curation pipeline stores:
    frame count, boundary count, first cut position, peak delta.
    Composition story: mapInPandas feature extraction feeds an ordinary
    window — once features are rows, media ops ARE relational ops.
    Exact integer energies end-to-end.  One window shuffle on doc_id +
    one aggregate on the same key.""",
)
def multimodal_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = spread(table(spark, sf_dir, "documents"))
    payloads = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    frames = payloads.mapInPandas(_audio_energy_batches, _AUDIO_SCHEMA)
    w = Window.partitionBy("doc_id").orderBy("frame_id")
    deltas = frames.select(
        "doc_id",
        "frame_id",
        F.abs(
            F.col("energy_scaled") - F.lag("energy_scaled").over(w)
        ).alias("delta"),
    )
    hit = F.col("delta") > _SHOT_THRESH
    return (
        deltas.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias("n_boundaries"),
            F.min(F.when(hit, F.col("frame_id"))).alias("first_boundary"),
            F.max("delta").alias("max_delta"),
        )
        .orderBy("doc_id")
    )


_PHASH_BUCKETS = 32  # aHash width in bits (min fixture payload is 47B)
_PHASH_BANDS = 4  # 4 bands x 8 bits: complete cover for Hamming <= 3
_PHASH_MAXH = 3


_PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def _phash_batches(batches):
    """mapInArrow kernel: 32-bit average-hash (aHash) per payload.

    PERCEPTUAL-DECODE STUB — a real deployment decodes the image,
    resizes to 8x8 luma, and thresholds against the mean (classic
    aHash); with no codecs in the container the kernel instead pools
    the RAW BYTES into 32 equal index-range buckets and sets bit b iff
    bucket b's mean byte exceeds the whole payload's mean.  Same
    fingerprint shape, same downstream banding, fully oracle-replayable
    from the hex expansion.

    Entirely buffer-level numpy (same doctrine as
    _arrow_checksum_batches): one bincount over a fused
    (row x bucket) key computes every row's 32 bucket sums in one
    pass.  The threshold is the EXACT integer cross-multiplication
    bucket_sum * payload_len > payload_sum * bucket_len — no float
    division anywhere, so DuckDB replays it bit-for-bit.  int64-safe
    while payload_len < 2^26 bytes (sum*len ~ 255n^2/32 < 2^63).
    """
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        arr = batch.column("payload")
        if len(arr) == 0:
            continue
        odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
            arr.offset : arr.offset + len(arr) + 1
        ].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        starts, ends = offs[:-1] - offs[0], offs[1:] - offs[0]
        seg = data[offs[0] : offs[-1]].astype(np.int64)
        lens = ends - starts  # upstream filter guarantees > 0
        nrows = lens.size
        idx_in_row = np.arange(seg.size) - np.repeat(starts, lens)
        nrep = np.repeat(lens, lens)
        bucket = idx_in_row * _PHASH_BUCKETS // nrep
        key = np.repeat(np.arange(nrows), lens) * _PHASH_BUCKETS + bucket
        size = nrows * _PHASH_BUCKETS
        # float64 weights are exact for integer sums < 2^53
        bsum = np.bincount(key, weights=seg, minlength=size).astype(np.int64)
        bcnt = np.bincount(key, minlength=size)
        bsum = bsum.reshape(nrows, _PHASH_BUCKETS)
        bcnt = bcnt.reshape(nrows, _PHASH_BUCKETS)
        tsum = bsum.sum(axis=1, keepdims=True)
        tcnt = lens.reshape(nrows, 1)
        bits = (bsum * tcnt > tsum * bcnt).astype(np.int64)
        phash = (bits << np.arange(_PHASH_BUCKETS, dtype=np.int64)).sum(axis=1)
        yield pa.RecordBatch.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(phash)],
            names=["doc_id", "phash"],
        )


@register(
    "multimodal_phash_dedup",
    oracle=f"""
        WITH b AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS n
            FROM documents
            WHERE octet_length(encode(text)) > 0
        ),
        bytes AS (
            SELECT doc_id, i - 1 AS idx, n,
                   CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS INTEGER) AS v
            FROM b, unnest(generate_series(1, n)) AS u(i)
        ),
        buck AS (
            SELECT doc_id, CAST(idx * {_PHASH_BUCKETS} // n AS BIGINT) AS bkt,
                   CAST(SUM(v) AS BIGINT) AS bsum,
                   CAST(COUNT(*) AS BIGINT) AS bcnt
            FROM bytes GROUP BY 1, 2
        ),
        tot AS (
            SELECT doc_id, CAST(SUM(bsum) AS BIGINT) AS tsum,
                   CAST(SUM(bcnt) AS BIGINT) AS tcnt
            FROM buck GROUP BY 1
        ),
        hashes AS (
            SELECT bk.doc_id,
                   CAST(SUM(CASE WHEN bk.bsum * t.tcnt > t.tsum * bk.bcnt
                                 THEN CAST(1 AS BIGINT)
                                      << CAST(bk.bkt AS INTEGER)
                                 ELSE 0 END) AS BIGINT) AS phash
            FROM buck bk JOIN tot t ON t.doc_id = bk.doc_id
            GROUP BY 1
        ),
        bands AS (
            SELECT doc_id, phash, band,
                   (phash >> (8 * band)) & 255 AS bval
            FROM hashes, unnest(generate_series(0, {_PHASH_BANDS - 1}))
                 AS g(band)
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_id_a, c.doc_id AS doc_id_b,
                   CAST(bit_count(xor(a.phash, c.phash)) AS BIGINT)
                       AS hamming
            FROM bands a JOIN bands c
              ON c.band = a.band AND c.bval = a.bval
             AND a.doc_id < c.doc_id
            WHERE bit_count(xor(a.phash, c.phash)) <= {_PHASH_MAXH}
        ),
        sym AS (
            SELECT doc_id_a AS doc_id, doc_id_b AS partner, hamming
            FROM pairs
            UNION ALL
            SELECT doc_id_b AS doc_id, doc_id_a AS partner, hamming
            FROM pairs
        ),
        census AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_near_dups,
                   MIN(struct_pack(h := hamming, p := partner)) AS best,
                   MAX(partner < doc_id) AS has_earlier
            FROM sym GROUP BY doc_id
        )
        SELECT h.doc_id, h.phash,
               COALESCE(c.n_near_dups, 0) AS n_near_dups,
               CAST(c.best.p AS BIGINT) AS nearest_id,
               CAST(c.best.h AS BIGINT) AS nearest_hamming,
               NOT COALESCE(c.has_earlier, FALSE) AS is_kept
        FROM hashes h LEFT JOIN census c ON c.doc_id = h.doc_id
        ORDER BY h.doc_id
    """,
    doc=f"""Perceptual-hash near-duplicate dedup over opaque binary
    payloads — the multimodal counterpart of the text tier's
    MinHash-LSH: a {_PHASH_BUCKETS}-bit average-hash per payload
    (Arrow-buffer numpy kernel, see _phash_batches), then
    {_PHASH_BANDS} bands x 8 bits banding so candidate pairs come from
    an equi-join on (band, band_value) — by pigeonhole the banding is
    a COMPLETE cover for Hamming <= {_PHASH_MAXH} (4 clean bands can't
    all be hit by 3 differing bits), so the exact bit_count(xor)
    verification on candidates loses nothing.  Output is a per-doc
    census: hash, near-dup degree, nearest partner by (hamming, id),
    and the keep-first verdict — exactly the columns a multimodal
    ingest writes next to each blob to route exact storage dedup.

    Scale: the kernel is one vectorized O(bytes) map pass; banding
    measured 2.3% pre-verify pair selectivity on the fixture (2 847
    candidates from 500 docs, all-pairs would be 124 750) and at any
    scale candidates ~ sum of band-bucket squares, never all-pairs;
    the verify + census are hash joins/aggregations on pair rows.
    All arithmetic is exact integers (cross-multiplied threshold,
    popcount), so the DuckDB oracle replays the full cascade
    bit-for-bit from the hex expansion.""",
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").repartition(8, "doc_id")
    payloads = d.where(F.length("text") > 0).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    hashes = managed_persist(
        f"multimodal_phash_dedup:hashes:{sf_dir}",
        payloads.mapInArrow(_phash_batches, _PHASH_SCHEMA),
    )
    bands = hashes.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(*[F.lit(i) for i in range(_PHASH_BANDS)])
        ).alias("band"),
    ).select(
        "doc_id",
        "phash",
        "band",
        F.expr("shiftright(phash, 8 * band) & 255").alias("bval"),
    )
    left = bands.select(
        F.col("doc_id").alias("doc_id_a"),
        F.col("phash").alias("ha"),
        "band",
        "bval",
    )
    right = bands.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("phash").alias("hb"),
        "band",
        "bval",
    )
    pairs = (
        left.join(right, ["band", "bval"])
        .where(F.col("doc_id_a") < F.col("doc_id_b"))
        .select(
            "doc_id_a",
            "doc_id_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
            .cast("bigint")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= _PHASH_MAXH)
        .distinct()
    )
    sym = pairs.select(
        F.col("doc_id_a").alias("doc_id"),
        F.col("doc_id_b").alias("partner"),
        "hamming",
    ).unionAll(
        pairs.select(
            F.col("doc_id_b").alias("doc_id"),
            F.col("doc_id_a").alias("partner"),
            "hamming",
        )
    )
    census = sym.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_near_dups"),
        F.min(F.struct("hamming", "partner")).alias("best"),
        F.max(F.col("partner") < F.col("doc_id")).alias("has_earlier"),
    )
    return (
        hashes.join(census, "doc_id", "left")
        .select(
            "doc_id",
            "phash",
            F.coalesce("n_near_dups", F.lit(0).cast("bigint")).alias(
                "n_near_dups"
            ),
            F.col("best.partner").cast("bigint").alias("nearest_id"),
            F.col("best.hamming").cast("bigint").alias("nearest_hamming"),
            (~F.coalesce("has_earlier", F.lit(False))).alias("is_kept"),
        )
        .orderBy("doc_id")
    )


@register(
    "multimodal_keyframe_select",
    oracle=f"""
        WITH frames AS (
            SELECT doc_id,
                   (i - 1) // {_AUDIO_FRAME} AS frame_id,
                   CAST(SUM(CAST(unicode(substr(text, i, 1)) - 96 AS BIGINT)
                            * CAST(unicode(substr(text, i, 1)) - 96
                                   AS BIGINT)) AS BIGINT) AS energy_scaled
            FROM documents, unnest(generate_series(1, length(text))) AS u(i)
            GROUP BY doc_id, frame_id
        ),
        flagged AS (
            SELECT doc_id, frame_id, energy_scaled,
                   CASE WHEN ABS(energy_scaled - LAG(energy_scaled) OVER w)
                             > {_SHOT_THRESH}
                        THEN 1 ELSE 0 END AS is_boundary
            FROM frames
            WINDOW w AS (PARTITION BY doc_id ORDER BY frame_id)
        ),
        shots AS (
            SELECT doc_id, frame_id, energy_scaled,
                   CAST(SUM(is_boundary) OVER (
                       PARTITION BY doc_id ORDER BY frame_id) AS BIGINT)
                       AS shot_id
            FROM flagged
        ),
        ranked AS (
            SELECT doc_id, shot_id, frame_id, energy_scaled,
                   row_number() OVER (
                       PARTITION BY doc_id, shot_id
                       ORDER BY energy_scaled DESC, frame_id) AS r,
                   CAST(COUNT(*) OVER (PARTITION BY doc_id, shot_id)
                        AS BIGINT) AS n_frames
            FROM shots
        )
        SELECT doc_id, shot_id, n_frames,
               frame_id AS keyframe_id,
               energy_scaled AS keyframe_energy
        FROM ranked WHERE r = 1
        ORDER BY doc_id, shot_id
    """,
    doc=f"""Keyframe selection — the step after shot detection in a
    video-for-training pipeline (one representative frame per shot
    feeds the vision encoder instead of every frame): frames are
    segmented into shots at the same |Δ energy| > {_SHOT_THRESH}
    boundaries multimodal_shot_boundaries reports (shot_id = running
    boundary count), and each shot elects its maximum-energy frame
    (ties to the earliest).  Emits one row per (doc, shot) with the
    shot's frame count and the elected keyframe.

    The frame 'decode' is the same deterministic pseudo-PCM stub as
    multimodal_audio_energy (no codecs in the container) — which is
    what makes the whole cascade exact-integer and oracle-replayable.

    Scale: one Arrow-batched mapInPandas pass emits frames; both
    windows (boundary lag, running shot id) and the per-shot argmax
    partition BY DOC, so no stage exceeds one clip's frames; zero
    float arithmetic anywhere.""",
)
def multimodal_keyframe_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = spread(table(spark, sf_dir, "documents"))
    payloads = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    frames = payloads.mapInPandas(_audio_energy_batches, _AUDIO_SCHEMA)
    w = Window.partitionBy("doc_id").orderBy("frame_id")
    flagged = frames.select(
        "doc_id",
        "frame_id",
        "energy_scaled",
        F.when(
            F.abs(
                F.col("energy_scaled") - F.lag("energy_scaled").over(w)
            )
            > _SHOT_THRESH,
            1,
        )
        .otherwise(0)
        .alias("is_boundary"),
    )
    shots = flagged.select(
        "doc_id",
        "frame_id",
        "energy_scaled",
        F.sum("is_boundary")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("shot_id"),
    )
    # keyframe argmax by (energy desc, frame_id asc) as MAX(struct);
    # n_frames folds into the same hash aggregate — drops the per-shot
    # Sort and both Window nodes, and the doc_id partitioning from the
    # shot windows already satisfies the (doc_id, shot_id) grouping so
    # no new exchange appears (r13; results row-identical, interleaved
    # min-of-3 0.84s -> 0.80s).
    return (
        shots.groupBy("doc_id", "shot_id")
        .agg(
            F.count("*").cast("bigint").alias("n_frames"),
            F.max(
                F.struct(
                    F.col("energy_scaled"), (-F.col("frame_id")).alias("nf")
                )
            ).alias("b"),
        )
        .select(
            "doc_id",
            "shot_id",
            "n_frames",
            (-F.col("b.nf")).alias("keyframe_id"),
            F.col("b.energy_scaled").alias("keyframe_energy"),
        )
        .orderBy("doc_id", "shot_id")
    )
