"""Multimodal column plumbing: binary payloads + typed metadata
(north-star LLM pipeline surface, SURVEY.md §7 step 8).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, partition-friendly layout,
Arrow-batched UDF signatures, batch iteration shape — is real and
tested; the actual codec calls are STUBBED (this container has no
image/audio libraries): ``decode_fn`` raises NotImplementedError unless
given a decoder, and the default test path uses a deterministic fake
extractor so the pipeline is exercisable end to end.

Scale notes (100 TB of media):
- payloads travel as Arrow binary batches through mapInPandas — one
  python worker round-trip per batch, never per row;
- metadata-only queries (filtering by mime/size/dims) never touch the
  payload column thanks to parquet column pruning;
- feature extraction emits fixed-width vectors -> downstream joins/ANN
  reuse the similarity operators.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes, metadata
    consistent with the payload (stands in for real image/audio files)."""
    df = spark.range(n).select(F.col("id").alias("media_id"))
    payload = F.encode(
        F.concat(F.lit("MEDIA:"), F.lpad(F.col("media_id").cast("string"), 12, "0")),
        "utf-8",
    )
    mime = F.when(F.col("media_id") % 3 == 0, "image/png").otherwise("image/jpeg")
    return df.select(
        "media_id",
        payload.alias("payload"),
        F.struct(
            mime.alias("mime"),
            ((F.col("media_id") % 16 + 1) * 64).cast("int").alias("width"),
            ((F.col("media_id") % 9 + 1) * 64).cast("int").alias("height"),
            F.length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder+embedder: bytes -> 8
    floats from a rolling byte sum (stable across engines/runs)."""
    acc = [0.0] * FEATURE_DIM
    for i, b in enumerate(payload):
        acc[i % FEATURE_DIM] += (b % 97) / 97.0
    # NOTE: no rounding here — Python round() is half-to-even while SQL
    # round() is half-away-from-zero. Callers that value-compare round
    # Spark-side (F.round) so both engines share rounding semantics.
    return acc


def stub_decoder(payload: bytes) -> bytes:
    """The real codec boundary. Container has no media libs (SURVEY.md
    build constraints): decoding is explicitly not implemented."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "environment; pass decode_fn=... to extract_features"
    )


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """Arrow-batched feature extraction via mapInPandas.

    ``decode_fn``: bytes -> fixed-width feature vector. Defaults to the
    deterministic fake so the plumbing is testable; a real deployment
    passes the actual decode+embed closure.
    """
    fn = decode_fn or _fake_features

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] if m is not None else None for m in pdf["meta"]],
                    "feature": [fn(bytes(p)) for p in pdf["payload"]],
                }
            )
            yield out

    return media.mapInPandas(_extract, FEATURES_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — never reads the payload column (check
    the scan's ReadSchema: payload must be absent)."""
    return media.groupBy(F.col("meta.mime").alias("mime")).agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.round(F.avg(F.col("meta.width") * F.col("meta.height")), 2).alias("avg_pixels"),
    )


# --------------------------------------------------------------------------
# Registered oracle-checked queries: the synthetic media table and the
# fake extractor are both deterministic ("MEDIA:"+zero-padded id bytes,
# rolling byte sum), so the full Arrow mapInPandas plumbing is
# value-checkable against a pure-SQL re-derivation — the strongest
# check available for a stubbed-codec path.
# --------------------------------------------------------------------------
from ..registry import register  # noqa: E402  (registered queries below)

MM_N_MEDIA = 200


@register(
    "mm_media_features",
    oracle=f"""
    WITH m AS (SELECT unnest(generate_series(0, {MM_N_MEDIA - 1})) AS media_id),
    s AS (
      SELECT media_id,
             'MEDIA:' || lpad(CAST(media_id AS VARCHAR), 12, '0') AS payload
      FROM m
    ),
    ch AS (
      SELECT media_id, payload,
             unnest(generate_series(0, len(payload) - 1)) AS i
      FROM s
    ),
    slot AS (
      SELECT media_id, i, i % {FEATURE_DIM} AS dim,
             (ascii(substr(payload, i + 1, 1)) % 97) / 97.0 AS v
      FROM ch
    ),
    feat AS (
      SELECT media_id, dim, round(sum(v ORDER BY i), 6) AS val
      FROM slot GROUP BY 1, 2
    )
    SELECT media_id,
           CASE WHEN media_id % 3 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS mime,
           CAST(dim AS INTEGER) AS dim, val
    FROM feat
    ORDER BY media_id, dim
    """,
)
def mm_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction, long-format for value checks.

    ``sf_dir`` is unused: media is the deterministic synthetic table
    (the test container ships no image/audio codecs — SURVEY.md §7
    step 8 stubs decode, keeps the Spark plumbing real). The oracle
    re-derives the rolling-byte-sum features in pure SQL, so a drift in
    batch iteration, Arrow binary handling, or the UDF signature shows
    up as a value mismatch, not just a row count.
    """
    feats = extract_features(synthetic_media(spark, MM_N_MEDIA))
    return (
        feats.select("media_id", "mime", F.posexplode("feature").alias("dim", "_raw"))
        # Spark-side SQL round so the rounding algorithm (half-away-from
        # -zero) matches the DuckDB oracle's round(); the Python
        # extractor emits raw doubles.
        .select("media_id", "mime", "dim", F.round("_raw", 6).alias("val"))
        .orderBy("media_id", "dim")
    )


@register(
    "mm_media_stats",
    oracle=f"""
    WITH m AS (SELECT unnest(generate_series(0, {MM_N_MEDIA - 1})) AS media_id),
    meta AS (
      SELECT media_id,
             CASE WHEN media_id % 3 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS mime,
             (media_id % 16 + 1) * 64 AS width,
             (media_id % 9 + 1) * 64 AS height,
             18 AS n_bytes
      FROM m
    )
    SELECT mime, CAST(count(*) AS BIGINT) AS n_media,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           round(avg(width * height), 2) AS avg_pixels
    FROM meta GROUP BY mime ORDER BY mime
    """,
)
def mm_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only media aggregate — the plan must never touch the
    payload column (column pruning over the nested struct; see
    test_plan_quality's ReadSchema checks for the scan-side analog)."""
    return media_stats(synthetic_media(spark, MM_N_MEDIA)).orderBy("mime")


# --------------------------------------------------------------------------
# Frame sampling: the video path of the pipeline. Uniformly sample K
# frame indices per clip (count derived from metadata), "decode" each
# sampled frame (stub = md5 of payload bytes + index — the real
# deployment swaps in an actual frame grab), and emit one row per
# sampled frame. mapInPandas keeps the fan-out inside the Arrow batch:
# no shuffle happens until something aggregates the frames.
# --------------------------------------------------------------------------
FRAME_SAMPLES = 4


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH m AS (SELECT unnest(generate_series(0, {MM_N_MEDIA - 1})) AS media_id),
    clip AS (
      SELECT media_id,
             'MEDIA:' || lpad(CAST(media_id AS VARCHAR), 12, '0') AS payload,
             (media_id % 16 + 1) * 8 AS n_frames
      FROM m
    ),
    j AS (SELECT unnest(generate_series(0, {FRAME_SAMPLES - 1})) AS j),
    sampled AS (
      SELECT c.media_id, c.n_frames,
             CAST(j.j * c.n_frames / {FRAME_SAMPLES} AS BIGINT) AS frame_idx,
             md5(c.payload || ':' || CAST(CAST(j.j * c.n_frames / {FRAME_SAMPLES} AS BIGINT) AS VARCHAR)) AS frame_md5
      FROM clip c CROSS JOIN j
    )
    SELECT media_id, CAST(n_frames AS INTEGER) AS n_frames, frame_idx, frame_md5
    FROM sampled
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform {FRAME_SAMPLES}-frame sample per synthetic clip.

    Frame count comes from metadata (width/8 — stands in for
    container-header duration); sampled indices are
    ``j * n_frames // {FRAME_SAMPLES}``; the per-frame fingerprint is
    the stub decode (md5 of payload bytes + frame index, computed with
    hashlib inside the Arrow batch). The oracle re-derives every
    fingerprint in SQL, so batch iteration, binary handling, and the
    integer sampling arithmetic are all value-checked.
    """
    import hashlib

    media = synthetic_media(spark, MM_N_MEDIA).select(
        "media_id", "payload", (F.col("meta.width") / 8).cast("int").alias("n_frames")
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nfs, idxs, hashes = [], [], [], []
            for mid, payload, nf in zip(pdf["media_id"], pdf["payload"], pdf["n_frames"]):
                p = bytes(payload)
                for j in range(FRAME_SAMPLES):
                    idx = j * int(nf) // FRAME_SAMPLES
                    ids.append(mid)
                    nfs.append(nf)
                    idxs.append(idx)
                    hashes.append(hashlib.md5(p + f":{idx}".encode()).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "n_frames": nfs, "frame_idx": idxs, "frame_md5": hashes}
            )

    return media.mapInPandas(
        _sample,
        "media_id bigint, n_frames int, frame_idx bigint, frame_md5 string",
    )


# --------------------------------------------------------------------------
# Patch-grid planning — the ViT-preprocessing plumbing computed
# relationally from METADATA ONLY: each media row expands to its
# 64x64-pixel patch grid (explode over the (i, j) index space) with
# the byte offset each patch's first pixel would have in a row-major
# RGB layout. The decode itself stays behind the documented codec
# stub; what a 100 TB preprocessing job actually schedules — which
# byte ranges to read for which patch — is exactly this relation, and
# it never touches the payload column.
#
# Exactness: all integer arithmetic on metadata. Scale: map-side
# sequence explode (patch count bounded by metadata), one mime-grain
# rollup.
# --------------------------------------------------------------------------
MM_PATCH_PX = 64
MM_BYTES_PER_PIXEL = 3


@register(
    "mm_patch_grid",
    oracle=f"""
    WITH media AS (
      SELECT id AS media_id,
             CASE WHEN id % 3 = 0 THEN 'image/png'
                  ELSE 'image/jpeg' END AS mime,
             CAST((id % 16 + 1) * 64 AS BIGINT) AS width,
             CAST((id % 9 + 1) * 64 AS BIGINT) AS height
      FROM (SELECT unnest(range(0, 100)) AS id)
    ),
    grid AS (
      SELECT media_id, mime, width, height,
             width // {MM_PATCH_PX} AS px, height // {MM_PATCH_PX} AS py
      FROM media
    ),
    patches AS (
      SELECT g.media_id, g.mime,
             (j.j * {MM_PATCH_PX} * g.width + i.i * {MM_PATCH_PX})
                 * {MM_BYTES_PER_PIXEL} AS byte_offset
      FROM grid g,
           unnest(generate_series(0, g.px - 1)) AS i(i),
           unnest(generate_series(0, g.py - 1)) AS j(j)
    )
    SELECT mime,
           CAST(count(DISTINCT media_id) AS BIGINT) AS n_media,
           CAST(count(*) AS BIGINT) AS total_patches,
           round(count(*) * 1.0 / count(DISTINCT media_id), 2)
               AS avg_patches_per_media,
           CAST(max(byte_offset) AS BIGINT) AS max_patch_offset
    FROM patches GROUP BY mime
    """,
)
def mm_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-mime {MM_PATCH_PX}px patch-grid plan (patch counts and
    byte-range offsets) from media metadata only — the preprocessing
    scheduler's relation; payload never read."""
    media = synthetic_media(spark)
    grid = media.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").cast("bigint").alias("width"),
        F.col("meta.height").cast("bigint").alias("height"),
    ).select(
        "media_id",
        "mime",
        "width",
        F.expr(f"width DIV {MM_PATCH_PX}").alias("px"),
        F.expr(f"height DIV {MM_PATCH_PX}").alias("py"),
    )
    patches = (
        grid.select(
            "media_id",
            "mime",
            "width",
            F.explode(F.sequence(F.lit(0), F.col("px") - 1)).alias("i"),
            "py",
        )
        .select(
            "media_id",
            "mime",
            "width",
            "i",
            F.explode(F.sequence(F.lit(0), F.col("py") - 1)).alias("j"),
        )
        .select(
            "media_id",
            "mime",
            (
                (F.col("j") * MM_PATCH_PX * F.col("width") + F.col("i") * MM_PATCH_PX)
                * MM_BYTES_PER_PIXEL
            ).alias("byte_offset"),
        )
    )
    return patches.groupBy("mime").agg(
        F.countDistinct("media_id").cast("bigint").alias("n_media"),
        F.count(F.lit(1)).cast("bigint").alias("total_patches"),
        F.round(F.count(F.lit(1)) * 1.0 / F.countDistinct("media_id"), 2).alias(
            "avg_patches_per_media"
        ),
        F.max("byte_offset").cast("bigint").alias("max_patch_offset"),
    )


# --------------------------------------------------------------------------
# Payload-level exact dedup — the first pass of every multimodal
# ingest (identical re-uploads are by far the most common duplicate
# class): fingerprint the binary payload (md5 over the bytes), keep
# the earliest media_id per fingerprint, report the cluster-size
# histogram and the dedup ratio. The synthetic upload stream maps
# {MM_DEDUP_UPLOADS} uploads onto {MM_DEDUP_DISTINCT} distinct
# payloads (deterministic modulo), so both engines rebuild identical
# fingerprints; at production scale this is a single shuffle on the
# 16-byte digest — the dd_exact_dedup shape applied to binary columns.
# --------------------------------------------------------------------------
MM_DEDUP_UPLOADS = 200
MM_DEDUP_DISTINCT = 150


@register(
    "mm_payload_dedup",
    oracle=f"""
    WITH up AS (
      SELECT unnest(generate_series(0, {MM_DEDUP_UPLOADS - 1})) AS upload_id
    ),
    payloads AS (
      SELECT upload_id,
             md5('MEDIA:' || lpad(CAST(upload_id % {MM_DEDUP_DISTINCT}
                                       AS VARCHAR), 12, '0')) AS fp
      FROM up
    ),
    clusters AS (
      SELECT fp, CAST(count(*) AS BIGINT) AS n_uploads,
             CAST(min(upload_id) AS BIGINT) AS keeper_id
      FROM payloads GROUP BY fp
    )
    SELECT n_uploads AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(n_uploads) AS BIGINT) AS n_total_uploads,
           CAST(sum(n_uploads) - count(*) AS BIGINT) AS n_duplicates
    FROM clusters
    GROUP BY n_uploads
    """,
)
def mm_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload exact-dedup cluster histogram (md5 fingerprints
    over the synthetic upload stream, keep-earliest survivorship)."""
    up = spark.range(MM_DEDUP_UPLOADS).select(F.col("id").alias("upload_id"))
    payload = F.encode(
        F.concat(
            F.lit("MEDIA:"),
            F.lpad(
                (F.col("upload_id") % MM_DEDUP_DISTINCT).cast("string"),
                12,
                "0",
            ),
        ),
        "utf-8",
    )
    payloads = up.select("upload_id", F.md5(payload).alias("fp"))
    clusters = payloads.groupBy("fp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_uploads"),
        F.min("upload_id").cast("bigint").alias("keeper_id"),
    )
    return clusters.groupBy(
        F.col("n_uploads").alias("cluster_size")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("n_uploads").cast("bigint").alias("n_total_uploads"),
        (F.sum("n_uploads") - F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_duplicates"),
    )


# --------------------------------------------------------------------------
# Perceptual near-duplicate detection (dHash): the standard image-dedup
# operator a multimodal corpus runs after exact payload dedup —
# re-encoded/slightly-retouched copies share no md5 but land within a
# few bits in difference-hash space. Pipeline shape (the part that must
# scale): decode -> 8x9 grayscale grid -> 64-bit dHash packed as FOUR
# 16-bit bands -> banded EQUI-JOIN on (band_id, band_value) for
# candidates (pigeonhole: hamming <= 3 guarantees one identical band;
# never an all-pairs cross join) -> exact hamming verify on the
# candidates only. That is dd_minhash_lsh_pairs' bucketing discipline
# applied to image space.
#
# The DECODE step is the documented stub seam (no image libs in this
# container): pixels come from a deterministic md5-derived fake
# luminance grid — per-(base, row) md5, one hex digit per column — and
# "re-encodes" (variant 1/2 of each base image) perturb exactly one
# pixel, flipping <=2 dHash bits, which is what a real JPEG re-encode
# does to a real dHash. Determinism makes the WHOLE pipeline — banding,
# candidate join, hamming verify, precision/recall — value-checkable in
# DuckDB, the strongest available check for a stubbed-codec path (same
# policy as mm_media_features).
# --------------------------------------------------------------------------
PH_N_BASE = 40
PH_VARIANTS = 3  # original + two perturbed re-encodes per base
PH_HAM_MAX = 8
_PH_PERTURB = {1: (3, 5), 2: (6, 1)}  # variant -> perturbed (row, col)


def _ph_px_sql(r: int, c: int) -> str:
    base = (
        f"('0x' || substr(md5(CAST(u % {PH_N_BASE} AS VARCHAR) || ':{r}'), "
        f"{c + 1}, 1))::INT"
    )
    for v, (pr, pc) in _PH_PERTURB.items():
        if (r, c) == (pr, pc):
            return (
                f"CASE WHEN u // {PH_N_BASE} = {v} THEN ({base} + 8) % 16 "
                f"ELSE {base} END"
            )
    return base


def _ph_band_sql(b: int) -> str:
    bits = []
    for ro in range(2):
        r = 2 * b + ro
        for c in range(8):
            bits.append(
                f"(CASE WHEN ({_ph_px_sql(r, c + 1)}) > ({_ph_px_sql(r, c)}) "
                f"THEN {1 << (8 * ro + c)} ELSE 0 END)"
            )
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


_PH_N_UP = PH_N_BASE * PH_VARIANTS
_PH_ORACLE = f"""
WITH up AS (
  SELECT unnest(generate_series(0, {_PH_N_UP - 1})) AS u
),
hashed AS (
  SELECT u, {", ".join(f"{_ph_band_sql(b)} AS band{b}" for b in range(4))}
  FROM up
),
bands AS (
  {" UNION ALL ".join(
      f"SELECT u, {b} AS band_id, band{b} AS val FROM hashed"
      for b in range(4)
  )}
),
cand AS (
  SELECT DISTINCT a.u AS ua, b.u AS ub
  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.val = b.val
  WHERE a.u < b.u
),
verified AS (
  SELECT c.ua, c.ub,
         CAST({" + ".join(
             f"bit_count(xor(x.band{b}, y.band{b}))" for b in range(4)
         )} AS BIGINT) AS hamming,
         CASE WHEN x.u % {PH_N_BASE} = y.u % {PH_N_BASE} THEN 1 ELSE 0 END
             AS same_base
  FROM cand c
  JOIN hashed x ON x.u = c.ua
  JOIN hashed y ON y.u = c.ub
)
SELECT CAST({_PH_N_UP * (_PH_N_UP - 1) // 2} AS BIGINT) AS n_all_pairs,
       CAST(count(*) AS BIGINT) AS n_candidate_pairs,
       CAST(sum(CASE WHEN hamming <= {PH_HAM_MAX} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_verified_pairs,
       CAST({PH_N_BASE * PH_VARIANTS * (PH_VARIANTS - 1) // 2} AS BIGINT)
           AS n_true_pairs,
       CAST(sum(CASE WHEN hamming <= {PH_HAM_MAX} AND same_base = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_verified_true
FROM verified
"""


def _ph_px_from_md5(r: int, c: int):
    """Pixel (r, c) from the already-projected per-row md5 column
    ``m{r}`` — same value as the former inline expression."""
    base = F.conv(F.substring(F.col(f"m{r}"), c + 1, 1), 16, 10).cast("int")
    for v, (pr, pc) in _PH_PERTURB.items():
        if (r, c) == (pr, pc):
            return F.when(
                (F.col("u") / PH_N_BASE).cast("int") == v,
                (base + 8) % 16,
            ).otherwise(base)
    return base


def _ph_hashed(up):
    """(u, band0..band3) via LAYERED projections — round-10
    optimization (guide §1.2 per-task work): the former single-select
    band expressions inlined the md5 + hex-digit subtree per
    comparison operand (~32 md5 subtrees per band, 128 per row), which
    both bloated the generated code and re-evaluated each pixel twice.
    Three stacked Projects (md5 strings -> pixel ints -> band bits)
    pin one evaluation per md5 and per pixel; the band bit formula and
    every per-pixel expression are unchanged, so the values are
    identical."""
    m = up.select(
        "u",
        *[
            F.md5(
                F.concat(
                    (F.col("u") % PH_N_BASE).cast("string"), F.lit(f":{r}")
                )
            ).alias(f"m{r}")
            for r in range(8)
        ],
    )
    px = m.select(
        "u", *[_ph_px_from_md5(r, c).alias(f"px_{r}_{c}") for r in range(8) for c in range(9)]
    )
    bands = []
    for b in range(4):
        acc = F.lit(0)
        for ro in range(2):
            r = 2 * b + ro
            for c in range(8):
                acc = acc + F.when(
                    F.col(f"px_{r}_{c + 1}") > F.col(f"px_{r}_{c}"),
                    F.lit(1 << (8 * ro + c)),
                ).otherwise(F.lit(0))
        bands.append(acc.cast("bigint").alias(f"band{b}"))
    return px.select("u", *bands)


@register("mm_phash_neardup", oracle=_PH_ORACLE)
def mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dHash perceptual near-dup sweep over the synthetic re-encode
    stream: banded candidate join + exact hamming verify, reported as
    one row of pruning/precision/recall counts."""
    up = spark.range(_PH_N_UP).select(F.col("id").alias("u"))
    hashed = _ph_hashed(up).persist()
    bands = hashed.select(
        "u",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.col(f"band{b}").alias("val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bv"),
    ).select("u", "bv.band_id", "bv.val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.u") < F.col("b.u")),
        )
        .select(F.col("a.u").alias("ua"), F.col("b.u").alias("ub"))
        .distinct()
    )
    x = hashed.select(
        F.col("u").alias("ua"), *[F.col(f"band{b}").alias(f"xa{b}") for b in range(4)]
    )
    y = hashed.select(
        F.col("u").alias("ub"), *[F.col(f"band{b}").alias(f"yb{b}") for b in range(4)]
    )
    hamming = sum(
        F.expr(f"bit_count(xa{b} ^ yb{b})") for b in range(4)
    ).cast("bigint")
    verified = (
        cand.join(x, "ua")
        .join(y, "ub")
        .select(
            hamming.alias("hamming"),
            (
                (F.col("ua") % PH_N_BASE) == (F.col("ub") % PH_N_BASE)
            ).cast("int").alias("same_base"),
        )
    )
    ok = F.col("hamming") <= PH_HAM_MAX
    return verified.agg(
        F.lit(_PH_N_UP * (_PH_N_UP - 1) // 2).cast("bigint").alias("n_all_pairs"),
        F.count(F.lit(1)).cast("bigint").alias("n_candidate_pairs"),
        F.sum(F.when(ok, 1).otherwise(0)).cast("bigint").alias("n_verified_pairs"),
        F.lit(PH_N_BASE * PH_VARIANTS * (PH_VARIANTS - 1) // 2)
        .cast("bigint")
        .alias("n_true_pairs"),
        F.sum(F.when(ok & (F.col("same_base") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_verified_true"),
    )


# --------------------------------------------------------------------------
# Distributed media-file ingest via Spark's binaryFile source — the
# missing first step of this module: everything above assumes payloads
# are ALREADY a binary column; this row ingests them from a directory
# the way a 100 TB media corpus actually arrives (millions of small
# object-store files). format("binaryFile") distributes the file
# listing across executors, packs small files into splits by
# spark.sql.files.maxPartitionBytes, and exposes (path, length,
# modificationTime, content) with column pruning — a metadata-only
# query (count, sum(length)) never reads file bytes (plan-asserted in
# tests/test_multimodal_datasource.py). The fixture files are
# deterministic ("MEDIA:" + zero-padded id, {MM_INGEST_DISTINCT}
# distinct payloads under {MM_INGEST_N} uploads), so the md5-distinct
# payload count value-checks the full ingest -> fingerprint path in
# DuckDB. EAGER CONTRACT: writes the {MM_INGEST_N} fixture files once
# per call (driver-side, kilobytes).
# --------------------------------------------------------------------------
MM_INGEST_N = 64
MM_INGEST_DISTINCT = 48


@register(
    "mm_binary_ingest",
    oracle=f"""
    WITH up AS (
      SELECT unnest(generate_series(0, {MM_INGEST_N - 1})) AS i
    ),
    payloads AS (
      SELECT i,
             'MEDIA:' || lpad(CAST(i % {MM_INGEST_DISTINCT} AS VARCHAR),
                              12, '0') AS body
      FROM up
    )
    SELECT CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(length(body)) AS BIGINT) AS total_bytes,
           CAST(count(DISTINCT md5(body)) AS BIGINT) AS n_distinct_payloads,
           CAST(min(i) AS BIGINT) AS min_id,
           CAST(max(i) AS BIGINT) AS max_id
    FROM payloads
    """,
)
def mm_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile-source ingest sweep over the deterministic media
    drop directory: file count, byte volume, md5-distinct payloads,
    id range — the arrival-side twin of mm_payload_dedup."""
    import shutil
    import tempfile
    from pathlib import Path

    # SF-suffixed scratch dir (concurrent-harness isolation)
    root = Path(tempfile.gettempdir()) / ("sdi_mm_ingest_r10_" + Path(sf_dir).name)
    shutil.rmtree(root, ignore_errors=True)
    root.mkdir(parents=True)
    for i in range(MM_INGEST_N):
        (root / f"{i:04d}.bin").write_bytes(
            f"MEDIA:{i % MM_INGEST_DISTINCT:012d}".encode()
        )
    raw = spark.read.format("binaryFile").load(str(root))
    media = raw.select(
        F.regexp_extract(F.col("path"), r"(\d{4})\.bin$", 1)
        .cast("bigint")
        .alias("media_id"),
        F.col("content").alias("payload"),
        F.col("length").cast("bigint").alias("n_bytes"),
    )
    return media.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.countDistinct(F.md5("payload")).cast("bigint").alias(
            "n_distinct_payloads"
        ),
        F.min("media_id").cast("bigint").alias("min_id"),
        F.max("media_id").cast("bigint").alias("max_id"),
    )
