"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, Arrow batch shape,
``mapInPandas`` partition-parallel decode, partition sizing. The codec step
itself is STUBBED (this container has no image/audio libraries): decode_*
dispatch to ``_decode_bytes_stub``, a clearly-marked deterministic fake keyed
on the content hash. Swapping in PIL/ffmpeg means replacing only that function
— the distributed plumbing (batch iteration, schema contract, memory posture)
is exactly what a real deployment runs.

100 TB posture: binaries never pass through the driver; Arrow batches bound
executor memory (``spark.sql.execution.arrow.maxRecordsPerBatch`` for huge
blobs); metadata-only queries prune the binary column at the parquet scan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from guardian_for_apache_kafka_spark.operators.layout import spread_narrow_scan

#: Typed metadata carried next to every blob.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),      # png, wav, mp4, ...
        T.StructField("size_bytes", T.LongType()),
    ]
)

IMAGE_FEATURES_DDL = (
    "doc_id BIGINT, media_type STRING, size_bytes BIGINT, "
    "width INT, height INT, n_channels INT, sha256 STRING"
)


def attach_media(
    df: DataFrame, binary_col: str, media_type: str, fmt: str, id_col: str = "doc_id"
) -> DataFrame:
    """Wrap a raw binary column into the engine's media shape:
    (id, content: binary, meta: struct)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(binary_col).alias("content"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(binary_col).cast("long").alias("size_bytes"),
        ).alias("meta"),
    )


def _decode_bytes_stub(content: bytes) -> tuple[int, int, int]:
    """STUB decode (no codec libs in this container): deterministic fake
    width/height/channels derived from the content digest. Replace with
    ``PIL.Image.open(io.BytesIO(content)).size`` in a real deployment."""
    h = hashlib.sha256(content).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 1 + h[2] % 4
    return width, height, channels


def extract_image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract over binary content, partition-parallel via
    ``mapInPandas`` (one Arrow batch of blobs at a time; nothing is collected).
    The input is spread first so a narrow scan cannot serialize the decode
    onto a single Arrow task (operators/layout.py)."""
    media = spread_narrow_scan(media)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"])
                w, h, c = _decode_bytes_stub(content)
                rows.append(
                    {
                        "doc_id": row["doc_id"],
                        "media_type": row["meta"]["media_type"],
                        "size_bytes": row["meta"]["size_bytes"],
                        "width": w,
                        "height": h,
                        "n_channels": c,
                        "sha256": hashlib.sha256(content).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(decode, IMAGE_FEATURES_DDL)


AUDIO_FEATURES_DDL = (
    "doc_id BIGINT, size_bytes BIGINT, sample_rate INT, n_samples BIGINT, "
    "duration_s DOUBLE, sha256 STRING"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio twin of ``extract_image_features``: mapInPandas decode to
    (sample_rate, n_samples, duration). Decode STUBBED (deterministic fake
    from the digest; a real deployment replaces it with soundfile/ffprobe —
    the Arrow batch contract is identical)."""
    media = spread_narrow_scan(media)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"])
                h = hashlib.sha256(content).digest()
                sample_rate = (8000, 16000, 22050, 44100)[h[3] % 4]
                n_samples = int.from_bytes(h[4:7], "big")
                rows.append(
                    {
                        "doc_id": row["doc_id"],
                        "size_bytes": row["meta"]["size_bytes"],
                        "sample_rate": sample_rate,
                        "n_samples": n_samples,
                        "duration_s": round(n_samples / sample_rate, 6),
                        "sha256": hashlib.sha256(content).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(decode, AUDIO_FEATURES_DDL)


RESIZED_DDL = "doc_id BIGINT, content BINARY, width INT, height INT, format STRING"


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize plumbing: mapInPandas batch transform emitting a new binary
    column with target-dimension metadata. The pixel op is STUBBED (content
    passes through digest-prefixed, deterministically); a real deployment
    swaps the inner function for PIL ``Image.resize`` — batch shape, schema,
    and memory posture (one Arrow batch of blobs in flight per task) are the
    deployment-real parts."""
    media = spread_narrow_scan(media)

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"])
                fake_resized = hashlib.sha256(content).digest() + content[:16]
                rows.append(
                    {
                        "doc_id": row["doc_id"],
                        "content": fake_resized,
                        "width": width,
                        "height": height,
                        "format": row["meta"]["format"],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(transform, RESIZED_DDL)


VIDEO_FRAMES_DDL = (
    "doc_id BIGINT, frame_index INT, fps INT, brightness INT, contrast INT, keyframe BOOLEAN"
)


def extract_video_frames(
    media: DataFrame, every_n: int = 10, max_frames: int = 4
) -> DataFrame:
    """Video frame sampling + per-frame feature extraction, one decode pass
    per video (``mapInPandas`` emits ``max_frames`` rows per input blob, so a
    100 TB corpus opens each container exactly once; cross-video parallelism
    comes from the input partitioning, intra-video fan-out is free row
    emission). For per-frame parallelism on very long videos use
    ``frame_sample_plan`` + a per-frame decode instead.

    The codec is STUBBED like the image/audio twins: per-frame features are
    derived from sha256(sha256hex(content) + ":" + frame_index), so the whole
    Arrow batch contract — blob round-trip, row fan-out, schema — is exactly
    recomputable by digest arithmetic (the m4 oracle). A real deployment
    swaps the inner loop for ffmpeg frame extraction."""
    media = spread_narrow_scan(media)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"])
                vid_dig = hashlib.sha256(content).hexdigest()
                fps = (12, 24, 25, 30)[int(vid_dig[6:8], 16) % 4]
                for k in range(max_frames):
                    idx = k * every_n
                    fh = hashlib.sha256(f"{vid_dig}:{idx}".encode()).digest()
                    rows.append(
                        {
                            "doc_id": row["doc_id"],
                            "frame_index": idx,
                            "fps": fps,
                            "brightness": fh[0],
                            "contrast": fh[1],
                            "keyframe": fh[2] % 8 == 0,
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(decode, VIDEO_FRAMES_DDL)


def frame_sample_plan(media: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """Plan video frame sampling: one output row per (doc_id, frame_index) —
    the explode happens BEFORE decode so frame extraction parallelizes across
    the cluster, not within one task. Decode itself remains the stub."""
    idx = F.sequence(F.lit(0), F.lit(max_frames - 1))
    return media.select(
        "doc_id",
        "meta",
        F.explode(F.transform(idx, lambda i: i * every_n)).alias("frame_index"),
    )


AUDIO_SEGMENTS_DDL = (
    "doc_id BIGINT, seg_index INT, kind STRING, start_frame INT, n_frames INT"
)


def segment_audio(
    media: DataFrame,
    max_frames: int = 8,
    silence_threshold: int = 64,
) -> DataFrame:
    """Voice-activity-style audio segmentation: ONE decode pass per blob
    emits the run-length encoding of silent vs speech frames — (doc_id,
    seg_index, kind, start_frame, n_frames) — the pre-chunking step of a
    speech-training pipeline (only speech runs proceed to transcription).

    The Arrow plumbing is real and the row-count contract is variable
    (0..max_frames runs per blob, decided inside the batch); only the codec
    is STUBBED: per-frame energy derives from sha256(hex_digest ':' index)
    byte 0, and the frame count from the m2 stub's digest-derived
    sample_rate/n_samples — all integer digest arithmetic a SQL oracle
    replays exactly. A real deployment swaps the stub for RMS over decoded
    PCM frames; batch shape, schema and the run-length fold are unchanged."""
    media = spread_narrow_scan(media)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"])
                db = hashlib.sha256(content).digest()
                dig = hashlib.sha256(content).hexdigest()
                sample_rate = (8000, 16000, 22050, 44100)[db[3] % 4]
                n_samples = int.from_bytes(db[4:7], "big")
                n_frames = min(-(-n_samples // sample_rate), max_frames)
                energies = [
                    hashlib.sha256(f"{dig}:{i}".encode()).digest()[0]
                    for i in range(n_frames)
                ]
                seg_index = -1
                prev: bool | None = None
                for i, e in enumerate(energies):
                    silent = e < silence_threshold
                    if silent != prev:
                        seg_index += 1
                        rows.append(
                            {
                                "doc_id": row["doc_id"],
                                "seg_index": seg_index,
                                "kind": "silence" if silent else "speech",
                                "start_frame": i,
                                "n_frames": 1,
                            }
                        )
                        prev = silent
                    else:
                        rows[-1]["n_frames"] += 1
            yield pd.DataFrame(rows, columns=[
                "doc_id", "seg_index", "kind", "start_frame", "n_frames",
            ])

    return media.mapInPandas(decode, AUDIO_SEGMENTS_DDL)


PHASH_DDL = "doc_id BIGINT, phash BIGINT"


def perceptual_hash(media: DataFrame) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint per image blob: decode to
    a tiny grayscale thumbnail, threshold each pixel against the mean, pack
    the bits. Near-duplicate images (re-encodes, minor crops) collide or
    land within small Hamming distance; bucketing by the hash (exact) or by
    simhash-style pigeonhole blocks (operators/dedup.simhash_pairs machinery)
    replaces any pairwise image comparison.

    The decode is the container's STUB: the "thumbnail" is the 32 bytes of
    sha256(content) and the mean-threshold bit-pack runs on those — so with
    the fake codec, only byte-identical blobs collide (random content is
    ~16 bits apart). A real deployment swaps the digest for an 8x8 PIL
    thumbnail and keeps every line after it. Integer-exact thresholding
    (32*pixel > total) so the oracle replays it with no float divide."""
    media = spread_narrow_scan(media)

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"])
                px = hashlib.sha256(content).digest()  # STUB thumbnail
                total = sum(px)
                phash = 0
                for k, b in enumerate(px):
                    if 32 * b > total:
                        phash |= 1 << k
                rows.append({"doc_id": row["doc_id"], "phash": phash})
            yield pd.DataFrame(rows)

    return media.mapInPandas(hash_batch, PHASH_DDL)


PATCH_GRID_DDL = (
    "doc_id BIGINT, patch_row INT, patch_col INT, patch_w INT, patch_h INT, "
    "mean_intensity INT, std_intensity INT, informative BOOLEAN"
)


def extract_patch_grid(media: DataFrame, grid: int = 2) -> DataFrame:
    """ViT-style patch extraction: ONE decode pass per image emits a
    ``grid x grid`` grid of patch rows with per-patch statistics and an
    informativeness flag — the pre-tokenization step of an image-training
    pipeline (blank/uninformative patches are dropped before the vision
    tokenizer, like t13 drops boilerplate chunks).

    Scale shape matches the other one-pass decoders: ``mapInPandas`` opens
    each blob exactly once and fans out grid**2 rows; cross-image
    parallelism comes from the input partitioning (spread first so a narrow
    scan cannot serialize onto one Arrow task), and the binary column never
    reaches the driver. The pixel statistics are STUBBED like the m1/m2/m4
    twins — per-patch features derive from sha256(sha256hex(content) +
    ":row:col"), so the whole Arrow fan-out contract is recomputable by
    digest arithmetic (the m7 oracle); a real deployment swaps the inner
    loop for PIL crop + numpy stats."""
    media = spread_narrow_scan(media)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"])
                w, h, _c = _decode_bytes_stub(content)
                dig = hashlib.sha256(content).hexdigest()
                for r in range(grid):
                    for c in range(grid):
                        ph = hashlib.sha256(f"{dig}:{r}:{c}".encode()).digest()
                        rows.append(
                            {
                                "doc_id": row["doc_id"],
                                "patch_row": r,
                                "patch_col": c,
                                "patch_w": w // grid,
                                "patch_h": h // grid,
                                "mean_intensity": ph[0],
                                "std_intensity": ph[1],
                                "informative": ph[2] % 4 != 0,
                            }
                        )
            yield pd.DataFrame(rows)

    return media.mapInPandas(decode, PATCH_GRID_DDL)


AUDIO_FP_DDL = "doc_id BIGINT, frame_index INT, fp BIGINT"


def audio_fingerprints(media: DataFrame, frames: int = 8) -> DataFrame:
    """Chromaprint-style audio fingerprinting: ONE decode pass per blob
    emits a SEQUENCE of per-frame sub-fingerprints (int64), and duplicate
    audio is found by counting SHARED sub-fingerprints between documents —
    the sequence form is what makes real audio matching robust to offsets
    and re-encodes, where m6's single whole-file hash is not.

    The spectral step is the container's STUB: frame k's sub-fingerprint is
    the first 4 bytes of sha256(sha256hex(content) + ':' + k) — so with the
    fake codec only byte-identical blobs share frames, while the Arrow
    fan-out, the int64-only shuffle contract, and the inverted-index match
    (the m8 oracle replays all of it in digest arithmetic) are
    deployment-real. A real build swaps the inner loop for chromaprint /
    librosa chroma features and keeps everything downstream."""
    media = spread_narrow_scan(media)

    def fps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"])
                dig = hashlib.sha256(content).hexdigest()
                for k in range(frames):
                    fh = hashlib.sha256(f"{dig}:{k}".encode()).digest()
                    rows.append(
                        {
                            "doc_id": row["doc_id"],
                            "frame_index": k,
                            "fp": int.from_bytes(fh[:4], "big"),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(fps, AUDIO_FP_DDL)


SCENE_SEGMENTS_DDL = (
    "doc_id BIGINT, scene_index INT, start_frame INT, n_frames INT, "
    "sum_brightness BIGINT"
)


def scene_segments(
    media: DataFrame, frames: int = 16, threshold: int = 64
) -> DataFrame:
    """Scene-change segmentation — the video-curation pre-chunker (shot
    boundaries gate which spans get expensive captioning/embedding):
    per-frame luminance is compared to its predecessor and a jump
    > ``threshold`` opens a new scene; output is the run-length encoding
    (doc_id, scene_index, start_frame, n_frames, sum_brightness). ONE
    decode pass per blob (the extract_video_frames discipline — a 100 TB
    corpus opens each container exactly once; scene fan-out is free row
    emission inside the Arrow batch).

    The codec is STUBBED like every multimodal twin: frame luminance is
    byte 0 of sha256(sha256hex(content) + ":" + frame_index) — digest
    arithmetic an oracle recomputes exactly, so the differential attests
    the whole segmentation recurrence (boundary rule, run accounting),
    not just row counts. A real deployment swaps the luminance line for
    an ffmpeg decode; the batch contract is identical."""
    media = spread_narrow_scan(media)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"])
                dig = hashlib.sha256(content).hexdigest()
                lum = [
                    hashlib.sha256(f"{dig}:{k}".encode()).digest()[0]
                    for k in range(frames)
                ]
                scene, start, acc = 0, 0, 0
                for k in range(frames):
                    if k > 0 and abs(lum[k] - lum[k - 1]) > threshold:
                        rows.append(
                            {
                                "doc_id": row["doc_id"],
                                "scene_index": scene,
                                "start_frame": start,
                                "n_frames": k - start,
                                "sum_brightness": acc,
                            }
                        )
                        scene, start, acc = scene + 1, k, 0
                    acc += lum[k]
                rows.append(
                    {
                        "doc_id": row["doc_id"],
                        "scene_index": scene,
                        "start_frame": start,
                        "n_frames": frames - start,
                        "sum_brightness": acc,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(decode, SCENE_SEGMENTS_DDL)


MOTION_ENERGY_DDL = (
    "doc_id BIGINT, total_motion BIGINT, max_jump INT, n_cuts INT, "
    "motion_class STRING"
)


def motion_energy(
    media: DataFrame, frames: int = 16, cut_threshold: int = 64
) -> DataFrame:
    """Per-video motion-energy profile — the curation signal that routes
    videos between 'static slideshow' (cheap frame-dedup path) and
    'cut-heavy' (per-scene captioning path): total absolute inter-frame
    luminance change, the largest single jump, and the hard-cut count at
    ``cut_threshold`` (m9's boundary rule), classified static (< 32
    avg motion) / smooth (no hard cut) / cut_heavy. ONE decode pass per
    blob (the scene_segments discipline); luminance is the same stubbed
    digest arithmetic (byte 0 of sha256(sha256hex(content)+":"+k)), so
    the oracle replays the full reduction exactly."""
    media = spread_narrow_scan(media)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"])
                dig = hashlib.sha256(content).hexdigest()
                lum = [
                    hashlib.sha256(f"{dig}:{k}".encode()).digest()[0]
                    for k in range(frames)
                ]
                diffs = [abs(lum[k] - lum[k - 1]) for k in range(1, frames)]
                total = sum(diffs)
                mx = max(diffs) if diffs else 0
                cuts = sum(1 for d in diffs if d > cut_threshold)
                if total < 32 * (frames - 1):
                    klass = "static"
                elif cuts == 0:
                    klass = "smooth"
                else:
                    klass = "cut_heavy"
                rows.append(
                    {
                        "doc_id": row["doc_id"],
                        "total_motion": total,
                        "max_jump": mx,
                        "n_cuts": cuts,
                        "motion_class": klass,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(decode, MOTION_ENERGY_DDL)


def fps_normalization_plan(
    media: DataFrame, target_fps: int = 6, sampled_frames: int = 16, every_n: int = 10
) -> DataFrame:
    """Frame-rate normalization plan: mixed-fps video corpora must be
    resampled to a common temporal rate before batch embedding (a 30 fps
    clip otherwise contributes 2.5x the frames of a 12 fps clip for the
    same wall-clock duration). Reads each container's fps in ONE
    metadata decode pass (max_frames=1 through the stubbed codec — a real
    deployment reads the container header), then pure JVM arithmetic:
    keep every ``stride = max(1, round(fps / target_fps))``-th sampled
    frame. Emits per-video (fps, stride, n_kept of ``sampled_frames``,
    effective_fps); the keep rule applied to ``frame_sample_plan`` rows is
    ``sample_ordinal % stride == 0``. Nothing corpus-scaled happens after
    the decode scan."""
    meta = extract_video_frames(media, every_n=every_n, max_frames=1).select(
        "doc_id", "fps"
    )
    stride = F.greatest(
        F.lit(1), F.round(F.col("fps") / float(target_fps)).cast("int")
    )
    return meta.select(
        "doc_id",
        "fps",
        stride.alias("stride"),
        (F.floor((sampled_frames - 1) / stride) + 1).cast("int").alias("n_kept"),
        F.round(F.col("fps") * 1.0 / stride, 2).alias("effective_fps"),
    )
