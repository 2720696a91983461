"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque `binary` columns + typed metadata structs. The Spark
side — schemas, partition sizing, Arrow batch shape, mapInPandas UDF
signatures — is real and tested; the codec calls are STUBBED behind
`decoder=` hooks because no image/audio libraries exist in this container
(deterministic fake decoder used in tests, NotImplementedError by default).

Scale notes: media rows are fat — `media_repartition` targets a byte budget
per partition (from an aggregate of payload lengths) instead of a row count;
mapInPandas keeps per-batch memory = batch_rows * avg_payload, controlled by
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import os
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def default_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Real codecs (PIL/libav) are unavailable in this container."""
    raise NotImplementedError(
        "media decode requires an image/audio codec library; inject a "
        "decoder via extract_features(decoder=...)"
    )


def fake_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in: byte histogram as a 16-dim 'decoded signal'.
    Lets the full Spark plumbing be exercised end-to-end in tests."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
    return hist / max(1.0, hist.sum())


def _input_file_bytes(df: DataFrame) -> int | None:
    """Total on-disk size of the DataFrame's input files (parquet footer /
    filesystem metadata only — no data scan, no Spark job). None when the
    plan has no file sources (in-memory data, post-shuffle stage)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        p = f[7:] if f.startswith("file://") else f
        if not os.path.exists(p):
            return None  # non-local fs: fall back rather than undercount
        total += os.path.getsize(p)
    return total


def media_repartition(
    df: DataFrame,
    target_bytes: int = 64 << 20,
    payload_col: str = "payload",
    total_bytes: int | None = None,
) -> DataFrame:
    """Partition fat binary rows by byte budget, not row count.

    Sizing comes from metadata, not a scan: caller-provided `total_bytes`
    hint first, else the sum of input-file sizes (parquet footers /
    fs stat — media tables are payload-dominated, so compressed file size
    is a sound proxy for the decode-stage byte budget). Only when neither
    exists (in-memory test frames) does it fall back to aggregating
    payload lengths — at 100 TB that fallback would be a full scan of the
    fat column before any real work, which is exactly what the metadata
    path avoids."""
    total = total_bytes
    if total is None:
        total = _input_file_bytes(df)
    if total is None:
        total = df.agg(F.sum(F.length(payload_col)).alias("b")).collect()[0]["b"] or 0
    n = max(1, int(total // target_bytes) + 1)
    return df.repartition(n)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = default_decoder,
    feat_dim: int = 16,
) -> DataFrame:
    """mapInPandas feature extraction: decode -> fixed-dim feature vector.

    The Arrow batch shape (payload bytes come in as Python bytes inside a
    pandas column) and output schema are the contract a real decoder plugs
    into."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if p is None else decoder(p, k).astype(np.float32)[:feat_dim].tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def chunk_frame_splitter(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic fake frame extraction: the payload byte stream is cut
    into n_frames chunks at floor(i*L/n) boundaries. A real deployment
    injects a libav-backed splitter (keyframe decode) via
    sample_frames(splitter=...); the chunk spec is the frozen stand-in that
    keeps the fan-out plumbing oracle-checkable (chunks are substrings of
    the payload, reproducible in SQL)."""
    L = len(payload)
    n = max(1, n_frames)
    return [payload[(i * L) // n : ((i + 1) * L) // n] for i in range(n)]


def sample_frames(
    media: DataFrame,
    stride: int = 5,
    splitter: Callable[[bytes, int], list] = chunk_frame_splitter,
) -> DataFrame:
    """Frame sampling for video rows: one output row per kept frame
    (media_id, frame_idx, n_bytes, frame), frames 0, stride, 2*stride, ...
    of meta.n_frames. The row fan-out happens inside mapInPandas (Arrow
    batches in/out, no per-row Python UDF call overhead); non-video rows
    are filtered before the decode stage so codec work never touches them.

    At scale this is the classic fat-row explode: output bytes ~= input
    bytes / stride, and the pre-filter + column pruning (payload + meta
    only) reach the parquet scan."""

    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "payload", F.col("meta.n_frames").alias("n_frames")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, frames = [], [], [], []
            for mid, p, n in zip(pdf["media_id"], pdf["payload"], pdf["n_frames"]):
                if p is None:
                    continue
                chunks = splitter(p, 1 if n is None or pd.isna(n) else int(n))
                for i in range(0, len(chunks), stride):
                    ids.append(mid)
                    idxs.append(i)
                    lens.append(len(chunks[i]))
                    frames.append(chunks[i])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "n_bytes": lens, "frame": frames}
            )

    return vids.mapInPandas(run, FRAME_SCHEMA)


def nearest_neighbor_resizer(
    payload: bytes, width: int, height: int, out_w: int, out_h: int
) -> bytes:
    """Deterministic fake image resize: the payload is treated as a
    row-major (height x width) uint8 raster (padded/truncated to fit) and
    subsampled with nearest-neighbor index math — the frozen stand-in for
    a PIL/turbojpeg resize, exercising the same bytes-in/bytes-out UDF
    contract."""
    need = width * height
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size < need:
        arr = np.pad(arr, (0, need - arr.size))
    img = arr[:need].reshape(height, width)
    ys = (np.arange(out_h) * height) // out_h
    xs = (np.arange(out_w) * width) // out_w
    return img[np.ix_(ys, xs)].tobytes()


def resize_images(
    media: DataFrame,
    out_w: int = 16,
    out_h: int = 16,
    resizer: Callable[[bytes, int, int, int, int], bytes] = nearest_neighbor_resizer,
) -> DataFrame:
    """Resize image rows to (out_w, out_h): same MEDIA-shaped schema out,
    payload replaced and meta.width/height updated; non-image rows pass
    through untouched (union, no codec work). The resizer is the
    injectable codec hook, same contract as extract_features(decoder=)."""

    is_img = F.col("kind") == "image"
    imgs = media.filter(is_img)
    # null-safe complement: a NULL kind must pass through, not vanish
    # (both `== 'image'` and `!= 'image'` are null-rejecting filters)
    rest = media.filter(~F.coalesce(is_img, F.lit(False)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = []
            metas = []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                # un-resizable rows (no payload, no meta, or no raster
                # dims) pass through UNCHANGED — never destroy a payload
                if p is None or m is None or m.get("width") is None or m.get("height") is None:
                    out_payload.append(p)
                    metas.append(m)
                    continue
                m = dict(m)
                out_payload.append(
                    resizer(p, int(m["width"]), int(m["height"]), out_w, out_h)
                )
                m["width"], m["height"] = out_w, out_h
                metas.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "meta": metas,
                }
            )

    return imgs.mapInPandas(run, MEDIA_SCHEMA).unionByName(rest)


def media_from_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic media table DERIVED from a text corpus: payload =
    UTF-8 bytes of the text, kind round-robins image/audio/video. Gives the
    binary-column plumbing an oracle-checkable input (the byte histogram of
    an ASCII payload is SQL-expressible over the source text), unlike the
    random synth_media payloads."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
    )
    mime = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
    )
    is_audio = F.pmod(F.col(id_col), F.lit(3)) == 1
    is_video = F.pmod(F.col(id_col), F.lit(3)) == 2
    return docs.filter(F.col(text_col).isNotNull() & (F.col(text_col) != "")).select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.when(~is_audio, F.lit(64)).cast("int").alias("width"),
            F.when(~is_audio, F.lit(64)).cast("int").alias("height"),
            F.when(is_audio, F.lit(16000)).cast("int").alias("sample_rate"),
            F.when(is_video, F.lit(30)).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def feature_histogram_counts(features: DataFrame) -> DataFrame:
    """Driver-gate projection of extract_features output: explode the
    float feature vector to (media_id, kind, n_bytes, dim, cnt) rows with
    cnt recovered as the EXACT integer histogram count (value * n_bytes
    rounds exactly — counts <= n_bytes are far inside float32 precision).
    List cells crash the driver's row canonicalizer; integer rows also
    dodge cross-engine float32-rounding flake."""
    return features.select(
        "media_id",
        "kind",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.posexplode("feature").alias("dim", "value"),
    ).select(
        "media_id",
        "kind",
        "n_bytes",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("value") * F.col("n_bytes")).cast("long").alias("cnt"),
    )


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table exercising the binary plumbing.

    Built as a pyarrow Table (Arrow -> LocalRelation): list-backed
    createDataFrame would make every downstream action re-evaluate a
    Python RDD (slow worker spin-up per job)."""
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    ids, ks, payloads, metas = [], [], [], []
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(64, 4096))
        ids.append(i)
        ks.append(kind)
        payloads.append(rng.integers(0, 256, size=size, dtype=np.uint8).tobytes())
        metas.append(
            {
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "width": 64 if kind != "audio" else None,
                "height": 64 if kind != "audio" else None,
                "sample_rate": 16000 if kind == "audio" else None,
                "n_frames": 30 if kind == "video" else None,
            }
        )
    meta_type = pa.struct(
        [
            ("mime", pa.string()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("sample_rate", pa.int32()),
            ("n_frames", pa.int32()),
        ]
    )
    table = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(ks, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, meta_type),
        }
    )
    return spark.createDataFrame(table)
