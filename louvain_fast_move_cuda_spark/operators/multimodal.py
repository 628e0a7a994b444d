"""Multimodal (image/audio/video) columns for training-data pipelines.

Media travel through the engine as **opaque binary columns with typed
metadata** — the pattern a 100 TB multimodal corpus needs: parquet/
Iceberg store the payload bytes untouched, Catalyst prunes/filters on
the typed metadata struct without ever deserializing payloads, and only
the stages that truly need pixel/sample access pay for an Arrow hop
into a vectorized Pandas UDF.

The decode itself is STUBBED in this container (no PIL/librosa/ffmpeg
available): ``real_decoder=True`` raises NotImplementedError at the
exact seam where the real library call belongs, while the default
deterministic fake decoder (payload bytes -> float features) keeps the
Spark-side plumbing — schema, ``mapInPandas`` batch iteration,
partitioning, Arrow round-trip — real and testable end-to-end.

No reference counterpart (the CUDA engine is graph-only); this module
is part of the training-data-pipeline surface alongside operators/dedup
and operators/textstats.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_KINDS = ("image", "audio", "video")

META_SCHEMA = (
    "struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)


def synthesize_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from ``documents`` (test/bench input).

    payload = UTF-8 bytes of the text (opaque to everything downstream);
    kind and the typed metadata derive arithmetically from ``doc_id`` so
    an ANSI-SQL oracle can mirror every column exactly.

    Returns (media_id, kind, payload: binary, meta: struct).
    """
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]), (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int")
    )
    width = (F.lit(16) + F.pmod(F.col(id_col) * 7, F.lit(240))).cast("int")
    height = (F.lit(16) + F.pmod(F.col(id_col) * 13, F.lit(240))).cast("int")
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.when(kind != "audio", width).alias("width"),
            F.when(kind != "audio", height).alias("height"),
            F.when(kind == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
            F.when(kind == "video", (F.lit(1) + F.pmod(F.col(id_col), F.lit(32))).cast("int"))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("n_frames"),
            F.element_at(
                F.array(F.lit("png"), F.lit("pcm16"), F.lit("h264")),
                (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
            ).alias("codec"),
        ).alias("meta"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed-metadata projection — NO payload deserialization.

    This is the plan shape that matters at 100 TB: the parquet scan reads
    only (media_id, kind, meta.*) plus the payload length; Catalyst prunes
    the payload column for every row where we never touch the bytes.
    """
    return media.select(
        "media_id",
        "kind",
        F.length("payload").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.n_frames").alias("n_frames"),
        F.col("meta.codec").alias("codec"),
    )


def _decode_stub(kind: str, payload: bytes, real_decoder: bool):
    """THE seam for real decoders. In production:

    * image -> ``PIL.Image.open(io.BytesIO(payload))`` -> np.asarray
    * audio -> ``soundfile.read``/librosa -> waveform
    * video -> ``av.open`` -> frame iterator

    None of those libraries exist in this container, so the real path
    raises and the deterministic fake path (bytes -> float64 array)
    keeps the distributed plumbing testable.
    """
    if real_decoder:
        raise NotImplementedError(
            f"real {kind} decoding requires PIL/soundfile/av, not available here"
        )
    import numpy as np

    return np.frombuffer(payload, dtype=np.uint8).astype("float64")


def decode_features(
    media: DataFrame,
    n_features: int = 8,
    real_decoder: bool = False,
) -> DataFrame:
    """(media_id, kind, features: array<double>) via one ``mapInPandas`` pass.

    Arrow hands the binary column to the Python worker per batch; the
    fake-decoder kernel is fully vectorized per batch — all payloads are
    concatenated into ONE byte buffer and every row's bucket sums come
    from a single prefix-sum lookup, no per-row Python loop. Fake
    features = byte sums over ``n_features`` contiguous buckets with
    boundaries ``floor(j*len/n)`` (0.0 for empty buckets) —
    deterministic and cheap to recompute in a test oracle. With
    ``real_decoder=True`` the per-payload library call in
    :func:`_decode_stub` replaces the fake path (and is then inherently
    per-row, as PIL/libav decode one object at a time).
    """
    schema = "media_id long, kind string, features array<double>"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if real_decoder:
                # the real path decodes object-at-a-time by necessity
                for kind, payload in zip(pdf["kind"], pdf["payload"]):
                    _decode_stub(kind, bytes(payload), real_decoder)
            payloads = [bytes(p) for p in pdf["payload"]]
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.float64)
            csum = np.concatenate([[0.0], np.cumsum(buf)])
            offsets = np.concatenate([[0], np.cumsum(lens)])[:-1]  # row starts
            j = np.arange(n_features + 1)
            # bounds[i, j] = offset_i + floor(j * len_i / n)
            bounds = offsets[:, None] + (j[None, :] * lens[:, None]) // n_features
            sums = csum[bounds[:, 1:]] - csum[bounds[:, :-1]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": list(sums),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(kernel, schema=schema)


def resize_images(
    media: DataFrame,
    target_w: int = 32,
    target_h: int = 32,
    real_decoder: bool = False,
) -> DataFrame:
    """(media_id, width, height, payload) with image payloads "resized".

    Plumbing for the decode->resize->re-encode stage: filters to
    kind='image' (Catalyst pushes this into the scan), then one
    ``mapInPandas`` pass. The fake resample maps payload bytes onto the
    target grid by index striding — the real seam would be
    ``PIL.Image.resize`` in :func:`_decode_stub`'s place.
    """
    schema = "media_id long, width int, height int, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        n_out = target_w * target_h
        for pdf in batches:
            payloads = []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                arr = _decode_stub(kind, bytes(payload), real_decoder)
                if len(arr) == 0:
                    arr = np.zeros(1)
                idx = (np.arange(n_out) * len(arr)) // n_out
                payloads.append(arr[idx].astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": np.full(len(pdf), target_w, dtype="int32"),
                    "height": np.full(len(pdf), target_h, dtype="int32"),
                    "payload": payloads,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "kind", "payload")
        .mapInPandas(kernel, schema=schema)
    )


def sample_frames(
    media: DataFrame,
    every_nth: int = 4,
    real_decoder: bool = False,
) -> DataFrame:
    """Explode videos into sampled frames: (media_id, frame_idx, payload).

    Frame boundaries come from the TYPED METADATA (meta.n_frames), so the
    frame index table is pure DataFrame work (explode over a sequence —
    no UDF, no payload access); only the per-frame byte slicing touches
    the binary column, inside one vectorized pass. A row-explosion stage
    like this is why media stay binary: 100 TB of video never round-trips
    through Python — only the sampled frames do.
    """
    frames = (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            "payload",
            F.col("meta.n_frames").alias("n_frames"),
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_nth))
            ).alias("frame_idx"),
        )
    )
    schema = "media_id long, frame_idx int, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            outs = []
            for payload, n_frames, fidx in zip(
                pdf["payload"], pdf["n_frames"], pdf["frame_idx"]
            ):
                arr = _decode_stub("video", bytes(payload), real_decoder)
                if len(arr) == 0:
                    outs.append(b"")
                    continue
                # fake frame = the payload's idx-th contiguous slice
                bounds = np.linspace(0, len(arr), int(n_frames) + 1).astype(int)
                outs.append(
                    arr[bounds[int(fidx)] : bounds[int(fidx) + 1]].astype(np.uint8).tobytes()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"].astype("int32"),
                    "payload": outs,
                }
            )

    return frames.mapInPandas(kernel, schema=schema)
