"""Multimodal binary-column plumbing (operators/multimodal.py).

The decode seam is stubbed (no PIL/librosa/av in this container) but the
Spark-side plumbing — binary columns, typed metadata struct, mapInPandas
batch iteration, Arrow round-trip — is real and checked end-to-end
against driver-side NumPy expectations.
"""

import numpy as np
import pytest

from louvain_fast_move_cuda_spark.operators.multimodal import (
    decode_features,
    media_metadata,
    resize_images,
    sample_frames,
    synthesize_media,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "sphinx of black quartz judge my vow"),
    (3, "x"),
    (4, "yz"),
    (5, "a b c d e f g h i j k l m n o p"),
]


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return synthesize_media(docs).localCheckpoint(eager=True)


def _expected_kind(i):
    return ["image", "audio", "video"][i % 3]


def test_media_schema_and_metadata(media):
    rows = {r.media_id: r for r in media_metadata(media).collect()}
    assert set(rows) == {d[0] for d in DOCS}
    for i, text in DOCS:
        r = rows[i]
        assert r.kind == _expected_kind(i)
        assert r.n_bytes == len(text.encode())
        assert r.codec == ["png", "pcm16", "h264"][i % 3]
        if r.kind == "audio":
            assert r.width is None and r.sample_rate == 16000
        else:
            assert r.width == 16 + (i * 7) % 240
            assert r.height == 16 + (i * 13) % 240
        assert r.n_frames == (1 + i % 32 if r.kind == "video" else 1)
    # payload is opaque: the binary column round-trips byte-exactly
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert payloads == {i: t.encode() for i, t in DOCS}


def _expected_features(text: str, n: int = 8):
    arr = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.float64)
    j = np.arange(n + 1)
    bounds = (j * len(arr)) // n
    csum = np.concatenate([[0.0], np.cumsum(arr)])
    return csum[bounds[1:]] - csum[bounds[:-1]]


def test_decode_features_matches_numpy_oracle(media):
    got = {r.media_id: np.array(r.features) for r in decode_features(media).collect()}
    for i, text in DOCS:
        np.testing.assert_array_equal(got[i], _expected_features(text))


def test_decode_features_stable_across_batch_sizes(spark, media):
    """A batch boundary must never change results (partial-batch discipline)."""
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf, None)
    try:
        spark.conf.set(conf, "2")
        small = {r.media_id: tuple(r.features) for r in decode_features(media).collect()}
    finally:
        if old is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, old)
    big = {r.media_id: tuple(r.features) for r in decode_features(media).collect()}
    assert small == big


def test_resize_images_only_images_fixed_size(media):
    rows = resize_images(media, target_w=8, target_h=4).collect()
    ids = {r.media_id for r in rows}
    assert ids == {i for i, _ in DOCS if _expected_kind(i) == "image"}
    for r in rows:
        assert (r.width, r.height) == (8, 4)
        assert len(bytes(r.payload)) == 32
    # deterministic striding: resampled bytes are a subsequence lookup
    src = dict(DOCS)[0].encode()
    out = next(bytes(r.payload) for r in rows if r.media_id == 0)
    idx = (np.arange(32) * len(src)) // 32
    assert out == np.frombuffer(src, dtype=np.uint8)[idx].tobytes()


def test_sample_frames_reconstructs_payload_at_stride_1(media):
    """every_nth=1 must partition each video payload exactly (no byte lost)."""
    vids = {i: t.encode() for i, t in DOCS if _expected_kind(i) == "video"}
    rows = sample_frames(media, every_nth=1).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, {})[r.frame_idx] = bytes(r.payload)
    assert set(by_id) == set(vids)
    for i, payload in vids.items():
        n_frames = 1 + i % 32
        frames = by_id[i]
        assert sorted(frames) == list(range(n_frames))
        assert b"".join(frames[j] for j in range(n_frames)) == payload


def test_sample_frames_stride(media):
    rows = sample_frames(media, every_nth=4).collect()
    for r in rows:
        assert r.frame_idx % 4 == 0


def test_real_decoder_raises_at_the_seam(media):
    with pytest.raises(Exception, match="PIL|NotImplementedError"):
        decode_features(media, real_decoder=True).collect()
