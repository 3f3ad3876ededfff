import numpy as np
import pytest

from taco_toolbox_spark.multimodal.binary_ops import (
    byte_features,
    decode_image,
    fake_decode_features,
    frame_sample,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, 20).cache()


def test_synthesize_deterministic(spark, media):
    again = synthesize_media(spark, 20)
    a = {r["media_id"]: bytes(r["media"]) for r in media.collect()}
    b = {r["media_id"]: bytes(r["media"]) for r in again.collect()}
    assert a == b
    assert all(len(v) == 512 for v in a.values())


def test_byte_features(media):
    feats = byte_features(media).toPandas().set_index("media_id")
    raw = {r["media_id"]: bytes(r["media"]) for r in media.collect()}
    assert (feats["n_bytes"] == 512).all()
    arr = np.frombuffer(raw[0], dtype=np.uint8)
    assert feats.loc[0, "mean_byte"] == pytest.approx(arr.mean())
    assert feats.loc[0, "entropy"] > 3  # pseudo-random bytes ≈ high entropy


def test_fake_decode_features(media):
    emb = fake_decode_features(media, dim=16).toPandas()
    assert emb.embedding.map(len).eq(16).all()
    norms = emb.embedding.map(lambda v: float(np.linalg.norm(v)))
    assert np.allclose(norms, 1.0, atol=1e-5)


def test_decode_image_stubbed(media):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL available; stub path not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(media, 8, 8)


def test_frame_sample(media):
    frames = frame_sample(media, frame_bytes=64, every_n=4).toPandas()
    # 512/64 = 8 frames, every 4th -> idx 0 and 4
    assert sorted(frames[frames.media_id == 0].frame_idx) == [0, 4]
    assert frames.frame.map(len).eq(64).all()


def test_byte_features_vectorized_parity(spark):
    """The batched (concat + reduceat/bincount) implementation must match a
    per-row numpy reference on adversarial blobs: null, empty, 1-byte,
    uniform, and mixed lengths."""
    rows = [
        (0, None),
        (1, b""),
        (2, b"\x00"),
        (3, b"\xff" * 100),
        (4, bytes(range(256)) * 3),
        (5, b"ab" * 7),
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = byte_features(df).toPandas().set_index("media_id").sort_index()
    for mid, blob in rows:
        if blob is None:
            assert got.loc[mid, "n_bytes"] == 0
            assert np.isnan(got.loc[mid, "mean_byte"])
            assert np.isnan(got.loc[mid, "entropy"])
            continue
        a = np.frombuffer(blob, dtype=np.uint8)
        assert got.loc[mid, "n_bytes"] == a.size
        if a.size == 0:
            assert np.isnan(got.loc[mid, "mean_byte"])
            assert got.loc[mid, "entropy"] == 0.0
            continue
        counts = np.bincount(a, minlength=256)
        p = counts[counts > 0] / a.size
        assert got.loc[mid, "mean_byte"] == pytest.approx(a.mean())
        assert got.loc[mid, "std_byte"] == pytest.approx(a.std())
        assert got.loc[mid, "entropy"] == pytest.approx(-(p * np.log2(p)).sum())


def test_fake_decode_vectorized_parity(spark):
    """Chunk boundaries must match np.array_split exactly, including blobs
    shorter than dim; a NULL blob must yield a NULL embedding (not a
    valid-looking vector) and an empty blob the zero vector."""
    rows = [
        (0, None),
        (1, b"\x05"),
        (2, bytes(range(100))),
        (3, b"z" * 7),
        (4, b""),
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = fake_decode_features(df, dim=16).toPandas().set_index("media_id")
    for mid, blob in rows:
        if blob is None:
            assert got.loc[mid, "embedding"] is None
            continue
        a = np.frombuffer(blob, dtype=np.uint8).astype(np.float64)
        chunks = np.array_split(a, 16)
        vec = np.array([c.mean() if c.size else 0.0 for c in chunks])
        norm = np.linalg.norm(vec) or 1.0
        want = (vec / norm).astype(np.float32)
        assert np.allclose(np.array(got.loc[mid, "embedding"]), want, atol=1e-6), mid
