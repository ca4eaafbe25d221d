import hashlib

from local_vectordb_spark.operators import multimodal as mm


def _docs(spark):
    return spark.createDataFrame(
        [(0, "abc"), (1, "defgh"), (2, "x" * 25)], "doc_id long, text string"
    )


def test_media_table_types_and_bytes(spark):
    out = {r["media_id"]: r for r in mm.to_media_table(_docs(spark)).collect()}
    assert out[0]["media_type"] == "image"
    assert out[1]["media_type"] == "audio"
    assert out[2]["media_type"] == "video"
    assert out[0]["n_bytes"] == 3
    assert bytes(out[0]["payload"]) == b"abc"


def test_decode_media_digest_and_dims(spark):
    decoded = {r["media_id"]: r for r in mm.decode_media(mm.to_media_table(_docs(spark))).collect()}
    assert decoded[0]["digest"] == hashlib.md5(b"abc").hexdigest()
    assert decoded[0]["width"] == 3 % 640 + 1
    assert decoded[2]["n_frames"] == 25 % 30 + 1
    assert "payload" not in decoded[0].asDict()


def test_frame_sample_every_nth(spark):
    decoded = mm.decode_media(mm.to_media_table(_docs(spark)))
    frames = mm.frame_sample(decoded, every_nth=10).collect()
    # only media 2 is video, n_frames=26 → indices 0,10,20
    assert sorted(r["frame_idx"] for r in frames) == [0, 10, 20]
    assert all(r["media_id"] == 2 for r in frames)


# ---------------------------------------------------------------------------
# Codec selection (r2 verdict #8): real decode when the lib is
# importable, deterministic fake otherwise — both paths exercised.
# ---------------------------------------------------------------------------


def test_auto_falls_back_to_fake_without_libs(spark):
    """This container ships neither PIL nor soundfile, so codec='auto'
    must produce byte-identical output to codec='fake' end-to-end."""
    media = mm.to_media_table(_docs(spark))
    auto = sorted(map(tuple, mm.decode_media(media, codec="auto").collect()))
    fake = sorted(map(tuple, mm.decode_media(media, codec="fake").collect()))
    assert auto == fake


def test_real_codec_propagates_import_error():
    import importlib.util

    import pytest

    assert importlib.util.find_spec("PIL") is None  # env precondition
    with pytest.raises(ImportError):
        mm._decode_one(b"not-an-image", "image", codec="real")


def test_real_codec_used_when_importable(monkeypatch):
    """Inject a synthetic PIL module: _decode_one must route image
    payloads through it (width/height/n_frames from the 'codec', not
    the fake), and keep using the fake for media types with no lib."""
    import io
    import sys
    import types

    class FakeImage:
        width, height, n_frames = 320, 240, 7

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    pil = types.ModuleType("PIL")
    pil.Image = types.SimpleNamespace(
        open=lambda buf: FakeImage() if isinstance(buf, io.BytesIO) else None
    )
    monkeypatch.setitem(sys.modules, "PIL", pil)

    assert mm._decode_one(b"png-bytes", "image", codec="auto") == (320, 240, 7)
    assert mm._decode_one(b"png-bytes", "image", codec="real") == (320, 240, 7)
    # video has no wired codec → auto falls back, real raises
    assert mm._decode_one(b"vid", "video", codec="auto") == mm._fake_decode(b"vid")
    import pytest

    with pytest.raises(ImportError):
        mm._decode_one(b"vid", "video", codec="real")


def test_real_codec_parse_failure_auto_falls_back(monkeypatch):
    """A payload the real codec rejects must not kill an auto-mode job."""
    import sys
    import types

    pil = types.ModuleType("PIL")

    def boom(buf):
        raise ValueError("corrupt image")

    pil.Image = types.SimpleNamespace(open=boom)
    monkeypatch.setitem(sys.modules, "PIL", pil)

    assert mm._decode_one(b"junk", "image", codec="auto") == mm._fake_decode(b"junk")
    import pytest

    with pytest.raises(ValueError, match="corrupt"):
        mm._decode_one(b"junk", "image", codec="real")
