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
