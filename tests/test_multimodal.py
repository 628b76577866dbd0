"""X5 multimodal plumbing: media struct schema, mapInPandas decode stage
(fake deterministic decoder), frame-sample explode, and the stub guard."""

from __future__ import annotations

import pytest

from hielo_spark.io import load_table
from hielo_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return MM.attach_fake_media(load_table(spark, sf_dir, "documents").select("doc_id").limit(50))


def test_media_struct_schema(media):
    names = [fld.name for fld in media.schema["media"].dataType.fields]
    assert names == ["uri", "mime", "n_bytes", "payload"]
    row = media.first()
    assert row["media"]["mime"] == "image/png"
    assert row["media"]["n_bytes"] == len(row["media"]["payload"])


def test_decode_features_deterministic(media):
    out1 = {r["doc_id"]: r.asDict() for r in MM.decode_image_features(media, fake=True).collect()}
    out2 = {r["doc_id"]: r.asDict() for r in MM.decode_image_features(media, fake=True).collect()}
    assert len(out1) == 50
    sample = next(iter(out1.values()))
    assert len(sample["feature"]) == 8
    assert all(0.0 <= x <= 1.0 for x in sample["feature"])
    assert out1.keys() == out2.keys()
    assert all(out1[k]["feature"] == out2[k]["feature"] for k in out1)


def test_decode_without_codec_raises(media):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises((PythonException, Py4JJavaError)) as ei:
        MM.decode_image_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "image decode requires" in str(ei.value)


def test_frame_sample_plan(media):
    frames = MM.frame_sample_plan(media, every_n=10)
    # payload is 136 bytes → n_frames = 1 → one frame (idx 0) per row
    assert frames.count() == 50
    assert frames.select("frame_idx").distinct().collect()[0][0] == 0
