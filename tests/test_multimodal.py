"""Multimodal plumbing: binary columns through mapInPandas with the
deterministic fake decoder; frame-sampling plan."""

import pytest
from pyspark.sql import functions as F

from historical_obs_platform_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, bytes([i % 256 for i in range(1000)]), ("image/png", 0, 0, None)),
        (2, b"\x89PNG fake content", ("image/png", 0, 0, None)),
        (3, None, ("image/png", None, None, None)),
        (4, b"video-bytes", ("video/mp4", 0, 0, 3500)),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_extract_features_fake_decoder(media):
    out = MM.extract_features(media, decoder=MM.FakeDecoder()).toPandas()
    out = out.set_index("media_id").sort_index()
    assert out.loc[1, "n_bytes"] == 1000
    assert len(out.loc[1, "feature"]) == MM.FakeDecoder.feature_dim
    assert out.loc[3, "sha1"] is None  # null content survives
    # determinism: same bytes -> same features
    again = (
        MM.extract_features(media, decoder=MM.FakeDecoder())
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    assert list(out.loc[2, "feature"]) == list(again.loc[2, "feature"])
    assert (out.loc[1, "width"] >= 0) and (out.loc[1, "height"] >= 0)


def test_decode_stub_raises_without_decoder(media):
    with pytest.raises(NotImplementedError):
        MM.extract_features(media)  # no codec in this container


def test_frame_sample_plan(media):
    frames = MM.frame_sample_plan(media, every_ms=1000).toPandas()
    v = frames[frames["media_id"] == 4]
    assert sorted(v["frame_ms"]) == [0, 1000, 2000, 3000]
    # zero/None duration media yield exactly the t=0 frame
    assert (frames[frames["media_id"] == 1]["frame_ms"] == 0).all()


def test_resize_plan_matches_oracle(spark, oracle_con):
    from historical_obs_platform_spark import registry

    from .conftest import assert_matches_oracle

    registry.load_all()
    assert_matches_oracle(spark, oracle_con, "m_resize_plan")


def test_resize_plan_invariants(spark):
    """Long edge capped at target, aspect never upscaled, small
    images untouched."""
    from historical_obs_platform_spark import registry
    from pyspark.sql import functions as F

    from .conftest import SF_DIR

    registry.load_all()
    out = registry.QUERIES["m_resize_plan"](spark, SF_DIR)
    assert (
        out.where(
            F.greatest("out_w", "out_h") > 256
        ).count()
        == 0
    )
    assert (
        out.where(
            ~F.col("resized")
            & (
                (F.col("out_w") != F.col("width"))
                | (F.col("out_h") != F.col("height"))
            )
        ).count()
        == 0
    )
    assert (
        out.where(
            (F.col("out_w") > F.col("width"))
            | (F.col("out_h") > F.col("height"))
        ).count()
        == 0
    )
