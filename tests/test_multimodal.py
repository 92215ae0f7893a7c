"""Multimodal plumbing: schemas, mapInPandas batch shapes, 1:N frame
sampling, metadata pushdown, and the stubbed-decoder contract."""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media_df(spark):
    pdf = MM.make_media(n=60, seed=42)
    return spark.createDataFrame(pdf, schema=MM.MEDIA).repartition(4)


def test_default_decoder_is_stubbed(spark, media_df):
    feats = MM.image_features(media_df)  # default decode_image raises
    with pytest.raises(Exception, match="NotImplementedError|codec library"):
        feats.collect()


def test_image_features_with_fake_decoder(spark, media_df):
    feats = MM.image_features(media_df, decoder=MM.fake_rgb_decoder).collect()
    pdf = MM.make_media(n=60, seed=42)
    imgs = pdf[pdf["kind"] == "image"]
    assert len(feats) == len(imgs)
    by_id = {r["media_id"]: r for r in feats}
    for _, row in imgs.iterrows():
        arr = MM.fake_rgb_decoder(row["payload"], row["codec"])
        r = by_id[row["media_id"]]
        assert (r["width"], r["height"]) == (arr.shape[1], arr.shape[0])
        assert r["mean_r"] == pytest.approx(arr.reshape(-1, 3).mean(0)[0])


def test_metadata_pushdown_filters_before_python(spark, media_df):
    feats = MM.image_features(
        media_df, decoder=MM.fake_rgb_decoder, min_width=32
    ).collect()
    assert all(r["width"] >= 32 for r in feats)
    assert 0 < len(feats) < 20  # the filter actually pruned


def test_resize_round_trip(spark, media_df):
    out = MM.resize_images(media_df, target=16, decoder=MM.fake_rgb_decoder)
    rows = out.collect()
    assert rows and all(r["width"] == 16 and r["height"] == 16 for r in rows)
    arr = MM.fake_rgb_decoder(bytes(rows[0]["payload"]), "fake-rgb")
    assert arr.shape == (16, 16, 3)


def test_frame_sampling_one_to_many(spark, media_df):
    frames = MM.sample_frames(media_df, every_n=10).collect()
    pdf = MM.make_media(n=60, seed=42)
    vids = pdf[pdf["kind"] == "video"]
    expected = sum(len(range(0, int(n), 10)) for n in vids["n_frames"])
    assert len(frames) == expected
    assert all(r["frame_idx"] % 10 == 0 for r in frames)


def test_audio_stats_consistency(spark, media_df):
    stats = MM.audio_stats(media_df).collect()
    pdf = MM.make_media(n=60, seed=42)
    assert len(stats) == (pdf["kind"] == "audio").sum()
    assert all(r["meta_consistent"] for r in stats)
    assert all(r["rms"] > 0 for r in stats)


def test_null_metadata_rows_handled(spark):
    """MEDIA declares its metadata/payload columns nullable: a NULL width
    must not vanish an image through the default (no-op) width filter,
    and NULL payload / n_frames / sample_rate rows must be excluded
    instead of crashing the executor with TypeError."""
    import pandas as pd

    base = MM.make_media(n=30, seed=7)
    img = base[base["kind"] == "image"].iloc[0]
    vid = base[base["kind"] == "video"].iloc[0]
    aud = base[base["kind"] == "audio"].iloc[0]
    rows = pd.DataFrame(
        [
            # image with NULL width but a valid payload: processed
            {**img.to_dict(), "media_id": 1001, "width": None},
            # image with NULL payload: excluded, not crashed
            {**img.to_dict(), "media_id": 1002, "payload": None},
            # video with NULL n_frames: excluded
            {**vid.to_dict(), "media_id": 1003, "n_frames": None},
            # audio with NULL sample_rate: excluded
            {**aud.to_dict(), "media_id": 1004, "sample_rate": None},
        ]
    )
    df = spark.createDataFrame(rows, schema=MM.MEDIA)
    feats = MM.image_features(df, decoder=MM.fake_rgb_decoder).collect()
    assert [r["media_id"] for r in feats] == [1001]
    assert MM.sample_frames(df, every_n=5).count() == 0
    assert MM.audio_stats(df).count() == 0


def test_min_width_one_is_honored(spark):
    """An explicit min_width=1 must gate width-0 rows (ADVICE r3: the old
    `> 1` heuristic could not distinguish an explicit 1 from the default
    and silently skipped the filter); the None default applies no gate."""
    pdf = MM.make_media(n=40, seed=3)
    imgs = pdf[pdf["kind"] == "image"]
    zero_id = imgs["media_id"].iloc[0]
    pdf.loc[pdf["media_id"] == zero_id, "width"] = 0
    df = spark.createDataFrame(pdf, schema=MM.MEDIA)

    ungated = {
        r["media_id"]
        for r in MM.image_features(df, decoder=MM.fake_rgb_decoder).collect()
    }
    gated = {
        r["media_id"]
        for r in MM.image_features(
            df, decoder=MM.fake_rgb_decoder, min_width=1
        ).collect()
    }
    assert zero_id in ungated  # None default: no width gate
    assert gated == ungated - {zero_id}  # explicit 1: gate applies
