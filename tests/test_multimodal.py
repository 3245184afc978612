"""Multimodal binary-column plumbing: Arrow-batched mapInPandas decode
(stubbed codec, real dataflow), resize planning, frame sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from activity_classifier_spark_cassandra_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    MODALITY_AUDIO,
    MODALITY_IMAGE,
    encode_fake_image,
    extract_media_features,
    resize_plan,
    sample_frames,
)


def _media_df(spark):
    rows = [
        (0, encode_fake_image(640, 480, 3, payload=b"x" * 100), "image/fake"),
        (1, encode_fake_image(64, 64, 1), "image/fake"),
        (2, encode_fake_image(0, 0, 0, MODALITY_AUDIO, 441), "audio/fake"),
        (3, b"\x89PNG\r\n....", "image/png"),  # real codec -> stubbed
        (4, None, "image/fake"),               # null payload
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_extract_media_features(spark):
    feats = {
        r["media_id"]: r.asDict()
        for r in extract_media_features(_media_df(spark)).collect()
    }
    assert feats[0]["width"] == 640 and feats[0]["height"] == 480
    assert feats[0]["n_pixels"] == 640 * 480
    assert feats[0]["payload_bytes"] == 100
    assert feats[0]["decode_ok"] is True
    assert feats[1]["channels"] == 1
    assert feats[2]["modality"] == MODALITY_AUDIO
    # unknown magic (real PNG) hits the NotImplementedError stub ->
    # recorded as a decode failure, row preserved
    assert feats[3]["decode_ok"] is False and feats[3]["modality"] == -1
    assert feats[4]["decode_ok"] is False


def test_extract_prunes_payload_column(spark):
    out = extract_media_features(_media_df(spark))
    assert "content" not in out.columns
    assert out.schema["modality"].dataType.typeName() == "integer"


def test_resize_plan(spark):
    plans = {
        r["media_id"]: r.asDict()
        for r in resize_plan(_media_df(spark), max_side=256).collect()
    }
    big = plans[0]  # 640x480 -> scale 256/640 = 0.4
    assert big["scale"] == 0.4
    assert (big["target_width"], big["target_height"]) == (256, 192)
    small = plans[1]  # 64x64 unchanged
    assert small["scale"] == 1.0
    assert (small["target_width"], small["target_height"]) == (64, 64)


def test_sample_frames(spark):
    frames = spark.createDataFrame(
        [(0, i) for i in range(100)], ["media_id", "frame_idx"]
    )
    kept = sample_frames(frames, every_n=10).collect()
    assert sorted(r["frame_idx"] for r in kept) == list(range(0, 100, 10))


def test_mapinpandas_partition_behavior(spark):
    """The decode must be a pure per-partition map: repartitioning the
    input must not change the result set (no cross-partition state)."""
    df = _media_df(spark)
    a = {r["media_id"] for r in extract_media_features(df).collect()}
    b = {
        r["media_id"]
        for r in extract_media_features(df.repartition(5)).collect()
    }
    assert a == b == {0, 1, 2, 3, 4}


def test_modality_label_usable_downstream(spark):
    """Extracted metadata joins/classifies like any typed column."""
    feats = extract_media_features(_media_df(spark))
    by_modality = (
        feats.filter(F.col("decode_ok"))
        .groupBy("modality")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = {r["modality"]: r["n"] for r in by_modality}
    assert got == {MODALITY_IMAGE: 2, MODALITY_AUDIO: 1}


def test_q_media_features_matches_closed_form(spark):
    """The registered end-to-end query (synth binary -> mapInPandas
    decode) must equal the closed-form arithmetic oracle."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{sf}/documents.parquet')"
    )
    sdf = entrymod.queries()["q_media_features"](spark, sf).toPandas()
    odf = con.execute(entrymod.oracle_sql()["q_media_features"]).df()
    cols = sorted(sdf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(s, o, check_dtype=False)
    con.close()
