"""Multimodal binary-column plumbing + Structured Streaming tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databridge_etl_tools_spark.operators import multimodal as MM
from databridge_etl_tools_spark.streaming import events as SE


@pytest.fixture()
def images(spark):
    rows = [
        (1, MM.pack_fake_image(4, 3, seed=0)),
        (2, MM.pack_fake_image(8, 2, seed=5)),
    ]
    return spark.createDataFrame(rows, "img_id int, content binary")


def test_image_metadata_header_only(spark, images):
    out = {r.img_id: r for r in MM.image_metadata(images).collect()}
    assert (out[1].width, out[1].height, out[1].format) == (4, 3, "fakeimg")
    assert (out[2].width, out[2].height) == (8, 2)


def test_image_features_full_decode(spark, images):
    out = {r.img_id: r for r in MM.image_features(images).collect()}
    # image 1: pixels 0..11 → mean 5.5
    assert out[1].n_pixels == 12 and abs(out[1].mean_pixel - 5.5) < 1e-9
    assert out[2].n_pixels == 16


def test_resize_roundtrip(spark, images):
    small = MM.resize_images(images, 2, 2)
    meta = {r.img_id: r for r in MM.image_metadata(small).collect()}
    assert (meta[1].width, meta[1].height) == (2, 2)
    feats = MM.image_features(small).first()
    assert feats.n_pixels == 4


def test_ppm_decodes_end_to_end_without_pil(spark):
    """A REAL uncompressed image format (binary PPM / P6) runs the
    whole decode→metadata→features→resize seam with the stdlib alone
    (r3 verdict #5) — no import gate in the path."""
    ppm = MM.pack_ppm(4, 3, seed=0)  # RGB pixels 0..35
    mixed = spark.createDataFrame(
        [(1, ppm), (2, MM.pack_fake_image(4, 3, seed=0))],
        "img_id int, content binary",
    )
    meta = {r.img_id: r for r in MM.image_metadata(mixed).collect()}
    assert (meta[1].width, meta[1].height, meta[1].format) == (4, 3, "ppm")
    assert meta[2].format == "fakeimg"

    feats = {r.img_id: r for r in MM.image_features(mixed).collect()}
    assert feats[1].n_pixels == 12  # pixels, not channel bytes
    assert abs(feats[1].mean_pixel - sum(range(36)) / 36) < 1e-9

    small = MM.resize_images(mixed, 2, 2)
    meta2 = {r.img_id: r for r in MM.image_metadata(small).collect()}
    assert (meta2[1].width, meta2[1].height, meta2[1].format) == (2, 2, "ppm")
    assert (meta2[2].width, meta2[2].height, meta2[2].format) == (2, 2, "fakeimg")
    # resized PPM is still a valid P6 the parser round-trips
    content = {r.img_id: bytes(r.content) for r in small.collect()}
    w, h, maxval, px = MM._parse_ppm(content[1])
    assert (w, h, maxval, len(px)) == (2, 2, 255, 12)


def test_ppm_header_comments_and_truncation():
    ok = b"P6\n# a comment\n2 1\n255\n" + bytes(6)
    assert MM._parse_ppm(ok)[:2] == (2, 1)
    import pytest as _pt

    with _pt.raises(ValueError):
        MM._parse_ppm(b"P6\n2 1\n255\n" + bytes(3))  # truncated pixels
    with _pt.raises(ValueError):
        MM._parse_ppm(b"P5\n2 1\n255\n" + bytes(2))  # not P6


def test_real_image_bytes_raise_not_implemented(spark):
    df = spark.createDataFrame([(1, b"\x89PNG\r\n...")], "img_id int, content binary")
    with pytest.raises(Exception) as ei:
        MM.image_features(df).collect()
    assert "NotImplementedError" in str(ei.value) or "Pillow" in str(ei.value)


def test_audio_frame_sample(spark):
    df = spark.createDataFrame(
        [(1, MM.pack_fake_audio(16000, 100, seed=1))], "aud_id int, content binary"
    )
    out = MM.audio_frame_sample(df, every_n=4).first()
    assert out.sample_rate == 4000 and out.n_kept == 25
    assert len(out.kept) == 25


def test_binary_stats_jvm_only(spark):
    df = spark.createDataFrame([(1, b"abc")], "id int, content binary")
    r = MM.binary_stats(df, "content", "id").first()
    assert r.n_bytes == 3
    assert r.content_md5 == "900150983cd24fb0d6963f7d28e17f72"


# ---------------- streaming ----------------


def test_available_now_drain_matches_batch(spark, tmp_path):
    # stage as micro-batch files (events.parquet is NANOS; re-stage as
    # ntz so the file stream source can read it)
    from databridge_etl_tools_spark.registry import table as load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    staging = str(tmp_path / "staging")
    ev.repartition(3).write.parquet(staging)

    stream = SE.read_event_stream(spark, staging)
    agg = SE.windowed_counts(stream, window="1 hour", watermark="2 hours")
    # append mode only emits closed windows; count totals instead via
    # a complete-mode drain of the raw stream
    out = SE.run_available_now(stream, "drained_events")
    assert out.count() == ev.count()


def test_sessionize_stream_matches_batch(spark, tmp_path):
    from databridge_etl_tools_spark.registry import table as load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    staging = str(tmp_path / "sess_staging")
    ev.write.parquet(staging)

    batch_sessions = SE.sessionize_batch(ev, gap_minutes=30)
    b = {
        (r.user_id, str(r.session_start)): r.n_events
        for r in batch_sessions.collect()
    }

    stream = SE.read_event_stream(spark, staging)
    q = (
        SE.sessionize_stream(stream, gap="30 minutes")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    s = {
        (r.user_id, str(r.session_start)): r.n_events
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert b == s


def test_stateful_running_totals_across_batches(spark, tmp_path):
    from databridge_etl_tools_spark.registry import table as load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, "/root/testdata/sf0.001", "events").limit(200).cache()
    staging = str(tmp_path / "state_staging")
    # two files → two micro-batches (maxFilesPerTrigger=1)
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(staging)
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(staging)

    stream = SE.read_event_stream(spark, staging)
    q = (
        SE.running_user_totals(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("running_totals")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM running_totals").collect()

    # final cumulative per user == plain batch totals
    final = {}
    for r in out:
        cur = final.get(r.user_id)
        if cur is None or r.cum_events > cur[0]:
            final[r.user_id] = (r.cum_events, r.cum_value)
    expected = {
        r.user_id: (r.n, r.v)
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert set(final) == set(expected)
    for u, (n, v) in expected.items():
        assert final[u][0] == n
        assert abs(final[u][1] - v) < 1e-9
    # state really carried across batches: some user must appear twice
    from collections import Counter

    seen = Counter(r.user_id for r in out)
    assert max(seen.values()) == 2


def test_checkpointed_stream_does_not_reprocess(spark, tmp_path):
    """Checkpoint recovery: a restarted availableNow query with the
    same checkpoint dir processes only files added since."""
    from databridge_etl_tools_spark.registry import table as load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").limit(100).cache()
    staging = str(tmp_path / "ckpt_staging")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "ckpt_out")
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(staging)

    def drain():
        q = (
            SE.read_event_stream(spark, staging)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    first = spark.read.parquet(sink).count()
    assert first == ev.where(F.col("event_id") % 2 == 0).count()

    # restart with no new files → nothing reprocessed
    drain()
    assert spark.read.parquet(sink).count() == first

    # add a second file → only its rows are appended
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(staging)
    drain()
    assert spark.read.parquet(sink).count() == ev.count()


# ---- real WAV (RIFF PCM16) through the audio seam -------------------


def test_wav_audio_features(spark):
    from databridge_etl_tools_spark.operators import multimodal as MM

    rows = [
        (1, MM.pack_wav(16000, 1600, seed=3)),
        (2, MM.pack_wav(8000, 800, seed=5, channels=2)),
        (3, MM.pack_fake_audio(1000, 100, seed=1)),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in MM.audio_features(df).collect()}
    w1 = out[1]
    assert (w1.container, w1.sample_rate, w1.channels, w1.n_samples) == (
        "wav", 16000, 1, 1600,
    )
    assert abs(w1.duration_s - 0.1) < 1e-9
    assert 0 < w1.rms < 10000 and 0 < w1.peak <= 10000
    assert 0.0 < w1.zcr < 1.0
    w2 = out[2]
    assert w2.channels == 2 and w2.container == "wav"
    f3 = out[3]
    assert f3.container == "fakeaud" and f3.sample_rate == 1000


def test_wav_features_match_pure_python(spark):
    """Independent twin: recompute RMS/peak/zcr from the same PCM with
    the stdlib only."""
    import struct
    import wave
    import io

    import numpy as np

    from databridge_etl_tools_spark.operators import multimodal as MM

    blob = MM.pack_wav(4000, 400, seed=9)
    with wave.open(io.BytesIO(blob), "rb") as w:
        pcm = w.readframes(w.getnframes())
    xs = struct.unpack(f"<{len(pcm)//2}h", pcm)
    exp_rms = (sum(v * v for v in xs) / len(xs)) ** 0.5
    exp_peak = max(abs(v) for v in xs)
    signs = [v < 0 for v in xs]
    exp_zcr = sum(a != b for a, b in zip(signs[1:], signs[:-1])) / (len(xs) - 1)

    df = spark.createDataFrame([(1, blob)], "media_id long, content binary")
    r = MM.audio_features(df).first()
    assert abs(r.rms - exp_rms) < 1e-9
    assert r.peak == exp_peak
    # numpy zcr averages over the same n-1 comparisons
    assert abs(r.zcr - exp_zcr) < 1e-9


def test_image_ahash_neardup_pairs(spark):
    """aHash near-dup: a lightly-noised copy collapses onto its
    original (small hamming), distinct images don't; banded join is
    pigeonhole-exact at distance ≤ 4."""
    from databridge_etl_tools_spark.operators.multimodal import (
        image_ahash,
        image_neardup_pairs,
        pack_ppm_random,
    )

    base = pack_ppm_random(32, 24, seed=7)
    noised = bytearray(base)
    # nudge a handful of pixel bytes by ±1 — far from any 8×8-cell
    # mean threshold, so the perceptual hash barely moves
    for off in range(20, 40):
        noised[off] = min(255, noised[off] + 1)
    rows = [
        (0, base),
        (1, bytes(noised)),
        (2, pack_ppm_random(32, 24, seed=99)),
        (3, pack_ppm_random(16, 16, seed=360)),
    ]
    df = spark.createDataFrame(rows, "item_id bigint, content binary")
    sig = {r["item_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert len(sig) == 4
    ham01 = bin(sig[0] ^ sig[1]).count("1")
    assert ham01 <= 4  # noised copy stays perceptually identical
    # genuinely different images are far apart
    assert bin(sig[0] ^ sig[2]).count("1") > 4
    assert bin(sig[0] ^ sig[3]).count("1") > 4
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in image_neardup_pairs(df).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == ham01
    # exactness: every pair under the banded join matches brute force
    brute = {
        (a, b): bin(sig[a] ^ sig[b]).count("1")
        for a in sig for b in sig if a < b and bin(sig[a] ^ sig[b]).count("1") <= 4
    }
    assert pairs == brute


def test_audio_fingerprint_neardup_pairs(spark):
    """Derivative-sign fingerprint: gain shift and sparse noise keep a
    copy within a few bits; different audio is far; banded join
    matches brute force (exactness)."""
    import numpy as np

    from databridge_etl_tools_spark.operators.multimodal import (
        _decode_fake,
        audio_fingerprint,
        audio_neardup_pairs,
        pack_fake_audio_random,
    )

    base = pack_fake_audio_random(8000, 2000, seed=5)
    _k, meta, data = _decode_fake(base)
    # gain/offset change: +10 on every sample (clipped) — frame deltas
    # barely move
    arr = np.frombuffer(data, dtype=np.uint8).astype(int)
    shifted = np.clip(arr + 10, 0, 255).astype(np.uint8).tobytes()
    copy = f"FAKEAUD:8000:{meta['n_samples']}:".encode() + shifted
    rows = [
        (0, base),
        (1, copy),
        (2, pack_fake_audio_random(8000, 2000, seed=77)),
        (3, pack_fake_audio_random(16000, 4000, seed=123)),
    ]
    df = spark.createDataFrame(rows, "item_id bigint, content binary")
    sig = {r["item_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    assert bin(sig[0] ^ sig[1]).count("1") <= 4
    assert bin(sig[0] ^ sig[2]).count("1") > 4
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in audio_neardup_pairs(df).collect()
    }
    brute = {
        (a, b): bin(sig[a] ^ sig[b]).count("1")
        for a in sig for b in sig
        if a < b and bin(sig[a] ^ sig[b]).count("1") <= 4
    }
    assert pairs == brute and (0, 1) in pairs
