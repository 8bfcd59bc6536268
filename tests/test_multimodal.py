"""Multimodal plumbing tests: binary payload determinism, Arrow
mapInPandas batch shape, frame expansion, and the decode stub
contract (SURVEY.md extensions; operators/multimodal.py)."""

from __future__ import annotations

import pytest

from python_sql_datawarehouse_project_spark.operators import multimodal as mm


def test_corpus_schema_and_determinism(spark, sf_dir):
    c1 = mm.mm_corpus(spark, sf_dir)
    assert dict(c1.dtypes)["payload"] == "binary"
    meta = [f for f in c1.schema.fields if f.name == "meta"][0]
    assert {x.name for x in meta.dataType.fields} == {
        "format", "n_bytes", "width", "height", "duration_s",
    }
    r1 = c1.orderBy("doc_id").limit(3).collect()
    r2 = mm.mm_corpus(spark, sf_dir).orderBy("doc_id").limit(3).collect()
    assert [bytes(r.payload) for r in r1] == [bytes(r.payload) for r in r2]
    assert all(len(bytes(r.payload)) == 128 for r in r1)


def test_decode_features_deterministic_and_complete(spark, sf_dir):
    f = mm.mm2_decode_features(spark, sf_dir)
    rows = {r.doc_id: r for r in f.collect()}
    n_docs = mm.mm_corpus(spark, sf_dir).count()
    assert len(rows) == n_docs
    # features recompute identically driver-side (same byte math)
    sample = mm.mm_corpus(spark, sf_dir).filter("doc_id = 0").collect()[0]
    want = mm.fake_decode_features(bytes(sample.payload))
    got = rows[0]
    assert [got.f_len, got.f_sum, got.f_mean, got.f_var, got.f_first, got.f_last] == want


def test_frame_sampling_shape(spark, sf_dir):
    fr = mm.mm3_frame_sample(spark, sf_dir)
    one = fr.filter("doc_id = 0").orderBy("frame_idx").collect()
    # 128 bytes -> 8 frames of 16, stride 4 -> frames 0 and 4
    assert [r.frame_idx for r in one] == [0, 4]
    assert all(r.frame_len == mm.FRAME_BYTES for r in one)


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG...")


# -- real stdlib BMP decode through the seam (VERDICT r5 #7) ----------
def _checker(width, height):
    """Deterministic checkerboard-ish test image, top-down (r,g,b)."""
    return [
        [((x * 37) % 256, (y * 53) % 256, (x * y) % 256) for x in range(width)]
        for y in range(height)
    ]


def test_bmp_codec_round_trips():
    for w, h in ((1, 1), (3, 2), (5, 4)):  # 5px rows exercise stride pad
        px = _checker(w, h)
        blob = mm.encode_bmp(w, h, px)
        assert blob[:2] == b"BM"
        assert mm.decode_bmp(blob) == (w, h, px)


def test_bmp_decoder_rejects_non_bmp_and_truncation():
    with pytest.raises(ValueError):
        mm.decode_bmp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    blob = mm.encode_bmp(3, 2, _checker(3, 2))
    with pytest.raises(ValueError):
        mm.decode_bmp(blob[:-4])


def test_real_bmp_decode_runs_end_to_end_on_executors(spark):
    """The mm2 seam executing a GENUINE decode: real BMP bytes go in
    as the payload column, the stdlib parser runs inside mapInPandas
    on executors, and the features come back computed over decoded
    PIXELS — not file bytes (byte 0 of a BMP file is ord('B'); pixel
    channel 0 is the image's own red value, so f_first alone proves
    decoding happened)."""
    imgs = [(i, mm.encode_bmp(4 + i, 3, _checker(4 + i, 3))) for i in range(6)]
    df = spark.createDataFrame(
        [(i, blob, "bmp", len(blob)) for i, blob in imgs],
        "doc_id long, payload binary, format string, n_bytes int",
    ).repartition(3)
    out = {
        r["doc_id"]: r
        for r in mm.decode_features(spark, df, mm.bmp_decode_features).collect()
    }
    assert len(out) == len(imgs)
    for i, blob in imgs:
        exp = mm.bmp_decode_features(blob)
        r = out[i]
        got = [r.f_len, r.f_sum, r.f_mean, r.f_var, r.f_first, r.f_last]
        assert got == exp, (i, got, exp)
        # decoded-pixel evidence: first channel is the image's (0,0)
        # red value (0 for _checker), never ord('B') = 66
        assert r.f_first == 0.0
        assert r.f_len == (4 + i) * 3 * 3  # w*h*3 channels, not file size


def test_mm2_decode_fn_seam(spark, sf_dir):
    # VERDICT r2 #8: a replacement decoder must slot into mm2 without
    # touching the oracled pipeline — same schema, same rows-in/rows-out
    # plumbing, only the per-payload feature values change.
    def _toy_decoder(payload: bytes) -> list[float]:
        # Stand-in for a real imaging-library extractor: any callable
        # with the bytes -> 6-floats contract slots into the seam.
        # (Defined as a closure so cloudpickle ships it by value — a
        # production decoder would live in an importable package.)
        return [
            float(payload[0]),
            float(payload[1]),
            float(payload[2] + payload[3]),
            0.5,
            -1.0,
            float(len(payload)),
        ]

    default = mm.mm2_decode_features(spark, sf_dir)
    injected = mm.mm2_decode_features(spark, sf_dir, decode_fn=_toy_decoder)
    assert injected.schema == default.schema
    rows = {r["doc_id"]: r for r in injected.collect()}
    assert len(rows) == default.count()

    # Verify the injected features are the toy decoder's output on the
    # actual payloads (the seam really feeds payload bytes through).
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in mm.mm_corpus(spark, sf_dir).select("doc_id", "payload").collect()
    }
    for doc_id, r in list(rows.items())[:25]:
        exp = _toy_decoder(payloads[doc_id])
        got = [r["f_len"], r["f_sum"], r["f_mean"], r["f_var"], r["f_first"], r["f_last"]]
        assert got == exp, (doc_id, got, exp)

    # And the default path still produces the oracle-pinned fake features.
    d0 = {r["doc_id"]: r for r in default.collect()}
    some = next(iter(payloads))
    assert d0[some]["f_len"] == 128.0
