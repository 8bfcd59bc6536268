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
