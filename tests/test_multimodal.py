"""Multimodal plumbing: schema contract, stubbed decode behavior, 1->n
frame sampling shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from hadoop_0_20_2_ljx_spark import catalog
from hadoop_0_20_2_ljx_spark.extensions import multimodal
from tests.conftest import SF_SMOKE


def _media(spark):
    docs = catalog.load(spark, SF_SMOKE, "documents").limit(20)
    return multimodal.attach_binary_payload(docs, "doc_id", "text")


def test_media_schema_contract(spark):
    m = _media(spark)
    assert dict(m.dtypes) == {
        "doc_id": "bigint",
        "media_type": "string",
        "payload": "binary",
        "meta": "struct<n_bytes:bigint,mime:string,checksum:string>",
    }
    row = m.filter(F.col("doc_id") == 0).collect()[0]
    assert row.meta.n_bytes == len(row.payload)


def test_decode_stub_raises_without_fake(spark):
    m = _media(spark)
    with pytest.raises(PythonException, match="NotImplementedError"):
        multimodal.decode_features(m, fake=False).collect()


def test_fake_decode_features(spark):
    m = _media(spark)
    feats = {r.doc_id: r for r in multimodal.decode_features(m, fake=True).collect()}
    src = {r.doc_id: r.text for r in catalog.load(spark, SF_SMOKE, "documents").limit(20).collect()}
    for doc_id, text in src.items():
        b = text.encode()
        assert feats[doc_id].n_bytes == len(b)
        assert feats[doc_id].first_byte == b[0]
        assert feats[doc_id].byte_sum64 == sum(b[:64])


def test_frame_sample_explodes_rows(spark):
    m = _media(spark).limit(3)
    frames = multimodal.frame_sample(m, every_n_bytes=16).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r.frame_off)
    sizes = {r.doc_id: r.meta.n_bytes for r in m.collect()}
    for doc_id, offs in by_doc.items():
        expected = list(range(0, sizes[doc_id], 16))
        assert sorted(offs) == expected


def test_resize_payload_contract(spark):
    import hashlib

    m = _media(spark).limit(5)
    out = multimodal.resize_payload(m, target_w=8, target_h=4, fake=True).collect()
    assert len(out) == 5
    for r in out:
        assert len(r.payload) == 8 * 4
        assert (r.width, r.height) == (8, 4)
        assert r.checksum == hashlib.md5(bytes(r.payload)).hexdigest()


def test_resize_real_decode_raises(spark):
    import pytest as _pytest

    m = _media(spark).limit(1)
    with _pytest.raises(Exception, match="NotImplementedError|decode"):
        multimodal.resize_payload(m, fake=False).collect()
