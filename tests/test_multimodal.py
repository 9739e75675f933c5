"""Multimodal plumbing: schema, Arrow batch shape, deterministic fake
decode (the codec call itself is stubbed — see operators/multimodal)."""

from __future__ import annotations

import zlib

from chrono_ts_spark.operators.multimodal import (
    _fake_decode,
    multimodal_features,
    with_binary_payload,
)


def test_payload_schema(spark):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "spark engine")], "doc_id long, text string"
    )
    p = with_binary_payload(docs)
    assert dict(p.dtypes) == {
        "doc_id": "bigint",
        "content": "binary",
        "meta": "struct<n_bytes:int,modality:string,format:string>",
    }


def test_feature_extraction_deterministic(spark):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "spark engine"), (2, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in multimodal_features(spark, docs).collect()}
    assert len(out) == 3
    for doc_id, text in [(0, "hello world"), (1, "spark engine"), (2, "")]:
        blob = text.encode()
        r = out[doc_id]
        assert r.n_bytes == len(blob)
        assert r.checksum == zlib.crc32(blob)
        assert [round(x, 5) for x in r.feature] == [
            round(x, 5) for x in _fake_decode(blob, r.modality)
        ]
    # modality assignment is doc_id mod 3
    assert out[0].modality == "image"
    assert out[1].modality == "audio"
    assert out[2].modality == "video"
