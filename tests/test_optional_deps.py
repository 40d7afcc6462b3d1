"""Deps-present CI leg (r10 VERDICT item 6): the REAL codec and
tokenizer paths -- ``codec="auto"`` decode/resize through Pillow and
the TIKTOKEN token-count backend -- never execute in a container
without those libraries, so they could rot unnoticed where the deps
exist.  These tests skip cleanly here (Pillow and tiktoken are absent
in this sandbox) and exercise the real paths end-to-end wherever the
dependencies are installed.

The injected-module fakes in test_multimodal_codec.py / the injected
tokenizer in test_tokenizer.py pin the dispatch SEAMS in every
environment; this file pins the real backends' behavior where they
can run.
"""

from __future__ import annotations

import importlib.util
import io

import pytest
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.functions.tokenizer import (
    TIKTOKEN,
    resolve_tokenizer,
    tiktoken_available,
    token_count,
)
from nyc_crash_mapper_etl_script_spark.operators.multimodal import (
    decode_media,
    extract_features,
    resize_images,
    resize_media,
)

_HAS_PIL = importlib.util.find_spec("PIL") is not None
_HAS_TIKTOKEN = tiktoken_available()

pil = pytest.mark.skipif(_HAS_PIL is False, reason="Pillow not installed")
tik = pytest.mark.skipif(
    _HAS_TIKTOKEN is False,
    reason="tiktoken (with vocab cache) not available",
)


def _png_bytes(w=16, h=8, color=(200, 40, 40)) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


@pil
def test_real_resize_produces_png_of_target_box():
    from PIL import Image

    out = resize_media(_png_bytes(16, 8), 4, 4)
    img = Image.open(io.BytesIO(out))
    assert img.format == "PNG" and img.size == (4, 4)


@pil
def test_real_decode_features_are_pixel_intensities():
    # a uniform mid-gray image decodes to n identical intensities
    feats = decode_media(_png_bytes(16, 8, (128, 128, 128)), n_features=4)
    assert len(feats) == 4
    assert all(abs(f - 128 / 255.0) < 0.02 for f in feats)


@pil
def test_real_resize_strict_raises_on_undecodable():
    with pytest.raises(Exception):
        resize_media(b"not an image", 4, 4, strict=True)


@pil
def test_codec_auto_through_spark(spark):
    """The full mapInPandas plumbing with codec='auto' on executors
    where Pillow exists: image payloads really resize (PNG at the new
    box), features are real pixel intensities in [0, 1]."""
    from PIL import Image

    rows = [
        (1, "image", _png_bytes(16, 8), ("image/png", 16, 8, 0)),
        (2, "audio", b"\x00\x01\x02", ("audio/wav", 0, 0, 900)),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int>",
    )
    resized = {
        r["media_id"]: r
        for r in resize_images(media, 4, 4, codec="auto").collect()
    }
    img = Image.open(io.BytesIO(bytes(resized[1]["payload"])))
    assert img.size == (4, 4)
    assert resized[1]["meta"]["width"] == 4
    assert bytes(resized[2]["payload"]) == b"\x00\x01\x02"  # non-image untouched
    feats = {
        r["media_id"]: r["features"]
        for r in extract_features(media, n_features=4, codec="auto").collect()
    }
    assert all(0.0 <= f <= 1.0 for f in feats[1])
    # the audio payload is undecodable -> sha-stub fallback, one row
    # per input either way
    assert len(feats[2]) == 4


@tik
def test_tiktoken_backend_resolves_and_counts(spark):
    import tiktoken

    kind, fn = resolve_tokenizer(None, "real", encoding="gpt2")
    assert kind == TIKTOKEN
    texts = ["hello world", "the quick brown fox", ""]
    enc = tiktoken.get_encoding("gpt2")
    want = [len(enc.encode_ordinary(t)) for t in texts]
    assert fn(texts) == want
    # through the Column API: NULL counts 0, same as the stub contract
    df = spark.createDataFrame(
        [(1, "hello world"), (2, None)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", token_count(F.col("text"), backend="real").alias("n")
        ).collect()
    }
    assert got[1] == want[0] and got[2] == 0
