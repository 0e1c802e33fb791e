"""Property-based tests (hypothesis) for the native codec layer.

The example-based codec suite pins hand-built layouts; these
properties sweep the INPUT space instead — random dims (including the
degenerate 1-pixel-wide/-tall shapes where Adam7 passes go empty),
random content (which drives JPEG EOB-run/ZRL/refinement coverage),
and random depth/channel combinations — asserting the two contracts
the pipeline depends on:

1. lossless formats roundtrip pixel-exactly (PNG all layouts, TIFF,
   BMP, WAV);
2. progressive JPEG decodes pixel-identically to baseline for the
   same input (same quantized coefficients by construction), across
   gray/RGB/CMYK/YCCK and subsampling.

No Spark session needed — pure numpy, so the whole file runs in
seconds despite the example counts.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from calaveras_uniteus_etl_spark.functions import codecs
from calaveras_uniteus_etl_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
)

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_dims = st.tuples(
    st.integers(min_value=1, max_value=40),  # height
    st.integers(min_value=1, max_value=40),  # width
)


def _img(seed: int, h: int, w: int, channels: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if channels == 0:
        return rng.integers(0, 256, (h, w), dtype=np.uint8)
    return rng.integers(0, 256, (h, w, channels), dtype=np.uint8)


@settings(**_SETTINGS)
@given(
    dims=_dims,
    channels=st.sampled_from([0, 1, 2, 3, 4]),
    interlace=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_png_roundtrip_property(dims, channels, interlace, seed):
    h, w = dims
    img = _img(seed, h, w, channels)
    out = codecs.decode_png(codecs.encode_png(img, interlace=interlace))
    ref = img if img.ndim == 3 else img[:, :, None]
    np.testing.assert_array_equal(out["pixels"], ref)
    assert (out["width"], out["height"]) == (w, h)


@settings(**_SETTINGS)
@given(
    dims=_dims,
    channels=st.sampled_from([0, 1, 3, 4]),
    big_endian=st.booleans(),
    compression=st.sampled_from(["none", "packbits", "lzw", "deflate"]),
    predictor=st.sampled_from([1, 2]),
    layout=st.one_of(
        st.none(),  # single strip
        st.integers(min_value=1, max_value=9),  # rows per strip
        st.tuples(  # tile grid
            st.integers(min_value=1, max_value=12),
            st.integers(min_value=1, max_value=12),
        ),
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_tiff_roundtrip_property(
    dims, channels, big_endian, compression, predictor, layout, seed
):
    h, w = dims
    if channels == 2:  # TIFF path supports 1/3/4 samples
        channels = 1
    img = _img(seed, h, w, channels)
    kw = dict(
        big_endian=big_endian,
        packbits=compression == "packbits",
        lzw=compression == "lzw",
        deflate=compression == "deflate",
        predictor=predictor,
    )
    if isinstance(layout, tuple):
        kw["tile"] = layout
    else:
        kw["rows_per_strip"] = layout
    t = codecs.encode_tiff(img, **kw)
    out = codecs.decode_tiff(t)
    ref = img if img.ndim == 3 else img[:, :, None]
    np.testing.assert_array_equal(out["pixels"], ref)


@settings(**_SETTINGS)
@given(
    dims=_dims,
    channels=st.sampled_from([3, 4]),
    top_down=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_bmp_roundtrip_property(dims, channels, top_down, seed):
    h, w = dims
    img = _img(seed, h, w, channels)
    out = codecs.decode_bmp(codecs.encode_bmp(img, top_down=top_down))
    np.testing.assert_array_equal(out["pixels"], img)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    dims=st.tuples(
        st.integers(min_value=1, max_value=33),
        st.integers(min_value=1, max_value=33),
    ),
    mode=st.sampled_from(
        ["gray", "rgb", "rgb420", "rgb422", "cmyk", "ycck"]
    ),
    restart=st.sampled_from([0, 0, 3]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_jpeg_progressive_equals_baseline_property(dims, mode, restart, seed):
    """The load-bearing JPEG contract: SOF2 and SOF0 carry identical
    quantized coefficients for the same input, so the decodes must be
    pixel-identical — across every color mode, any dims, any content
    (random content drives the EOB-run / ZRL / refinement branches),
    with and without restart markers. Ramp content (below) hits the
    exact-.5 rounding ties that random content misses."""
    h, w = dims
    channels = {"gray": 0, "rgb": 3, "rgb420": 3, "rgb422": 3,
                "cmyk": 4, "ycck": 4}[mode]
    img = _img(seed, h, w, channels)
    kw = {
        "subsample_420": mode == "rgb420",
        "subsample_422": mode == "rgb422",
        "restart_interval": restart,
    }
    if mode == "ycck":
        kw["ycck"] = True
    base = decode_jpeg(encode_jpeg_baseline(img, **kw))
    prog = decode_jpeg(encode_jpeg_progressive(img, **kw))
    np.testing.assert_array_equal(base["pixels"], prog["pixels"])


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    dims=st.tuples(
        st.integers(min_value=8, max_value=32),
        st.integers(min_value=8, max_value=32),
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_jpeg_tie_rounding_property(dims, seed):
    """Regression for the einsum-vs-matmul tie-rounding bug: linear
    ramps (scaled/offset at random) maximize exact-.5 quantization
    ties; progressive must still match baseline bitwise."""
    h, w = dims
    rng = np.random.default_rng(seed)
    base_ramp = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    img = np.stack(
        [
            np.clip(base_ramp * rng.uniform(0.5, 1.0)
                    + rng.integers(0, 64), 0, 255),
            np.clip(np.flipud(base_ramp), 0, 255),
            np.full((h, w), float(rng.integers(0, 256))),
        ],
        axis=2,
    ).astype(np.uint8)
    b = decode_jpeg(encode_jpeg_baseline(img))
    p = decode_jpeg(encode_jpeg_progressive(img))
    np.testing.assert_array_equal(b["pixels"], p["pixels"])


@settings(**_SETTINGS)
@given(
    n=st.integers(min_value=1, max_value=4000),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_wav_roundtrip_property(n, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, n, dtype=np.int16)
    out = codecs.decode_wav(codecs.encode_wav(samples, rate))
    assert out["sample_rate"] == rate
    np.testing.assert_array_equal(
        np.asarray(out["samples"], dtype=np.int16).ravel(), samples
    )
