"""Optional rasterio fast-path decoder: auto-selection + byte parity
with the pure-Python baseline codec (r8, VERDICT r7 #5).

The parity test is env-gated: this container ships no rasterio, so it
SKIPS here and runs wherever the fast path would actually be used —
the same discipline as the env-gated real-Kafka and ImageIO tests.
The auto-selection fallback test always runs.
"""

from __future__ import annotations

import numpy as np
import pytest

from biggis_landuse_spark.sources.geotiff import (
    GeoTiffDecoder,
    RasterioDecoder,
    best_decoder,
)
from biggis_landuse_spark.sources.tiff import encode_tiff


def _fixture_payloads():
    """Shared parity fixtures: textured bands across the layouts and
    compressions both decoders must agree on."""
    yy, xx = np.mgrid[0:64, 0:80]
    band16 = ((yy * 7 + xx * 3) % 1000).astype(np.uint16)
    band8 = ((yy + xx) % 251).astype(np.uint8)
    cases = [
        ("strips/none/u16", encode_tiff([band16], compression="none")),
        ("strips/deflate/u16", encode_tiff([band16], compression="deflate")),
        ("strips/lzw/u16", encode_tiff([band16], compression="lzw")),
        ("strips/packbits/u8", encode_tiff([band8], compression="packbits")),
        ("tiled/deflate/u16",
         encode_tiff([band16], tile_size=32, compression="deflate")),
        ("multiband/none",
         encode_tiff([band8, (band8 * 2).astype(np.uint8)],
                     compression="none")),
        ("georef/deflate",
         encode_tiff([band16], compression="deflate",
                     georef=(500000.0, 5600000.0, 30.0, 30.0))),
    ]
    return cases


def test_best_decoder_falls_back_to_baseline():
    # in a container without rasterio the auto-select must return the
    # pure-Python baseline, not raise
    try:
        import rasterio  # noqa: F401

        has_rasterio = True
    except ImportError:
        has_rasterio = False
    dec = best_decoder()
    if has_rasterio:
        assert isinstance(dec, RasterioDecoder)
    else:
        assert type(dec) is GeoTiffDecoder


def test_rasterio_decoder_raises_cleanly_when_missing():
    try:
        import rasterio  # noqa: F401

        pytest.skip("rasterio present; covered by the parity test")
    except ImportError:
        pass
    with pytest.raises(ImportError):
        RasterioDecoder()


def test_rasterio_parity_on_shared_fixtures():
    pytest.importorskip("rasterio")
    base = GeoTiffDecoder()
    fast = RasterioDecoder()
    for label, payload in _fixture_payloads():
        want = base.decode(label, payload)
        got = fast.decode(label, payload)
        assert len(got) == len(want), label
        for b, (w, g) in enumerate(zip(want, got)):
            assert g.shape == w.shape, (label, b)
            assert g.dtype == w.dtype == np.float64, (label, b)
            np.testing.assert_array_equal(g, w, err_msg=f"{label} band {b}")
    # georef parity on the georeferenced fixture
    label, payload = next(
        c for c in _fixture_payloads() if c[0].startswith("georef")
    )
    assert fast.georef(label, payload) == pytest.approx(
        base.georef(label, payload)
    )
