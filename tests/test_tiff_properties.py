"""Property-based round-trips for the pure-Python TIFF codec and the
shapefile ring-grouping logic (hypothesis). No Spark involvement —
these run the codecs exactly as the executors do, over randomized
shapes, dtypes, layouts, and compressions."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from biggis_landuse_spark.sources.tiff import decode_tiff, encode_tiff
from biggis_landuse_spark.sources.vector import (
    _ring_signed_area,
    parse_shp,
    shp_rings_to_wkts,
)

DTYPES = ["uint8", "uint16", "int16", "uint32", "int32", "float32", "float64"]


@st.composite
def tiff_case(draw):
    h = draw(st.integers(1, 40))
    w = draw(st.integers(1, 40))
    n_bands = draw(st.integers(1, 4))
    dtype = draw(st.sampled_from(DTYPES))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    if np.dtype(dtype).kind == "f":
        bands = [
            rng.uniform(-1e6, 1e6, (h, w)).astype(dtype) for _ in range(n_bands)
        ]
    else:
        info = np.iinfo(dtype)
        bands = [
            rng.integers(info.min, info.max, (h, w), dtype=dtype, endpoint=True)
            for _ in range(n_bands)
        ]
    layout = draw(
        st.one_of(
            st.none(),  # single strip
            st.integers(1, max(1, h)),  # rows_per_strip
            st.tuples(st.just("tile"), st.sampled_from([8, 16])),
        )
    )
    compression = draw(st.sampled_from(["none", "deflate", "lzw", "packbits"]))
    planar = draw(st.booleans())
    predictor = (
        draw(st.booleans()) if np.dtype(dtype).kind in "ui" else False
    )
    return bands, layout, compression, planar, predictor


@given(tiff_case())
@settings(max_examples=60, deadline=None)
def test_tiff_roundtrip_property(case):
    bands, layout, compression, planar, predictor = case
    kwargs = dict(compression=compression, planar=planar, predictor=predictor)
    if isinstance(layout, tuple):
        kwargs["tile_size"] = layout[1]
    elif layout is not None:
        kwargs["rows_per_strip"] = layout
    payload = encode_tiff(bands, **kwargs)
    got = decode_tiff(payload)
    assert len(got) == len(bands)
    for g, b in zip(got, bands):
        np.testing.assert_array_equal(g, b.astype(np.float64))


coord = st.floats(-1e6, 1e6, allow_nan=False, width=64).map(lambda v: round(v, 3))


@st.composite
def rectangle_ring(draw, clockwise):
    x0, y0 = draw(coord), draw(coord)
    wdt = draw(st.floats(0.001, 1e4).map(lambda v: round(v, 3)))
    hgt = draw(st.floats(0.001, 1e4).map(lambda v: round(v, 3)))
    ccw = [(x0, y0), (x0 + wdt, y0), (x0 + wdt, y0 + hgt), (x0, y0 + hgt), (x0, y0)]
    return list(reversed(ccw)) if clockwise else ccw


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_shp_ring_grouping_property(data):
    # any sequence of outer(CW)/hole(CCW) rectangles groups into
    # exactly one WKT per outer ring, holes attached to the nearest
    # preceding outer
    import struct as st_mod

    n_outer = data.draw(st.integers(1, 4))
    rings, holes_after = [], []
    for _ in range(n_outer):
        rings.append(data.draw(rectangle_ring(clockwise=True)))
        n_holes = data.draw(st.integers(0, 2))
        holes_after.append(n_holes)
        for _ in range(n_holes):
            rings.append(data.draw(rectangle_ring(clockwise=False)))

    # signed-area orientation detection must agree with construction
    kinds = []
    for r in rings:
        kinds.append("outer" if _ring_signed_area(r) <= 0 else "hole")
    wkts = shp_rings_to_wkts(rings)
    assert len(wkts) == n_outer
    for wkt, n_holes in zip(wkts, holes_after):
        assert wkt.count("(") == 1 + 1 + n_holes  # POLYGON ( + rings

    # and the binary .shp encoding of those rings parses back exactly
    n_points = sum(len(r) for r in rings)
    parts, acc = [], 0
    for r in rings:
        parts.append(acc)
        acc += len(r)
    content = st_mod.pack("<i", 5)
    xs = [p[0] for r in rings for p in r]
    ys = [p[1] for r in rings for p in r]
    content += st_mod.pack("<4d", min(xs), min(ys), max(xs), max(ys))
    content += st_mod.pack("<ii", len(rings), n_points)
    content += st_mod.pack(f"<{len(parts)}i", *parts)
    for r in rings:
        for x, y in r:
            content += st_mod.pack("<2d", x, y)
    records = st_mod.pack(">ii", 1, len(content) // 2) + content
    header = st_mod.pack(">iiiiiii", 9994, 0, 0, 0, 0, 0, (100 + len(records)) // 2)
    header += st_mod.pack("<ii", 1000, 5) + st_mod.pack("<8d", *([0.0] * 8))
    shapes = parse_shp(header + records)
    assert shapes == [[list(map(tuple, r)) for r in rings]]
