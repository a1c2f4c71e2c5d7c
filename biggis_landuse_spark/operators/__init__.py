"""Raster operator library: local/focal map algebra, pyramid, resample,
rasterize, stats — all expressed as DataFrame transformations."""
