"""Raster ops (filled in batch 4)."""
