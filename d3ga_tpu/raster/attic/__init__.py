"""Attic: measured-dead-end kernel variants kept for reference.

`pallas_fused.py` (banded one-hot compaction) and `pallas_fused2.py`
(butterfly lane-roll compaction) fuse select+compact+blend into one
kernel; both measured at or below the split pipeline at Goliath scale
and with worse forward accuracy (PERF_NOTES.md "Fused select+compact+
blend kernels", PALLAS_PARITY.json forward_fused). They stay runnable
behind `raster_backend: fused` / `rasterize_tiled_fused`, but are off
the default import and CI surface (tests gate on D3GA_TEST_ATTIC=1).
"""
