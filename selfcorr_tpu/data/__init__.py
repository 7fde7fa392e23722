"""Host-side data pipelines: Wild6D / NOCS REAL275 / CUB + synthetic."""
