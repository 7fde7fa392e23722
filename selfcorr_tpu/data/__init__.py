"""Host-side data pipelines: Wild6D / NOCS REAL275 / CUB + synthetic."""
try:
    import cv2

    # The loaders parallelize across frames with a thread pool; cv2's own
    # internal threading oversubscribes cores and serializes everything
    # (measured: 1.5 ms -> 71 ms per cached item under 8 workers).
    cv2.setNumThreads(0)
except Exception:
    pass
