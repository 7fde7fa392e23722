"""Pure-functional math ops: geometry, mesh utilities, rasterizer, knn, Umeyama."""
