"""Device kernels: ray-triangle intersection, BVH traversal, texture sampling,
SHARC hash-grid cache. The TraceRayInline / SHARC-header replacement layer
(SURVEY.md §2.3-§2.4)."""
