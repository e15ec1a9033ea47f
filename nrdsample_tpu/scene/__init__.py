"""Scene layer: flat-array scene representation, procedural scenes, glTF loading,
camera, and the CPU BVH builder.

Replaces the reference's NRIFramework `utils::Scene` (cgltf glTF loader) and the
driver BLAS/TLAS machinery (NRDSample.cpp:2464-2864) with plain arrays the
traversal kernels consume (SURVEY.md §7.1).
"""

from nrdsample_tpu.scene.types import Scene, TriangleSoA, Camera, Materials  # noqa: F401
