"""glTF loader tests: build a tiny glTF in-memory, load, verify arrays."""

import base64
import json
import struct

import numpy as np
import pytest

from nrdsample_tpu import config
from nrdsample_tpu.scene import gltf


def _make_gltf(tmp_path, transform=None):
    # one quad (two triangles), one emissive material
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    normals = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    buf = verts.tobytes() + normals.tobytes() + idx.tobytes()
    node = {"mesh": 0}
    if transform:
        node.update(transform)
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [node],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "NORMAL": 1},
                        "indices": 2,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {
                "pbrMetallicRoughness": {
                    "baseColorFactor": [0.8, 0.2, 0.1, 1.0],
                    "metallicFactor": 0.3,
                    "roughnessFactor": 0.6,
                },
                "emissiveFactor": [1.0, 0.5, 0.25],
                "extensions": {
                    "KHR_materials_emissive_strength": {"emissiveStrength": 4.0}
                },
            }
        ],
        "buffers": [
            {
                "byteLength": len(buf),
                "uri": "data:application/octet-stream;base64,"
                + base64.b64encode(buf).decode(),
            }
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
    }
    p = tmp_path / "test.gltf"
    p.write_text(json.dumps(doc))
    return str(p)


class TestGltf:
    def test_load_quad(self, tmp_path):
        scene = gltf.load_gltf(_make_gltf(tmp_path))
        assert scene.num_tris == 2
        np.testing.assert_allclose(
            np.asarray(scene.materials.base_color[0]), [0.8, 0.2, 0.1], atol=1e-6
        )
        assert float(scene.materials.metalness[0]) == pytest.approx(0.3)
        np.testing.assert_allclose(
            np.asarray(scene.materials.emission[0]), [4.0, 2.0, 1.0], atol=1e-6
        )
        assert scene.has_emissive
        assert int(scene.emissive_count) == 2
        # geometry: area of unit quad = 1 => each tri 0.5
        np.testing.assert_allclose(np.asarray(scene.tris.world_area), 0.5, atol=1e-6)

    def test_node_transform_applied(self, tmp_path):
        path = _make_gltf(
            tmp_path, transform={"translation": [5, 0, 0], "scale": [2, 2, 2]}
        )
        scene = gltf.load_gltf(path)
        p0 = np.asarray(scene.tris.p0)
        assert p0[:, 0].min() >= 5.0  # translated
        np.testing.assert_allclose(
            np.asarray(scene.tris.world_area), 2.0, atol=1e-5
        )  # scaled by 4

    def test_glb_roundtrip(self, tmp_path):
        # re-pack the .gltf as .glb with an embedded BIN chunk
        src = _make_gltf(tmp_path)
        doc = json.loads(open(src).read())
        blob = base64.b64decode(doc["buffers"][0]["uri"].split(",", 1)[1])
        doc["buffers"][0] = {"byteLength": len(blob)}
        js = json.dumps(doc).encode()
        js += b" " * ((4 - len(js) % 4) % 4)
        blob += b"\x00" * ((4 - len(blob) % 4) % 4)
        glb = (
            struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js) + 8 + len(blob))
            + struct.pack("<II", len(js), 0x4E4F534A) + js
            + struct.pack("<II", len(blob), 0x004E4942) + blob
        )
        p = tmp_path / "test.glb"
        p.write_bytes(glb)
        scene = gltf.load_gltf(str(p))
        assert scene.num_tris == 2


class TestTextures:
    def _make_textured_gltf(self, tmp_path):
        """Quad with UVs + a 4x4 PNG baseColor texture, alphaMode MASK."""
        import io

        from PIL import Image

        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
        )
        uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
        buf = verts.tobytes() + uvs.tobytes() + idx.tobytes()

        img = np.zeros((4, 4, 4), np.uint8)
        img[..., 0] = 255   # pure red texture
        img[..., 3] = 255
        img[:, :2, 3] = 0   # left half transparent (alpha test)
        bio = io.BytesIO()
        Image.fromarray(img).save(bio, format="PNG")
        png_b64 = base64.b64encode(bio.getvalue()).decode()

        doc = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0}],
            "meshes": [{"primitives": [{
                "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
                "indices": 2, "material": 0,
            }]}],
            "materials": [{
                "alphaMode": "MASK",
                "pbrMetallicRoughness": {
                    "baseColorFactor": [1.0, 1.0, 1.0, 1.0],
                    "baseColorTexture": {"index": 0},
                },
            }],
            "textures": [{"source": 0}],
            "images": [{"uri": "data:image/png;base64," + png_b64}],
            "buffers": [{
                "byteLength": len(buf),
                "uri": "data:application/octet-stream;base64,"
                + base64.b64encode(buf).decode(),
            }],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": 48},
                {"buffer": 0, "byteOffset": 48, "byteLength": 32},
                {"buffer": 0, "byteOffset": 80, "byteLength": 12},
            ],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
                {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC2"},
                {"bufferView": 2, "componentType": 5123, "count": 6, "type": "SCALAR"},
            ],
        }
        p = tmp_path / "textured.gltf"
        p.write_text(json.dumps(doc))
        return str(p)

    def test_textures_loaded_and_alpha_flagged(self, tmp_path):
        scene = gltf.load_gltf(self._make_textured_gltf(tmp_path), tex_res=16)
        assert scene.textures is not None
        assert scene.has_alpha_test
        import numpy as _np

        from nrdsample_tpu import config as _cfg

        assert (_np.asarray(scene.materials.flags) & _cfg.FLAG_ALPHA_TEST).any()
        # the loaded base-color texture is red
        lvl0 = _np.asarray(scene.textures.levels[0])
        assert lvl0.shape[0] == 1  # one material
        red = lvl0[0, :, 8:, 0]    # right (opaque) half
        assert red.mean() > 0.9
        # alpha plane carries the left-half transparency
        alpha = lvl0[0, :, :, 3]
        assert alpha[:, :4].mean() < 0.2 and alpha[:, 12:].mean() > 0.9

    def test_textured_scene_traces_through_alpha(self, tmp_path):
        from nrdsample_tpu.ops import traversal

        scene = gltf.load_gltf(self._make_textured_gltf(tmp_path), tex_res=16)
        ctx, scene2 = traversal.build_context(scene)
        import jax.numpy as jnp

        # ray through the transparent left half passes; opaque right half blocks
        o = jnp.asarray([[0.25, 0.5, 1.0], [0.75, 0.5, 1.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], jnp.float32)
        res = traversal.closest_hit_alpha(ctx, scene2, o, d)
        tri = np.asarray(res["tri"])
        assert tri[0] < 0    # passed through
        assert tri[1] >= 0   # blocked


def test_glb_roundtrip_exterior(tmp_path):
    """Scene -> save_glb -> load_gltf roundtrip (the production-asset path,
    NRDSample.cpp:2197-2241): geometry, material params, and the
    TRANSPARENT/LEAF/ALPHA_TEST flag mapping all survive."""
    from nrdsample_tpu.scene import procedural

    scene = procedural.exterior(blocks=2, window_grid=2, cobbles=6,
                                tree_count=4, tree_res=6, lamp_count=2)
    path = str(tmp_path / "exterior.glb")
    gltf.save_glb(scene, path)
    loaded = gltf.load_gltf(path)

    assert loaded.tris.count == scene.tris.count
    # bounding box preserved
    for src, dst in ((scene.tris.p0, loaded.tris.p0),):
        np.testing.assert_allclose(np.asarray(src).min(0),
                                   np.asarray(dst).min(0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(src).max(0),
                                   np.asarray(dst).max(0), atol=1e-4)
    # flags: glass stayed transparent, leaves stayed tagged
    src_fl = np.asarray(scene.materials.flags)
    dst_fl = np.asarray(loaded.materials.flags)
    assert (dst_fl & config.FLAG_TRANSPARENT).any() == (
        src_fl & config.FLAG_TRANSPARENT).any()
    assert (dst_fl & config.FLAG_LEAF).any()
    # per-triangle material params survive (possibly renumbered): compare
    # base colors gathered per triangle
    src_bc = np.asarray(scene.materials.base_color)[np.asarray(scene.tris.material)]
    dst_bc = np.asarray(loaded.materials.base_color)[np.asarray(loaded.tris.material)]
    # same triangle ORDER is not guaranteed (grouped by material); compare sets
    np.testing.assert_allclose(np.sort(src_bc.sum(1)), np.sort(dst_bc.sum(1)),
                               atol=1e-5)
    # emission scale preserved
    assert np.isclose(np.asarray(scene.materials.emission).max(),
                      np.asarray(loaded.materials.emission).max(), atol=1e-3)


def test_strided_accessor_native_and_fallback():
    """Interleaved vertex buffers (byteStride > element size) decode through
    the native path (native/gltf_decode.cpp) and the numpy strided-view
    fallback identically."""
    rng = np.random.default_rng(5)
    count = 37
    # interleave POSITION (vec3 f32) + NORMAL (vec3 f32) + pad to 32B stride
    pos = rng.standard_normal((count, 3)).astype(np.float32)
    nrm = rng.standard_normal((count, 3)).astype(np.float32)
    pad = np.zeros((count, 2), np.float32)
    inter = np.concatenate([pos, nrm, pad], axis=1)  # stride 32
    buf = inter.tobytes()
    doc = {
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(buf), "byteStride": 32},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": count, "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
             "count": count, "type": "VEC3"},
        ],
    }
    got_pos = gltf._read_accessor(doc, [buf], 0)
    got_nrm = gltf._read_accessor(doc, [buf], 1)
    np.testing.assert_array_equal(got_pos, pos)
    np.testing.assert_array_equal(got_nrm, nrm)


def test_native_normal_accumulation_matches_numpy():
    from nrdsample_tpu import native

    rng = np.random.default_rng(9)
    verts = rng.standard_normal((50, 3)).astype(np.float32)
    idx = rng.integers(0, 50, (40, 3)).astype(np.int64)
    got = native.accumulate_normals(verts, idx)
    if got is None:
        pytest.skip("native lib unavailable")
    ref = np.zeros_like(verts)
    fn = np.cross(verts[idx[:, 1]] - verts[idx[:, 0]],
                  verts[idx[:, 2]] - verts[idx[:, 0]])
    for k in range(3):
        np.add.at(ref, idx[:, k], fn)
    np.testing.assert_allclose(got, ref, atol=1e-4)
