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
