"""glTF 2.0 loader -> flat scene arrays.

Replaces NRIFramework's `utils::Scene` cgltf-based loader (used by LoadScene,
NRDSample.cpp:2197-2241). Pure-python parse of .gltf (JSON + .bin) and .glb
(binary container); supports the subset the reference scenes need: indexed
triangle meshes, node hierarchy with TRS/matrix transforms, POSITION / NORMAL /
TEXCOORD_0 attributes, pbrMetallicRoughness materials with emissive factors,
KHR_materials_transmission / alphaMode BLEND mapped to FLAG_TRANSPARENT.

World-space pre-transform: like the reference's merged static BLAS
(NRDSample.cpp:2475-2524), static geometry is baked into world space at load.
"""

from __future__ import annotations

import base64
import json
import os
import struct

import numpy as np

from nrdsample_tpu import config
from nrdsample_tpu.scene.types import Materials, Scene, build_triangle_soa, make_scene

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def _load_buffers(doc: dict, base_dir: str, glb_bin: bytes | None):
    out = []
    for buf in doc.get("buffers", []):
        uri = buf.get("uri")
        if uri is None:
            out.append(glb_bin)
        elif uri.startswith("data:"):
            out.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            with open(os.path.join(base_dir, uri), "rb") as f:
                out.append(f.read())
    return out


def _read_accessor(doc: dict, buffers, idx: int) -> np.ndarray:
    acc = doc["accessors"][idx]
    view = doc["bufferViews"][acc["bufferView"]]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    ncomp = _TYPE_COUNTS[acc["type"]]
    count = acc["count"]
    buf = buffers[view["buffer"]]
    offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = view.get("byteStride") or (np.dtype(dtype).itemsize * ncomp)
    itemsize = np.dtype(dtype).itemsize * ncomp
    if stride == itemsize:
        arr = np.frombuffer(buf, dtype=dtype, count=count * ncomp, offset=offset)
        return np.ascontiguousarray(arr.reshape(count, ncomp))
    # interleaved vertex buffers (byteStride > element size): native one-pass
    # decode (native/gltf_decode.cpp, the cgltf role) with a zero-copy numpy
    # strided-view fallback
    from nrdsample_tpu import native

    as_index = acc["componentType"] == 5125 and ncomp == 1
    out = native.decode_accessor(
        buf, offset, stride, count, ncomp, acc["componentType"],
        as_index=as_index,
    )
    if out is not None:
        # f32-widened (or i64 for indices); downstream .astype() calls are
        # no-ops for the float attributes this loader consumes
        return out
    raw = np.frombuffer(buf, dtype=np.uint8)
    view_arr = np.lib.stride_tricks.as_strided(
        raw[offset:].view(np.uint8),
        shape=(count, itemsize),
        strides=(stride, 1),
        writeable=False,
    )
    return np.ascontiguousarray(view_arr).view(dtype).reshape(count, ncomp)


def _node_matrix(node: dict) -> np.ndarray:
    if "matrix" in node:
        return np.array(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    t = node.get("translation", [0, 0, 0])
    r = node.get("rotation", [0, 0, 0, 1])  # xyzw quaternion
    s = node.get("scale", [1, 1, 1])
    x, y, z, w = r
    rot = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )
    m[:3, :3] = rot * np.array(s, np.float32)[None, :]
    m[:3, 3] = t
    return m


def _parse_glb(data: bytes):
    magic, version, _length = struct.unpack_from("<III", data, 0)
    assert magic == 0x46546C67, "not a GLB file"
    offset = 12
    doc = None
    binary = None
    while offset < len(data):
        clen, ctype = struct.unpack_from("<II", data, offset)
        chunk = data[offset + 8 : offset + 8 + clen]
        if ctype == 0x4E4F534A:  # JSON
            doc = json.loads(chunk.decode("utf-8"))
        elif ctype == 0x004E4942:  # BIN
            binary = chunk
        offset += 8 + clen
    return doc, binary


def _decode_image(doc, buffers, base_dir, image_idx):
    """Decode a glTF image (bufferView or URI) to float32 [0,1] HxWxC."""
    import io

    from PIL import Image

    img = doc["images"][image_idx]
    if "bufferView" in img:
        bv = doc["bufferViews"][img["bufferView"]]
        buf = buffers[bv["buffer"]]
        off = bv.get("byteOffset", 0)
        data = buf[off:off + bv["byteLength"]]
    else:
        uri = img["uri"]
        if uri.startswith("data:"):
            data = base64.b64decode(uri.split(",", 1)[1])
        else:
            with open(os.path.join(base_dir, uri), "rb") as f:
                data = f.read()
    pil = Image.open(io.BytesIO(data))
    return np.asarray(pil.convert("RGBA"), np.float32) / 255.0


def _material_textures(doc, buffers, base_dir, mats, tex_res):
    """Per-material texture dicts for textures.build_texture_set: baseColor
    (+alpha), metallicRoughness (G=roughness, B=metalness), emissive — the 4
    bindless fetches of GetMaterialProps (RaytracingShared.hlsli:424-555)."""
    def tex_image(tex_info):
        if not tex_info:
            return None
        tex = doc["textures"][tex_info["index"]]
        if "source" not in tex:
            return None
        return _decode_image(doc, buffers, base_dir, tex["source"])

    per_material = []
    any_tex = False
    for m in mats or [{}]:
        pbr = m.get("pbrMetallicRoughness", {})
        entry = {}
        bc = tex_image(pbr.get("baseColorTexture"))
        if bc is not None:
            entry["base_color"] = bc  # RGBA; alpha channel picked up by builder
            any_tex = True
        mr = tex_image(pbr.get("metallicRoughnessTexture"))
        if mr is not None:
            entry["roughness"] = mr[..., 1]
            entry["metalness"] = mr[..., 2]
            any_tex = True
        em = tex_image(m.get("emissiveTexture"))
        if em is not None:
            entry["emissive"] = em[..., :3].mean(axis=-1)
            any_tex = True
        per_material.append(entry)
    if not any_tex:
        return None
    from nrdsample_tpu.scene import textures as tex_mod

    return tex_mod.build_texture_set(per_material, res=tex_res)


def load_gltf(path: str, max_emissive: int | None = None, load_textures: bool = True,
              tex_res: int = 256) -> Scene:
    """Load a .gltf/.glb file into a Scene (world-space flattened)."""
    base_dir = os.path.dirname(os.path.abspath(path))
    if path.endswith(".glb"):
        with open(path, "rb") as f:
            doc, glb_bin = _parse_glb(f.read())
    else:
        with open(path) as f:
            doc = json.load(f)
        glb_bin = None
    buffers = _load_buffers(doc, base_dir, glb_bin)

    # materials
    mats = doc.get("materials", [{}])
    base_color, metalness, roughness, emission, ior, flags = [], [], [], [], [], []
    for m in mats or [{}]:
        pbr = m.get("pbrMetallicRoughness", {})
        bc = pbr.get("baseColorFactor", [1, 1, 1, 1])
        base_color.append(bc[:3])
        metalness.append(pbr.get("metallicFactor", 1.0))
        roughness.append(pbr.get("roughnessFactor", 1.0))
        em = m.get("emissiveFactor", [0, 0, 0])
        strength = (
            m.get("extensions", {})
            .get("KHR_materials_emissive_strength", {})
            .get("emissiveStrength", 1.0)
        )
        emission.append([c * strength for c in em])
        ior.append(
            m.get("extensions", {}).get("KHR_materials_ior", {}).get("ior", 1.5)
        )
        transmissive = (
            "KHR_materials_transmission" in m.get("extensions", {})
            or m.get("alphaMode") == "BLEND"
        )
        # glTF scene geometry is static scenery (animated instances are
        # synthesized separately without FLAG_STATIC)
        fl = (config.FLAG_TRANSPARENT if transmissive
              else config.FLAG_NON_TRANSPARENT) | config.FLAG_STATIC
        if m.get("alphaMode") == "MASK":
            # alpha-tested foliage etc -> any-hit alpha test
            fl |= config.FLAG_ALPHA_TEST
        # name-tagged foliage gets the leaf-translucency branch (the reference
        # loader sets material.isLeaf the same way; NRDSample.cpp:3544-3545)
        mname = m.get("name", "").lower()
        if "leaf" in mname or "foliage" in mname:
            fl |= config.FLAG_LEAF
        flags.append(fl)
    if not mats:
        base_color, metalness, roughness = [[0.8, 0.8, 0.8]], [0.0], [0.9]
        emission, ior, flags = [[0, 0, 0]], [1.5], [config.FLAG_NON_TRANSPARENT | config.FLAG_STATIC]

    # walk node hierarchy to gather world-transformed primitives
    all_v, all_n, all_uv, all_i, all_m, all_t = [], [], [], [], [], []
    voffset = 0

    def visit(node_idx: int, parent: np.ndarray):
        nonlocal voffset
        node = doc["nodes"][node_idx]
        world = parent @ _node_matrix(node)
        if "mesh" in node:
            mesh = doc["meshes"][node["mesh"]]
            for prim in mesh["primitives"]:
                if prim.get("mode", 4) != 4:  # TRIANGLES only
                    continue
                attrs = prim["attributes"]
                pos = _read_accessor(doc, buffers, attrs["POSITION"]).astype(np.float32)
                pos_w = pos @ world[:3, :3].T + world[:3, 3]
                if "NORMAL" in attrs:
                    nrm = _read_accessor(doc, buffers, attrs["NORMAL"]).astype(np.float32)
                    # normal matrix: inverse-transpose of the upper 3x3
                    nmat = np.linalg.inv(world[:3, :3]).T
                    nrm_w = nrm @ nmat.T
                    nrm_w /= np.maximum(
                        np.linalg.norm(nrm_w, axis=-1, keepdims=True), 1e-20
                    )
                else:
                    nrm_w = None
                uv = (
                    _read_accessor(doc, buffers, attrs["TEXCOORD_0"]).astype(np.float32)
                    if "TEXCOORD_0" in attrs
                    else np.zeros((len(pos), 2), np.float32)
                )
                if "TANGENT" in attrs:
                    tan = _read_accessor(doc, buffers, attrs["TANGENT"]).astype(np.float32)
                    tan_w = np.concatenate(
                        [tan[:, :3] @ world[:3, :3].T, tan[:, 3:4]], axis=-1
                    )
                    tlen = np.linalg.norm(tan_w[:, :3], axis=-1, keepdims=True)
                    tan_w[:, :3] /= np.maximum(tlen, 1e-20)
                else:
                    tan_w = None
                if "indices" in prim:
                    idx = _read_accessor(doc, buffers, prim["indices"]).reshape(-1)
                else:
                    idx = np.arange(len(pos), dtype=np.uint32)
                idx = idx.astype(np.int64).reshape(-1, 3)
                mat_id = prim.get("material", 0)
                all_v.append(pos_w)
                all_n.append(
                    nrm_w if nrm_w is not None else _flat_normals(pos_w, idx)
                )
                all_uv.append(uv)
                all_t.append(tan_w)
                all_i.append(idx + voffset)
                all_m.append(np.full(len(idx), mat_id, np.int32))
                voffset += len(pos)
        for child in node.get("children", []):
            visit(child, world)

    scene_idx = doc.get("scene", 0)
    roots = doc["scenes"][scene_idx]["nodes"]
    for r in roots:
        visit(r, np.eye(4, dtype=np.float32))

    verts = np.concatenate(all_v)
    normals = np.concatenate(all_n)
    uvs = np.concatenate(all_uv)
    indices = np.concatenate(all_i).astype(np.int32)
    tri_mat = np.concatenate(all_m)
    # tangents only if EVERY primitive carries them (mixed meshes fall back
    # to UV-derived tangents in build_triangle_soa)
    tangents = (
        np.concatenate(all_t) if all_t and all(t is not None for t in all_t)
        else None
    )

    import jax.numpy as jnp

    tris = build_triangle_soa(verts, indices, normals, uvs, tri_mat,
                              tangents=tangents)
    materials = Materials(
        base_color=np.asarray(np.array(base_color, np.float32)),
        metalness=np.asarray(np.array(metalness, np.float32)),
        roughness=np.asarray(np.array(roughness, np.float32)),
        emission=np.asarray(np.array(emission, np.float32)),
        ior=np.asarray(np.array(ior, np.float32)),
        flags=np.asarray(np.array(flags, np.int32)),
    )
    scene = make_scene(tris, materials, max_emissive=max_emissive)

    if load_textures:
        ts = _material_textures(doc, buffers, base_dir, mats, tex_res)
        if ts is not None:
            import dataclasses as dc

            has_at = bool(
                (np.asarray(materials.flags) & config.FLAG_ALPHA_TEST).any()
            )
            scene = dc.replace(scene, textures=ts, has_alpha_test=has_at)
    return scene


def _flat_normals(verts: np.ndarray, idx: np.ndarray) -> np.ndarray:
    from nrdsample_tpu import native

    n = native.accumulate_normals(verts, idx)  # one-pass C++ scatter-add
    if n is None:
        n = np.zeros_like(verts)
        fn = np.cross(
            verts[idx[:, 1]] - verts[idx[:, 0]], verts[idx[:, 2]] - verts[idx[:, 0]]
        )
        for k in range(3):
            np.add.at(n, idx[:, k], fn)
    return (n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)).astype(
        np.float32
    )


# ---------------------------------------------------------------------------
# Exporter: Scene -> .glb
# ---------------------------------------------------------------------------

def save_glb(scene: Scene, path: str):
    """Write a Scene back out as a binary glTF (.glb).

    The reference consumes production scenes as glTF (NRDSample.cpp:2197-2241);
    this exporter lets any procedurally built scene (including the ~1M-tri
    exterior) round-trip through the SAME production load path (`load_gltf`),
    proving the data layer at asset scale without shipping binary assets.

    One mesh primitive per material (unindexed triangle soup from the SoA);
    material params map back to pbrMetallicRoughness + KHR extensions, with
    FLAG_TRANSPARENT -> KHR_materials_transmission, FLAG_ALPHA_TEST ->
    alphaMode MASK and FLAG_LEAF -> a "leaf" material name (the loader's
    foliage tag, mirroring the reference's isLeaf)."""
    tris = scene.tris
    p0 = np.asarray(tris.p0, np.float32)
    p1 = p0 + np.asarray(tris.e1, np.float32)
    p2 = p0 + np.asarray(tris.e2, np.float32)
    n = [np.asarray(getattr(tris, f"n{k}"), np.float32) for k in range(3)]
    uv = [np.asarray(getattr(tris, f"uv{k}"), np.float32) for k in range(3)]
    tri_mat = np.asarray(tris.material, np.int32)
    mats = scene.materials
    m_bc = np.asarray(mats.base_color, np.float32)
    m_metal = np.asarray(mats.metalness, np.float32)
    m_rough = np.asarray(mats.roughness, np.float32)
    m_em = np.asarray(mats.emission, np.float32)
    m_ior = np.asarray(mats.ior, np.float32)
    m_fl = np.asarray(mats.flags, np.int32)

    bin_parts: list[bytes] = []
    views, accessors, materials_json, primitives = [], [], [], []

    def add_accessor(arr: np.ndarray, gltf_type: str, with_minmax=False):
        data = np.ascontiguousarray(arr, np.float32)
        offset = sum(len(b) for b in bin_parts)
        raw = data.tobytes()
        bin_parts.append(raw + b"\0" * ((4 - len(raw) % 4) % 4))
        views.append({"buffer": 0, "byteOffset": offset, "byteLength": len(raw)})
        acc = {"bufferView": len(views) - 1, "componentType": 5126,
               "count": len(data), "type": gltf_type}
        if with_minmax:
            acc["min"] = data.min(axis=0).tolist()
            acc["max"] = data.max(axis=0).tolist()
        accessors.append(acc)
        return len(accessors) - 1

    for mi in range(len(m_bc)):
        sel = tri_mat == mi
        if not sel.any():
            continue
        pos = np.concatenate([p0[sel], p1[sel], p2[sel]])
        # interleave back to per-vertex order (v0 v1 v2 per tri)
        order = np.arange(len(pos)).reshape(3, -1).T.reshape(-1)
        pos = pos[order]
        nrm = np.concatenate([n[0][sel], n[1][sel], n[2][sel]])[order]
        tc = np.concatenate([uv[0][sel], uv[1][sel], uv[2][sel]])[order]
        primitives.append({
            "attributes": {
                "POSITION": add_accessor(pos, "VEC3", with_minmax=True),
                "NORMAL": add_accessor(nrm, "VEC3"),
                "TEXCOORD_0": add_accessor(tc, "VEC2"),
            },
            "material": len(materials_json),
            "mode": 4,
        })
        fl = int(m_fl[mi])
        em = m_em[mi]
        strength = float(em.max())
        mat = {
            "name": ("leaf_" if fl & config.FLAG_LEAF else "") + f"mat{mi}",
            "pbrMetallicRoughness": {
                "baseColorFactor": m_bc[mi].tolist() + [1.0],
                "metallicFactor": float(m_metal[mi]),
                "roughnessFactor": float(m_rough[mi]),
            },
            "extensions": {"KHR_materials_ior": {"ior": float(m_ior[mi])}},
        }
        if strength > 0:
            mat["emissiveFactor"] = (em / max(strength, 1e-9)).tolist()
            mat["extensions"]["KHR_materials_emissive_strength"] = {
                "emissiveStrength": strength}
        if fl & config.FLAG_TRANSPARENT:
            mat["extensions"]["KHR_materials_transmission"] = {
                "transmissionFactor": 1.0}
        if fl & config.FLAG_ALPHA_TEST:
            mat["alphaMode"] = "MASK"
        materials_json.append(mat)

    blob = b"".join(bin_parts)
    doc = {
        "asset": {"version": "2.0", "generator": "nrdsample_tpu"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": primitives}],
        "materials": materials_json,
        "buffers": [{"byteLength": len(blob)}],
        "bufferViews": views,
        "accessors": accessors,
        "extensionsUsed": ["KHR_materials_ior",
                           "KHR_materials_emissive_strength",
                           "KHR_materials_transmission"],
    }
    js = json.dumps(doc).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    total = 12 + 8 + len(js) + 8 + len(blob)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A) + js)
        f.write(struct.pack("<II", len(blob), 0x004E4942) + blob)
