"""Mesh generators and glTF loader tests."""

import base64
import json

import numpy as np
import pytest

from cpugpupathtracing_tpu.models import gltf, mesh

REF_ASSETS = "/root/reference/Assets/Models"


class TestMesh:
    def test_quad_matches_reference_ground(self):
        g = mesh.ground_quad()
        # Source/Main.cpp:789-800: 4 verts at +-1000, y=-3, indices 0,1,2,2,3,0
        assert g.num_triangles == 2
        np.testing.assert_allclose(g.positions[0], [-1000.0, -3.0, 1000.0])
        assert g.indices.tolist() == [0, 1, 2, 2, 3, 0]
        np.testing.assert_allclose(g.normals, np.tile([0.0, 1.0, 0.0], (4, 1)))

    def test_cube_has_12_triangles_outward_normals(self):
        c = mesh.cube()
        assert c.num_triangles == 12
        tri_pos, tri_nrm = c.triangles()
        centers = tri_pos.mean(axis=1)
        # outward: face normal agrees with direction from origin
        assert (np.sum(centers * tri_nrm[:, 0], axis=1) > 0).all()

    def test_icosphere_on_sphere(self):
        s = mesh.icosphere(radius=2.0, subdivisions=1)
        r = np.linalg.norm(s.positions, axis=1)
        np.testing.assert_allclose(r, 2.0, atol=1e-5)

    def test_dragon_standin_scale(self):
        d = mesh.dragon_standin()
        # workload-parity with the ~91,216-tri dragon (BASELINE.md)
        assert 85_000 <= d.num_triangles <= 100_000
        ext = d.positions.max(axis=0) - d.positions.min(axis=0)
        assert (ext > 1.0).all() and (ext < 10.0).all()

    def test_concat(self):
        a, b = mesh.cube(), mesh.ground_quad()
        c = a.concat(b)
        assert c.num_triangles == 14
        assert c.indices[-1] < len(c.positions)


def _write_minimal_gltf(tmp_path, two_meshes=False):
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
    idx = np.array([0, 1, 2], np.uint16)
    blob = pos.tobytes() + nrm.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [
            {
                "byteLength": len(blob),
                "uri": "data:application/octet-stream;base64,"
                + base64.b64encode(blob).decode(),
            }
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "meshes": [
            {
                "name": "m0",
                "primitives": [
                    {"attributes": {"POSITION": 0, "NORMAL": 1}, "indices": 2}
                ],
            }
        ],
    }
    if two_meshes:
        doc["meshes"].append(doc["meshes"][0] | {"name": "m1"})
    p = tmp_path / "t.gltf"
    p.write_text(json.dumps(doc))
    return str(p)


class TestGltf:
    def test_minimal_data_uri(self, tmp_path):
        m = gltf.load(_write_minimal_gltf(tmp_path))
        assert m.num_triangles == 1
        assert m.indices.dtype == np.uint32  # u16 widened, GLTFLoader.cpp:74-84
        np.testing.assert_allclose(m.positions[1], [1, 0, 0])

    def test_all_meshes_concatenated_by_default(self, tmp_path):
        m = gltf.load(_write_minimal_gltf(tmp_path, two_meshes=True))
        assert m.num_triangles == 2

    def test_last_primitive_only_compat(self, tmp_path):
        # reproduces the reference's overwrite-per-primitive quirk
        # (Source/GLTFLoader.cpp:34-85)
        m = gltf.load(_write_minimal_gltf(tmp_path, two_meshes=True),
                      last_primitive_only=True)
        assert m.num_triangles == 1

    def test_cube_asset(self):
        m = gltf.load(f"{REF_ASSETS}/Cube/Cube.gltf")
        assert m.num_triangles == 12
        assert len(m.positions) == len(m.normals)

    def test_duck_asset(self):
        m = gltf.load(f"{REF_ASSETS}/Duck/Duck.gltf")
        assert m.num_triangles > 1000
        n = np.linalg.norm(m.normals, axis=1)
        np.testing.assert_allclose(n, 1.0, atol=1e-3)

    def test_duck_with_transforms(self):
        raw = gltf.load(f"{REF_ASSETS}/Duck/Duck.gltf")
        xf = gltf.load(f"{REF_ASSETS}/Duck/Duck.gltf", apply_transforms=True)
        assert raw.num_triangles == xf.num_triangles
        # the Duck node carries a scale/rotation matrix; extents must differ
        assert not np.allclose(
            raw.positions.max(0) - raw.positions.min(0),
            xf.positions.max(0) - xf.positions.min(0),
        )

    def test_dragon_gltf_missing_bin_raises_cleanly(self):
        # DragonAttenuation.bin is absent from the mounted assets
        with pytest.raises(RuntimeError, match="missing buffer file"):
            gltf.load(f"{REF_ASSETS}/Dragon/DragonAttenuation.gltf")
