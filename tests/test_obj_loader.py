"""OBJ loader tests: dedup semantics, fan triangulation, error handling."""

import numpy as np
import pytest

from minipath_tpu.scene.obj_loader import ObjOpenError, load_obj


def _write(tmp_path, text):
    p = tmp_path / "model.obj"
    p.write_text(text)
    return p


class TestLoadObj:
    def test_simple_triangle(self, tmp_path):
        mesh = load_obj(
            _write(tmp_path, "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        )
        assert mesh.triangle_count == 1
        assert mesh.vertex_count == 3
        np.testing.assert_array_equal(mesh.triangles, [[0, 1, 2]])
        # No normals in file -> zero normals (flat shading downstream).
        assert (mesh.normals == 0).all()

    def test_quad_fan_triangulated(self, tmp_path):
        # The reference silently skips quads (building.rs:43-46); we fan.
        mesh = load_obj(
            _write(tmp_path, "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
        )
        assert mesh.triangle_count == 2
        np.testing.assert_array_equal(mesh.triangles, [[0, 1, 2], [0, 2, 3]])

    def test_vertex_dedup_by_index_tuple(self, tmp_path):
        # Same position with different normals -> distinct unified vertices;
        # identical tuples dedup (building.rs:36-81).
        text = (
            "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
            "vn 0 0 1\nvn 0 0 -1\n"
            "f 1//1 2//1 3//1\n"
            "f 1//2 2//1 3//1\n"
        )
        mesh = load_obj(_write(tmp_path, text))
        assert mesh.triangle_count == 2
        assert mesh.vertex_count == 4  # (1,1) reused, (1,2) new
        assert mesh.triangles[0][1] == mesh.triangles[1][1]
        assert mesh.triangles[0][0] != mesh.triangles[1][0]

    def test_normals_normalized(self, tmp_path):
        text = "v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 10\nf 1//1 2//1 3//1\n"
        mesh = load_obj(_write(tmp_path, text))
        np.testing.assert_allclose(mesh.normals[0], [0, 0, 1], atol=1e-6)

    def test_texcoords(self, tmp_path):
        text = "v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0.25 0.75\nf 1/1 2/1 3/1\n"
        mesh = load_obj(_write(tmp_path, text))
        np.testing.assert_allclose(mesh.texcoords[0], [0.25, 0.75, 0.0])

    def test_negative_indices(self, tmp_path):
        mesh = load_obj(
            _write(tmp_path, "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
        )
        assert mesh.triangle_count == 1
        np.testing.assert_array_equal(mesh.triangles, [[0, 1, 2]])

    def test_missing_file(self, tmp_path):
        with pytest.raises(ObjOpenError):
            load_obj(tmp_path / "nope.obj")

    def test_bad_face(self, tmp_path):
        with pytest.raises(ObjOpenError):
            load_obj(_write(tmp_path, "v 0 0 0\nf 1 2 9\n"))

    def test_comments_and_blank_lines(self, tmp_path):
        mesh = load_obj(
            _write(tmp_path, "# hi\n\nv 0 0 0\nv 1 0 0\nv 0 1 0\n\nf 1 2 3\n")
        )
        assert mesh.triangle_count == 1

    def test_reference_teapot_if_available(self):
        # The reference data dir is read-only mounted; use it when present.
        import os

        path = "/root/reference/data/teapot.obj"
        if not os.path.exists(path):
            pytest.skip("reference teapot not available")
        mesh = load_obj(path)
        assert mesh.triangle_count == 2256  # grep -c '^f ' teapot.obj
        assert mesh.vertex_count > 0
        # Teapot has normals everywhere: nothing flat shaded.
        assert (np.linalg.norm(mesh.normals, axis=1) > 0.9).all()


class TestSphere:
    def test_hit_miss_graze(self):
        # Mirrors primitives.rs:62-97 semantics.
        import jax.numpy as jnp

        from minipath_tpu.geometry import make_rays
        from minipath_tpu.scene.primitives import Sphere

        s = Sphere((0.0, 0.0, 0.0), 1.0)
        origins = np.array(
            [
                [0, 0, -5],  # head-on hit
                [0, 2, -5],  # miss
                [0, 1, -5],  # graze
                [0, 0, 0],  # from inside -> far root
                [0, 0, 5],  # behind (pointing away)
            ],
            np.float32,
        )
        dirs = np.array(
            [[0, 0, 1], [0, 0, 1], [0, 0, 1], [0, 0, 1], [0, 0, 1]], np.float32
        )
        hits = s.intersect(make_rays(origins, dirs))
        h = np.asarray(hits.hit)
        t = np.asarray(hits.t)
        assert h.tolist() == [True, False, True, True, False]
        assert t[0] == pytest.approx(4.0, abs=1e-5)
        assert t[3] == pytest.approx(1.0, abs=1e-5)
        # Normal points outward radially.
        np.testing.assert_allclose(np.asarray(hits.normal)[0], [0, 0, -1], atol=1e-5)
        box = s.get_bounding_box()
        np.testing.assert_array_equal(box.min, [-1, -1, -1])
        np.testing.assert_array_equal(box.max, [1, 1, 1])
