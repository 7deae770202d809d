"""Wavefront OBJ reader -> triangle vertex arrays.

Reference semantics: obj_reader.zig — parses ``v`` (obj_reader.zig:151-159),
``f`` with 3..6 vertices fan-triangulated in the exact pattern
{0,1,2} {2,3,0} {3,4,0} {4,5,0} (obj_reader.zig:64-111), and ``vn`` which
is collected but never used (obj_reader.zig:176-184). Face vertex tokens
may be ``v``, ``v/t``, ``v/t/n`` or ``v//n`` (obj_reader.zig:21-47);
indices are 1-based (obj_reader.zig:50-60). One material per model
(obj_reader.zig:114). Faces with <3 or >6 vertices are an error
(obj_reader.zig:80-82,104-106).
"""

from __future__ import annotations

import dataclasses

import numpy as np

# Fan-triangulation index pattern per face size (obj_reader.zig:85-107).
_FAN = {
    3: [(0, 1, 2)],
    4: [(0, 1, 2), (2, 3, 0)],
    5: [(0, 1, 2), (2, 3, 0), (3, 4, 0)],
    6: [(0, 1, 2), (2, 3, 0), (3, 4, 0), (4, 5, 0)],
}


class ObjParseError(ValueError):
    pass


@dataclasses.dataclass
class ObjModel:
    vertices: np.ndarray  # (V, 3) f32
    faces: int  # number of 'f' records
    triangles: np.ndarray  # (T, 3) int32 vertex indices (0-based)
    vertex_normals: np.ndarray  # (VN, 3) f32, parsed but unused (parity)

    @property
    def tri_vertices(self):
        """Triangle vertex arrays ``(a, b, c)``, each ``(T, 3)`` f32."""
        v = self.vertices[self.triangles]
        return v[:, 0], v[:, 1], v[:, 2]

    @property
    def center(self) -> np.ndarray:
        """Mean vertex (vector.zig:149-162), logged by the reference."""
        if len(self.vertices) == 0:
            return np.zeros(3, np.float32)
        return self.vertices.mean(axis=0)


def _face_vertex_index(token: str) -> int:
    """First component of a face vertex token (obj_reader.zig:21-47)."""
    head = token.split("/", 1)[0]
    if not head:
        raise ObjParseError(f"bad face vertex token: {token!r}")
    return int(head)


def read_obj(path) -> ObjModel:
    # Native C++ fast path (same semantics); Python fallback below.
    try:
        from zraytrace_tpu.native.api import parse_obj_native

        native = parse_obj_native(path)
    except ImportError:  # pragma: no cover
        native = None
    if native is not None:
        vertices_np, tris_np, faces, n_normals = native
        return ObjModel(
            vertices=vertices_np,
            faces=faces,
            triangles=tris_np,
            vertex_normals=np.zeros((n_normals, 3), np.float32),
        )
    vertices: list[tuple[float, float, float]] = []
    normals: list[tuple[float, float, float]] = []
    tris: list[tuple[int, int, int]] = []
    face_count = 0

    with open(path, "r") as f:
        for raw in f:
            line = raw.rstrip("\r\n")
            if len(line) < 2:
                continue
            if line[0] == "v" and line[1] == " ":
                parts = line.split()
                vertices.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif line[0] == "f" and line[1] == " ":
                idx = [_face_vertex_index(tok) - 1 for tok in line.split()[1:]]
                if len(idx) not in _FAN:
                    raise ObjParseError(
                        f"face with {len(idx)} vertices not supported"
                    )
                for i, j, k in _FAN[len(idx)]:
                    tris.append((idx[i], idx[j], idx[k]))
                face_count += 1
            elif line.startswith("vn "):
                parts = line.split()
                normals.append((float(parts[1]), float(parts[2]), float(parts[3])))

    return ObjModel(
        vertices=np.asarray(vertices, np.float32).reshape(-1, 3),
        faces=face_count,
        triangles=np.asarray(tris, np.int32).reshape(-1, 3),
        vertex_normals=np.asarray(normals, np.float32).reshape(-1, 3),
    )
