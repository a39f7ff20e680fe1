"""Minimal PLY mesh/point-cloud IO (pure numpy; no trimesh/plyfile in
this environment). Handles ascii and binary_little_endian, vertices with
optional colors/normals, triangular faces — the formats used by the
Goliath assets (`assets/simplified.ply`, template meshes) and for
means3D debug dumps (`/root/reference/train.py:378-382`).
"""

import struct
from typing import Optional, Tuple

import numpy as np

_PLY_DTYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


def load_ply(path_or_bytes):
    """Returns dict with "vertices" [V,3] float32, optional "faces"
    [F,3] int32, "colors" [V,3] uint8, "normals" [V,3] float32."""
    if isinstance(path_or_bytes, (str, bytes)):
        if isinstance(path_or_bytes, str):
            with open(path_or_bytes, "rb") as f:
                data = f.read()
        else:
            data = path_or_bytes
    else:
        data = path_or_bytes.read()

    header_end = data.find(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode("ascii", errors="replace")
    body = data[header_end:]

    fmt = "ascii"
    elements = []  # (name, count, [(prop_name, dtype, is_list, count_t)])
    for line in header.splitlines():
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1][2].append((parts[4], _PLY_DTYPES[parts[3]], True, _PLY_DTYPES[parts[2]]))
            else:
                elements[-1][2].append((parts[2], _PLY_DTYPES[parts[1]], False, None))

    out = {}
    if fmt == "ascii":
        lines = body.decode("ascii").splitlines()
        li = 0
        for name, count, props in elements:
            rows = []
            for _ in range(count):
                rows.append(lines[li].split())
                li += 1
            _parse_element_ascii(out, name, rows, props)
    else:
        endian = "<" if "little" in fmt else ">"
        offset = 0
        for name, count, props in elements:
            if any(p[2] for p in props):
                # list properties (faces): parse row by row
                faces = []
                for _ in range(count):
                    cnt_t = np.dtype(endian + props[0][3])
                    n = int(np.frombuffer(body, cnt_t, 1, offset)[0])
                    offset += cnt_t.itemsize
                    idx_t = np.dtype(endian + props[0][1])
                    vals = np.frombuffer(body, idx_t, n, offset)
                    offset += idx_t.itemsize * n
                    faces.append(vals)
                if name == "face" and faces:
                    out["faces"] = np.asarray(faces, np.int64).astype(np.int32)
            else:
                dt = np.dtype([(p[0], endian + p[1]) for p in props])
                arr = np.frombuffer(body, dt, count, offset)
                offset += dt.itemsize * count
                _collect_vertex_props(out, name, arr)
    return out


def _parse_element_ascii(out, name, rows, props):
    if any(p[2] for p in props):
        if name == "face":
            out["faces"] = np.asarray(
                [[int(v) for v in r[1 : 1 + int(r[0])]] for r in rows], np.int32
            )
        return
    cols = {p[0]: i for i, p in enumerate(props)}
    arr = np.asarray(rows, np.float64)
    if name == "vertex":
        out["vertices"] = arr[:, [cols["x"], cols["y"], cols["z"]]].astype(np.float32)
        if "red" in cols:
            out["colors"] = arr[:, [cols["red"], cols["green"], cols["blue"]]].astype(np.uint8)
        if "nx" in cols:
            out["normals"] = arr[:, [cols["nx"], cols["ny"], cols["nz"]]].astype(np.float32)


def _collect_vertex_props(out, name, arr):
    if name != "vertex":
        return
    names = arr.dtype.names
    out["vertices"] = np.stack(
        [arr["x"], arr["y"], arr["z"]], axis=-1
    ).astype(np.float32)
    if "red" in names:
        out["colors"] = np.stack([arr["red"], arr["green"], arr["blue"]], -1).astype(np.uint8)
    if "nx" in names:
        out["normals"] = np.stack([arr["nx"], arr["ny"], arr["nz"]], -1).astype(np.float32)


def save_ply(path, vertices, faces=None, colors=None, normals=None):
    """Binary little-endian PLY writer."""
    vertices = np.asarray(vertices, np.float32)
    v = vertices.shape[0]
    props = ["property float x", "property float y", "property float z"]
    cols = []
    if normals is not None:
        props += ["property float nx", "property float ny", "property float nz"]
    if colors is not None:
        colors = np.clip(np.asarray(colors), 0, 255).astype(np.uint8)
        props += ["property uchar red", "property uchar green", "property uchar blue"]
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {v}"] + props
    if faces is not None:
        faces = np.asarray(faces, np.int32)
        header += [f"element face {faces.shape[0]}", "property list uchar int vertex_indices"]
    header += ["end_header"]

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        fields = [vertices.astype("<f4")]
        if normals is not None:
            fields.append(np.asarray(normals, "<f4"))
        row = np.concatenate([x.view(np.uint8).reshape(v, -1) for x in fields], axis=1)
        if colors is not None:
            row = np.concatenate([row, colors.reshape(v, 3).view(np.uint8)], axis=1)
        f.write(row.tobytes())
        if faces is not None:
            cnt = np.full((faces.shape[0], 1), 3, np.uint8)
            body = np.concatenate(
                [cnt, faces.astype("<i4").view(np.uint8).reshape(-1, 12)], axis=1
            )
            f.write(body.tobytes())
