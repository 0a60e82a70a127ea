"""PLY mesh/point-cloud I/O (ascii + binary_little_endian).

Capability stand-in for the reference's vendored
`src/utils/colmap/plyfile.py` (918 LoC general PLY library): reads and
writes the PLY subset the COLMAP/NeRF tooling actually uses — element
tables with scalar properties plus the `vertex_indices` face list —
without vendoring a full parser.

API:
  read_ply(path)  -> {element_name: {prop: np.ndarray, ...}, ...}
  write_ply(path, elements, fmt="binary"|"ascii")
where ``elements`` is the same nested-dict shape; list properties (e.g.
faces) are (N, K) integer arrays.
"""

from __future__ import annotations

import numpy as np

_TYPES = {
    "char": "i1", "uchar": "u1", "short": "i2", "ushort": "u2",
    "int": "i4", "uint": "u4", "float": "f4", "double": "f8",
    "int8": "i1", "uint8": "u1", "int16": "i2", "uint16": "u2",
    "int32": "i4", "uint32": "u4", "float32": "f4", "float64": "f8",
}
_NAMES = {"i1": "char", "u1": "uchar", "i2": "short", "u2": "ushort",
          "i4": "int", "u4": "uint", "f4": "float", "f8": "double"}


def _parse_header(f):
    assert f.readline().strip() == b"ply", "not a PLY file"
    fmt = None
    elements = []  # (name, count, [(prop, dtype) | ("__list__", name, ct, it)])
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unterminated PLY header")
        parts = line.decode("ascii").strip().split()
        if not parts or parts[0] == "comment":
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1][2].append(
                    ("__list__", parts[4], _TYPES[parts[2]], _TYPES[parts[3]]))
            else:
                elements[-1][2].append((parts[2], _TYPES[parts[1]]))
        elif parts[0] == "end_header":
            break
    return fmt, elements


def read_ply(path: str) -> dict:
    with open(path, "rb") as f:
        fmt, elements = _parse_header(f)
        out = {}
        if fmt == "ascii":
            lines = f.read().decode("ascii").split("\n")
            li = 0
            for name, count, props in elements:
                cols = {p[0] if p[0] != "__list__" else p[1]: []
                        for p in props}
                for _ in range(count):
                    vals = lines[li].split()
                    li += 1
                    vi = 0
                    for p in props:
                        if p[0] == "__list__":
                            n = int(vals[vi])
                            cols[p[1]].append(
                                [float(v) for v in vals[vi + 1: vi + 1 + n]])
                            vi += 1 + n
                        else:
                            cols[p[0]].append(float(vals[vi]))
                            vi += 1
                out[name] = {
                    k: np.asarray(v) for k, v in cols.items()}
                for p in props:
                    if p[0] != "__list__":
                        out[name][p[0]] = out[name][p[0]].astype(p[1])
                    else:
                        out[name][p[1]] = out[name][p[1]].astype(p[3])
            return out
        assert fmt == "binary_little_endian", f"unsupported format {fmt}"
        for name, count, props in elements:
            if all(p[0] != "__list__" for p in props):
                dt = np.dtype([(p[0], "<" + p[1]) for p in props])
                arr = np.frombuffer(f.read(dt.itemsize * count), dt)
                out[name] = {p[0]: arr[p[0]].copy() for p in props}
            else:
                # list properties force row-by-row parsing
                cols = {p[0] if p[0] != "__list__" else p[1]: []
                        for p in props}
                for _ in range(count):
                    for p in props:
                        if p[0] == "__list__":
                            n = int(np.frombuffer(
                                f.read(np.dtype(p[2]).itemsize),
                                "<" + p[2])[0])
                            it = np.dtype(p[3])
                            cols[p[1]].append(np.frombuffer(
                                f.read(it.itemsize * n), "<" + p[3]).copy())
                        else:
                            cols[p[0]].append(np.frombuffer(
                                f.read(np.dtype(p[1]).itemsize),
                                "<" + p[1])[0])
                out[name] = {k: (np.stack(v) if k in
                                 [p[1] for p in props if p[0] == "__list__"]
                                 and len({len(x) for x in v}) == 1
                                 else np.asarray(v, dtype=object)
                                 if k in [p[1] for p in props
                                          if p[0] == "__list__"]
                                 else np.asarray(v))
                             for k, v in cols.items()}
        return out


def write_ply(path: str, elements: dict, fmt: str = "binary"):
    """elements: {name: {prop: (N,) scalar array | (N,K) int list array}}."""
    binary = fmt.startswith("binary")
    header = ["ply",
              "format binary_little_endian 1.0" if binary
              else "format ascii 1.0"]
    bodies = []
    for name, props in elements.items():
        counts = {v.shape[0] for v in props.values()}
        assert len(counts) == 1, f"inconsistent counts in element {name}"
        n = counts.pop()
        header.append(f"element {name} {n}")
        for pname, arr in props.items():
            arr = np.asarray(arr)
            if arr.ndim == 2 and not np.issubdtype(arr.dtype, np.floating):
                header.append(f"property list uchar int {pname}")
            else:
                header.append(
                    f"property {_NAMES[arr.dtype.str[1:]]} {pname}")
        bodies.append((props, n))
    header.append("end_header")

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        for props, n in bodies:
            arrs = {k: np.asarray(v) for k, v in props.items()}
            for i in range(n):
                row = b"" if binary else []
                for pname, arr in arrs.items():
                    if arr.ndim == 2 and not np.issubdtype(
                            arr.dtype, np.floating):
                        if binary:
                            row += np.uint8(arr.shape[1]).tobytes()
                            row += arr[i].astype("<i4").tobytes()
                        else:
                            row.append(" ".join(
                                [str(arr.shape[1])] +
                                [str(int(v)) for v in arr[i]]))
                    else:
                        if binary:
                            row += arr[i].astype(arr.dtype.newbyteorder("<")
                                                 ).tobytes()
                        else:
                            row.append(repr(arr[i].item()))
                f.write(row if binary
                        else (" ".join(row) + "\n").encode("ascii"))
