"""Minimal binary-little-endian PLY reader/writer (numpy, no plyfile dep),
plus the Gaussian-model PLY schema used by the reference for interop.

The model schema matches gaussian_model.py:293-344/358-417 exactly — standard
3DGS layout (x,y,z, nx,ny,nz, f_dc_*, f_rest_*, opacity, scale_*, rot_*) plus
the MS-GS extras (occ_multiplier_{0..3}, dc_delta_{i}_{j}, base_gaussian_mask,
max_pixel_sizes, min_pixel_sizes) — so models trained with the CUDA reference
load here and vice versa.
"""
from __future__ import annotations

import io
from typing import Dict, Tuple

import numpy as np

_DTYPES = {
    "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "short": "<i2", "int16": "<i2", "ushort": "<u2", "uint16": "<u2",
    "int": "<i4", "int32": "<i4", "uint": "<u4", "uint32": "<u4",
}
_NAMES = {"<f4": "float", "<f8": "double", "u1": "uchar", "i1": "char",
          "<i2": "short", "<u2": "ushort", "<i4": "int", "<u4": "uint"}


def read_ply(path: str) -> Dict[str, np.ndarray]:
    """Read the first ('vertex') element of a binary/ascii PLY into a dict of
    per-property arrays."""
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.find(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode("ascii").splitlines()
    fmt = None
    count = 0
    props = []
    in_vertex = False
    for line in header:
        tok = line.strip().split()
        if not tok:
            continue
        if tok[0] == "format":
            fmt = tok[1]
        elif tok[0] == "element":
            in_vertex = tok[1] == "vertex"
            if in_vertex:
                count = int(tok[2])
        elif tok[0] == "property" and in_vertex:
            props.append((tok[-1], _DTYPES[tok[1]]))
    if fmt == "ascii":
        body = np.loadtxt(io.BytesIO(data[header_end:]), ndmin=2)
        return {name: body[:count, i].astype(np.dtype(dt))
                for i, (name, dt) in enumerate(props)}
    if fmt == "binary_big_endian":
        props = [(n, dt.replace("<", ">")) for n, dt in props]
    dtype = np.dtype([(n, dt) for n, dt in props])
    arr = np.frombuffer(data, dtype=dtype, count=count, offset=header_end)
    return {n: np.ascontiguousarray(arr[n]) for n, _ in props}


def write_ply(path: str, fields: Dict[str, np.ndarray]):
    """Write a dict of equal-length 1-D arrays as a binary PLY vertex
    element (order preserved)."""
    names = list(fields)
    n = len(fields[names[0]])
    cols = []
    dtype_fields = []
    for name in names:
        a = np.asarray(fields[name])
        assert a.ndim == 1 and len(a) == n, name
        dt = a.dtype.newbyteorder("<") if a.dtype.byteorder == ">" else a.dtype
        if dt == np.bool_:
            a, dt = a.astype(np.uint8), np.dtype("u1")
        key = dt.str.lstrip("=|")
        key = {"f4": "<f4", "f8": "<f8", "i2": "<i2", "i4": "<i4",
               "u2": "<u2", "u4": "<u4"}.get(key, key)
        dtype_fields.append((name, key))
        cols.append(a)
    rec = np.empty(n, dtype=np.dtype(dtype_fields))
    for name, a in zip(names, cols):
        rec[name] = a
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {n}\n".encode())
        for name, key in dtype_fields:
            f.write(f"property {_NAMES[key]} {name}\n".encode())
        f.write(b"end_header\n")
        f.write(rec.tobytes())


# ---------------------------------------------------------------------------
# Gaussian model schema (reference-compatible)
# ---------------------------------------------------------------------------

def save_gaussian_ply(path: str, arrs: Dict[str, np.ndarray]):
    """arrs: xyz (N,3), features_dc (N,1,3), features_rest (N,K-1,3),
    opacity (N,1) logit, scaling (N,3) log, rotation (N,4),
    occ_multiplier (N,4), dc_delta (N,4,3), base_mask (N,), max_pixel_sizes,
    min_pixel_sizes. Layout mirrors construct_list_of_attributes
    (gaussian_model.py:293-313): f_dc channel-major, f_rest transposed to
    (channel, coeff) then flattened."""
    xyz = arrs["xyz"]
    n = len(xyz)
    fields: Dict[str, np.ndarray] = {}
    for i, ax in enumerate("xyz"):
        fields[ax] = xyz[:, i].astype(np.float32)
    for i, ax in enumerate("xyz"):
        fields["n" + ax] = np.zeros(n, np.float32)
    f_dc = arrs["features_dc"].reshape(n, -1)          # (N, 3)
    for i in range(f_dc.shape[1]):
        fields[f"f_dc_{i}"] = f_dc[:, i].astype(np.float32)
    f_rest = np.transpose(arrs["features_rest"], (0, 2, 1)).reshape(n, -1)
    for i in range(f_rest.shape[1]):
        fields[f"f_rest_{i}"] = f_rest[:, i].astype(np.float32)
    fields["opacity"] = arrs["opacity"].reshape(n).astype(np.float32)
    for i in range(arrs["scaling"].shape[1]):
        fields[f"scale_{i}"] = arrs["scaling"][:, i].astype(np.float32)
    for i in range(arrs["rotation"].shape[1]):
        fields[f"rot_{i}"] = arrs["rotation"][:, i].astype(np.float32)
    occ = arrs["occ_multiplier"].reshape(n, -1)
    for i in range(occ.shape[1]):
        fields[f"occ_multiplier_{i}"] = occ[:, i].astype(np.float32)
    dcd = arrs["dc_delta"]
    for i in range(dcd.shape[1]):
        for j in range(dcd.shape[2]):
            fields[f"dc_delta_{i}_{j}"] = dcd[:, i, j].astype(np.float32)
    fields["base_gaussian_mask"] = arrs["base_mask"].astype(np.uint8)
    fields["max_pixel_sizes"] = arrs["max_pixel_sizes"].astype(np.float32)
    fields["min_pixel_sizes"] = arrs["min_pixel_sizes"].astype(np.float32)
    write_ply(path, fields)


def load_gaussian_ply(path: str) -> Dict[str, np.ndarray]:
    """Inverse of save_gaussian_ply; tolerates plain 3DGS PLYs (MS extras
    default to their fresh-state values, as in load_ply
    gaussian_model.py:358-417)."""
    f = read_ply(path)
    n = len(f["x"])
    xyz = np.stack([f["x"], f["y"], f["z"]], axis=1).astype(np.float32)
    dc_keys = sorted([k for k in f if k.startswith("f_dc_")],
                     key=lambda k: int(k.split("_")[-1]))
    features_dc = np.stack([f[k] for k in dc_keys], axis=1).reshape(n, 1, 3)
    rest_keys = sorted([k for k in f if k.startswith("f_rest_")],
                       key=lambda k: int(k.split("_")[-1]))
    if rest_keys:
        rest = np.stack([f[k] for k in rest_keys], axis=1)  # (N, 3*(K-1))
        k_rest = len(rest_keys) // 3
        features_rest = rest.reshape(n, 3, k_rest).transpose(0, 2, 1)
    else:
        features_rest = np.zeros((n, 0, 3), np.float32)
    scale_keys = sorted([k for k in f if k.startswith("scale_")],
                        key=lambda k: int(k.split("_")[-1]))
    rot_keys = sorted([k for k in f if k.startswith("rot_")],
                      key=lambda k: int(k.split("_")[-1]))
    out = {
        "xyz": xyz,
        "features_dc": features_dc.astype(np.float32),
        "features_rest": features_rest.astype(np.float32),
        "opacity": f["opacity"].reshape(n, 1).astype(np.float32),
        "scaling": np.stack([f[k] for k in scale_keys], 1).astype(np.float32),
        "rotation": np.stack([f[k] for k in rot_keys], 1).astype(np.float32),
    }
    occ_keys = sorted([k for k in f if k.startswith("occ_multiplier_")],
                      key=lambda k: int(k.split("_")[-1]))
    if occ_keys:
        out["occ_multiplier"] = np.stack(
            [f[k] for k in occ_keys], 1).astype(np.float32)
    dcd_keys = [k for k in f if k.startswith("dc_delta_")]
    if dcd_keys:
        n_lvl = 1 + max(int(k.split("_")[2]) for k in dcd_keys)
        n_ch = 1 + max(int(k.split("_")[3]) for k in dcd_keys)
        dcd = np.zeros((n, n_lvl, n_ch), np.float32)
        for k in dcd_keys:
            _, _, i, j = k.split("_")
            dcd[:, int(i), int(j)] = f[k]
        out["dc_delta"] = dcd
    if "base_gaussian_mask" in f:
        out["base_mask"] = f["base_gaussian_mask"].astype(bool)
    if "max_pixel_sizes" in f:
        out["max_pixel_sizes"] = f["max_pixel_sizes"].astype(np.float32)
    if "min_pixel_sizes" in f:
        out["min_pixel_sizes"] = f["min_pixel_sizes"].astype(np.float32)
    return out
