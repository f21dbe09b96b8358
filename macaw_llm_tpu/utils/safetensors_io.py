"""Minimal pure-numpy safetensors reader/writer.

HF ships LLaMA/CLIP/Whisper checkpoints as .safetensors; loading them via
torch doubles host RAM for 7B-class models. The format is trivial — an
8-byte little-endian header length, a JSON header mapping tensor name ->
{dtype, shape, data_offsets}, then the raw buffer — so we read it with
numpy memmap (zero-copy until device transfer) and no torch dependency.
"""

from __future__ import annotations

import json
import struct
from typing import Dict, Mapping

import numpy as np

_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
    # BF16 has no numpy dtype: read as uint16 and upconvert
    "BF16": np.uint16,
}


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Read every tensor from a .safetensors file as numpy arrays.

    BF16 tensors are upconverted to float32 (numpy has no bfloat16)."""
    with open(path, "rb") as f:
        header_len = struct.unpack("<Q", f.read(8))[0]
        header = json.loads(f.read(header_len))
    data = np.memmap(path, np.uint8, mode="r", offset=8 + header_len)

    out: Dict[str, np.ndarray] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        dt = meta["dtype"]
        start, end = meta["data_offsets"]
        raw = np.frombuffer(data[start:end], dtype=_DTYPES[dt])
        arr = raw.reshape(meta["shape"])
        if dt == "BF16":
            # bf16 bits are the top half of an f32
            arr = (arr.astype(np.uint32) << 16).view(np.float32)
        out[name] = arr
    return out


def save_safetensors(tensors: Mapping[str, np.ndarray], path: str) -> None:
    """Write numpy arrays as a .safetensors file (f32/f16/ints/bool)."""
    rev = {v: k for k, v in _DTYPES.items() if k != "BF16"}
    header = {}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        code = rev.get(arr.dtype.type)
        if code is None:
            arr = arr.astype(np.float32)
            code = "F32"
        blob = arr.tobytes()
        header[name] = {"dtype": code, "shape": list(arr.shape),
                        "data_offsets": [offset, offset + len(blob)]}
        offset += len(blob)
        blobs.append(blob)
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for blob in blobs:
            f.write(blob)
