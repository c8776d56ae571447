"""Minimal pure-Python safetensors reader (stdlib + numpy only).

The CLIP weight converter must be able to consume an HF safetensors
checkpoint (`model.safetensors` for openai/clip-vit-base-patch16 —
reference consumer: clip/clipunet.py:7-65) on a deploy host with
neither torch nor the `safetensors` package installed. The format is
trivially simple and stable, so we parse it directly:

    [8 bytes LE uint64: N]
    [N bytes: JSON header {name: {dtype, shape, data_offsets}, ...}]
    [raw little-endian tensor data, offsets relative to byte 8+N]

bfloat16 (common in HF uploads) has no numpy dtype; it is widened to
float32 by bit-shifting the stored uint16 into the high half of a
uint32 — exact, since bf16 is float32's top 16 bits.
"""
from __future__ import annotations

import json

import numpy as np

# safetensors dtype tag → (numpy dtype used for the raw read, itemsize)
_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
    # BF16 handled specially (no numpy dtype): raw uint16 → float32
    "BF16": np.uint16,
}


def _bf16_to_f32(raw_u16: np.ndarray) -> np.ndarray:
    """Exact widening: bf16 is the top 16 bits of an IEEE float32."""
    return (raw_u16.astype(np.uint32) << 16).view(np.float32)


def read_safetensors(path: str, prefix: str | None = None) -> dict:
    """Read a .safetensors file → {name: numpy array}.

    `prefix` (e.g. 'vision_model.') keeps only matching tensors — the
    full CLIP checkpoint also carries the text tower, which the vision
    converter never needs (and which doubles the read for nothing).
    bf16 tensors are returned widened to float32.
    """
    with open(path, "rb") as f:
        header_len = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(header_len).decode("utf-8"))
        header.pop("__metadata__", None)
        data_start = 8 + header_len

        out = {}
        for name in sorted(header):  # sorted → sequential-ish seeks
            if prefix is not None and not name.startswith(prefix):
                continue
            info = header[name]
            dtype_tag = info["dtype"]
            if dtype_tag not in _DTYPES:
                raise ValueError(
                    f"{path}: tensor {name!r} has unsupported dtype "
                    f"{dtype_tag!r} (supported: {sorted(_DTYPES)})"
                )
            lo, hi = info["data_offsets"]
            shape = tuple(info["shape"])
            f.seek(data_start + lo)
            buf = f.read(hi - lo)
            arr = np.frombuffer(buf, dtype=_DTYPES[dtype_tag])
            if dtype_tag == "BF16":
                arr = _bf16_to_f32(arr)
            expected = int(np.prod(shape, dtype=np.int64)) if shape else 1
            if arr.size != expected:
                raise ValueError(
                    f"{path}: tensor {name!r} has {arr.size} elements, "
                    f"header shape {shape} implies {expected}"
                )
            out[name] = arr.reshape(shape)
    return out


def write_safetensors(path: str, tensors: dict) -> None:
    """Write {name: numpy array} as a .safetensors file.

    Used by tests to synthesize HF-shaped checkpoints; float32/float16/
    int dtypes only (we never need to WRITE bf16).
    """
    tag_of = {np.dtype(v): k for k, v in _DTYPES.items() if k != "BF16"}
    header, blobs, offset = {}, [], 0
    for name in sorted(tensors):
        # NOT ascontiguousarray (it promotes 0-d to (1,)); tobytes()
        # already emits C order regardless of the input layout
        arr = np.asarray(tensors[name])
        tag = tag_of.get(arr.dtype)
        if tag is None:
            raise ValueError(f"unsupported write dtype {arr.dtype}")
        blob = arr.tobytes()
        header[name] = {
            "dtype": tag,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(blob)],
        }
        blobs.append(blob)
        offset += len(blob)
    hjson = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(len(hjson).to_bytes(8, "little"))
        f.write(hjson)
        for blob in blobs:
            f.write(blob)
