"""Torch-free reader for torch.save zip archives.

A torch>=1.6 checkpoint is a ZIP holding `<root>/data.pkl` (a pickle whose
tensors are persistent-id references) plus one raw little-endian buffer per
storage under `<root>/data/<key>`. This module parses that format with a
RESTRICTED unpickler — only the handful of globals reference checkpoints
actually contain are resolvable, and tensors come back as plain numpy
arrays — so a TPU host without torch installed can still consume the
reference's `.pth` / `checkpoint.tar` artifacts
(reference util/checkpoint_util.py:25-44, train.py:561, get_basis consumers).

torch is never imported here. `utils/checkpoint.py::_torch_load_safe` uses
this reader first and only falls back to torch.load for anything it cannot
parse (e.g. the legacy pre-1.6 non-zip format).
"""
from __future__ import annotations

import io
import os
import pickle
import zipfile
from typing import Any, BinaryIO, Dict

import numpy as np

try:  # numpy 2.x moved the reconstruction helpers to numpy._core
    from numpy._core import multiarray as _np_multiarray
except ImportError:  # pragma: no cover - numpy 1.x
    from numpy.core import multiarray as _np_multiarray

# torch storage-class name -> numpy dtype of the raw buffer. bfloat16 has no
# numpy dtype: read the raw uint16 halves and widen to float32 below.
_STORAGE_DTYPES: Dict[str, np.dtype] = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "BFloat16Storage": np.dtype("<u2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("bool"),
}


class _StorageType:
    """Stand-in for the torch.<T>Storage classes named in persistent ids."""

    def __init__(self, name: str):
        if name not in _STORAGE_DTYPES:
            raise pickle.UnpicklingError(f"unsupported storage torch.{name}")
        self.name = name
        self.dtype = _STORAGE_DTYPES[name]
        self.bf16 = name == "BFloat16Storage"


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None) -> np.ndarray:
    """numpy twin of torch._utils._rebuild_tensor_v2.

    `storage` is the flat numpy buffer the persistent-load hook produced;
    torch strides are element strides — convert to byte strides for
    as_strided, then copy so the result owns its memory (the zip buffer is
    transient and checkpoint consumers mutate-protect via copies anyway;
    see utils/checkpoint.py::_to_np)."""
    flat, bf16 = storage
    if not size:
        arr = flat[storage_offset:storage_offset + 1].reshape(())
    else:
        byte_strides = tuple(int(s) * flat.dtype.itemsize for s in stride)
        arr = np.lib.stride_tricks.as_strided(
            flat[storage_offset:], shape=tuple(int(d) for d in size),
            strides=byte_strides)
    arr = np.array(arr, copy=True)
    if bf16:
        arr = (arr.astype(np.uint32) << 16).view(np.float32)
    return arr


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


# Allowed pickle globals. Tensor rebuilding and container/scalar metadata
# only — anything else (arbitrary code) raises, same spirit as
# torch.load(weights_only=True).
_SAFE_GLOBALS: Dict[tuple, Any] = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("collections", "OrderedDict"): dict,
    ("numpy", "dtype"): np.dtype,
    ("numpy", "ndarray"): np.ndarray,
    ("numpy._core.multiarray", "scalar"): _np_multiarray.scalar,
    ("numpy.core.multiarray", "scalar"): _np_multiarray.scalar,
    ("numpy._core.multiarray", "_reconstruct"): _np_multiarray._reconstruct,
    ("numpy.core.multiarray", "_reconstruct"): _np_multiarray._reconstruct,
    ("_codecs", "encode"): lambda s, enc: s.encode(enc),
}


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, f: BinaryIO, load_storage):
        super().__init__(f, encoding="latin1")
        self._load_storage = load_storage

    def find_class(self, module: str, name: str):
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        try:
            return _SAFE_GLOBALS[(module, name)]
        except KeyError:
            raise pickle.UnpicklingError(
                f"global '{module}.{name}' is not allowed by the torch-free "
                "checkpoint reader") from None

    def persistent_load(self, pid):
        # ('storage', StorageType, key, location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        _, stype, key, _location, _numel = pid
        return self._load_storage(str(key), stype)


def torch_free_load(path: str) -> Any:
    """Load a torch.save zip archive without torch; tensors -> numpy arrays.

    Raises on the legacy (pre-1.6, non-zip) format and on any pickle global
    outside the tensor/metadata whitelist — callers fall back to torch.load
    for those.
    """
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        pkl = [n for n in names if n.endswith("/data.pkl") or n == "data.pkl"]
        if len(pkl) != 1:
            raise pickle.UnpicklingError(
                f"{path}: expected exactly one data.pkl in the archive, "
                f"found {pkl}")
        root = pkl[0][:-len("data.pkl")]

        byteorder_name = root + "byteorder"
        if byteorder_name in names:
            bo = z.read(byteorder_name).decode().strip()
            if bo != "little":
                raise pickle.UnpicklingError(
                    f"{path}: unsupported byteorder {bo!r}")

        def load_storage(key: str, stype: _StorageType):
            buf = z.read(f"{root}data/{key}")
            return np.frombuffer(buf, dtype=stype.dtype), stype.bf16

        with z.open(pkl[0]) as f:
            data = io.BytesIO(f.read())
        return _TorchUnpickler(data, load_storage).load()


def is_zip_checkpoint(path: str) -> bool:
    """True for the torch>=1.6 zip format (magic 'PK')."""
    if os.path.isdir(path):
        return False
    with open(path, "rb") as f:
        return f.read(2) == b"PK"
