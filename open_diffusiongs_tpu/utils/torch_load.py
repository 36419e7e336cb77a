"""Pure-Python reader for `torch.save` archives — no torch required.

The RE10K preprocessing input (pixelSplat `.torch` chunks) is a
torch-saved list of scene dicts.  The reference loads it with
`torch.load` (process_data.py:47); this image has no torch, so this
module implements the subset of the format those chunks use:

  * the ZIP container written by torch >= 1.6: `<name>/data.pkl` pickled
    with persistent IDs `('storage', StorageClass, key, location, numel)`
    referencing raw little-endian buffers at `<name>/data/<key>`;
  * tensor reconstruction via `torch._utils._rebuild_tensor_v2`
    (storage, storage_offset, size, stride, ...), mapped to numpy with
    `as_strided` + copy;
  * typed storage classes (FloatStorage, ByteStorage, ...) mapped to
    numpy dtypes (bfloat16 via ml_dtypes, which ships with jax).

Everything is returned as numpy arrays / plain Python objects.  Unknown
`torch.*` globals raise a clear error instead of silently mis-parsing.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, BinaryIO, Union

import numpy as np

_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "ComplexFloatStorage": np.complex64,
    "ComplexDoubleStorage": np.complex128,
}


def _bfloat16():
    import ml_dtypes
    return np.dtype(ml_dtypes.bfloat16)


class _StorageClass:
    """Stands in for torch.FloatStorage etc. inside persistent IDs."""

    def __init__(self, name: str):
        self.name = name

    @property
    def dtype(self) -> np.dtype:
        if self.name == "BFloat16Storage":
            return _bfloat16()
        try:
            return np.dtype(_STORAGE_DTYPES[self.name])
        except KeyError:
            raise NotImplementedError(
                f"torch storage type {self.name!r} is not supported by the "
                f"torch-free reader (utils/torch_load.py)")


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *_args):
    arr = storage  # already a 1-D numpy array of the right dtype
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    if not size:
        return arr[storage_offset:storage_offset + 1].reshape(())[()]
    item = arr.dtype.itemsize
    out = np.lib.stride_tricks.as_strided(
        arr[storage_offset:], shape=size,
        strides=tuple(s * item for s in stride))
    return out.copy()


def _rebuild_tensor(storage, storage_offset, size, stride):
    return _rebuild_tensor_v2(storage, storage_offset, size, stride)


_TORCH_GLOBALS = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
    ("torch", "Size"): tuple,
}

# Mirrors torch.load(weights_only=True): only globals that reconstruct
# plain containers/scalars may load.  Anything else — including stdlib
# classes with pickle REDUCE gadget potential (os.system, subprocess,
# functools.partial, ...) — is rejected, since .torch/.pt/.ckpt inputs
# are downloaded third-party artifacts.
_SAFE_GLOBALS = {
    ("collections", "OrderedDict"): __import__("collections").OrderedDict,
    ("collections", "defaultdict"): __import__("collections").defaultdict,
    ("builtins", "complex"): complex,
    ("builtins", "set"): set,
    ("builtins", "frozenset"): frozenset,
    ("builtins", "bytearray"): bytearray,
    ("builtins", "list"): list,
    ("builtins", "tuple"): tuple,
    ("builtins", "dict"): dict,
    ("builtins", "int"): int,
    ("builtins", "float"): float,
    ("builtins", "bool"): bool,
    ("builtins", "str"): str,
    ("builtins", "bytes"): bytes,
}


class _Unpickler(pickle.Unpickler):

    def __init__(self, file, read_storage):
        super().__init__(file, encoding="utf-8")
        self._read_storage = read_storage

    def find_class(self, module: str, name: str):
        if (module, name) in _TORCH_GLOBALS:
            return _TORCH_GLOBALS[(module, name)]
        if module == "torch" and (name in _STORAGE_DTYPES
                                  or name == "BFloat16Storage"):
            return _StorageClass(name)
        if (module, name) in _SAFE_GLOBALS:
            return _SAFE_GLOBALS[(module, name)]
        raise NotImplementedError(
            f"global {module}.{name} is not in the torch-free reader's "
            f"safelist (utils/torch_load.py); refusing to unpickle it")

    def persistent_load(self, pid: Any):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise NotImplementedError(f"unsupported persistent id: {pid!r}")
        _, storage_cls, key, _location, _numel = pid
        if isinstance(storage_cls, type) and issubclass(storage_cls,
                                                        _StorageClass):
            raise NotImplementedError("untyped storages are not supported")
        dtype = storage_cls.dtype
        return self._read_storage(str(key), dtype)


def torch_load(f: Union[str, BinaryIO]) -> Any:
    """Load a torch.save ZIP archive into numpy/Python objects.

    Drop-in for `torch.load(path, map_location='cpu')` for the data
    formats the RE10K chunks use.  Tensors come back as numpy arrays
    (so `.numpy()` call sites need a `hasattr` guard, which
    process_data.py already has for the str-key case).
    """
    if isinstance(f, (str, bytes)):
        fh = open(f, "rb")
        close = True
    else:
        fh, close = f, False
    try:
        head = fh.read(4)
        fh.seek(0)
        if head[:2] != b"PK":
            raise NotImplementedError(
                "legacy (non-zip) torch.save format detected; re-save the "
                "file with torch >= 1.6 or install torch for this path")
        with zipfile.ZipFile(fh) as zf:
            names = zf.namelist()
            pkl_name = next(n for n in names if n.endswith("/data.pkl")
                            or n == "data.pkl")
            prefix = pkl_name[:-len("data.pkl")]
            cache = {}

            def read_storage(key: str, dtype) -> np.ndarray:
                ck = (key, np.dtype(dtype).str)
                if ck not in cache:
                    raw = zf.read(f"{prefix}data/{key}")
                    cache[ck] = np.frombuffer(raw, dtype=dtype)
                return cache[ck]

            return _Unpickler(io.BytesIO(zf.read(pkl_name)),
                              read_storage).load()
    finally:
        if close:
            fh.close()
