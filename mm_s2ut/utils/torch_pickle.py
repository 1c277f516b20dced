"""Torch-free reader for PyTorch ``.pt`` checkpoints (zip format).

The fairseq checkpoints the reference publishes its results from
(`/root/reference/README.md:223`, loaded via
``checkpoint_utils.load_model_ensemble_and_task``) are, on disk, zip
archives holding one pickle stream (``data.pkl``) plus one raw
little-endian buffer per tensor storage (``data/<key>``) — nothing in
the format needs libtorch. This module reads that format with a
RESTRICTED unpickler so the converters (``utils/fairseq_convert.py``)
work on torch-free deployments:

* tensor rebuilds (``torch._utils._rebuild_tensor_v2`` /
  ``_rebuild_parameter``) are mapped to numpy: storage bytes →
  ``np.ndarray`` via offset/size/stride (``as_strided`` + copy);
* storage dtypes map ``FloatStorage``→f4 … ``BFloat16Storage``→uint16
  bits widened to f32 (numpy has no bf16);
* harmless stdlib globals (OrderedDict, argparse.Namespace, …) resolve
  for real; EVERYTHING else (omegaconf configs, fairseq dataclasses)
  becomes an inert ``_Stub`` that absorbs its pickled state into
  ``__dict__`` — config blobs stay readable as attribute bags, and no
  third-party constructor ever executes (this is also why the reader is
  safe on untrusted checkpoints: no arbitrary ``__reduce__`` calls).

Legacy (pre-torch-1.6, non-zip) checkpoints raise
:class:`LegacyFormatError`; callers may fall back to torch if present.
"""
from __future__ import annotations

import io
import pickle
import zipfile
from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np

# torch storage class name → (numpy dtype, is_bfloat16)
_STORAGE_DTYPES: Dict[str, Tuple[np.dtype, bool]] = {
    "DoubleStorage": (np.dtype("<f8"), False),
    "FloatStorage": (np.dtype("<f4"), False),
    "HalfStorage": (np.dtype("<f2"), False),
    "BFloat16Storage": (np.dtype("<u2"), True),
    "LongStorage": (np.dtype("<i8"), False),
    "IntStorage": (np.dtype("<i4"), False),
    "ShortStorage": (np.dtype("<i2"), False),
    "CharStorage": (np.dtype("i1"), False),
    "ByteStorage": (np.dtype("u1"), False),
    "BoolStorage": (np.dtype("?"), False),
}

# dtype-tag objects produced for GLOBAL torch.FloatStorage etc.


class _StorageType:
    def __init__(self, name: str):
        self.name = name


class LegacyFormatError(ValueError):
    """The file is a pre-1.6 sequential-pickle torch checkpoint."""


class _Stub:
    """Inert stand-in for any non-allowlisted global: accepts any
    constructor arguments, absorbs ``__setstate__`` dicts into
    ``__dict__`` — never executes third-party code."""

    _qualname = "stub"

    def __init__(self, *args, **kwargs):
        self._args = args
        self._kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple) and len(state) == 2 and isinstance(state[0], (dict, type(None))):
            # (dict_state, slots_state) two-tuple convention
            self.__dict__.update(state[0] or {})
            if isinstance(state[1], dict):
                self.__dict__.update(state[1])
        else:
            self.__dict__["_state"] = state

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"<stub {self._qualname} {sorted(self.__dict__)}>"


def _rebuild_tensor_v2(
    storage, storage_offset, size, stride, requires_grad=False,
    backward_hooks=None, metadata=None,
):
    arr, itemsize = storage
    size = tuple(size)
    stride = tuple(stride)
    if not size:
        return arr[storage_offset].copy() if arr.size else arr.copy()
    base = arr[storage_offset:]
    strided = np.lib.stride_tricks.as_strided(
        base, size, tuple(s * itemsize for s in stride), writeable=False
    )
    return np.ascontiguousarray(strided)


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


_SAFE_GLOBALS = {
    ("collections", "OrderedDict"),
    ("argparse", "Namespace"),
    ("builtins", "set"),
    ("builtins", "frozenset"),
    ("builtins", "complex"),
    ("builtins", "bytearray"),
    ("builtins", "list"),
    ("builtins", "dict"),
    ("builtins", "tuple"),
    ("numpy", "dtype"),
    ("numpy", "ndarray"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
}


class _RestrictedUnpickler(pickle.Unpickler):
    def __init__(self, data: io.BytesIO, load_storage):
        super().__init__(data)
        self._load_storage = load_storage

    def find_class(self, module: str, name: str):
        if module == "torch._utils" and name in (
            "_rebuild_tensor_v2", "_rebuild_tensor"
        ):
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        if module == "torch.serialization" and name == "_get_layout":
            return lambda *a: None
        if module == "torch" and name in ("Size",):
            return tuple
        if (module, name) in _SAFE_GLOBALS:
            mod = __import__(module, fromlist=[name])
            return getattr(mod, name)
        stub = type(name, (_Stub,), {"_qualname": f"{module}.{name}"})
        return stub

    def persistent_load(self, saved_id):
        if not (isinstance(saved_id, tuple) and saved_id and saved_id[0] == "storage"):
            raise pickle.UnpicklingError(
                f"unsupported persistent id: {saved_id!r}"
            )
        _, storage_type, key, _location, numel = saved_id
        if isinstance(storage_type, _StorageType):
            type_name = storage_type.name
        else:  # torch ≥1.13 pickles torch.storage.TypedStorage + dtype stub
            type_name = getattr(storage_type, "_qualname", "").rsplit(".", 1)[-1]
        if type_name not in _STORAGE_DTYPES:
            raise pickle.UnpicklingError(
                f"unknown torch storage type {type_name!r}"
            )
        dtype, is_bf16 = _STORAGE_DTYPES[type_name]
        raw = self._load_storage(key)
        arr = np.frombuffer(raw, dtype=dtype, count=int(numel))
        if is_bf16:
            arr = (arr.astype(np.uint32) << 16).view(np.float32)
        return (arr, arr.dtype.itemsize)


def load(path: str | Path) -> Any:
    """Read a torch zip-format ``.pt`` without torch. Tensors come back
    as ``np.ndarray`` (bf16 widened to f32); unknown pickled classes as
    inert attribute-bag stubs. Raises :class:`LegacyFormatError` for the
    pre-1.6 sequential format."""
    path = Path(path)
    if not zipfile.is_zipfile(path):
        raise LegacyFormatError(
            f"{path} is not a zip-format torch checkpoint (legacy "
            "pre-1.6 serialization needs torch to read)"
        )
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
        root = pkl_name[: -len("data.pkl")]

        def load_storage(key: str) -> bytes:
            return zf.read(f"{root}data/{key}")

        data = io.BytesIO(zf.read(pkl_name))
        return _RestrictedUnpickler(data, load_storage).load()


def load_checkpoint_numpy(path: str | Path) -> Any:
    """Blob with every tensor as ``np.ndarray`` — torch-free for zip
    format; legacy pre-1.6 files fall back to torch when installed
    (tensors converted on the way out). The one loader behind all
    torch-artifact interop sites (hifigan/wav2vec2/vit/image stores)."""
    try:
        return load(path)
    except LegacyFormatError:
        try:
            import torch  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-specific
            raise RuntimeError(
                f"{path} uses the legacy pre-1.6 torch serialization; "
                "reading it needs torch installed (zip-format checkpoints "
                "load torch-free)"
            ) from e
        import torch

        blob = torch.load(path, map_location="cpu", weights_only=True)

        def conv(node):
            if isinstance(node, torch.Tensor):
                t = node.detach().cpu()
                if t.dtype == torch.bfloat16:
                    t = t.float()
                return t.numpy()
            if isinstance(node, dict):
                return {k: conv(v) for k, v in node.items()}
            if isinstance(node, (list, tuple)):
                return type(node)(conv(v) for v in node)
            return node

        return conv(blob)


def to_plain(node: Any) -> Any:
    """Best-effort conversion of a loaded blob to plain dicts: stubs →
    their ``__dict__`` (omegaconf DictConfig stubs → their ``_content``),
    so config blobs read uniformly whether they were pickled as plain
    dicts, Namespaces, or dataclasses."""
    if isinstance(node, _Stub):
        d = dict(node.__dict__)
        d.pop("_args", None)
        d.pop("_kwargs", None)
        if "_content" in d:  # omegaconf Container state
            return to_plain(d["_content"])
        return {k: to_plain(v) for k, v in d.items()}
    if isinstance(node, dict):
        return {k: to_plain(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return type(node)(to_plain(v) for v in node)
    if hasattr(node, "__dict__") and type(node).__module__ == "argparse":
        return {k: to_plain(v) for k, v in vars(node).items()}
    return node
