"""Native (C++) runtime components with ctypes bindings + python fallbacks.

TPU-side analogue of the reference's native layer: where the reference ships
CUDA kernels behind a JIT plugin loader (``torch_utils/custom_ops.py:46`` —
md5-keyed incremental build, FileBaton lock, runtime-disabled fallback to
python impls), this package ships C++ *host runtime* components — the TPU
compute path is XLA/Pallas, so native code belongs to the IO/tokenize side:

- ``write_png`` / ``write_png_batch``: zlib PNG writer for the 30k-image eval
  loop (no PIL/GIL in the disk path),
- ``NativeTokenizer``: CLIP BPE for ASCII prompts with automatic per-string
  python fallback (same ids by construction).

The shared library builds lazily on first use into an md5-keyed build dir
(sources hash -> rebuild only on change) with a lock file guarding concurrent
builds.  Every entry point silently degrades to the python implementation if
no compiler is available — mirroring the reference's ``impl='ref'`` path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
from typing import Optional, Sequence

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_SOURCES = ("pngio.cpp", "tokenizer.cpp")
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _source_hash() -> str:
    h = hashlib.md5()
    for name in _SOURCES:
        with open(os.path.join(_SRC_DIR, name), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:12]


def _build_dir() -> str:
    root = os.environ.get(
        "SIDLSG_NATIVE_BUILD_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "sid_lsg_tpu", "native"),
    )
    return os.path.join(root, _source_hash())


def _build_library() -> Optional[str]:
    out_dir = _build_dir()
    so_path = os.path.join(out_dir, "libsidnative.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(out_dir, exist_ok=True)
    lock = os.path.join(out_dir, ".lock")
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        import time

        for _ in range(600):  # wait up to 60s for a concurrent build
            if os.path.exists(so_path):
                return so_path
            time.sleep(0.1)
        return None
    try:
        srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
        tmp = so_path + ".tmp.so"
        cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", tmp,
               *srcs, "-lz"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)
        return so_path
    except Exception as e:  # no compiler / build error -> python fallback
        print(f"[sid_lsg_tpu.native] build failed, using python fallbacks: {e}",
              file=sys.stderr)
        return None
    finally:
        try:
            os.remove(lock)
        except OSError:
            pass


def get_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if os.environ.get("SIDLSG_DISABLE_NATIVE"):
        _lib_failed = True
        return None
    so_path = _build_library()
    if so_path is None:
        _lib_failed = True
        return None
    lib = ctypes.CDLL(so_path)
    lib.sid_write_png.restype = ctypes.c_int
    lib.sid_write_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.sid_write_png_batch.restype = ctypes.c_int
    lib.sid_tok_create.restype = ctypes.c_void_p
    lib.sid_tok_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.sid_tok_destroy.argtypes = [ctypes.c_void_p]
    lib.sid_tok_encode_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_library() is not None


# ---------------------------------------------------------------------------
# PNG writing


def write_png(path: str, image: np.ndarray, compress_level: int = 1) -> None:
    """uint8 (H,W,3) or (H,W) -> PNG; PIL fallback when native is absent."""
    image = np.ascontiguousarray(image, dtype=np.uint8)
    channels = 1 if image.ndim == 2 else image.shape[2]
    lib = get_library()
    if lib is not None and channels in (1, 3):
        rc = lib.sid_write_png(
            path.encode(), image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            image.shape[0], image.shape[1], channels, compress_level,
        )
        if rc == 0:
            return
    from PIL import Image

    Image.fromarray(image if image.ndim == 3 else image, "RGB" if channels == 3 else "L").save(path)


def write_png_batch(paths: Sequence[str], images: np.ndarray,
                    compress_level: int = 1) -> None:
    """(N,H,W,C) uint8 -> N PNGs in one native call."""
    images = np.ascontiguousarray(images, dtype=np.uint8)
    lib = get_library()
    if lib is None or images.shape[-1] not in (1, 3):
        for p, img in zip(paths, images):
            write_png(p, img, compress_level)
        return
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    n = lib.sid_write_png_batch(
        arr, images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(paths), images.shape[1], images.shape[2], images.shape[3],
        compress_level,
    )
    if n != len(paths):
        raise IOError(f"native png batch wrote {n}/{len(paths)} files")


# ---------------------------------------------------------------------------
# Tokenizer


class NativeTokenizer:
    """CLIP BPE with native ASCII fast path; same interface & ids as
    ``models.tokenizer.CLIPTokenizer`` (the python tokenizer handles every
    string the native side declines: non-ASCII, html entities, OOV)."""

    def __init__(self, py_tokenizer):
        self.py = py_tokenizer
        self.model_max_length = py_tokenizer.model_max_length
        self.bos_token_id = py_tokenizer.bos_token_id
        self.eos_token_id = py_tokenizer.eos_token_id
        self.pad_token_id = py_tokenizer.pad_token_id
        self._handle = None
        lib = get_library()
        if lib is not None and hasattr(py_tokenizer, "encoder"):
            self._handle = self._create(lib)

    def _create(self, lib):
        import tempfile

        d = tempfile.mkdtemp(prefix="sidtok_")
        vocab_tsv = os.path.join(d, "vocab.tsv")
        merges = os.path.join(d, "merges.txt")
        with open(vocab_tsv, "w", encoding="utf-8") as f:
            for tok, idx in self.py.encoder.items():
                if "\t" not in tok and "\n" not in tok:
                    f.write(f"{tok}\t{idx}\n")
        with open(merges, "w", encoding="utf-8") as f:
            for (a, b), _ in sorted(self.py.bpe_ranks.items(), key=lambda kv: kv[1]):
                f.write(f"{a} {b}\n")
        return lib.sid_tok_create(vocab_tsv.encode(), merges.encode())

    @staticmethod
    def _native_safe(text: str) -> bool:
        # Route html entities & control chars to python (tokenizer unescapes).
        return all(32 <= ord(c) <= 126 for c in text) and "&" not in text

    def __call__(self, prompts: Sequence[str]) -> np.ndarray:
        lib = get_library()
        n, L = len(prompts), self.model_max_length
        if self._handle is None or lib is None:
            return self.py(list(prompts))
        out = np.full((n, L), self.pad_token_id, dtype=np.int32)
        ok = np.zeros(n, dtype=np.uint8)
        safe = [i for i, p in enumerate(prompts) if self._native_safe(p)]
        if safe:
            texts = (ctypes.c_char_p * len(safe))(
                *[prompts[i].encode() for i in safe]
            )
            sub = np.zeros((len(safe), L), dtype=np.int32)
            sub_ok = np.zeros(len(safe), dtype=np.uint8)
            lib.sid_tok_encode_batch(
                ctypes.c_void_p(self._handle), texts, len(safe),
                sub.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), L,
                self.bos_token_id, self.eos_token_id, self.pad_token_id,
                sub_ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            for j, i in enumerate(safe):
                if sub_ok[j]:
                    out[i] = sub[j]
                    ok[i] = 1
        rest = [i for i in range(n) if not ok[i]]
        if rest:
            out[rest] = self.py([prompts[i] for i in rest])
        return out

    def encode(self, text: str):
        return self.py.encode(text)
