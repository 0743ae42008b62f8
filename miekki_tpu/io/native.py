"""ctypes bindings for the native C++ FASTA/FASTQ reader (native/miekki_io.cpp).

The native path parses + 2-bit-encodes whole files at memory bandwidth; the
pure-Python reader (io.reader) is the always-available fallback and the
behavioral specification (parity tests in tests/test_native_io.py).
Disable with MIEKKI_NATIVE_IO=0; build with `make -C native`.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Iterator, Optional, Tuple

import numpy as np

_ERRORS = {
    -1: "cannot open file",
    -2: "gzip decompression failed",
    -3: "unrecognized sequence file",
    -4: "malformed FASTQ record",
    -5: "allocation failure",
}


class _MioResult(ctypes.Structure):
    _fields_ = [
        ("codes", ctypes.POINTER(ctypes.c_uint8)),
        ("offsets", ctypes.POINTER(ctypes.c_uint64)),
        ("names", ctypes.POINTER(ctypes.c_char)),  # NUL-separated blob — not
        # c_char_p, which would truncate at the first embedded NUL
        ("n_records", ctypes.c_uint64),
        ("codes_len", ctypes.c_uint64),
        ("names_len", ctypes.c_uint64),
    ]


_lib: Optional[ctypes.CDLL] = None
_lib_checked = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    if os.environ.get("MIEKKI_NATIVE_IO", "1") == "0":
        return None
    so = Path(__file__).resolve().parents[2] / "native" / "libmiekki_io.so"
    if not so.exists():
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.mio_parse_file.argtypes = [ctypes.c_char_p, ctypes.POINTER(_MioResult)]
    lib.mio_parse_file.restype = ctypes.c_int
    lib.mio_free.argtypes = [ctypes.POINTER(_MioResult)]
    lib.mio_free.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def read_encoded_native(path) -> Iterator[Tuple[str, np.ndarray]]:
    """Native analog of io.reader.read_encoded: yields (name, uint8 codes).

    Raises ValueError with the same wording family as the Python reader on
    malformed input; RuntimeError if the library is unavailable.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not available (make -C native)")
    res = _MioResult()
    rc = lib.mio_parse_file(os.fspath(path).encode(), ctypes.byref(res))
    if rc != 0:
        raise ValueError(f"{_ERRORS.get(rc, f'error {rc}')}: {path}")
    try:
        n = int(res.n_records)
        codes_len = int(res.codes_len)
        all_codes = np.ctypeslib.as_array(res.codes, shape=(codes_len,)).copy() \
            if codes_len else np.zeros(0, np.uint8)
        offsets = np.ctypeslib.as_array(res.offsets, shape=(n + 1,)).copy() \
            if n else np.zeros(1, np.uint64)
        names_blob = ctypes.string_at(res.names, int(res.names_len)) if n else b""
    finally:
        lib.mio_free(ctypes.byref(res))
    names = names_blob.decode("utf-8", "replace").split("\0")[:n]
    for i in range(n):
        a, b = int(offsets[i]), int(offsets[i + 1])
        yield names[i], all_codes[a:b]
