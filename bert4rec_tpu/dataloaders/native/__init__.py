"""Native (C++) data-pipeline components.

The reference has zero native code (SURVEY.md §2: 100% Python); this
package exists because the TPU framework needs the host pipeline to outrun
multiple chips per host — the numpy masking pass peaks around 38k
examples/s, while a full v5e host wants >100k.

``load()`` compiles ``masking.cpp`` with the system g++ on first use (cached
next to the source) and exposes it via ctypes. All callers fall back to the
numpy implementation when no compiler is available, so the native engine is
an accelerator, never a requirement.
"""

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SRC = _DIR / "masking.cpp"
_LIB = _DIR / "libmasking.so"

_lock = threading.Lock()
_lib = None
_load_failed = False


def _compile() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           str(_SRC), "-o", str(_LIB)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """The compiled library, building it on first call (None on failure)."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not _LIB.is_file() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _compile():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            _load_failed = True
            return None
        lib.apply_dynamic_masking_batch.restype = None
        lib.apply_dynamic_masking_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,   # in arrays
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,       # n, s, p
            ctypes.c_int32,                                       # mask id
            ctypes.c_void_p, ctypes.c_int64,                      # specials
            ctypes.c_int32,                                       # vocab
            ctypes.c_double, ctypes.c_double, ctypes.c_double,    # rates
            ctypes.c_uint64, ctypes.c_int32,                      # seed, thr
            ctypes.c_void_p, ctypes.c_void_p,                     # outputs
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def apply_dynamic_masking_batch_native(
        input_ids: np.ndarray,
        lengths: np.ndarray,
        max_selections_per_seq: int,
        mask_token_id: int,
        special_token_ids,
        vocab_size: int,
        seed: int,
        selection_rate: float = 0.2,
        mask_token_rate: float = 1.0,
        random_token_rate: float = 0.0,
        finetuning: Optional[np.ndarray] = None,
        n_threads: int = 0) -> dict:
    """Same contract as dataloader_utils.apply_dynamic_masking_batch, with
    an explicit integer ``seed`` (per-row splitmix64 streams; a given
    (seed, row) is deterministic regardless of threading)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native masking library unavailable")

    input_ids = np.ascontiguousarray(input_ids, dtype=np.int32)
    n, s = input_ids.shape
    p = max_selections_per_seq
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    specials = np.ascontiguousarray(
        np.asarray(list(special_token_ids), dtype=np.int32))
    ft = (np.ascontiguousarray(finetuning, dtype=np.uint8)
          if finetuning is not None else None)

    masked_input = np.empty_like(input_ids)
    mlm_positions = np.empty((n, p), dtype=np.int32)
    mlm_ids = np.empty((n, p), dtype=np.int32)
    mlm_weights = np.empty((n, p), dtype=np.int32)

    lib.apply_dynamic_masking_batch(
        input_ids.ctypes.data, lengths.ctypes.data,
        ft.ctypes.data if ft is not None else None,
        n, s, p, mask_token_id,
        specials.ctypes.data, len(specials), vocab_size,
        float(selection_rate), float(mask_token_rate),
        float(random_token_rate),
        np.uint64(seed & 0xFFFFFFFFFFFFFFFF), int(n_threads),
        masked_input.ctypes.data, mlm_positions.ctypes.data,
        mlm_ids.ctypes.data, mlm_weights.ctypes.data)

    return {
        "input_word_ids": masked_input,
        "masked_lm_positions": mlm_positions,
        "masked_lm_ids": mlm_ids,
        "masked_lm_weights": mlm_weights,
    }
