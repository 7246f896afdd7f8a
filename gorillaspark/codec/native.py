"""ctypes loader for the optional C fast path (codec/_native/gorilla.c).

Built lazily with the system compiler (``cc -O3 -shared -fPIC``) into
the package directory; if no compiler is available or the build/load
fails for any reason, ``NATIVE = None`` and callers use the
numpy/Python implementations — correctness never depends on this
module. The pytest suite exercises both paths against the
reference-generated goldens.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent / "_native"
_SRC = _DIR / "gorilla.c"


def _so_path() -> Path | None:
    """Shared-object name keyed by the source hash: a changed gorilla.c
    always gets a fresh build even when mtimes are unreliable (git
    checkout / rsync preserving timestamps). None when the source is
    not shipped at all (pruned install) — the silent-fallback contract
    must hold even for the hash read."""
    try:
        digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:12]
    except OSError:
        return None
    return _DIR / f"_gorilla_{digest}.so"


_SO = _so_path()


def _build() -> bool:
    try:
        if _SO is None:
            return False
        if _SO.exists():
            return True
        # many executor Python workers may import concurrently: build to
        # a unique temp name, then atomically rename into place
        tmp = _SO.with_suffix(f".{os.getpid()}.tmp.so")
        subprocess.run(
            ["cc", "-O3", "-shared", "-fPIC", "-o", str(tmp), str(_SRC)],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        # best-effort sweep of builds of older source revisions
        for old in _DIR.glob("_gorilla*.so"):
            if old != _SO:
                try:
                    old.unlink()
                except OSError:
                    pass
        return True
    except Exception:
        return False


def _load():
    if not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
        I64 = ctypes.POINTER(ctypes.c_int64)
        U64 = ctypes.POINTER(ctypes.c_uint64)
        lib.gs_encode_blocks.restype = ctypes.c_int64
        lib.gs_encode_blocks.argtypes = [I64, I64, ctypes.c_int64, I64,
                                         U64, U64, ctypes.c_int64, I64]
        lib.gs_decode_blocks.restype = ctypes.c_int64
        lib.gs_decode_blocks.argtypes = [U64, I64, ctypes.c_int64, I64,
                                         U64, I64, ctypes.c_int64]
        lib.gs_encode_blocks_dfcm.restype = ctypes.c_int64
        lib.gs_encode_blocks_dfcm.argtypes = [
            I64, I64, ctypes.c_int64, I64, U64, U64, ctypes.c_int64,
            I64, U64, ctypes.c_int64]
        lib.gs_decode_blocks_dfcm.restype = ctypes.c_int64
        lib.gs_decode_blocks_dfcm.argtypes = [
            U64, I64, ctypes.c_int64, I64, U64, I64, ctypes.c_int64,
            U64, ctypes.c_int64]
        U8 = ctypes.POINTER(ctypes.c_uint8)
        lib.gs_rice_decode.restype = ctypes.c_int64
        lib.gs_rice_decode.argtypes = [U8, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int, I64]
        lib.gs_png_unfilter.restype = ctypes.c_int
        lib.gs_png_unfilter.argtypes = [U8, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_int, U8]
        lib.gs_flac_crc.restype = ctypes.c_int
        lib.gs_flac_crc.argtypes = [U8, ctypes.c_int64, ctypes.c_int]
        lib.gs_h265_search_mv.restype = ctypes.c_int
        lib.gs_h265_search_mv.argtypes = [
            I64, ctypes.c_int64, ctypes.c_int64, I64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, I64,
            ctypes.c_int64, ctypes.c_int64, I64]
        I32 = ctypes.POINTER(ctypes.c_int32)
        lib.gs_jpeg_scan.restype = ctypes.c_int
        lib.gs_jpeg_scan.argtypes = (
            [U8, ctypes.c_int64, ctypes.c_int64] + [ctypes.c_int] * 5
            + [I32] * 5 + [I64] + [I32] * 3 + [I32] * 3 + [U8] + [I32])
        return lib
    except Exception:
        return None


NATIVE = _load()


def _malloc_prefault() -> bool:
    """Raise glibc's M_MMAP_THRESHOLD so the large per-batch decode
    output buffers (~16 B/point, freed every Arrow batch) come from
    the malloc free-list instead of fresh mmaps: freed pages stay
    faulted, removing kernel page-zeroing from the per-batch cost.
    tools/decode_cliff_probe.py quantifies the effect (cold-output
    faults collapse 32-proc decode 5×; in the steady-state Spark path
    this trims ~14% off the median batch). Heap high-water memory is
    retained by the worker — bounded by one batch's output footprint.
    Disable with SPARK_GRAFT_MALLOC_PREFAULT=0."""
    if os.environ.get("SPARK_GRAFT_MALLOC_PREFAULT", "1") != "1":
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_MMAP_THRESHOLD = -3
        return bool(libc.mallopt(M_MMAP_THRESHOLD, 1 << 30))
    except Exception:
        return False


_PREFAULT = _malloc_prefault()


def _p64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _pu64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def encode_blocks_native(block_ts: np.ndarray, offsets: np.ndarray,
                         ts: np.ndarray, values: np.ndarray):
    """C-kernel segmented encode; same contract as vector.encode_blocks.
    Returns None when the native library is unavailable."""
    if NATIVE is None:
        return None
    block_ts = np.ascontiguousarray(block_ts, dtype=np.int64)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    ts = np.ascontiguousarray(ts, dtype=np.int64)
    if values.dtype != np.uint64:
        values = np.ascontiguousarray(values).view(np.uint64)
    values = np.ascontiguousarray(values)
    S = block_ts.shape[0]
    n = ts.shape[0]
    cap = 2 * n + 6 * max(S, 1)
    out_words = np.empty(cap, dtype=np.uint64)
    out_wc = np.empty(max(S, 1), dtype=np.int64)
    total = NATIVE.gs_encode_blocks(_p64(block_ts), _p64(offsets), S,
                                    _p64(ts), _pu64(values),
                                    _pu64(out_words), cap, _p64(out_wc))
    if total < 0:
        return None
    return out_words[:total].copy(), out_wc[:S].copy()


def _dfcm_table_n(size: int) -> int:
    """Java table-size rounding, mirrored from predictors.DifferentialFCM:
    next power of two of (size-1).bit_length(), with size==1 -> 1."""
    if size <= 0:
        raise ValueError("size must be positive")
    size -= 1
    return 1 if size == 0 else 1 << size.bit_length()


def encode_blocks_dfcm_native(block_ts: np.ndarray, offsets: np.ndarray,
                              ts: np.ndarray, values: np.ndarray,
                              size: int = 1024):
    """C-kernel segmented encode with the DFCM value predictor
    (bit-exact vs codec/scalar.py GorillaEncoder(predictor='dfcm:N'));
    None when the native library is unavailable."""
    if NATIVE is None:
        return None
    block_ts = np.ascontiguousarray(block_ts, dtype=np.int64)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    ts = np.ascontiguousarray(ts, dtype=np.int64)
    if values.dtype != np.uint64:
        values = np.ascontiguousarray(values).view(np.uint64)
    values = np.ascontiguousarray(values)
    S = block_ts.shape[0]
    n = ts.shape[0]
    cap = 2 * n + 6 * max(S, 1)
    out_words = np.empty(cap, dtype=np.uint64)
    out_wc = np.empty(max(S, 1), dtype=np.int64)
    table_n = _dfcm_table_n(size)
    table = np.empty(table_n, dtype=np.uint64)
    total = NATIVE.gs_encode_blocks_dfcm(
        _p64(block_ts), _p64(offsets), S, _p64(ts), _pu64(values),
        _pu64(out_words), cap, _p64(out_wc), _pu64(table), table_n)
    if total < 0:
        return None
    return out_words[:total].copy(), out_wc[:S].copy()


def decode_blocks_dfcm_native(words: np.ndarray, word_counts: np.ndarray,
                              size: int = 1024,
                              n_points_hint: int | None = None):
    """C-kernel segmented DFCM decode → (offsets, ts, values) or None."""
    if NATIVE is None:
        return None
    words = np.ascontiguousarray(words, dtype=np.uint64)
    wc = np.ascontiguousarray(word_counts, dtype=np.int64)
    S = wc.shape[0]
    cap = int(n_points_hint) if n_points_hint else int(words.shape[0]) * 32
    table_n = _dfcm_table_n(size)
    table = np.empty(table_n, dtype=np.uint64)
    while True:
        out_ts = np.empty(cap, dtype=np.int64)
        out_vals = np.empty(cap, dtype=np.uint64)
        out_off = np.empty(S + 1, dtype=np.int64)
        total = NATIVE.gs_decode_blocks_dfcm(
            _pu64(words), _p64(wc), S, _p64(out_ts), _pu64(out_vals),
            _p64(out_off), cap, _pu64(table), table_n)
        if total == -1:
            cap = max(cap * 2, int(words.shape[0]) * 32)
            n_points_hint = None
            continue
        if total < 0:
            return None
        return (out_off.copy(), out_ts[:total].copy(),
                out_vals[:total].copy())


def decode_blocks_native(words: np.ndarray, word_counts: np.ndarray,
                         n_points_hint: int | None = None):
    """C-kernel segmented decode → (offsets, ts, values) or None."""
    if NATIVE is None:
        return None
    words = np.ascontiguousarray(words, dtype=np.uint64)
    wc = np.ascontiguousarray(word_counts, dtype=np.int64)
    S = wc.shape[0]
    # capacity: each encoded point needs ≥ (1+1) bits ⇒ points < bits
    cap = int(n_points_hint) if n_points_hint else int(words.shape[0]) * 32
    while True:
        out_ts = np.empty(cap, dtype=np.int64)
        out_vals = np.empty(cap, dtype=np.uint64)
        out_off = np.empty(S + 1, dtype=np.int64)
        total = NATIVE.gs_decode_blocks(_pu64(words), _p64(wc), S,
                                        _p64(out_ts), _pu64(out_vals),
                                        _p64(out_off), cap)
        if total == -1:          # undersized hint — grow and retry
            cap = max(cap * 2, int(words.shape[0]) * 32)
            n_points_hint = None
            continue
        if total < 0:
            return None
        return (out_off.copy(), out_ts[:total].copy(),
                out_vals[:total].copy())


def rice_decode_native(data: bytes, start_bit: int, cnt: int,
                       k: int):
    """C fast path for FLAC rice partitions: (int64 residuals,
    end_bit), or None when the kernel is unavailable / the stream is
    truncated (caller falls back to the numpy path)."""
    if NATIVE is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(cnt, dtype=np.int64)
    end = NATIVE.gs_rice_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(data), start_bit, cnt, k, _p64(out))
    if end < 0:
        return None
    return out, int(end)


def png_unfilter_native(raw: np.ndarray, h: int, w: int, c: int):
    """C fast path for PNG row unfiltering: (h, w, c) uint8 array, or
    None when the kernel is unavailable (caller falls back to numpy).
    Raises ValueError on an invalid filter byte — same contract as the
    Python path."""
    if NATIVE is None:
        return None
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    out = np.empty(h * w * c, dtype=np.uint8)
    U8 = ctypes.POINTER(ctypes.c_uint8)
    rc = NATIVE.gs_png_unfilter(
        raw.ctypes.data_as(U8), h, w, c, out.ctypes.data_as(U8))
    if rc < 0:
        raise ValueError("bad PNG filter byte")
    return out.reshape(h, w, c)


def jpeg_scan_native(data: bytes, start: int, mcux: int, mcuy: int,
                     dri: int, n_comps: int, units: np.ndarray,
                     comp_base: np.ndarray, comp_rowstride: np.ndarray,
                     comp_sh: np.ndarray, comp_sv: np.ndarray,
                     mincode: np.ndarray, maxcode: np.ndarray,
                     valptr: np.ndarray, vals: np.ndarray,
                     total_blocks: int):
    """C fast path for the baseline-JPEG entropy scan: zig-zag
    coefficient blocks (total_blocks, 64) int32, or None when the
    kernel is unavailable. ``units`` is (n_units, 5) int32 rows of
    (comp, v, u, dc_slot, ac_slot). Raises ValueError on corrupt
    entropy data — same failure classes as the Python bit-walk."""
    if NATIVE is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    units = np.ascontiguousarray(units, dtype=np.int32)
    out = np.zeros(total_blocks * 64, dtype=np.int32)
    U8 = ctypes.POINTER(ctypes.c_uint8)
    I32 = ctypes.POINTER(ctypes.c_int32)

    def p32(a):
        return np.ascontiguousarray(a, dtype=np.int32) \
            .ctypes.data_as(I32)

    rc = NATIVE.gs_jpeg_scan(
        buf.ctypes.data_as(U8), len(data), start, mcux, mcuy, dri,
        n_comps, units.shape[0],
        p32(units[:, 0].copy()), p32(units[:, 1].copy()),
        p32(units[:, 2].copy()), p32(units[:, 3].copy()),
        p32(units[:, 4].copy()),
        _p64(np.ascontiguousarray(comp_base, dtype=np.int64)),
        p32(comp_rowstride), p32(comp_sh), p32(comp_sv),
        p32(mincode), p32(maxcode), p32(valptr),
        np.ascontiguousarray(vals, dtype=np.uint8)
        .ctypes.data_as(U8),
        out.ctypes.data_as(I32))
    if rc == -2:
        raise ValueError("invalid huffman code in JPEG stream")
    if rc == -3:
        raise ValueError("AC run overflow")
    if rc == -4:
        raise ValueError("truncated JPEG: missing restart marker")
    if rc == -5:
        raise ValueError("implausible JPEG DC size")
    if rc != 0:
        raise ValueError(f"JPEG entropy decode failed ({rc})")
    return out.reshape(total_blocks, 64)


def h265_search_mv_native(refY: np.ndarray, src_blk: np.ndarray,
                          x0: int, y0: int, w: int, h: int,
                          starts, rng: int):
    """C fast path for the HEVC encoder motion search — same
    (sad, (mvx, mvy)) as operators/h265._search_mv's numpy form
    (which stays as the correctness reference / fallback); None when
    the kernel is unavailable."""
    if NATIVE is None:
        return None
    ref = np.ascontiguousarray(refY, dtype=np.int64)
    src = np.ascontiguousarray(src_blk, dtype=np.int64)
    n_starts = len(starts)
    st = np.zeros(max(1, 2 * n_starts), dtype=np.int64)
    for i, (sx, sy) in enumerate(starts):
        st[2 * i] = sx
        st[2 * i + 1] = sy
    out = np.empty(3, dtype=np.int64)
    NATIVE.gs_h265_search_mv(_p64(ref), ref.shape[0], ref.shape[1],
                             _p64(src), x0, y0, w, h, _p64(st),
                             n_starts, rng, _p64(out))
    return int(out[0]), (int(out[1]), int(out[2]))


def flac_crc_native(data: bytes, mode: int):
    """C fast path for FLAC frame CRCs (mode 0 = CRC-8 poly 0x07,
    1 = CRC-16 poly 0x8005); None when the kernel is unavailable."""
    if NATIVE is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    return int(NATIVE.gs_flac_crc(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(data), mode))
