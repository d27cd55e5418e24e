"""ctypes loader + auto-builder for the native PAF parser.

Builds pgparse.c with the system compiler on first use (gcc/cc -O3 -shared);
falls back silently to the pure-Python parser when no compiler or zlib dev
headers are available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_pgparse.so")
_SRC = os.path.join(_HERE, "pgparse.c")
_lock = threading.Lock()
_lib = None
_build_failed = False


def build_so(src: str, so: str, libs=("-lz", "-lm")) -> bool:
    """Compile one .c into a shared object with the first working compiler."""
    for cc in ("cc", "gcc", "clang"):
        try:
            r = subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", src, "-o", so] + list(libs),
                capture_output=True, timeout=120)
            if r.returncode == 0:
                return True
        except Exception:
            continue
    return False


def _build() -> bool:
    # libdeflate fast path (measured ~2x zlib inflate) when the dev files
    # exist; plain zlib build otherwise — pgparse.c gates on the define
    if os.path.exists("/usr/include/libdeflate.h") and build_so(
            _SRC, _SO, libs=("-DPG_HAVE_LIBDEFLATE", "-ldeflate",
                             "-lz", "-lm")):
        return True
    return build_so(_SRC, _SO)


def get_lib():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.pg_parse_paf.restype = ctypes.c_void_p
        lib.pg_parse_paf.argtypes = [ctypes.c_char_p, ctypes.c_char,
                                     ctypes.c_double, ctypes.c_double,
                                     ctypes.c_double]
        for f in ("r_name r_qlen r_cid r_ctglen r_kept h_name h_qs h_qe "
                  "h_mlen h_blen h_rank h_score_ori h_score_adj h_lof "
                  "h_n_exon h_off_exon h_cid h_rev h_cs h_ce h_cm "
                  "e_os e_oe").split():
            fn = getattr(lib, "pg_get_" + f)
            fn.restype = ctypes.c_void_p
            fn.argtypes = [ctypes.c_void_p,
                           ctypes.POINTER(ctypes.c_int64)]
        lib.pg_get_err.restype = ctypes.c_char_p
        lib.pg_get_err.argtypes = [ctypes.c_void_p]
        lib.pg_get_n_records.restype = ctypes.c_int64
        lib.pg_get_n_records.argtypes = [ctypes.c_void_p]
        for f in ("prot", "ctg"):
            b = getattr(lib, "pg_get_%s_blob" % f)
            b.restype = ctypes.c_void_p
            b.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                          ctypes.POINTER(ctypes.c_int64)]
            o = getattr(lib, "pg_get_%s_offs" % f)
            o.restype = ctypes.c_void_p
            o.argtypes = [ctypes.c_void_p]
        lib.pg_parse_free.argtypes = [ctypes.c_void_p]
        lib.pg_score_adj.restype = ctypes.c_int32
        lib.pg_score_adj.argtypes = [ctypes.c_int32, ctypes.c_double,
                                     ctypes.c_double, ctypes.c_double]
        lib.pg_parse_paf_sess.restype = ctypes.c_void_p
        lib.pg_parse_paf_sess.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char,
            ctypes.c_double, ctypes.c_double, ctypes.c_double]
        lib.pg_sess_new.restype = ctypes.c_void_p
        lib.pg_sess_new.argtypes = [ctypes.c_char]
        lib.pg_sess_free.argtypes = [ctypes.c_void_p]
        lib.pg_sess_n_prot.restype = ctypes.c_int64
        lib.pg_sess_n_prot.argtypes = [ctypes.c_void_p]
        lib.pg_sess_n_gene.restype = ctypes.c_int64
        lib.pg_sess_n_gene.argtypes = [ctypes.c_void_p]
        lib.pg_sess_name_blob.restype = ctypes.c_void_p
        lib.pg_sess_name_blob.argtypes = [
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.pg_sess_name_offs.restype = ctypes.c_void_p
        lib.pg_sess_name_offs.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.pg_sess_prot_gid_arr.restype = ctypes.c_void_p
        lib.pg_sess_prot_gid_arr.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def _arr(lib, getter, handle, dtype):
    n = ctypes.c_int64()
    ptr = getter(handle, ctypes.byref(n))
    n_elem = int(n.value)
    if n_elem == 0 or ptr is None:
        return np.zeros(0, dtype)
    buf = (ctypes.c_char * (n_elem * np.dtype(dtype).itemsize)) \
        .from_address(ptr)
    return np.frombuffer(buf, dtype=dtype).copy()


def _names_blob(lib, which, handle) -> bytes:
    """Raw NUL-separated name blob (names in intern order)."""
    blob_len = ctypes.c_int64()
    n = ctypes.c_int64()
    bptr = getattr(lib, "pg_get_%s_blob" % which)(
        handle, ctypes.byref(blob_len), ctypes.byref(n))
    if int(n.value) == 0:
        return b""
    return ctypes.string_at(bptr, int(blob_len.value))


def decode_names(blob: bytes):
    if not blob:
        return []
    parts = blob.split(b"\0")
    if parts and parts[-1] == b"":
        parts.pop()
    return [p.decode() for p in parts]


class InternSession:
    """Cross-file global name intern owned by the native parser."""

    def __init__(self, lib, delim: str):
        self._lib = lib
        self.handle = lib.pg_sess_new(delim.encode()[:1] or b":")

    def close(self):
        if self.handle:
            self._lib.pg_sess_free(self.handle)
            self.handle = None

    def counts(self):
        return (int(self._lib.pg_sess_n_gene(self.handle)),
                int(self._lib.pg_sess_n_prot(self.handle)))

    def names_tail(self, which: int, start: int, total: int):
        """Decode names [start, total) of table `which` (0=gene, 1=prot)."""
        if total <= start:
            return []
        blob_len = ctypes.c_int64()
        n = ctypes.c_int64()
        bptr = self._lib.pg_sess_name_blob(self.handle, which,
                                           ctypes.byref(blob_len),
                                           ctypes.byref(n))
        optr = self._lib.pg_sess_name_offs(self.handle, which)
        offs = np.frombuffer(
            (ctypes.c_char * (total * 8)).from_address(optr), np.int64)
        lo = int(offs[start])
        blob = ctypes.string_at(bptr + lo, int(blob_len.value) - lo)
        return decode_names(blob)

    def prot_gid(self, n: int) -> np.ndarray:
        ptr = self._lib.pg_sess_prot_gid_arr(self.handle)
        if n == 0 or not ptr:
            return np.zeros(0, np.int32)
        return np.frombuffer(
            (ctypes.c_char * (n * 4)).from_address(ptr), np.int32).copy()


def make_session(delim: str):
    lib = get_lib()
    if lib is None:
        return None
    return InternSession(lib, delim)


def parse_paf_native(fn: str, min_ratio: float, min_iden: float,
                     coef: float, sess: "InternSession" = None,
                     delim: str = ":"):
    """Returns dict of numpy arrays + name lists, or None if unavailable.

    With `sess`, r_name/h_name carry GLOBAL protein ids (cross-file intern
    in C, delim fixed at session creation) and the per-file prot blob is
    omitted. Without `sess` (the parallel-parse worker path), ids are
    file-LOCAL in first-encounter order and `prot_blob` carries the names."""
    lib = get_lib()
    if lib is None:
        return None
    dl = delim.encode()[:1] or b":"
    if sess is not None:
        handle = lib.pg_parse_paf_sess(sess.handle, fn.encode(), dl,
                                       min_ratio, min_iden, coef)
    else:
        handle = lib.pg_parse_paf(fn.encode(), dl, min_ratio, min_iden,
                                  coef)
    try:
        err = lib.pg_get_err(handle)
        if err:
            raise RuntimeError("native PAF parse failed: %s" % err.decode())
        out = {}
        specs = {
            "r_name": np.int32, "r_qlen": np.int32, "r_cid": np.int32,
            "r_ctglen": np.int64, "r_kept": np.int8,
            "h_name": np.int32, "h_qs": np.int32, "h_qe": np.int32,
            "h_mlen": np.int32, "h_blen": np.int32, "h_rank": np.int32,
            "h_score_ori": np.int32, "h_score_adj": np.int32,
            "h_lof": np.int32, "h_n_exon": np.int32, "h_off_exon": np.int32,
            "h_cid": np.int32, "h_rev": np.int32,
            "h_cs": np.int64, "h_ce": np.int64, "h_cm": np.int64,
            "e_os": np.int32, "e_oe": np.int32,
        }
        for name, dt in specs.items():
            out[name] = _arr(lib, getattr(lib, "pg_get_" + name), handle, dt)
        out["prot_blob"] = _names_blob(lib, "prot", handle)
        out["ctg_names"] = decode_names(_names_blob(lib, "ctg", handle))
        out["n_records"] = int(lib.pg_get_n_records(handle))
        return out
    finally:
        lib.pg_parse_free(handle)


def score_adj_exact(score_ori: int, coef: float, div: float,
                    uncov: float) -> int:
    lib = get_lib()
    if lib is None:
        import math
        return int(score_ori * math.exp(-coef * (div + uncov)) + 0.499)
    return int(lib.pg_score_adj(score_ori, coef, div, uncov))
