"""ctypes bridge to the native C++ frame loader (native/dataloader.cpp).

The native loader is the TPU-framework equivalent of the reference's only
host concurrency — DataLoader(num_workers=4) (dataset/dataset.py:249): a
thread-pool libpng/libjpeg decoder with an in-RAM frame cache.  Falls back
cleanly (returns None) when the shared library hasn't been built
(`make -C native`).
"""
from __future__ import annotations

import ctypes
import os.path as osp
from typing import List, Optional

import numpy as np

_LIB = None
_LIB_TRIED = False


def _load_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = osp.join(osp.dirname(__file__), "..", "..", "native",
                    "libsrloader.so")
    if not osp.isfile(path):
        return None
    lib = ctypes.CDLL(path)
    lib.sr_loader_create.restype = ctypes.c_void_p
    lib.sr_loader_create.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.sr_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.sr_loader_batch.restype = ctypes.c_int
    lib.sr_loader_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8)]
    _LIB = lib
    return lib


class NativeLoader:
    """Owns a native loader handle; None-safe construction via .create()."""

    def __init__(self, lib, handle, n_frames, H, W, has_normals):
        self._lib = lib
        self._h = handle
        self.n_frames = n_frames
        self.H = H
        self.W = W
        self.has_normals = has_normals

    @classmethod
    def create(cls, img_paths: List[str], mask_paths: List[str],
               normal_paths: Optional[List[str]], H: int, W: int,
               n_threads: int = 4, cache: bool = True):
        lib = _load_lib()
        if lib is None:
            return None
        normals = "\n".join(normal_paths) if normal_paths else ""
        h = lib.sr_loader_create(
            "\n".join(img_paths).encode(), "\n".join(mask_paths).encode(),
            normals.encode(), len(img_paths), H, W, n_threads,
            1 if cache else 0)
        if not h:
            return None
        return cls(lib, h, len(img_paths), H, W, bool(normal_paths))

    def batch(self, fids) -> dict:
        """uint8 arrays: img (B,H,W,3) BGR, mask (B,H,W) {0,1},
        normal (B,H,W,3) RGB when available."""
        fids = np.ascontiguousarray(np.asarray(fids, np.int32))
        bs = len(fids)
        imgs = np.empty((bs, self.H, self.W, 3), np.uint8)
        masks = np.empty((bs, self.H, self.W), np.uint8)
        normals = (np.empty((bs, self.H, self.W, 3), np.uint8)
                   if self.has_normals else None)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        n = self._lib.sr_loader_batch(
            self._h, fids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), bs,
            imgs.ctypes.data_as(u8p), masks.ctypes.data_as(u8p),
            normals.ctypes.data_as(u8p) if normals is not None else
            ctypes.cast(None, u8p))
        out = {"img": imgs, "mask": masks}
        if normals is not None and n == bs:
            out["normal"] = normals
        return out

    def __del__(self):
        try:
            if self._h:
                self._lib.sr_loader_destroy(self._h)
                self._h = None
        except Exception:
            pass
