"""Scene dataset + per-frame learnable parameter bank.

Parity target: dataset/dataset.py of the reference.  The reference's unusual
architecture — "the dataset is a parameter server" (SURVEY §1): per-frame
optimizable tensors (poses, trans, camera params, deformer latent `dcond`,
render latent `rcond`) live on the dataset object and are handed to the
optimizer — is kept *logically*: `SceneDataset.param_bank()` returns one
pytree of jnp arrays that the trainer owns and updates functionally; the
dataset itself only does host-side IO (numpy/cv2, no torch anywhere).

Key parity points:
  * conds are initialized in a truncated DCT subspace of frame_num//5
    coefficients: (0.1*randn(len, F//5) @ DCTSpace(F//5, F)).T
    (dataset/dataset.py:21-23);
  * images are loaded BGR (cv2 convention, kept for color-loss parity) and
    mapped to [-1, 1]; masks are any-channel > 0; normals are RGB in [-1, 1]
    (dataset/dataset.py:85-115);
  * `window_indices` reproduces get_batchframe_data's 30-frame window with
    boundary clamping and video-segment awareness (dataset/dataset.py:128-191);
  * RandomSampler semantics (dataset/dataset.py:218-237).
"""
from __future__ import annotations

import os
import os.path as osp
import threading
import queue as _queue
from glob import glob
from typing import Dict, List, Optional

import numpy as np

from ..utils.math import dct_space

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class SceneDataset:
    def __init__(self, data_root: str, conds_lens: Optional[Dict[str, int]] = None,
                 cache_images: bool = True, seed: int = 0,
                 use_native: bool = True, n_threads: int = 4):
        self.root = data_root
        self._read_meta()
        self.cache_images = cache_images
        self._cache: Dict[int, dict] = {}
        self._lock = threading.Lock()
        self._native = None
        if use_native:
            from .native_loader import NativeLoader
            normal_paths = None
            if self.has_normals:
                normal_paths = [
                    n.replace("/imgs/", "/normals/")[:-3] + "png"
                    for n in self.img_ns]
                if not all(osp.isfile(p) for p in normal_paths):
                    normal_paths = None
            self._native = NativeLoader.create(
                self.img_ns, self.mask_ns, normal_paths, self.H, self.W,
                n_threads=n_threads, cache=cache_images)

        rng = np.random.default_rng(seed)
        self.conds: Dict[str, np.ndarray] = {}
        conds_lens = conds_lens or {}
        ncoef = max(self.frame_num // 5, 1)
        basis = dct_space(ncoef, self.frame_num)  # (ncoef, F)
        for name, length in conds_lens.items():
            coef = 0.1 * rng.standard_normal((length, ncoef)).astype(np.float32)
            self.conds[name] = (coef @ basis).T.copy()  # (F, length)

    # -- metadata -----------------------------------------------------------
    def _read_meta(self):
        imgs: List[str] = []
        for ext in (".jpg", ".png"):
            imgs.extend(glob(osp.join(self.root, "imgs/*" + ext)))
        imgs.sort(key=lambda x: int(osp.basename(x).split(".")[0]))
        assert imgs, f"no images under {self.root}/imgs"
        self.img_ns = imgs
        self.frame_num = len(imgs)
        self.mask_ns = []
        for ind, img_n in enumerate(self.img_ns):
            assert ind == int(osp.basename(img_n).split(".")[0]), (ind, img_n)
            mask_n = osp.join(self.root, "masks/%s.png"
                              % osp.basename(img_n).split(".")[0])
            assert osp.isfile(mask_n), mask_n
            self.mask_ns.append(mask_n)
        m0 = cv2.imread(self.mask_ns[0])
        self.H, self.W = m0.shape[:2]

        data = np.load(osp.join(self.root, "smpl_rec.npz"))
        self.poses = data["poses"].astype(np.float32).reshape(-1, 24, 3)
        self.trans = data["trans"].astype(np.float32).reshape(-1, 3)
        self.shape = data["shape"].astype(np.float32).reshape(-1)
        self.gender = str(data["gender"]) if "gender" in data else "neutral"
        if "vid_seg_indices" in data:
            segs = data["vid_seg_indices"]
            segs = segs.tolist() if isinstance(segs, np.ndarray) else segs
            self.video_segmented_index = list(segs[:-1])
        else:
            self.video_segmented_index = []

        cam = np.load(osp.join(self.root, "camera.npz"))
        self.camera_params = {
            "focal_length": np.array([cam["fx"], cam["fy"]], np.float32).reshape(2),
            "princeple_points": np.array([cam["cx"], cam["cy"]], np.float32).reshape(2),
            "cam2world_coord_quat": cam["quat"].astype(np.float32).reshape(4),
            "world2cam_coord_trans": cam["T"].astype(np.float32).reshape(3),
        }
        self.has_normals = osp.isdir(osp.join(self.root, "normals"))

    # -- per-frame pixel data ----------------------------------------------
    def frame_data(self, fid: int) -> dict:
        """uint8 image (H,W,3) BGR, bool mask (H,W), optional float16 normal
        (H,W,3) in [-1,1] (stored RGB like the reference flips to)."""
        if self.cache_images:
            with self._lock:
                if fid in self._cache:
                    return self._cache[fid]
        img = cv2.imread(self.img_ns[fid])  # BGR uint8
        mask = (cv2.imread(self.mask_ns[fid]) > 0).any(-1)
        out = {"img": img, "mask": mask}
        norm_f = self.img_ns[fid].replace("/imgs/", "/normals/")[:-3] + "png"
        if osp.isfile(norm_f):
            normals = cv2.imread(norm_f)[:, :, ::-1]  # -> RGB
            out["normal"] = (2.0 * normals.astype(np.float32) / 255.0 - 1.0
                             ).astype(np.float16)
        if self.cache_images:
            with self._lock:
                self._cache[fid] = out
        return out

    def batch(self, fids) -> dict:
        """Stack frame data for a batch of frame ids (host numpy).

        imgs as float32 in [-1,1] (BGR, parity dataset/dataset.py:88), masks
        float32 {0,1}, normals float32 (zeros when absent).
        """
        if self._native is not None:
            raw = self._native.batch(fids)
            out = {"img": (raw["img"].astype(np.float32) / 255.0 - 0.5) * 2.0,
                   "mask": raw["mask"].astype(np.float32)}
            if "normal" in raw:
                out["normal"] = (2.0 * raw["normal"].astype(np.float32)
                                 / 255.0 - 1.0)
            return out
        frames = [self.frame_data(int(f)) for f in fids]
        imgs = np.stack([(f["img"].astype(np.float32) / 255.0 - 0.5) * 2.0
                         for f in frames])
        masks = np.stack([f["mask"].astype(np.float32) for f in frames])
        out = {"img": imgs, "mask": masks}
        if all("normal" in f for f in frames):
            out["normal"] = np.stack([f["normal"].astype(np.float32)
                                      for f in frames])
        return out

    def batch_raw(self, fids) -> dict:
        """uint8 batch: img (B,H,W,3) BGR, mask (B,H,W) {0,1}, optional
        normal (B,H,W,3) RGB-encoded.  The training step converts to float
        ON DEVICE (8x less host->device traffic than float32)."""
        if self._native is not None:
            return self._native.batch(fids)
        frames = [self.frame_data(int(f)) for f in fids]
        out = {"img": np.stack([f["img"] for f in frames]),
               "mask": np.stack([f["mask"].astype(np.uint8)
                                 for f in frames])}
        if all("normal" in f for f in frames):
            out["normal"] = np.stack([
                np.clip((f["normal"].astype(np.float32) * 0.5 + 0.5) * 255.0,
                        0, 255).astype(np.uint8) for f in frames])
        return out

    # -- learnable bank -----------------------------------------------------
    def param_bank(self) -> dict:
        """The full optimizable-state pytree (numpy; trainer converts to jnp).

        Contents mirror what the reference optimizer receives
        (dataset/dataset.py:76-81) plus shape (frozen by default, like the
        reference where shape.requires_grad is never set).
        """
        bank = {
            "poses": self.poses.copy(),
            "trans": self.trans.copy(),
            "camera": {k: v.copy() for k, v in self.camera_params.items()},
        }
        for name, c in self.conds.items():
            bank[f"cond_{name}"] = c.copy()
        return bank

    def load_bank(self, bank: dict):
        """Write an updated bank back (checkpoint restore / save)."""
        self.poses = np.asarray(bank["poses"], np.float32)
        self.trans = np.asarray(bank["trans"], np.float32)
        for k in self.camera_params:
            self.camera_params[k] = np.asarray(bank["camera"][k], np.float32)
        for name in self.conds:
            self.conds[name] = np.asarray(bank[f"cond_{name}"], np.float32)

    # -- temporal windows ---------------------------------------------------
    def window_indices(self, fids: np.ndarray, batchsize: int):
        """(windows (B,batchsize) int, offsets (B,)): frame-index window of
        length batchsize around each fid, clamped to its video segment;
        offsets = position of fid inside its row.  Parity:
        dataset/dataset.py:128-191 — except that a segment SHORTER than the
        window (the reference asserts, dataset/dataset.py:151,173) repeats
        its last frame instead of crashing, so the DCT prior sees a constant
        tail."""
        fids = np.asarray(fids, np.int64)
        segments = [0] + list(self.video_segmented_index) + [self.frame_num]
        windows = np.zeros((len(fids), batchsize), np.int64)
        starts = np.zeros_like(fids)
        for b, fid in enumerate(fids):
            lo, hi = 0, self.frame_num
            for si in range(len(segments) - 1):
                if segments[si] <= fid < segments[si + 1]:
                    lo, hi = segments[si], segments[si + 1]
                    break
            s = fid - batchsize // 2
            e = s + batchsize
            if s < lo:
                e += lo - s
                s = lo
            if e > hi:
                s -= e - hi
                e = hi
            s = max(s, lo)  # only binds when hi-lo < batchsize (short segment)
            starts[b] = s
            windows[b] = np.clip(s + np.arange(batchsize), lo, hi - 1)
        return windows, fids - starts


class ClipSampler:
    """Contiguous-clip sampler, parity dataset/dataset.py:196-216: splits the
    sequence into n clips of clip_size starting at a random offset, shuffles
    clip order (frames inside a clip stay contiguous)."""

    def __init__(self, length: int, clip_size: int, shuffle: bool = True,
                 seed: int = 0):
        self.length = length
        self.clip_size = clip_size
        self.shuffle = shuffle
        self.n = length // clip_size
        if length == self.n * clip_size:
            self.n -= 1
        self.start = length - self.n * clip_size
        self._rng = np.random.default_rng(seed)

    def epoch_ids(self) -> np.ndarray:
        start = (int(self._rng.integers(0, self.start + 1))
                 if self.shuffle else 0)
        out = np.arange(start, start + self.n * self.clip_size).reshape(
            self.n, self.clip_size)
        if self.shuffle:
            out = out[self._rng.permutation(self.n)]
        return out.reshape(-1)


class RandomSampler:
    """Frame-id sampler, parity dataset/dataset.py:218-237 (intersect=1)."""

    def __init__(self, length: int, intersect: int = 1, shuffle: bool = True,
                 seed: int = 0):
        self.length = length
        self.intersect = intersect
        self.shuffle = shuffle
        self.n = (length - 1) // intersect + 1
        self.start = length - intersect * (self.n - 1)
        self._rng = np.random.default_rng(seed)

    def epoch_ids(self) -> np.ndarray:
        if self.shuffle:
            start = int(self._rng.integers(0, self.start))
            index = np.arange(start, self.length, self.intersect)
            index = index[self._rng.permutation(self.n)]
        else:
            index = np.arange(0, self.length, self.intersect)
        assert index.size == self.n
        return index


def batch_iterator(dataset: SceneDataset, sampler: RandomSampler,
                   batch_size: int, prefetch: int = 2, raw: bool = True):
    """Yield (fids (B,), batch dict) over one epoch with background prefetch.

    Replaces the reference's DataLoader(num_workers=4): one feeder thread on
    top of the native loader's decode pool; frames are RAM-cached after
    epoch 1.  raw=True yields uint8 batches (the trainer converts on device).
    """
    ids = sampler.epoch_ids()
    groups = [ids[i:i + batch_size] for i in range(0, len(ids), batch_size)]
    groups = [g for g in groups if len(g) == batch_size]

    q: _queue.Queue = _queue.Queue(maxsize=prefetch)
    fetch = dataset.batch_raw if raw else dataset.batch

    def worker():
        for g in groups:
            q.put((g, fetch(g)))
        q.put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is None:
            break
        yield item


# ---------------------------------------------------------------------------
# Synthetic scene (tests / benchmarks / smoke e2e)
# ---------------------------------------------------------------------------

def make_synthetic_scene(root: str, n_frames: int = 8, H: int = 96, W: int = 96,
                         seed: int = 0):
    """Write a tiny scene in the exact on-disk layout the reference consumes
    (imgs/ masks/ camera.npz smpl_rec.npz): a toy body rendered as a moving
    disk mask with flat shading.  Enough to drive the full optimizer
    end-to-end in tests."""
    rng = np.random.default_rng(seed)
    os.makedirs(osp.join(root, "imgs"), exist_ok=True)
    os.makedirs(osp.join(root, "masks"), exist_ok=True)
    fx = fy = 0.9 * W
    cx, cy = W / 2.0, H / 2.0
    quat = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    T = np.array([0.0, 0.0, 2.5], np.float32)
    np.savez(osp.join(root, "camera.npz"), fx=fx, fy=fy, cx=cx, cy=cy,
             quat=quat, T=T)
    poses = 0.03 * rng.standard_normal((n_frames, 24, 3)).astype(np.float32)
    trans = np.zeros((n_frames, 3), np.float32)
    trans[:, 0] = 0.15 * np.sin(np.linspace(0, 2 * np.pi, n_frames))
    shape = np.zeros(10, np.float32)
    np.savez(osp.join(root, "smpl_rec.npz"), poses=poses, trans=trans,
             shape=shape, gender="neutral")
    yy, xx = np.mgrid[0:H, 0:W]
    for f in range(n_frames):
        # project the body center (world origin + trans) with the same camera
        # convention as render/camera.py (negated x/y)
        p = trans[f] + np.array([0, 0, 0], np.float32)
        pc = p + T  # R = I
        col = cx - fx * pc[0] / pc[2]
        row = cy - fy * pc[1] / pc[2]
        r_pix = 0.35 * fx / pc[2]
        mask = ((xx - col) ** 2 + (yy - row) ** 2) < r_pix ** 2
        img = np.zeros((H, W, 3), np.uint8)
        img[mask] = (40 + 160 * (f / max(n_frames - 1, 1)), 90, 180)
        cv2.imwrite(osp.join(root, "imgs/%d.png" % f), img)
        cv2.imwrite(osp.join(root, "masks/%d.png" % f),
                    (mask * 255).astype(np.uint8))
    return root
