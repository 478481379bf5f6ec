"""Device-resident data pipeline: preload the train/val image bank to HBM
once, then send only a tiny augmentation PLAN per batch and compose the
augmented batch on device.

Why this exists: real-data training through the single-admission device
tunnel is transfer-bound — each bs=16 640px uint8 batch is ~20 MB of
host->device traffic, measured at ~10 s/step on this host (the FP quality
arm ran at ~128 s/epoch for 192 images while the same train step with
on-device data runs at 184 img/s, evidence/r5/train_breakdown.json).  The
TPU-native fix is the standard one: keep the dataset in HBM (192-1k
letterboxed 640px images = 0.2-1.2 GB uint8, far under the chip's memory),
ship per-batch augmentation parameters (a few hundred bytes) instead of
pixels, and run the augmentations as compiled device ops.  The reference
has no analogue (its Ultralytics loader feeds a local GPU over PCIe,
reference train.py:302-371); this module exists because on TPU the
host<->device link IS the bottleneck and the design must minimise it.

Semantics mirror `YOLODataset.get_item` (dataset.py:353-397) exactly at the
label level and to interpolation/rounding tolerance at the pixel level:

  mosaic    For same-size letterboxed sources the host mosaic
            (dataset.py:305-351) is PROVABLY a fixed four-quarter
            composite: the random center (cx, cy) cancels.  Proof sketch:
            quadrant k is placed at offset x0 in {cx-S, cx} and the crop
            starts at wx0 = cx - S//2, so content/boxes shift by
            x0 - wx0 in {-(S - S//2), +S//2} — independent of cx.  The 2x2
            image grid covers the crop window for every center in the
            host's draw range, so no canvas background is ever visible.
            The device composite therefore reproduces host mosaic EXACTLY
            (pure block copy, no resampling).
  hsv       cv2-convention HSV jitter (H in [0,180), gains on H/S/V —
            dataset.py:226-234) computed in float32; the host path's
            intermediate uint8 rounding makes the two differ by a couple
            of 8-bit steps at most (pinned by test_device_pipeline.py).
  affine    scale+translate warp (dataset.py:236-260) as SEPARABLE
            bilinear resampling: one banded row-weight matrix and one
            column-weight matrix per image, applied as two MXU batch
            matmuls — no gathers, no scatter.  Out-of-range source mass
            goes to the cv2 borderValue 114, which reproduces
            cv2.warpAffine's border blend (weights of taps outside the
            source each contribute the border color).
  hflip     exact.

Box/label math is the host formulas verbatim on the host (numpy over at
most max_boxes rows — microseconds); only PIXEL work moves on device.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from .dataset import YOLODataset

_HSV_GAIN_SCALE = np.array([0.015, 0.7, 0.4], np.float32)  # dataset.py:230


# ---------------------------------------------------------------------------
# Device-side kernels (jit; shapes static per (B, S))
# ---------------------------------------------------------------------------


def _rgb_to_hsv_cv2(img):
    """float32 RGB [0,255] -> cv2-convention HSV: H in [0,180), S,V in
    [0,255] (matches cv2.cvtColor(..., COLOR_RGB2HSV) on uint8 input up to
    its integer rounding)."""
    import jax.numpy as jnp

    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    m = jnp.minimum(jnp.minimum(r, g), b)
    d = v - m
    safe_d = jnp.where(d > 0, d, 1.0)
    # 60 deg/sector stored as deg/2: 30 per sector
    h = jnp.where(
        v == r, 30.0 * (g - b) / safe_d,
        jnp.where(v == g, 60.0 + 30.0 * (b - r) / safe_d,
                  120.0 + 30.0 * (r - g) / safe_d))
    h = jnp.where(d > 0, h, 0.0)
    h = jnp.where(h < 0, h + 180.0, h)
    s = jnp.where(v > 0, d / jnp.where(v > 0, v, 1.0) * 255.0, 0.0)
    return h, s, v


def _hsv_to_rgb_cv2(h, s, v):
    """Inverse of _rgb_to_hsv_cv2 (cv2 COLOR_HSV2RGB convention)."""
    import jax.numpy as jnp

    h60 = h / 30.0  # sector index in [0, 6)
    i = jnp.floor(h60)
    f = h60 - i
    sn = s / 255.0
    p = v * (1.0 - sn)
    q = v * (1.0 - sn * f)
    t = v * (1.0 - sn * (1.0 - f))
    i = i.astype(np.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([r, g, b], axis=-1)


def _hsv_jitter_device(img, gains):
    """img (..., S, S, 3) float32 [0,255]; gains (..., 3) broadcastable.
    Mirrors dataset.py:226-234: H*(g0) mod 180, S/V scaled and clipped."""
    import jax.numpy as jnp

    h, s, v = _rgb_to_hsv_cv2(img)
    g = gains[..., None, None, :]
    h = (h * g[..., 0]) % 180.0
    s = jnp.clip(s * g[..., 1], 0.0, 255.0)
    v = jnp.clip(v * g[..., 2], 0.0, 255.0)
    return _hsv_to_rgb_cv2(h, s, v)


def _bilinear_weights(src, size):
    """src (B, S) fractional source coordinates for each output position ->
    (B, S, size) banded bilinear weight matrix W[b, o, j] =
    max(0, 1 - |src[b, o] - j|).  Rows whose source lies outside
    [0, size-1] lose mass; the caller routes the missing mass to the
    border color (cv2 borderValue semantics)."""
    import jax
    import jax.numpy as jnp

    j = jax.lax.broadcasted_iota(jnp.float32, (1, 1, size), 2)
    return jnp.clip(1.0 - jnp.abs(src[..., None] - j), 0.0, 1.0)


def _affine_device(img, s, tx, ty, border=114.0):
    """Axis-aligned scale+translate warp of img (B, S, S, 3) float32 with
    cv2.warpAffine(INTER_LINEAR, borderValue=border) semantics
    (dataset.py:243-253: M = [[s,0,c-s*c+tx],[0,s,c-s*c+ty]], c = S/2).
    Separable bilinear as two batch matmuls (MXU) instead of per-pixel
    gathers."""
    import jax.numpy as jnp

    B, S = img.shape[0], img.shape[1]
    c = S / 2.0
    out_pos = jnp.arange(S, dtype=jnp.float32)[None, :]  # (1, S)
    sx = (out_pos - (c - s[:, None] * c + tx[:, None])) / s[:, None]  # (B, S)
    sy = (out_pos - (c - s[:, None] * c + ty[:, None])) / s[:, None]
    wr = _bilinear_weights(sy, S)  # (B, S, S): out row <- src row weights
    wc = _bilinear_weights(sx, S)  # (B, S, S): out col <- src col weights
    # sampled[b, y, x, ch] = sum_ij wr[b,y,i] * img[b,i,j,ch] * wc[b,x,j]
    tmp = jnp.einsum("byi,bijc->byjc", wr, img)
    sampled = jnp.einsum("bxj,byjc->byxc", wc, tmp)
    mass = wr.sum(-1)[:, :, None] * wc.sum(-1)[:, None, :]  # (B, S, S)
    return sampled + border * (1.0 - mass)[..., None]


def _make_augment_fn(S: int):
    """Build the jitted batch augmentation kernel for image side S (even)."""
    import jax
    import jax.numpy as jnp

    h = S // 2

    @jax.jit
    def augment(bank, idx4, mosaic_on, hsv_on, hsv_gains, s, tx, ty, flip):
        # bank (N,S,S,3) uint8; idx4 (B,4) int32; mosaic_on/flip (B,) bool;
        # hsv_on (B,4) bool; hsv_gains (B,4,3) f32; s/tx/ty (B,) f32
        tiles = bank[idx4].astype(jnp.float32)  # (B,4,S,S,3)
        jit_t = _hsv_jitter_device(tiles, hsv_gains)
        tiles = jnp.where(hsv_on[..., None, None, None], jit_t, tiles)
        # fixed four-quarter mosaic composite (see module docstring): crop
        # quadrant (Y, X) takes the mirror-opposite quarter of tile 2Y+X
        top = jnp.concatenate([tiles[:, 0, h:, h:], tiles[:, 1, h:, :h]],
                              axis=2)
        bot = jnp.concatenate([tiles[:, 2, :h, h:], tiles[:, 3, :h, :h]],
                              axis=2)
        mosaic = jnp.concatenate([top, bot], axis=1)  # (B, S, S, 3)
        img = jnp.where(mosaic_on[:, None, None, None], mosaic, tiles[:, 0])
        img = _affine_device(img, s, tx, ty)
        img = jnp.where(flip[:, None, None, None], img[:, :, ::-1, :], img)
        return jnp.clip(jnp.rint(img), 0.0, 255.0).astype(jnp.uint8)

    return augment


# ---------------------------------------------------------------------------
# Host-side plan + labels
# ---------------------------------------------------------------------------


class DevicePipeline:
    """Preloads a YOLODataset's letterboxed images into device memory and
    serves augmented batches whose "image" is ALREADY a device array (the
    trainer's `jnp.asarray` / single-device `shard_batch` become no-ops, so
    per-step host->device traffic drops from ~20 MB of pixels to the
    few-hundred-byte plan arrays + padded labels).

    Label arrays stay host numpy — evaluation/target extraction consume
    them host-side anyway (utils/evaluation.py:141-151)."""

    def __init__(self, dataset: YOLODataset, chunk_bytes: int = 64 << 20):
        if dataset.img_size % 2 != 0:
            raise ValueError("DevicePipeline requires an even img_size")
        import jax.numpy as jnp

        self.dataset = dataset
        self.S = dataset.img_size
        self.max_boxes = dataset.max_boxes

        # clean (augmentation-free) letterboxed bank + per-image labels:
        # reuse the dataset's own loader with augmentation toggled off so
        # image/label semantics cannot drift from the host path
        was_aug = dataset.augment
        dataset.augment = False
        try:
            imgs, self.boxes, self.classes = [], [], []
            for i in range(len(dataset)):
                im, bx, cl, _, _, _ = dataset._load_single(i)
                imgs.append(im)
                self.boxes.append(np.asarray(bx, np.float32))
                self.classes.append(np.asarray(cl, np.int32))
        finally:
            dataset.augment = was_aug
        # One bulk upload instead of one transfer per batch per epoch —
        # chunked at ~64 MB: the tunnel moves 16-240 MB payloads at
        # 20-30 MB/s, but a single multi-hundred-MB RPC has been observed
        # to stall a degraded tunnel session, and chunking bounds the
        # blast radius (each piece retries independently at dispatch).
        stack = np.stack(imgs)  # (N, S, S, 3) uint8
        per = max(1, int(chunk_bytes) // max(1, stack[0].nbytes))
        from ..utils.sync import sync

        parts = []
        for i in range(0, len(stack), per):
            part = jnp.asarray(stack[i:i + per])
            # synchronize per chunk: bounds in-flight tunnel data (an
            # unsynced multi-hundred-MB pile-up has been observed to stall
            # a tunnel session indefinitely) and gives visible progress
            sync(part)
            parts.append(part)
            print(f"[device-pipeline] bank upload "
                  f"{min(i + per, len(stack))}/{len(stack)} images",
                  flush=True)
        self.bank = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        if len(parts) > 1:
            sync(self.bank)
        self._augment = _make_augment_fn(self.S)

    def __len__(self) -> int:
        return len(self.dataset)

    # -- host label transforms (verbatim dataset.py math) -----------------

    def _mosaic_labels(self, idxs: Sequence[int]):
        S, h = self.S, self.S // 2
        off = [(-(S - h), -(S - h)), (h, -(S - h)), (-(S - h), h), (h, h)]
        bs, cs = [], []
        for (dx, dy), j in zip(off, idxs):
            b = self.boxes[j]
            if len(b):
                b = b.copy()
                b[:, [0, 2]] += dx
                b[:, [1, 3]] += dy
                bs.append(b)
                cs.append(self.classes[j])
        if not bs:
            return np.zeros((0, 4), np.float32), np.zeros((0,), np.int32)
        b = np.concatenate(bs)
        c = np.concatenate(cs)
        b[:, [0, 2]] = np.clip(b[:, [0, 2]], 0, S)
        b[:, [1, 3]] = np.clip(b[:, [1, 3]], 0, S)
        keep = ((b[:, 2] - b[:, 0]) >= 2.0) & ((b[:, 3] - b[:, 1]) >= 2.0)
        return b[keep], c[keep]

    def _affine_labels(self, b, c, s, tx, ty):
        S = self.S
        if not len(b):
            return b, c
        cc = S / 2.0
        m02 = cc - s * cc + tx
        m12 = cc - s * cc + ty
        b = b.astype(np.float32).copy()
        b[:, [0, 2]] = np.clip(b[:, [0, 2]] * s + m02, 0, S)
        b[:, [1, 3]] = np.clip(b[:, [1, 3]] * s + m12, 0, S)
        keep = ((b[:, 2] - b[:, 0]) >= 2.0) & ((b[:, 3] - b[:, 1]) >= 2.0)
        return b[keep], c[keep]

    # -- batch assembly ----------------------------------------------------

    def _plan_batch(self, chunk: Sequence[int], rng: np.random.Generator,
                    augment: bool):
        ds, B, S = self.dataset, len(chunk), self.S
        idx4 = np.tile(np.asarray(chunk, np.int32)[:, None], (1, 4))
        mosaic_on = np.zeros(B, bool)
        hsv_on = np.zeros((B, 4), bool)
        hsv_gains = np.ones((B, 4, 3), np.float32)
        s = np.ones(B, np.float32)
        tx = np.zeros(B, np.float32)
        ty = np.zeros(B, np.float32)
        flip = np.zeros(B, bool)
        gtb = np.zeros((B, self.max_boxes, 4), np.float32)
        gtc = np.zeros((B, self.max_boxes), np.int32)
        gtm = np.zeros((B, self.max_boxes), bool)

        do_affine = augment and (ds.scale_jitter > 0 or ds.translate > 0)
        for b, j in enumerate(chunk):
            if augment and rng.random() < ds.mosaic_p:
                mosaic_on[b] = True
                idx4[b, 1:] = rng.integers(0, len(ds), 3)
                boxes, classes = self._mosaic_labels(idx4[b])
                ntile = 4
            else:
                boxes, classes = self.boxes[j].copy(), self.classes[j]
                ntile = 1
            for t in range(ntile):
                if augment and rng.random() < ds.hsv_p:
                    hsv_on[b, t] = True
                    hsv_gains[b, t] = 1.0 + rng.uniform(-1, 1, 3) * _HSV_GAIN_SCALE
            if do_affine:
                s[b] = 1.0 + float(rng.uniform(-ds.scale_jitter, ds.scale_jitter))
                tx[b] = float(rng.uniform(-ds.translate, ds.translate)) * S
                ty[b] = float(rng.uniform(-ds.translate, ds.translate)) * S
                boxes, classes = self._affine_labels(boxes, classes,
                                                     s[b], tx[b], ty[b])
            if augment and rng.random() < ds.hflip_p:
                flip[b] = True
                if len(boxes):
                    x1 = S - boxes[:, 2]
                    x2 = S - boxes[:, 0]
                    boxes[:, 0], boxes[:, 2] = x1.copy(), x2.copy()
            n = min(len(boxes), self.max_boxes)
            gtb[b, :n] = boxes[:n]
            gtc[b, :n] = classes[:n]
            gtm[b, :n] = True

        return (idx4, mosaic_on, hsv_on, hsv_gains, s, tx, ty, flip), \
            {"gt_boxes": gtb, "gt_classes": gtc, "gt_mask": gtm,
             "paths": [ds.img_files[j] for j in chunk]}

    def batch(self, chunk: Sequence[int], rng: np.random.Generator,
              augment: Optional[bool] = None) -> Dict:
        import jax.numpy as jnp

        augment = self.dataset.augment if augment is None else augment
        plan, labels = self._plan_batch(chunk, rng, augment)
        if augment:
            image = self._augment(self.bank, *map(jnp.asarray, plan))
        else:
            image = self.bank[jnp.asarray(plan[0][:, 0])]
        return {"image": image, **labels}

    def loader(self, batch_size: int, shuffle: bool = False,
               indices: Optional[Sequence[int]] = None, seed: int = 0,
               drop_last: bool = True,
               augment: Optional[bool] = None) -> "DeviceDataLoader":
        return DeviceDataLoader(self, batch_size, shuffle=shuffle,
                                indices=indices, seed=seed,
                                drop_last=drop_last, augment=augment)


class DeviceDataLoader:
    """Iterator facade matching the host DataLoader's batching semantics
    (dataset.py:405-456: optional index subset, shuffle, drop_last) but
    yielding device-resident images."""

    def __init__(self, pipe: DevicePipeline, batch_size: int,
                 shuffle: bool = False,
                 indices: Optional[Sequence[int]] = None, seed: int = 0,
                 drop_last: bool = True, augment: Optional[bool] = None):
        self.pipe = pipe
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.indices = (list(indices) if indices is not None
                        else list(range(len(pipe))))
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        self.augment = augment

    def __len__(self) -> int:
        n = len(self.indices)
        return (n // self.batch_size if self.drop_last
                else -(-n // self.batch_size))

    def __iter__(self) -> Iterator[Dict]:
        order = list(self.indices)
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        end = len(order) - (len(order) % bs) if self.drop_last else len(order)
        if end == 0 and not self.drop_last:
            end = len(order)
        for i in range(0, end, bs):
            chunk = order[i:i + bs]
            if self.drop_last and len(chunk) < bs:
                break
            yield self.pipe.batch(chunk, self.rng, augment=self.augment)
