"""ImageFolder datasets + per-host sharded loaders.

Replaces reference ``data/build.py`` (torchvision ImageFolder + timm
transforms + DistributedSampler): a plain folder scanner + PIL decode with
torch's worker-pool DataLoader (torch is the only battle-tested CPU loader
in this image; no CUDA anywhere). Sharding follows the TPU model: each HOST
loads ``1/num_hosts`` of the data and feeds its local chips; the train
sampler shards per host with per-epoch shuffling (``DistributedSampler``
equivalent), the val split strides ``indices[host::num_hosts]`` like the
reference's ``SubsetRandomSampler`` scheme (``data/samplers.py:11-29``).

When ``DATA.DATA_PATH`` does not exist, a deterministic synthetic dataset is
substituted so smoke tests and dry runs work anywhere.
"""

from __future__ import annotations

import os
import random
from typing import Iterator, Optional, Tuple

import numpy as np

from .transforms import EvalTransform, TrainTransform

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class ImageFolderDataset:
    """<root>/<class_name>/<image> scanner with deterministic class ids."""

    def __init__(self, root: str, transform, seed: int = 0):
        self.root = root
        self.transform = transform
        self.seed = seed
        self.epoch = 0  # bumped by Loader.set_epoch: fresh augs every epoch
        classes = sorted(
            d
            for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(IMG_EXTENSIONS):
                    self.samples.append(
                        (os.path.join(cdir, fname), self.class_to_idx[c])
                    )
        self.num_classes = len(classes)

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int):
        path, label = self.samples[idx]
        # deterministic per-(seed, epoch, sample) stream: reproducible under
        # SEED regardless of worker-process assignment, and a fresh
        # augmentation draw every epoch (torch reseeds workers per epoch;
        # an int-tuple hash is unsalted so this is stable across runs)
        rng_key = hash((self.seed, self.epoch, idx))
        arr = self._native_item(path, random.Random(rng_key))
        if arr is None:
            from PIL import Image

            with Image.open(path) as img:
                arr = self.transform(img, random.Random(rng_key))
        return arr.astype(np.float32), np.int32(label)

    def _native_item(self, path: str, rng) -> Optional[np.ndarray]:
        """Native decode+crop+resample fast path (C++ runtime); returns
        None on any failure so the PIL path takes over with a fresh rng."""
        if not path.lower().endswith((".jpg", ".jpeg")):
            return None
        from . import native_jpeg

        if not native_jpeg.available():
            return None
        try:
            with open(path, "rb") as f:
                data = f.read()
            dims = native_jpeg.jpeg_dims(data)
            if dims is None:
                return None
            w, h = dims
            box, interp, flip, fast = self.transform.native_geometry(w, h, rng)
            arr8 = native_jpeg.decode_crop_resize(
                data,
                box,
                (self.transform.size, self.transform.size),
                flip=flip,
                interpolation=interp,
                fast_scale=fast,
            )
            if arr8 is None:
                return None
            return self.transform.finish_uint8(arr8, rng)
        except (OSError, AttributeError):
            return None


class SyntheticDataset:
    """Deterministic fake images for smoke tests / dry runs."""

    def __init__(self, img_size: int, num_classes: int, length: int = 1024):
        self.img_size = img_size
        self.num_classes = num_classes
        self.length = length

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int):
        rng = np.random.default_rng(idx)
        arr = rng.standard_normal(
            (self.img_size, self.img_size, 3)
        ).astype(np.float32)
        return arr, np.int32(idx % self.num_classes)


def _host_shard_indices(
    n: int, host: int, num_hosts: int, shuffle: bool, seed: int, epoch: int
):
    """DistributedSampler-equivalent per-host index shard (train) with
    drop-last padding semantics."""
    idx = np.arange(n)
    if shuffle:
        rng = np.random.default_rng((seed, epoch))
        idx = rng.permutation(n)
    per_host = n // num_hosts  # drop_last
    return idx[host * per_host : (host + 1) * per_host]


def build_dataset(config, is_train: bool):
    split = "train" if is_train else "val"
    transform = TrainTransform(config) if is_train else EvalTransform(config)
    root = os.path.join(config.DATA.DATA_PATH, split)
    if config.DATA.DATASET == "imagenet22k" and is_train:
        root = config.DATA.DATA_PATH
    if os.path.isdir(root):
        ds = ImageFolderDataset(root, transform, seed=config.SEED)
        if ds.num_classes:
            return ds, ds.num_classes
    # fall back to synthetic data (keeps --throughput / smoke paths alive)
    num_classes = config.MODEL.NUM_CLASSES
    length = max(4 * config.DATA.BATCH_SIZE, 64)
    return (
        SyntheticDataset(config.DATA.IMG_SIZE, num_classes, length=length),
        num_classes,
    )


class Loader:
    """Epoch-based loader yielding numpy batches {'image', 'label'}."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool,
        host: int = 0,
        num_hosts: int = 1,
        seed: int = 0,
        num_workers: int = 0,
        drop_last: bool = True,
        stride_shard: bool = False,
        transport_dtype: str = "float32",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.host = host
        self.num_hosts = num_hosts
        self.seed = seed
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.stride_shard = stride_shard
        # DATA.TRANSPORT_DTYPE: wire format of the normalized images from
        # the decode worker to the device. "float16" halves the worker-IPC
        # and H2D payload (77 -> 38 MB at b128/224); fp16 ulp at the
        # normalized image range (~0.002) sits 8-16x below bf16 compute
        # rounding, so training numerics are unaffected. Default float32
        # preserves exact eval parity.
        self.transport_dtype = np.dtype(transport_dtype)
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if hasattr(self.dataset, "epoch"):
            self.dataset.epoch = epoch  # re-keys the augmentation stream

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.stride_shard:
            # every host reports the padded (equal) length
            local = -(-n // self.num_hosts)
        else:
            local = n // self.num_hosts
        if self.drop_last:
            return local // self.batch_size
        return (local + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.stride_shard:
            # val sharding: indices[host::num_hosts] (data/samplers.py:23-26),
            # padded with -1 sentinels so every host yields the SAME number
            # of equally-shaped batches (multi-host eval steps are
            # collective: unequal counts would deadlock)
            idx = np.arange(n)[self.host :: self.num_hosts]
            maxlen = -(-n // self.num_hosts)
            if len(idx) < maxlen:
                idx = np.concatenate([idx, np.full(maxlen - len(idx), -1)])
            return idx
        return _host_shard_indices(
            n, self.host, self.num_hosts, self.shuffle, self.seed, self.epoch
        )

    def __iter__(self) -> Iterator[dict]:
        indices = self._indices()
        if self.num_workers > 0:
            yield from self._iter_workers(indices)
            return
        batch_imgs, batch_labels, batch_valid = [], [], []
        for i in indices:
            img, label = self.dataset[0 if i < 0 else int(i)]
            img = img.astype(self.transport_dtype, copy=False)
            batch_imgs.append(img)
            batch_labels.append(label)
            batch_valid.append(i >= 0)
            if len(batch_imgs) == self.batch_size:
                yield self._pack(batch_imgs, batch_labels, batch_valid)
                batch_imgs, batch_labels, batch_valid = [], [], []
        if batch_imgs and not self.drop_last:
            yield self._pack(batch_imgs, batch_labels, batch_valid)

    @staticmethod
    def _pack(imgs, labels, valid) -> dict:
        out = {
            "image": np.stack(imgs),
            "label": np.asarray(labels, np.int32),
        }
        if not all(valid):
            out["valid"] = np.asarray(valid, bool)
        return out

    def _iter_workers(self, indices: np.ndarray) -> Iterator[dict]:
        """Parallel decode via torch's DataLoader machinery (CPU only)."""
        import torch
        from torch.utils.data import DataLoader, Dataset

        outer = self

        class _Wrap(Dataset):
            def __len__(self):
                return len(indices)

            def __getitem__(self, i):
                j = int(indices[i])
                img, label = outer.dataset[0 if j < 0 else j]
                # cast IN THE WORKER so the IPC pipe carries the (possibly
                # halved) transport payload, not float32
                img = img.astype(outer.transport_dtype, copy=False)
                return (
                    torch.from_numpy(np.ascontiguousarray(img)),
                    int(label),
                    bool(j >= 0),
                )

        dl = DataLoader(
            _Wrap(),
            batch_size=self.batch_size,
            num_workers=self.num_workers,
            drop_last=self.drop_last,
            shuffle=False,
            persistent_workers=False,
        )
        for imgs, labels, valid in dl:
            out = {
                "image": imgs.numpy(),
                "label": labels.numpy().astype(np.int32),
            }
            if not bool(valid.all()):
                out["valid"] = valid.numpy().astype(bool)
            yield out


def build_loaders(config, host: int = 0, num_hosts: int = 1):
    """(train_loader, val_loader, num_classes) for this host."""
    train_ds, num_classes = build_dataset(config, is_train=True)
    val_ds, _ = build_dataset(config, is_train=False)
    workers = min(config.DATA.NUM_WORKERS, os.cpu_count() or 1)
    if isinstance(train_ds, SyntheticDataset):
        workers = 0
    train_loader = Loader(
        train_ds,
        config.DATA.BATCH_SIZE,
        shuffle=True,
        host=host,
        num_hosts=num_hosts,
        seed=config.SEED,
        num_workers=workers,
        drop_last=True,
        transport_dtype=config.DATA.TRANSPORT_DTYPE,
    )
    val_loader = Loader(
        val_ds,
        config.DATA.BATCH_SIZE,
        shuffle=False,
        host=host,
        num_hosts=num_hosts,
        seed=config.SEED,
        num_workers=workers,
        drop_last=False,
        stride_shard=True,
    )
    return train_loader, val_loader, num_classes
