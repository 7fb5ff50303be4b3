"""Batching, seeded splits, and device-feeding input pipeline.

Replaces the reference's torch DataLoader + Lightning DataModules (reference:
src/dataloader/dataloaderPL.py:94-259) with a TPU-feeding pipeline:
- the train/valid split reproduces `torch.utils.data.random_split` with a
  manual-seeded generator bit-exactly (reference: src/utils/utils.py:228-234)
  by using torch's own CPU randperm;
- ragged per-image targets are padded into static [B, MAX_GT] tensors at the
  host boundary (the TPU graph never sees ragged data);
- batches are prefetched on a background thread and `jax.device_put` ahead of
  compute (double buffering), optionally with a `NamedSharding` so each batch
  lands already sharded across the data-parallel mesh.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from hallucidet_tpu.detection.targets import Targets, pad_targets


def split_indices(n: int, split_ratio: float = 0.8, seed: int = 123):
    """Bit-exact `random_split(generator=Generator().manual_seed(seed))`
    membership: torch draws randperm(n) on CPU and takes the first chunk."""
    import torch

    g = torch.Generator().manual_seed(seed)
    perm = torch.randperm(n, generator=g).tolist()
    train_size = int(split_ratio * n)
    return perm[:train_size], perm[train_size:]


class Subset:
    def __init__(self, dataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]


def split_dataset(dataset, split_ratio: float = 0.8, seed: int = 123):
    tr, va = split_indices(len(dataset), split_ratio, seed)
    return Subset(dataset, tr), Subset(dataset, va)


def _stack_images(images: List[np.ndarray]) -> np.ndarray:
    return np.stack(images, axis=0)


def collate_single(batch, max_boxes: int) -> Tuple[np.ndarray, Targets]:
    imgs, targets = zip(*batch)
    images = _stack_images(list(imgs))
    padded = pad_targets(
        [t["boxes"] for t in targets], [t["labels"] for t in targets], max_boxes
    )
    return images, padded


def collate_multi(batch, max_boxes: int):
    rgb, t_rgb, ir, t_ir = zip(*batch)
    return (
        _stack_images(list(rgb)),
        pad_targets([t["boxes"] for t in t_rgb], [t["labels"] for t in t_rgb], max_boxes),
        _stack_images(list(ir)),
        pad_targets([t["boxes"] for t in t_ir], [t["labels"] for t in t_ir], max_boxes),
    )


class DataLoader:
    """Minimal deterministic loader: seeded shuffle per epoch, drop_last for
    static batch shapes, background prefetch thread, optional device_put with
    a target sharding."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate: Callable,
        shuffle: bool = False,
        drop_last: bool = True,
        seed: int = 123,
        prefetch: int = 2,
        sharding=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.sharding = sharding
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> List[List[int]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        batches = []
        for i in range(0, n - (self.batch_size - 1 if self.drop_last else 0), self.batch_size):
            idx = order[i : i + self.batch_size]
            if len(idx) == 0:
                break
            batches.append(idx.tolist())
        return batches

    def __iter__(self) -> Iterator:
        batches = self._batch_indices()
        self.epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    samples = [self.dataset[i] for i in b]
                    out = self.collate(samples)
                    if self.sharding is not None:
                        out = jax.tree_util.tree_map(
                            lambda x: jax.device_put(x, self.sharding), out
                        )
                    q.put(out)
                q.put(None)
            except BaseException as e:  # surface loader errors to the consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


class SingleModalDataModule:
    """Mirror of the reference DataModule (reference: dataloaderPL.py:94-175):
    seeded 0.8 split of the train set, separate test set, `ablation_flag`
    substitutes valid <- test."""

    def __init__(
        self,
        dataset: str,
        path_images_train: str,
        path_images_test: str,
        batch_size: int = 4,
        num_workers: int = 4,
        ext: str = ".png",
        seed: int = 123,
        split_ratio_train_valid: float = 0.8,
        modality: str = "rgb",
        data_augmentation=None,
        fixed_transformations=None,
        ablation_flag: bool = False,
        max_boxes: int = 64,
        sharding=None,
    ):
        from hallucidet_tpu.data.datasets import SingleModalDetectionDataset

        del num_workers, fixed_transformations  # single-process host pipeline
        full = SingleModalDetectionDataset(
            dataset=dataset, path_images=path_images_train, modality=modality,
            transforms=None, ext=ext, train=True,
            rng=np.random.default_rng(seed),
        )
        self.train_ds, self.valid_ds = split_dataset(
            full, split_ratio_train_valid, seed
        )
        # augmentation applies only to the train subset (post-split, exactly
        # like the reference's DatasetTransform wrapper)
        aug_full = SingleModalDetectionDataset(
            dataset=dataset, path_images=path_images_train, modality=modality,
            transforms=data_augmentation, ext=ext, train=True,
            rng=np.random.default_rng(seed),
        )
        self.train_ds = Subset(aug_full, self.train_ds.indices)
        self.test_ds = SingleModalDetectionDataset(
            dataset=dataset, path_images=path_images_test, modality=modality,
            transforms=None, ext=ext, train=False,
            rng=np.random.default_rng(seed),
        )
        if ablation_flag:
            self.valid_ds = self.test_ds
        self.batch_size = batch_size
        self.seed = seed
        self.max_boxes = max_boxes
        self.sharding = sharding

    def _loader(self, ds, shuffle):
        return DataLoader(
            ds, self.batch_size,
            collate=lambda b: collate_single(b, self.max_boxes),
            shuffle=shuffle, drop_last=True, seed=self.seed, sharding=self.sharding,
        )

    def train_dataloader(self):
        return self._loader(self.train_ds, True)

    def val_dataloader(self):
        return self._loader(self.valid_ds, False)

    def test_dataloader(self):
        return self._loader(self.test_ds, False)


class MultimodalDatasetTransform:
    """Post-split wrapper applying a JointSpatialTransform (or any callable
    (img_rgb, t_rgb, img_ir, t_ir, rng) -> same) to the train subset —
    the reference's multimodal DatasetTransform (dataloaderPL.py:14-91)."""

    def __init__(self, subset, transform, rng=None):
        self.subset = subset
        self.transform = transform
        self.rng = rng or np.random.default_rng(0)

    def __len__(self):
        return len(self.subset)

    def __getitem__(self, i):
        img_rgb, t_rgb, img_ir, t_ir = self.subset[i]
        return self.transform(img_rgb, t_rgb, img_ir, t_ir, self.rng)


class MultiModalDataModule:
    """Paired RGB+IR module (reference: dataloaderPL.py:176-259)."""

    def __init__(
        self,
        dataset: str,
        path_images_train_rgb: str,
        path_images_train_ir: str,
        path_images_test_rgb: str,
        path_images_test_ir: str,
        batch_size: int = 4,
        num_workers: int = 4,
        ext: str = ".png",
        seed: int = 123,
        split_ratio_train_valid: float = 0.8,
        data_augmentation=None,
        fixed_transformations=None,
        ablation_flag: bool = False,
        max_boxes: int = 64,
        sharding=None,
    ):
        from hallucidet_tpu.data.datasets import MultiModalDetectionDataset

        del num_workers, fixed_transformations
        full = MultiModalDetectionDataset(
            dataset=dataset, path_images_rgb=path_images_train_rgb,
            path_images_ir=path_images_train_ir, modality="both",
            ext=ext, train=True, rng=np.random.default_rng(seed),
        )
        self.train_ds, self.valid_ds = split_dataset(
            full, split_ratio_train_valid, seed
        )
        if data_augmentation is not None:
            # post-split joint transform, like the reference's
            # DatasetTransform wrapper (dataloaderPL.py:14-91): ONE compose
            # over both modalities with shared bbox params, train split only.
            self.train_ds = MultimodalDatasetTransform(
                self.train_ds, data_augmentation,
                rng=np.random.default_rng(seed),
            )
        self.test_ds = MultiModalDetectionDataset(
            dataset=dataset, path_images_rgb=path_images_test_rgb,
            path_images_ir=path_images_test_ir, modality="both",
            ext=ext, train=False, rng=np.random.default_rng(seed),
        )
        if ablation_flag:
            self.valid_ds = self.test_ds
        self.batch_size = batch_size
        self.seed = seed
        self.max_boxes = max_boxes
        self.sharding = sharding

    def _loader(self, ds, shuffle):
        return DataLoader(
            ds, self.batch_size,
            collate=lambda b: collate_multi(b, self.max_boxes),
            shuffle=shuffle, drop_last=True, seed=self.seed, sharding=self.sharding,
        )

    def train_dataloader(self):
        return self._loader(self.train_ds, True)

    def val_dataloader(self):
        return self._loader(self.valid_ds, False)

    def test_dataloader(self):
        return self._loader(self.test_ds, False)
