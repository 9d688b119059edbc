"""Host-side dataset + threaded prefetching batch loader.

Replaces the reference's torchvision ImageNet dataset + DataLoader
(num_workers=5, pin_memory, persistent_workers — reference:
distributed_trainer_cls.py:62,140-144). Host work here is only JPEG decode +
resize to 256x256 uint8; every augmentation runs on device
(data/augment.py). Decoded batches flow through a bounded queue from worker
threads, so decode overlaps device compute (double-buffered feed).

Datasets:
  ImageFolderDataset — ImageNet-layout directory tree
                       (root/<split>/<wnid>/*.JPEG), classes sorted by name;
  SyntheticDataset   — deterministic random data for benchmarks/tests when
                       no dataset is mounted.
"""

from __future__ import annotations

import pathlib
import queue
import threading

import numpy as np

from calm_vit_dte_tpu.data.sampler import ShardedSampler

_EXTS = {".jpeg", ".jpg", ".png", ".bmp", ".webp"}


class ImageFolderDataset:
    def __init__(self, root: str, split: str = "train", size: int = 256):
        self.size = size
        base = pathlib.Path(root) / split
        if not base.is_dir():
            raise FileNotFoundError(f"dataset split not found: {base}")
        self.classes = sorted(p.name for p in base.iterdir() if p.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples: list[tuple[str, int]] = []
        for c in self.classes:
            for f in sorted((base / c).iterdir()):
                if f.suffix.lower() in _EXTS:
                    self.samples.append((str(f), self.class_to_idx[c]))

    def __len__(self) -> int:
        return len(self.samples)

    @property
    def num_classes(self) -> int:
        return len(self.classes)

    def load(self, idx: int) -> tuple[np.ndarray, int]:
        from PIL import Image

        path, label = self.samples[idx]
        with Image.open(path) as im:
            im = im.convert("RGB").resize((self.size, self.size),
                                          Image.BILINEAR)
            return np.asarray(im, dtype=np.uint8), label

    def load_batch(self, idxs) -> tuple[np.ndarray, np.ndarray]:
        """Batch decode via the native C++ data plane (GIL-free
        multithreaded JPEG decode + antialiased resize); PIL fallback for
        images the native path can't handle (PNG, CMYK, truncated)."""
        import os

        from calm_vit_dte_tpu.data import native

        labels = np.asarray([self.samples[int(i)][1] for i in idxs],
                            np.int32)
        # Native decode wins everywhere it is available: it scales across
        # cores GIL-free, and even single-threaded it measures faster than
        # Pillow (560.9 vs 437.6 img/s on 256px JPEGs, 1-core host,
        # docs/evidence/dataplane.json) — and, critically, it does not
        # serialize against the trainer's dispatch thread the way
        # GIL-holding PIL worker threads do. CALM_NATIVE_DECODE=0 forces
        # the PIL path (A/B hook).
        use_native = (native.available()
                      and os.environ.get("CALM_NATIVE_DECODE") != "0")
        if use_native:
            paths = [self.samples[int(i)][0] for i in idxs]
            imgs, ok = native.decode_resize_batch(paths, self.size)
            for j in np.nonzero(~ok)[0]:
                imgs[j], _ = self.load(int(idxs[j]))
            return imgs, labels
        imgs = np.empty((len(idxs), self.size, self.size, 3), np.uint8)
        for j, i in enumerate(idxs):
            imgs[j], _ = self.load(int(i))
        return imgs, labels


class SyntheticDataset:
    """Deterministic fake ImageNet: index-seeded uint8 images."""

    def __init__(self, n: int = 50000, num_classes: int = 1000,
                 size: int = 256):
        self.n = n
        self.num_classes = num_classes
        self.size = size

    def __len__(self) -> int:
        return self.n

    def load(self, idx: int) -> tuple[np.ndarray, int]:
        rng = np.random.default_rng(idx)
        img = rng.integers(0, 256, (self.size, self.size, 3), dtype=np.uint8)
        return img, int(idx % self.num_classes)


class BatchLoader:
    """Threaded prefetching loader: yields {'image': u8 (B,S,S,3),
    'label': i32 (B,)} numpy batches for one epoch."""

    def __init__(self, dataset, sampler: ShardedSampler, batch_size: int,
                 num_workers: int = 5, prefetch: int = 4,
                 drop_last: bool = True, pad_last: bool = False):
        """pad_last=True (implies drop_last=False semantics): the final
        partial batch is padded to full batch_size by wrapping, and every
        batch carries a 'valid' bool array marking real entries — so jitted
        shapes stay static while evaluation covers each sample exactly once
        (combined with ShardedSampler.valid_mask)."""
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        # Clamp workers to the host core count: each worker drives a
        # GIL-free native decode of a whole batch, so workers beyond the
        # core count only thrash (measured on a 1-core host: 1 worker
        # 439 img/s, 2 workers 133, 5 workers 186 — the reference's
        # num_workers=5 assumed a many-core host).
        import os

        self.num_workers = max(1, min(num_workers,
                                      os.cpu_count() or num_workers))
        self.prefetch = prefetch
        self.drop_last = drop_last and not pad_last
        self.pad_last = pad_last

    def steps_per_epoch(self) -> int:
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        indices = self.sampler.indices()
        nb = self.steps_per_epoch()
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]
        valids = None
        if self.pad_last:
            valid_all = (self.sampler.valid_mask()
                         if hasattr(self.sampler, "valid_mask")
                         else np.ones(len(indices), bool))
            valids = [valid_all[i * self.batch_size:(i + 1) * self.batch_size]
                      for i in range(nb)]
            for i, (b, v) in enumerate(zip(batches, valids)):
                short = self.batch_size - len(b)
                if short > 0:
                    batches[i] = np.concatenate([b, indices[:short]])
                    valids[i] = np.concatenate([v, np.zeros(short, bool)])
        task_q: queue.Queue = queue.Queue()
        results: dict[int, dict] = {}
        lock = threading.Lock()
        # Backpressure: at most prefetch + num_workers batches in flight.
        budget = threading.Semaphore(self.prefetch + self.num_workers)
        for i, b in enumerate(batches):
            task_q.put((i, b))

        def worker():
            while True:
                # Acquire before claiming a task: tokens then always belong
                # to claimed tasks, and FIFO claiming guarantees the lowest
                # unconsumed batch is in flight -> no deadlock.
                budget.acquire()
                try:
                    i, idxs = task_q.get_nowait()
                except queue.Empty:
                    budget.release()
                    return
                try:
                    if hasattr(self.dataset, "load_batch"):
                        imgs, labels = self.dataset.load_batch(idxs)
                    else:
                        imgs = np.empty((len(idxs), self.dataset.size,
                                         self.dataset.size, 3), np.uint8)
                        labels = np.empty((len(idxs),), np.int32)
                        for j, idx in enumerate(idxs):
                            imgs[j], labels[j] = self.dataset.load(int(idx))
                    payload = {"image": imgs, "label": labels}
                    if valids is not None:
                        payload["valid"] = valids[i]
                except BaseException as e:
                    # A raising worker must still publish a result: storing
                    # the exception keeps the consumer loop from busy-waiting
                    # forever on a slot that would never fill (one corrupt
                    # file must fail the job loudly, not hang it).
                    payload = e
                with lock:
                    results[i] = payload

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        next_idx = 0
        import time
        while next_idx < nb:
            with lock:
                batch = results.pop(next_idx, None)
            if batch is None:
                time.sleep(0.002)
                continue
            budget.release()
            if isinstance(batch, BaseException):
                raise RuntimeError(
                    f"data worker failed on batch {next_idx}") from batch
            yield batch
            next_idx += 1
