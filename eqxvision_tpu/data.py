"""Host-side data loading: threaded decode + prefetch feeding the
on-device preprocessing pipeline.

The reference had no input pipeline at all (preprocessing was delegated
to torchvision in its tests, SURVEY.md §4 fixtures note). For TPU
serving the division of labor is: host threads decode JPEG -> fixed-size
uint8 canvases (cheap, parallel, 3x smaller transfer than f32), batches
prefetch into a bounded queue, and resize/crop/normalize run fused on
device (ops/preprocessing.py) in front of the model.

    loader = ImageFolderLoader("/data/imagenet/val", batch_size=128)
    for images_u8, labels in loader:            # np.uint8 NHWC, int32
        x = imagenet_eval_pipeline(jnp.asarray(images_u8))
        logits, _ = model(x, state)
"""
from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


def find_imagefolder_samples(root: str) -> Tuple[List[Tuple[str, int]], List[str]]:
    """ImageFolder convention: root/<class>/<image>; classes sorted
    lexicographically to indices (torchvision's mapping)."""
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    samples = []
    for idx, c in enumerate(classes):
        cdir = os.path.join(root, c)
        for fname in sorted(os.listdir(cdir)):
            samples.append((os.path.join(cdir, fname), idx))
    return samples, classes


def decode_to_canvas(path: str, side: int) -> np.ndarray:
    """Decode an image to a (side, side, 3) uint8 canvas: shorter side
    scaled to ``side`` then center-cropped — host-side companion of the
    device pipeline's resize/crop (PIL bilinear)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    scale = side / min(w, h)
    img = img.resize(
        (max(side, round(w * scale)), max(side, round(h * scale))), Image.BILINEAR
    )
    left = (img.width - side) // 2
    top = (img.height - side) // 2
    img = img.crop((left, top, left + side, top + side))
    return np.asarray(img, np.uint8)


class ImageFolderLoader:
    """Threaded, prefetching uint8 batch loader.

    Yields ``(images, labels)``: np.uint8 (B, side, side, 3) and
    np.int32 (B,). Drops the ragged tail batch (static shapes for jit).
    """

    def __init__(
        self,
        root: str,
        batch_size: int = 128,
        side: int = 256,
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 4,
        limit: Optional[int] = None,
        process_shard: bool = False,
    ):
        self.samples, self.classes = find_imagefolder_samples(root)
        if limit:
            self.samples = self.samples[:limit]
        if process_shard:
            # multi-host eval: each process decodes only its shard
            # (parallel/multihost.py pads shards so every process yields
            # the same number of batches — collective steps stay in
            # lockstep). SURVEY.md §2.5 multi-host eval seam.
            from .parallel.multihost import local_shard

            self.samples = local_shard(self.samples)
        self.batch_size = batch_size
        self.side = side
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch

    def __len__(self) -> int:
        return len(self.samples) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = np.arange(len(self.samples))
        if self.shuffle:
            np.random.RandomState(self.seed).shuffle(order)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        pool = ThreadPoolExecutor(self.num_workers)
        n_batches = len(self)

        def produce():
            try:
                for b in range(n_batches):
                    idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
                    items = [self.samples[i] for i in idxs]
                    imgs = list(pool.map(lambda it: decode_to_canvas(it[0], self.side), items))
                    labels = np.asarray([it[1] for it in items], np.int32)
                    q.put((np.stack(imgs), labels))
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item
        pool.shutdown(wait=False)


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Keep ``size`` batches resident on device ahead of the consumer.

    The host->device copy of batch N+1 rides DMA while the model step
    for batch N executes, hiding transfer latency behind compute (the
    flax ``prefetch_to_device`` pattern). ``sharding`` (e.g. a
    ``NamedSharding`` over the data axis) places each leaf directly in
    its sharded layout so no per-step reshard is needed.

        mesh = make_mesh(data=8)
        sh = jax.sharding.NamedSharding(mesh, P("data"))
        for x_u8, y in device_prefetch(loader, 2, sh):
            ...
    """
    import collections
    import itertools

    import jax

    def put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    it = iter(iterator)
    buf = collections.deque()
    for b in itertools.islice(it, size):
        buf.append(put(b))
    while buf:
        yield buf.popleft()
        for b in itertools.islice(it, 1):
            buf.append(put(b))
