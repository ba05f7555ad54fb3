"""Host-side input pipeline feeding the device training loops.

Behavioral parity with reference train_data_generator.py:
  - `ImageFolderSource` ~ DataSequence (25-110): read, normalize
    (mean 127 / std 128 for lite), aspect-preserving resize, zero-pad
  - `filter_by_dims` (135-158): drop images whose person boxes touch a 20px
    border margin or exceed max_area_ratio of the image area
  - `partition` (161-234): 90/10 train/val split, batching, shuffling
  - train-time augmentations (207-226: random flip, RandomContrast .2,
    random_brightness .2, clip) are reimplemented as a jitted device-side
    `augment_batch` — the TPU equivalent of the reference's GPU tf.data maps.

TPU-first: the host thread produces fixed-shape numpy batches; a
double-buffering prefetcher overlaps host decode with device compute and
`jax.device_put`s onto the mesh's batch sharding.
"""
from __future__ import annotations

import functools
import math
import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.preprocess import preprocess_host
from ..utils.image import parse_image_size
from ..utils.log import get_logger

logger = get_logger(__name__)


def _read_image(img_dir: str, filename: str) -> np.ndarray:
    from PIL import Image
    im = Image.open(os.path.join(img_dir, filename))
    if im.mode != "RGB":
        im = im.convert("RGB")
    return np.asarray(im)


def _parse_label_line(line: str) -> Optional[List[float]]:
    """'cls ymin xmin ymax xmax' -> [ymin, xmin, ymax, xmax]; None for
    blank/malformed lines (trailing newline at EOF etc.)."""
    parts = line.split()
    if len(parts) != 5:
        return None
    try:
        return [float(v) for v in parts[1:]]
    except ValueError:
        return None


def filter_by_dims(img_dir: str, label_dir: str, max_area_ratio: float,
                   filename: str) -> bool:
    """Parity with train_data_generator.py:135-158."""
    im = _read_image(img_dir, filename)
    h, w, _ = im.shape
    label_file = os.path.splitext(filename)[0] + ".txt"
    with open(os.path.join(label_dir, label_file)) as f:
        for line in f.readlines():
            parsed = _parse_label_line(line)
            if parsed is None:
                continue
            ymin, xmin, ymax, xmax = parsed
            if ymin < 20 or xmin < 20 or ymax > h - 20 or xmax > w - 20:
                return False
            if ((ymax - ymin) * (xmax - xmin)) / (h * w) >= max_area_ratio:
                return False
    return True


class ImageFolderSource:
    """Reads + preprocesses images from a directory (DataSequence parity)."""

    def __init__(self, img_dir: str, output_size, mean_rgb, stddev_rgb, *,
                 file_list: Optional[Sequence[str]] = None,
                 shuffle: bool = True, seed: int = 0):
        self.img_dir = img_dir
        self.output_size = parse_image_size(output_size)
        self.mean_rgb = mean_rgb
        self.stddev_rgb = stddev_rgb
        self.files = list(file_list if file_list is not None
                          else sorted(os.listdir(img_dir)))
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.files)

    def shard(self, index: int, count: int) -> "ImageFolderSource":
        """Restrict to the index-th of `count` disjoint file slices
        (multi-host input: each process reads only its share). Returns
        self for chaining; call BEFORE iterating."""
        if not (0 <= index < count):
            raise ValueError(f"bad shard ({index}, {count})")
        self.files = self.files[index::count]
        return self

    def __getitem__(self, idx: int) -> np.ndarray:
        im = _read_image(self.img_dir, self.files[idx])
        out, _ = preprocess_host(im, self.output_size, self.mean_rgb,
                                 self.stddev_rgb)
        return out

    def batches(self, batch_size: int, *, drop_remainder: bool = False,
                start_batch: int = 0) -> Iterator[np.ndarray]:
        """One epoch of [B, H, W, 3] float32 batches (short last batch is
        padded by wrapping, matching fixed-shape device programs).
        `start_batch` skips the first batches of the epoch without loading
        their images (resume fast-forward)."""
        order = np.arange(len(self.files))
        if self.shuffle:
            self.rng.shuffle(order)
        n = len(order)
        for start in range(start_batch * batch_size, n, batch_size):
            idxs = order[start:start + batch_size]
            if len(idxs) < batch_size:
                if drop_remainder:
                    return
                pad = order[: batch_size - len(idxs)]
                idxs = np.concatenate([idxs, pad])
            yield np.stack([self[i] for i in idxs])

    def repeat_batches(self, batch_size: int, *, skip_batches: int = 0
                       ) -> Iterator[np.ndarray]:
        """Endless epochs of batches. `skip_batches` fast-forwards the
        deterministic stream (resume): full epochs advance the shuffle RNG
        exactly as an iterated epoch would — one shuffle of an equal-length
        permutation — and the in-epoch remainder is skipped by index, so no
        skipped image is ever read from disk."""
        if not self.files:
            # without this an empty source busy-loops forever: each pass
            # of batches() yields nothing and the consumer blocks on a
            # prefetch queue that never fills
            raise ValueError(
                f"no images in {self.img_dir!r} (empty dataset, "
                f"everything filtered out, or a too-small train split)")
        per_epoch = -(-len(self.files) // batch_size)  # ceil (wrap-padded)
        full, rem = divmod(skip_batches, per_epoch)
        for _ in range(full):
            if self.shuffle:
                self.rng.shuffle(np.arange(len(self.files)))
        first = True
        while True:
            yield from self.batches(batch_size,
                                    start_batch=rem if first else 0)
            first = False


def partition(config, img_dir: str, label_dir: Optional[str],
              max_area_ratio: float = 0.1, train_split: float = 0.9, *,
              batch_size: int = 2, shuffle: bool = True,
              filter_data: bool = False, seed: int = 0) -> dict:
    """90/10 split into train/val sources (train_data_generator.py:161-234)."""
    file_list = sorted(os.listdir(img_dir))
    if filter_data:
        if label_dir is None:
            logger.warning("no filtering done since label_dir is not provided")
        else:
            logger.info("filtering dataset by label constraints...")
            fn = functools.partial(filter_by_dims, img_dir, label_dir,
                                   max_area_ratio)
            file_list = [f for f in file_list if fn(f)]
            logger.info(f"done. data size is {len(file_list)}")
    ds_size = len(file_list)
    train_size = int(train_split * ds_size)

    mk = functools.partial(ImageFolderSource, img_dir, config.image_size,
                           config.mean_rgb, config.stddev_rgb, seed=seed)
    train = mk(file_list=file_list[:train_size], shuffle=shuffle)
    val = mk(file_list=file_list[train_size:], shuffle=False)
    return {
        "train": {"source": train,
                  "length": math.ceil(max(train_size, 1) / batch_size)},
        "val": {"source": val,
                "length": math.ceil(max(ds_size - train_size, 1) / batch_size)},
    }


@jax.jit
def augment_batch(key: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    """Device-side train augmentations (train_data_generator.py:201-226):
    random horizontal flip, RandomContrast(.2), random_brightness(.2), clip."""
    b = images.shape[0]
    k_flip, k_con, k_bri = jax.random.split(key, 3)
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    images = jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)
    # keras RandomContrast: (x - channel_mean) * factor + channel_mean
    factor = jax.random.uniform(k_con, (b, 1, 1, 1), minval=0.8, maxval=1.2)
    mean = jnp.mean(images, axis=(1, 2), keepdims=True)
    images = (images - mean) * factor + mean
    delta = jax.random.uniform(k_bri, (b, 1, 1, 1), minval=-0.2, maxval=0.2)
    return jnp.clip(images + delta, -1.0, 1.0)


def skip_batches(iterator: Iterator[np.ndarray], n: int
                 ) -> Iterator[np.ndarray]:
    """Consume and discard the first n items (resume fast-forward for
    generator sources like synthetic_batches, whose RNG state advances
    only by drawing; ImageFolderSource has a no-IO fast path instead —
    repeat_batches(skip_batches=...))."""
    for _ in range(n):
        next(iterator)
    return iterator


def prefetch(iterator: Iterator[np.ndarray], *, size: int = 2,
             device_put_fn=None) -> Iterator:
    """Background-thread prefetch + optional device_put (double buffering).

    The TPU equivalent of tf.data AUTOTUNE prefetch
    (train_data_generator.py:218-220)."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def worker():
        try:
            for item in iterator:
                if device_put_fn is not None:
                    item = device_put_fn(item)
                q.put(item)
            q.put(_END)
        except BaseException as e:  # propagate to the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def synthetic_batches(batch_size: int, image_size, *, seed: int = 0,
                      n_boxes: int = 2) -> Iterator[np.ndarray]:
    """Synthetic data source for tests/benchmarks (the analog of the
    reference's use_fake_data mode, dataloader.py:455-459): random
    backgrounds with high-contrast rectangles so detectors output boxes."""
    hw = parse_image_size(image_size)
    rng = np.random.default_rng(seed)
    while True:
        imgs = rng.uniform(-1, 1, size=(batch_size, *hw, 3)).astype(np.float32)
        for b in range(batch_size):
            for _ in range(n_boxes):
                y0 = rng.integers(0, hw[0] // 2)
                x0 = rng.integers(0, hw[1] // 2)
                h = rng.integers(hw[0] // 8, hw[0] // 2)
                w = rng.integers(hw[1] // 8, hw[1] // 2)
                imgs[b, y0:y0 + h, x0:x0 + w] = rng.uniform(-1, 1, size=3)
        yield imgs
