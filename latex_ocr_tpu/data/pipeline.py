"""Device input pipeline: static-shape batches with background prefetch.

The reference re-pads numpy arrays per step and feeds them through a TF1
feed_dict — a host-bound hot loop (reference model/img2seq.py:125-142).
Here the pipeline owns the static-shape contract instead:

- images are padded up to a *snapped* shape from the bucket table (white,
  255), so the number of distinct image shapes — and therefore compiled
  programs — is bounded by the bucket table;
- formula lengths snap to a small set of length buckets
  (default multiples of ``length_bucket`` capped at ``max_length + 1``);
- a background thread prepares the next host batch while the device is
  busy, and batches are transferred eagerly so dispatch overlaps compute
  (double buffering);
- the final partial batch is padded to full ``batch_size`` with white
  images / PAD formulas and ``n_real`` records the true count, keeping
  every shape static.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from .images import get_max_shape
from .vocab import pad_batch_formulas


def snap_length(length: int, bucket: int, max_len: int) -> int:
    """Round ``length`` up to a multiple of ``bucket``, capped at max_len."""
    snapped = ((length + bucket - 1) // bucket) * bucket
    return min(max(snapped, bucket), max_len)


def snap_image_shape(
    shape: Sequence[int],
    stored_buckets: Optional[Sequence[Tuple[int, int]]],
) -> Tuple[int, int]:
    """Snap an (H, W) to the first stored bucket that fits, else round up
    to a multiple of 8 (the CNN reduction factor) so odd shapes still get
    a bounded shape set. The no-bucket fallback is floored at 32 px: the
    encoder contract is H' = H/8 - 2, so inputs under 24 px would reach
    the VALID conv with a non-positive spatial dim."""
    h, w = int(shape[0]), int(shape[1])
    if stored_buckets:
        for bh, bw in stored_buckets:
            if bh >= h and bw >= w:
                return (bh, bw)

    def up8(v):
        return max(32, ((v + 7) // 8) * 8)

    return (up8(h), up8(w))


def stored_bucket_table(
    buckets: Optional[Sequence[Sequence[int]]], down_ratio: int = 2
) -> Optional[List[Tuple[int, int]]]:
    """Convert the config's (width, height) bucket table into stored-image
    (H, W) shapes (post-downsample), sorted by area (first-fit order)."""
    if not buckets:
        return None
    shapes = [(h // down_ratio, w // down_ratio) for (w, h) in buckets]
    return sorted(set(shapes), key=lambda s: (s[0] * s[1], s[0]))


def make_batch(
    images: Sequence[np.ndarray],
    formulas: Sequence[Sequence[int]],
    id_pad: int,
    id_end: int,
    batch_size: int,
    stored_buckets: Optional[Sequence[Tuple[int, int]]] = None,
    length_bucket: int = 32,
    max_formula_len: int = 151,
) -> Dict[str, np.ndarray]:
    """Assemble one static-shape host batch.

    Returns dict with:
        image  (B, H, W, 1) uint8, white padded
        formula(B, T) int32, END-terminated, PAD padded
        length (B,) int32 (0 for padding rows)
        n_real () int32
    """
    n_real = len(images)
    max_hw = get_max_shape(images)
    H, W = snap_image_shape(max_hw[:2], stored_buckets)

    img_batch = np.full((batch_size, H, W, 1), 255, dtype=np.uint8)
    for i, img in enumerate(images):
        img_batch[i, : img.shape[0], : img.shape[1], :] = img

    max_len = max(len(f) for f in formulas)
    T = snap_length(max_len + 1, length_bucket, max_formula_len)
    formula_batch, lengths = pad_batch_formulas(formulas, id_pad, id_end, max_len=T - 1)

    if n_real < batch_size:
        pad_rows = np.full((batch_size - n_real, T), id_pad, dtype=np.int32)
        formula_batch = np.concatenate([formula_batch, pad_rows], axis=0)
        lengths = np.concatenate(
            [lengths, np.zeros(batch_size - n_real, np.int32)], axis=0
        )

    return {
        "image": img_batch,
        "formula": formula_batch,
        "length": lengths,
        "n_real": np.int32(n_real),
    }


class BatchPipeline:
    """Iterates static-shape device batches with background host prep.

    Wraps a DataGenerator (already shape-bucketed) and produces batches
    ready for the jitted step functions. ``sharding`` (optional
    jax.sharding.NamedSharding) places each batch across the mesh via
    `jax.device_put`, letting pjit consume it without relayout.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        id_pad: int,
        id_end: int,
        buckets: Optional[Sequence[Sequence[int]]] = None,
        length_bucket: int = 32,
        max_formula_len: int = 151,
        sharding=None,
        prefetch: int = 2,
        shuffle_seed: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.id_pad = id_pad
        self.id_end = id_end
        self.stored_buckets = stored_bucket_table(buckets)
        self.length_bucket = length_bucket
        self.max_formula_len = max_formula_len
        self.sharding = sharding
        self.prefetch = prefetch
        self.shuffle_seed = shuffle_seed

    def set_epoch(self, epoch: int) -> None:
        """Epoch-seeded reshuffle (same contract as the cached pipeline's
        set_epoch: deterministic given (shuffle_seed, epoch), so exact
        resume replays the same order). Requires a bucketed DataGenerator;
        silently keeps file order otherwise."""
        if self.shuffle_seed is None:
            return
        reshuffle = getattr(self.dataset, "reshuffle", None)
        if reshuffle is not None:
            # seed with the PAIR, not the sum: default_rng(seed + epoch)
            # makes seed s at epoch e+1 collide with seed s+1 at epoch e,
            # overlapping the shuffle streams of consecutive-seed runs;
            # SeedSequence mixes the pair without cross-seed collisions
            reshuffle(np.random.default_rng([self.shuffle_seed, epoch]))

    def _host_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        from ..utils.general import minibatches

        for imgs, forms in minibatches(self.dataset, self.batch_size):
            # keep each batch single-shape: split on image-shape boundaries
            # (the bucketed generator makes splits rare)
            groups: List[Tuple[list, list]] = []
            for img, form in zip(imgs, forms):
                if groups and groups[-1][0][0].shape == img.shape:
                    groups[-1][0].append(img)
                    groups[-1][1].append(form)
                else:
                    groups.append(([img], [form]))
            for g_imgs, g_forms in groups:
                yield make_batch(
                    g_imgs,
                    g_forms,
                    self.id_pad,
                    self.id_end,
                    self.batch_size,
                    self.stored_buckets,
                    self.length_bucket,
                    self.max_formula_len,
                )

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        done = object()
        abandoned = threading.Event()

        def put_with_escape(item) -> bool:
            """Blocking put that gives up once the consumer is gone."""
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for batch in self._host_batches():
                    if not put_with_escape(batch):
                        return
            finally:
                put_with_escape(done)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is done:
                    break
                if self.sharding is not None:
                    batch = {
                        k: jax.device_put(v, self.sharding if np.ndim(v) else None)
                        for k, v in batch.items()
                    }
                yield batch
        finally:
            # consumer stopped early (break/exception): release the producer
            abandoned.set()
