"""Cached input pipeline: decode once, native batch assembly every epoch.

Production counterpart of `BatchPipeline`: instead of re-reading and
re-decoding PNGs per epoch (the reference re-decodes per step via
scipy imread, data_generator.py:166), all images are decoded once into a
RawImageCache (mmap blob) and every epoch assembles white-padded batches
with the multithreaded native batcher. Shape-bucketed grouping happens on
the cached index arrays — no image bytes move until assembly.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .cache import RawImageCache
from .pipeline import snap_image_shape, snap_length, stored_bucket_table
from .vocab import load_formulas, pad_batch_formulas


class CachedBatchPipeline:
    """Static-shape batches from a RawImageCache + tokenized formulas."""

    def __init__(
        self,
        cache: RawImageCache,
        formulas: Sequence[Sequence[int]],  # token ids, aligned with cache
        batch_size: int,
        id_pad: int,
        id_end: int,
        buckets: Optional[Sequence[Sequence[int]]] = None,
        length_bucket: int = 32,
        max_formula_len: int = 151,
        sharding=None,
        shuffle_seed: Optional[int] = None,
        n_threads: int = 8,
        target_batch_pixels: Optional[int] = None,
        max_iter: Optional[int] = None,
        device_resident: bool = False,
        max_resident_bytes: int = 6 << 30,
    ):
        assert len(cache) == len(formulas), (len(cache), len(formulas))
        self.cache = cache
        self.formulas = [np.asarray(f, np.int32) for f in formulas]
        self.batch_size = batch_size
        # adaptive per-bucket batch: large buckets get a smaller batch so
        # the encoder-activation footprint (the HBM hot spot in the
        # backward pass) stays roughly constant across buckets
        self.target_batch_pixels = target_batch_pixels
        self.id_pad = id_pad
        self.id_end = id_end
        self.stored_buckets = stored_bucket_table(buckets)
        self.length_bucket = length_bucket
        self.max_formula_len = max_formula_len
        self.sharding = sharding
        # adaptive batches must stay sublane-friendly (multiple of 8) AND
        # divide evenly across a batch-sharded mesh
        self._batch_multiple = 8
        if sharding is not None:
            try:
                n_dev = int(np.prod(sharding.mesh.devices.shape))
                self._batch_multiple = int(np.lcm(8, n_dev))
            except AttributeError:
                pass
        self.shuffle_seed = shuffle_seed
        self.n_threads = n_threads
        # cap on examples per epoch (reference DataGenerator max_iter,
        # data_generator.py:190-191); None = no cap
        self.max_iter = max_iter
        self._epoch = 0

        # group example indices by snapped image shape (the static contract)
        self._groups: Dict[Tuple[int, int], List[int]] = {}
        for i in range(len(cache)):
            shape = snap_image_shape(cache.shape(i), self.stored_buckets)
            self._groups.setdefault(shape, []).append(i)

        # device-resident dataset: upload each bucket group's white-padded
        # image stack to HBM ONCE, then gather batches on device by index —
        # the steady-state train loop transfers only indices + formula ids
        # (KB/step) instead of the image batch (MB/step). This is both the
        # TPU-shaped design (minimize host<->device traffic) and the
        # mitigation for the tunneled-runtime transfer leak measured in
        # docs/design.md §13. Incompatible with a batch sharding (multi-host
        # feeds per-host shards from the host path instead).
        # True: resident or raise. "auto": resident if it fits the cap and
        # there is no sharding, else fall back to host assembly.
        auto = device_resident == "auto"
        self.device_resident = bool(device_resident)
        if self.device_resident and self.sharding is not None:
            if not auto:
                raise ValueError("device_resident and sharding are mutually exclusive")
            self.device_resident = False
        total = sum(
            (len(g) + 1) * h * w for (h, w), g in self._groups.items()
        )
        if self.device_resident and total > max_resident_bytes:
            if not auto:
                raise ValueError(
                    f"dataset needs {total / 1e9:.1f} GB resident, over the "
                    f"{max_resident_bytes / 1e9:.1f} GB cap — use the host path"
                )
            self.device_resident = False
        self._resident: Optional[Dict[Tuple[int, int], object]] = None
        self._positions: Dict[int, int] = {}  # cache idx -> position in its group

    def _ensure_resident(self) -> None:
        """Upload every group stack (plus one all-white padding row at the
        end of each stack) to the default device."""
        import jax

        if self._resident is not None:
            return
        self._resident = {}
        for (H, W), idxs in self._groups.items():
            # capacity len+1: the native assembler white-fills unused rows,
            # so row len(idxs) is the all-white tail-padding image
            stack = self.cache.batch(idxs, len(idxs) + 1, H, W, self.n_threads)
            self._resident[(H, W)] = jax.device_put(stack)
            for pos, i in enumerate(idxs):
                self._positions[i] = pos

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle epoch (for exact resume: the trainer drives the
        epoch counter so a restart reproduces the same data order)."""
        self._epoch = int(epoch)

    def batch_size_for(self, shape: Tuple[int, int]) -> int:
        if self.target_batch_pixels is None:
            # fixed batch: the caller owns divisibility (round_batch_to_mesh)
            return self.batch_size
        m = self._batch_multiple
        h, w = shape
        b = self.target_batch_pixels // max(1, h * w)
        b = (b // m) * m
        cap = max(m, (self.batch_size // m) * m)
        return int(max(m, min(cap, b)))

    def __len__(self) -> int:
        total = 0
        remaining = self.max_iter if self.max_iter is not None else None
        for shape, g in self._groups.items():
            b = self.batch_size_for(shape)
            n = len(g)
            if remaining is not None:
                n = min(n, remaining)
                remaining -= n
            total += (n + b - 1) // b
            if remaining == 0:
                break
        return total

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        import jax

        # pair-seeded (not seed+epoch summed) so consecutive-seed runs
        # don't share shuffle streams — see data/pipeline.py set_epoch
        rng = (
            np.random.default_rng([self.shuffle_seed, self._epoch])
            if self.shuffle_seed is not None
            else None
        )
        self._epoch += 1

        order: List[Tuple[Tuple[int, int], np.ndarray]] = []
        # max_iter truncates per-group counts in group order (must mirror
        # __len__ exactly so the trainer's batch estimate holds)
        remaining = self.max_iter if self.max_iter is not None else None
        for shape, idxs in self._groups.items():
            arr = np.asarray(idxs, np.int32)
            if rng is not None:
                rng.shuffle(arr)
            if remaining is not None:
                arr = arr[:remaining]
                remaining -= len(arr)
            b = self.batch_size_for(shape)
            for start in range(0, len(arr), b):
                order.append((shape, arr[start : start + b]))
            if remaining == 0:
                break
        if rng is not None:
            rng.shuffle(order)

        if self.device_resident:
            self._ensure_resident()
            import jax.numpy as jnp

        for (H, W), idxs in order:
            b = self.batch_size_for((H, W))
            if self.device_resident:
                n_group = len(self._groups[(H, W)])
                pos = np.full((b,), n_group, np.int32)  # white padding row
                pos[: len(idxs)] = [self._positions[i] for i in idxs]
                image = jnp.take(self._resident[(H, W)], pos, axis=0)
            else:
                image = self.cache.batch(idxs, b, H, W, self.n_threads)

            forms = [self.formulas[i] for i in idxs]
            max_len = max(len(f) for f in forms)
            T = snap_length(max_len + 1, self.length_bucket, self.max_formula_len)
            formula, lengths = pad_batch_formulas(forms, self.id_pad, self.id_end, max_len=T - 1)
            if len(idxs) < b:
                pad_n = b - len(idxs)
                formula = np.concatenate(
                    [formula, np.full((pad_n, T), self.id_pad, np.int32)]
                )
                lengths = np.concatenate([lengths, np.zeros(pad_n, np.int32)])

            batch = {
                "image": image,
                "formula": formula,
                "length": lengths,
                "n_real": np.int32(len(idxs)),
            }
            if self.sharding is not None:
                batch = {
                    k: jax.device_put(v, self.sharding if np.ndim(v) else None)
                    for k, v in batch.items()
                }
            yield batch


def build_cached_pipeline(
    path_formulas: str,
    dir_images: str,
    path_matching: str,
    form_prepro: Callable,
    cache_dir: str,
    batch_size: int,
    id_pad: int,
    id_end: int,
    max_len: Optional[int] = None,
    **kwargs,
) -> CachedBatchPipeline:
    """Construct the cached pipeline from the reference's file contract.

    The image cache under ``cache_dir`` is reused when its entry count
    matches the matching file; delete the cache dir after re-rendering a
    dataset in place (same paths, same count, new pixels).
    """
    formulas_raw = load_formulas(path_formulas)
    paths: List[str] = []
    token_lists: List[Sequence[int]] = []
    with open(path_matching) as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) < 2:
                continue
            img_path, formula_id = parts[0], int(parts[1])
            tokens = form_prepro(formulas_raw[formula_id])
            if max_len is not None and len(tokens) > max_len:
                continue
            paths.append(os.path.join(dir_images, img_path))
            token_lists.append(tokens)

    cache = RawImageCache.build(paths, cache_dir)
    return CachedBatchPipeline(
        cache, token_lists, batch_size, id_pad, id_end, **kwargs
    )
