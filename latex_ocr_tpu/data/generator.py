"""Dataset iteration: matching files, formula joins, shape bucketing.

File format contract (so datasets interchange with the reference,
model/utils/data_generator.py:12-238):
- formulas file: one formula per line (tokens space-separated)
- matching file: lines of ``<image_file> <formula_line_number>``
- image dir: rendered PNGs

`DataGenerator` joins the three, applies image/formula preprocessing per
item, drops formulas longer than ``max_len``, caps iteration at
``max_iter``, and optionally groups items into runs of ``bucket_size``
sharing an identical image shape so downstream batches have a single
static shape — the cornerstone of the XLA compile-cache contract.
"""

from __future__ import annotations

import os
from typing import Callable, Iterator, Optional, Tuple

from .images import greyscale, read_img
from .vocab import load_formulas


class DataGeneratorFile:
    """Iterates (img_path, formula_id) pairs from a matching file."""

    def __init__(self, filename: str):
        self._filename = filename

    def __iter__(self) -> Iterator[Tuple[str, str]]:
        with open(self._filename) as f:
            for line in f:
                parts = line.strip().split(" ")
                if len(parts) >= 2:
                    yield parts[0], parts[1]


class DataGenerator:
    """Yields (img, formula) tuples with preprocessing, filtering, bucketing."""

    def __init__(
        self,
        path_formulas: str,
        dir_images: str,
        path_matching: str,
        bucket: bool = False,
        form_prepro: Callable = lambda s: s.strip().split(" "),
        iter_mode: str = "data",
        img_prepro: Callable = lambda x: x,
        max_iter: Optional[int] = None,
        max_len: Optional[int] = None,
        bucket_size: int = 20,
    ):
        self._path_formulas = path_formulas
        self._dir_images = dir_images
        self._path_matching = path_matching
        self._img_prepro = img_prepro
        self._form_prepro = form_prepro
        self._max_iter = max_iter
        self._max_len = max_len
        self._iter_mode = iter_mode
        self._bucket = bucket
        self._bucket_size = bucket_size

        self._length: Optional[int] = None
        self._formulas = load_formulas(path_formulas)
        self._set_data_generator()

    def _set_data_generator(self) -> None:
        self._data_generator = DataGeneratorFile(self._path_matching)
        if self._bucket:
            self._data_generator = self.bucket(self._bucket_size)

    def bucket(self, bucket_size: int):
        """Reorder the listing into runs of identical image shapes.

        A full pass loads every image once; items accumulate per-shape and
        each time a shape reaches ``bucket_size`` items the run is flushed to
        the output listing, so consecutive batches mostly share one shape.
        """
        print("Bucketing the dataset by image shape...")
        bucketed = []
        old_mode = self._iter_mode
        self._iter_mode = "full"

        buffers: dict = {}
        groups: dict = {}  # full per-shape listings, kept for reshuffle()
        idx = -1
        for idx, (img, _formula, img_path, formula_id) in enumerate(self):
            shape = img.shape
            groups.setdefault(shape, []).append((img_path, formula_id))
            buf = buffers.setdefault(shape, [])
            if len(buf) == bucket_size:
                bucketed.extend(buf)
                buf.clear()
            buf.append((img_path, formula_id))
        for buf in buffers.values():
            bucketed.extend(buf)

        self._iter_mode = old_mode
        self._length = idx + 1
        self._shape_groups = groups
        print(f"- done ({self._length} items, {len(buffers)} shapes).")
        return bucketed

    def reshuffle(self, rng) -> None:
        """Re-draw the bucketed listing for a new epoch: item order within
        each shape group and the order of the flushed runs both shuffle
        under ``rng`` (np.random.Generator), while runs keep a single
        image shape so the static-shape batch contract holds. No-op for
        un-bucketed datasets (nothing cached to permute)."""
        groups = getattr(self, "_shape_groups", None)
        if not groups:
            return
        runs = []
        for items in groups.values():
            items = list(items)
            rng.shuffle(items)
            runs.extend(
                items[i : i + self._bucket_size]
                for i in range(0, len(items), self._bucket_size)
            )
        rng.shuffle(runs)
        self._data_generator = [ex for run in runs for ex in run]

    def _get_raw_formula(self, formula_id) -> str:
        try:
            return self._formulas[int(formula_id)]
        except KeyError:
            raise KeyError(
                f"Formula id {formula_id} not found ({len(self._formulas)} formulas"
                f" loaded) — matching file and formulas file may be mismatched."
            )

    def _process_instance(self, example: Tuple[str, str]):
        img_path, formula_id = example
        img = read_img(os.path.join(self._dir_images, img_path))
        img = self._img_prepro(img)
        formula = self._form_prepro(self._get_raw_formula(formula_id))

        if self._iter_mode == "data":
            inst = (img, formula)
        else:  # "full"
            inst = (img, formula, img_path, formula_id)

        skip = self._max_len is not None and len(formula) > self._max_len
        return inst, skip

    def __iter__(self):
        n = 0
        for example in self._data_generator:
            if self._max_iter is not None and n >= self._max_iter:
                break
            inst, skip = self._process_instance(example)
            if skip:
                continue
            n += 1
            yield inst

    def __getitem__(self, i: int):
        for count, item in enumerate(self):
            if count == i:
                return item
        raise IndexError(i)

    def __len__(self) -> int:
        if self._length is None:
            self._length = sum(1 for _ in self)
        return self._length

    def build(
        self,
        quality: int = 100,
        density: int = 200,
        down_ratio: int = 2,
        buckets=None,
        n_threads: int = 10,
    ) -> None:
        """Render every formula to a PNG and write the matching file."""
        from .render import build_images

        os.makedirs(self._dir_images, exist_ok=True)
        parent = os.path.dirname(self._path_matching)
        if parent:
            os.makedirs(parent, exist_ok=True)
        result = build_images(
            self._formulas, self._dir_images, quality, density, down_ratio, buckets, n_threads
        )
        with open(self._path_matching, "w") as f:
            for path_img, idx in result:
                if path_img is not False:
                    f.write(f"{path_img} {idx}\n")


def default_img_prepro(img):
    """Default image preprocessing: greyscale to (H, W, 1) uint8."""
    return greyscale(img)
