"""Formula -> PNG rendering: host-side LaTeX toolchain pool.

Pipeline per formula (reference model/utils/image.py:164-251): write a
standalone .tex, `pdflatex` it, rasterize with ImageMagick at density 200,
crop to ink, pad +8px and snap to the bucket table, LANCZOS-downsample by 2,
clean aux files. Each subprocess is hard-killed after TIMEOUT seconds;
failed renders are dropped from the matching file. Already-rendered images
are skipped, making builds incremental/idempotent.

When the LaTeX toolchain is unavailable (no pdflatex/magick on PATH) the
synthetic renderer from `latex_ocr_tpu.data.synthetic` is used instead so
the full pipeline stays exercisable in CI and on render-less hosts.
"""

from __future__ import annotations

import os
import shutil
from multiprocessing import Pool
from multiprocessing.pool import ThreadPool
from typing import Dict, List, Optional, Sequence, Tuple, Union

from ..utils.general import delete_file, get_files, init_dir, run
from .images import crop_image, downsample_image, pad_image

TIMEOUT = 10

_TEX_TEMPLATE = r"""\documentclass[preview]{standalone}
    \begin{document}
        $$ %s $$
    \end{document}"""


def latex_toolchain_available() -> bool:
    return shutil.which("pdflatex") is not None and (
        shutil.which("magick") is not None or shutil.which("convert") is not None
    )


def _magick_cmd() -> str:
    return "magick convert" if shutil.which("magick") else "convert"


def convert_to_png(
    formula: str,
    dir_output: str,
    name: str,
    quality: int = 100,
    density: int = 200,
    down_ratio: int = 2,
    buckets: Optional[Sequence[Sequence[int]]] = None,
) -> Union[str, bool]:
    """Render one LaTeX formula to `<name>.png` in `dir_output`.

    Returns the png filename, or False if rendering failed (timeout, bad
    LaTeX, blank output).
    """
    tex_path = os.path.join(dir_output, f"{name}.tex")
    pdf_path = os.path.join(dir_output, f"{name}.pdf")
    png_path = os.path.join(dir_output, f"{name}.png")

    with open(tex_path, "w") as f:
        f.write(_TEX_TEMPLATE % formula)

    run(
        f"pdflatex -interaction=nonstopmode -output-directory={dir_output} {tex_path}",
        TIMEOUT,
    )
    run(
        f"{_magick_cmd()} -density {density} -quality {quality} {pdf_path} {png_path}",
        TIMEOUT,
    )

    try:
        if not crop_image(png_path, png_path):
            # blank render (reference treats a no-ink crop as failure,
            # image.py:196-207); delete the png too so an incremental
            # rebuild doesn't resurrect it as "already rendered"
            print(f"render blank for {name}")
            _clean(dir_output, name)
            delete_file(png_path)
            return False
        pad_image(png_path, png_path, buckets=buckets)
        downsample_image(png_path, png_path, down_ratio)
        _clean(dir_output, name)
        return f"{name}.png"
    except Exception as e:  # noqa: BLE001 - render failures must not kill the pool
        print(f"render failed for {name}: {e}")
        _clean(dir_output, name)
        return False


def _clean(dir_output: str, name: str) -> None:
    for ext in ("aux", "log", "pdf", "tex"):
        delete_file(os.path.join(dir_output, f"{name}.{ext}"))


def _build_one(item) -> Tuple[Union[str, bool], int]:
    idx, formula, dir_images, quality, density, down_ratio, buckets, synthetic, handwritten = item
    name = str(idx)
    if synthetic:
        from .synthetic import render_synthetic_formula

        ok = render_synthetic_formula(
            formula, os.path.join(dir_images, f"{name}.png"), buckets=buckets,
            down_ratio=down_ratio, handwritten=handwritten,
        )
        return (f"{name}.png" if ok else False, idx)
    path = convert_to_png(formula, dir_images, name, quality, density, down_ratio, buckets)
    return (path, idx)


def build_images(
    formulas: Dict[int, str],
    dir_images: str,
    quality: int = 100,
    density: int = 200,
    down_ratio: int = 2,
    buckets: Optional[Sequence[Sequence[int]]] = None,
    n_threads: int = 4,
    force_synthetic: bool = False,
    handwritten=False,  # False | True/'jitter' | 'stroke' (synthetic.py)
) -> List[Tuple[Union[str, bool], int]]:
    """Render all formulas in parallel; skip images already on disk.

    Returns list of (png filename | False, formula idx) including the
    pre-existing images.
    """
    init_dir(dir_images)
    existing = sorted(
        {
            int(f.split(".")[0])
            for f in get_files(dir_images)
            if f.split(".")[-1] == "png" and f.split(".")[0].isdigit()
        }
    )
    synthetic = force_synthetic or not latex_toolchain_available()
    if synthetic and not force_synthetic:
        print("LaTeX toolchain not found — using the synthetic glyph renderer.")

    todo = [
        (idx, form, dir_images, quality, density, down_ratio, buckets, synthetic, handwritten)
        for idx, form in formulas.items()
        if idx not in set(existing)
    ]
    if todo:
        if synthetic:
            # thread pool: numpy/PIL release the GIL, and forking after a
            # JAX import risks deadlocks in multithreaded processes
            with ThreadPool(n_threads) as pool:
                result = pool.map(_build_one, todo)
        else:
            # process pool for the LaTeX toolchain (subprocess-bound)
            with Pool(n_threads) as pool:
                result = pool.map(_build_one, todo)
    else:
        result = []
    result += [(f"{idx}.png", idx) for idx in existing]
    return result
