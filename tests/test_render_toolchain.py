"""Mocked-toolchain coverage for the real LaTeX render path.

The CI image has no pdflatex/magick, so `convert_to_png`'s real-toolchain
branch (render.py:44-97) would otherwise never execute before the first
real-data run. These tests install fake `pdflatex`/`magick` executables on
PATH that honor the exact command contracts the reference uses
(model/utils/image.py:164-214): pdflatex takes -interaction=nonstopmode
-output-directory=<dir> <tex> and leaves .pdf/.aux/.log files; magick
convert takes -density/-quality <pdf> <png>. Covered: command
construction, the crop→pad→downsample postprocess, blank-render False,
timeout kill, aux cleanup, and the incremental `build_images` pool path.
"""

import os
import stat
import textwrap

import numpy as np
import pytest
from PIL import Image

from latex_ocr_tpu.data import render
from latex_ocr_tpu.data.render import build_images, convert_to_png, latex_toolchain_available


FAKE_PDFLATEX = textwrap.dedent(
    """\
    #!/usr/bin/env python3
    # fake pdflatex: validates the CLI contract, emits pdf marker + aux files
    import os, sys, time
    if os.environ.get("FAKE_LATEX_HANG"):
        time.sleep(60)
    args = sys.argv[1:]
    assert "-interaction=nonstopmode" in args, args
    outdir = None
    tex = None
    for a in args:
        if a.startswith("-output-directory="):
            outdir = a.split("=", 1)[1]
        elif a.endswith(".tex"):
            tex = a
    assert outdir and tex, args
    body = open(tex).read()
    assert "\\\\documentclass" in body and "$$" in body, body
    name = os.path.splitext(os.path.basename(tex))[0]
    # the formula travels pdf-ward through a side file the fake magick reads
    open(os.path.join(outdir, name + ".pdf"), "w").write(body)
    open(os.path.join(outdir, name + ".aux"), "w").write("aux")
    open(os.path.join(outdir, name + ".log"), "w").write("log")
    """
)

FAKE_MAGICK = textwrap.dedent(
    """\
    #!/usr/bin/env python3
    # fake magick: convert -density D -quality Q in.pdf out.png
    import os, sys
    import numpy as np
    from PIL import Image
    args = sys.argv[1:]
    if args and args[0] == "convert":
        args = args[1:]
    assert "-density" in args and "-quality" in args, args
    pdf, png = args[-2], args[-1]
    assert pdf.endswith(".pdf") and png.endswith(".png"), args
    if not os.path.exists(pdf):
        sys.exit(1)
    img = np.full((60, 120), 255, np.uint8)
    if not os.environ.get("FAKE_LATEX_BLANK"):
        img[20:40, 30:90] = 0  # a block of ink to crop to
    Image.fromarray(img).save(png)
    """
)


@pytest.fixture()
def fake_toolchain(tmp_path, monkeypatch):
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    for name, body in (("pdflatex", FAKE_PDFLATEX), ("magick", FAKE_MAGICK)):
        p = bin_dir / name
        p.write_text(body)
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")
    monkeypatch.delenv("FAKE_LATEX_BLANK", raising=False)
    monkeypatch.delenv("FAKE_LATEX_HANG", raising=False)
    # the fake tools are python scripts whose interpreter startup (numpy +
    # PIL imports) can exceed the production 10s kill-timer on a loaded
    # 1-CPU host — widen it here; the timeout-kill test pins its own value
    monkeypatch.setattr(render, "TIMEOUT", 120)
    # which() caches nothing, but render checks availability at call time
    assert latex_toolchain_available()
    return bin_dir


def test_convert_to_png_success_and_cleanup(fake_toolchain, tmp_path):
    out = tmp_path / "imgs"
    out.mkdir()
    result = convert_to_png(
        r"x + y", str(out), "7", buckets=[[240, 100], [320, 80]]
    )
    assert result == "7.png"
    img = np.asarray(Image.open(out / "7.png"))
    # 60x120 ink box 20x60 -> crop (20,60) -> +8px border (36,76) -> first
    # fitting (w,h) bucket (240,100) -> downsample /2 -> (50,120)
    assert img.shape[:2] == (50, 120)
    assert (img != 255).any(), "ink must survive the postprocess"
    # aux files cleaned, only the png remains
    assert sorted(os.listdir(out)) == ["7.png"]


def test_convert_to_png_blank_render_fails(fake_toolchain, tmp_path, monkeypatch):
    monkeypatch.setenv("FAKE_LATEX_BLANK", "1")
    out = tmp_path / "imgs"
    out.mkdir()
    result = convert_to_png(r"\\phantom{x}", str(out), "3")
    assert result is False
    # nothing left behind: a stale blank png would be resurrected as
    # "already rendered" by the next incremental build
    assert os.listdir(out) == []


def test_convert_to_png_timeout_kill(fake_toolchain, tmp_path, monkeypatch):
    monkeypatch.setenv("FAKE_LATEX_HANG", "1")
    monkeypatch.setattr(render, "TIMEOUT", 1)
    out = tmp_path / "imgs"
    out.mkdir()
    import time

    t0 = time.time()
    result = convert_to_png("x", str(out), "9")
    assert result is False
    assert time.time() - t0 < 30, "hung pdflatex must be hard-killed"
    assert os.listdir(out) == []


def test_build_images_pool_and_incremental_skip(fake_toolchain, tmp_path):
    out = str(tmp_path / "imgs")
    formulas = {0: "a+b", 1: "c^2", 2: "\\frac{x}{y}"}
    results = build_images(formulas, out, n_threads=2)
    ok = {idx: p for p, idx in results}
    assert ok == {0: "0.png", 1: "1.png", 2: "2.png"}

    # second run: everything pre-existing, nothing re-rendered (tex files
    # would be left behind if the pool ran again — the dir stays png-only)
    results2 = build_images(formulas, out, n_threads=2)
    assert sorted(idx for _, idx in results2) == [0, 1, 2]
    assert all(f.endswith(".png") for f in os.listdir(out))
