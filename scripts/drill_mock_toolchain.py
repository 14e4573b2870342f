#!/usr/bin/env python
"""Mocked-toolchain render leg of the full-scale drill.

Runs a few hundred real im2latex formulas through the REAL subprocess
render path (data/render.py: pdflatex + magick command contracts,
timeout-kill, crop->pad-to-21-bucket->downsample postprocess, incremental
skip) using fake pdflatex/magick executables — the same fixtures the unit
tests install (tests/test_render_toolchain.py), here at a few-hundred-
formula volume with the real bucket table. The fake magick draws an
ink box sized by the formula's token count so the renders spread across
the reference's bucket table instead of collapsing into the smallest one.

The full 70k volume goes through the in-process synthetic renderer (the
documented render-less fallback): on this 1-vCPU host each mocked render
costs two ~4 s Python subprocess spawns, so 70k of them (~40 h) would be
a test of process spawning, not of the pipeline.
"""
import json
import os
import stat
import subprocess
import sys
import tempfile
import textwrap
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FORMULAS = int(sys.argv[1]) if len(sys.argv) > 1 else 300

FAKE_PDFLATEX = textwrap.dedent(
    """\
    #!/usr/bin/env python3
    import os, sys
    args = sys.argv[1:]
    assert "-interaction=nonstopmode" in args, args
    outdir = tex = None
    for a in args:
        if a.startswith("-output-directory="):
            outdir = a.split("=", 1)[1]
        elif a.endswith(".tex"):
            tex = a
    assert outdir and tex, args
    body = open(tex).read()
    assert "\\\\documentclass" in body and "$$" in body, body
    name = os.path.splitext(os.path.basename(tex))[0]
    open(os.path.join(outdir, name + ".pdf"), "w").write(body)
    open(os.path.join(outdir, name + ".aux"), "w").write("aux")
    open(os.path.join(outdir, name + ".log"), "w").write("log")
    """
)

FAKE_MAGICK = textwrap.dedent(
    """\
    #!/usr/bin/env python3
    # ink box sized by token count so renders spread over the bucket table
    import sys
    import numpy as np
    from PIL import Image
    args = sys.argv[1:]
    if args and args[0] == "convert":
        args = args[1:]
    assert "-density" in args and "-quality" in args, args
    pdf, png = args[-2], args[-1]
    body = open(pdf).read()
    formula = body.split("$$")[1].strip()
    n_tok = max(1, len(formula.split()))
    w, h = min(3100, 40 + 20 * n_tok), 60 + 2 * (n_tok % 5)
    img = np.full((h, w), 255, np.uint8)
    img[10 : h - 10, 10 : w - 10] = 0
    Image.fromarray(img).save(png)
    """
)


def main():
    from latex_ocr_tpu.data import render
    from latex_ocr_tpu.data.render import build_images, latex_toolchain_available
    from latex_ocr_tpu.utils.config import Config

    bin_dir = tempfile.mkdtemp(prefix="fake_toolchain_")
    for name, body in (("pdflatex", FAKE_PDFLATEX), ("magick", FAKE_MAGICK)):
        p = os.path.join(bin_dir, name)
        with open(p, "w") as f:
            f.write(body)
        os.chmod(p, os.stat(p).st_mode | stat.S_IEXEC)
    os.environ["PATH"] = f"{bin_dir}:{os.environ['PATH']}"
    assert latex_toolchain_available()
    render.TIMEOUT = 120  # fake tools pay a multi-second numpy import on 1 vCPU

    buckets = Config("configs/data.json").buckets  # the reference 21-bucket table
    with open("data/train.formulas.norm.txt") as f:
        formulas = {i: l.strip() for i, l in zip(range(N_FORMULAS), f)}

    out = "data/images_drill_mock/"
    t0 = time.time()
    result = build_images(formulas, out, buckets=buckets, n_threads=4)
    ok = [r for r in result if r[0]]
    elapsed = time.time() - t0

    # incremental rebuild must skip everything already rendered
    t1 = time.time()
    result2 = build_images(formulas, out, buckets=buckets, n_threads=4)
    assert len([r for r in result2 if r[0]]) == len(ok)
    incr = time.time() - t1
    assert incr < elapsed / 5, (incr, elapsed)

    from PIL import Image

    shapes = {}
    for name, _ in ok:
        with Image.open(os.path.join(out, name)) as im:
            shapes[im.size] = shapes.get(im.size, 0) + 1
    print(json.dumps({
        "mock_toolchain_renders": len(ok),
        "failed": len(result) - len(ok),
        "wall_s": round(elapsed, 1),
        "incremental_rescan_s": round(incr, 1),
        "distinct_stored_shapes": len(shapes),
        "shapes": {f"{w}x{h}": c for (w, h), c in sorted(shapes.items())},
    }))


if __name__ == "__main__":
    main()
