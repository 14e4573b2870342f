"""`serve` CLI: dynamic-batching inference benchmark at fixed QPS.

Loads a trained run and serves a request mix sampled from an image
directory through the bucket-aware dynamic batcher, reporting latency
percentiles and achieved QPS (BASELINE.json config #5).
"""

from __future__ import annotations

import json
import os

import click

from ..data.images import greyscale, read_img
from ..utils import Config
from .common import make_vocab
from .predict_cli import load_model


@click.command()
@click.option("--results", default="results/small/")
@click.option("--model", "extra_models", multiple=True,
              help="Extra routed models as name=results_dir (repeatable); "
                   "benchmark requests are spread round-robin across the "
                   "primary --results model ('default') and every extra name")
@click.option("--images", "image_dir", required=True, help="Dir with .png requests")
@click.option("--qps", default=20.0)
@click.option("--duration", default=10.0, help="Benchmark duration (s)")
@click.option("--max-batch", default=16)
@click.option("--max-wait-ms", default=10.0)
@click.option("--quota", "quotas", multiple=True,
              help="Per-model QPS quota as name=qps (repeatable); requests "
                   "over a model's quota are shed with a fast failure "
                   "instead of starving the other routed models")
def main(results: str, extra_models, image_dir: str, qps: float, duration: float,
         max_batch: int, max_wait_ms: float, quotas) -> None:
    from ..utils.jax_setup import setup_jax

    setup_jax()
    from ..serving import LatexOCRServer, run_qps_benchmark

    model, params = load_model(results)
    models = {"default": (model, params)}
    for spec in extra_models:
        if "=" not in spec:
            raise click.ClickException(f"--model expects name=results_dir, got {spec!r}")
        name, rdir = spec.split("=", 1)
        if name in models:
            raise click.ClickException(
                f"duplicate model name {name!r} ('default' is the --results model)"
            )
        models[name] = load_model(rdir)
    buckets = None
    if os.path.exists(os.path.join(results, "data.json")) or os.path.exists(
        os.path.join(results, "config.json")
    ):
        buckets = Config.from_run_dir(results, parts=("data.json",)).get("buckets")

    raw = [
        read_img(os.path.join(image_dir, f))
        for f in sorted(os.listdir(image_dir))
        if f.endswith(".png")
    ][:64]
    if not raw:
        raise click.ClickException(f"no .png files under {image_dir}")
    # spread the request mix round-robin across every registered model
    names = list(models)
    imgs = [(img, names[i % len(names)]) for i, img in enumerate(raw)]

    quota_map = {}
    for spec in quotas:
        if "=" not in spec:
            raise click.ClickException(f"--quota expects name=qps, got {spec!r}")
        name, rate = spec.split("=", 1)
        if name not in models:
            raise click.ClickException(
                f"--quota for unknown model {name!r}; have {sorted(models)}"
            )
        quota_map[name] = float(rate)

    server = LatexOCRServer(
        models=models, buckets=buckets, max_batch=max_batch,
        max_wait_ms=max_wait_ms, quotas=quota_map or None,
    )
    try:
        # precompile every (model, bucket, max_batch) decode program so the
        # benchmark tail carries no first-compile pollution; without a
        # bucket table, fall back to warming through live requests
        if server.warmup() == 0:
            for img, name in imgs[: 4 * len(names)]:
                server.submit(img, model=name).result(timeout=600)
            server.stats.clear()
        stats = run_qps_benchmark(server, imgs, qps=qps, duration_s=duration)
    finally:
        server.close()
    click.echo(json.dumps({k: round(v, 2) for k, v in stats.items()}))


if __name__ == "__main__":
    main()
