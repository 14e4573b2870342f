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
@click.option("--images", "image_dir", default=None,
              help="Dir with .png requests (required for the benchmark "
                   "modes; unused in --http serve mode)")
@click.option("--qps", default=20.0)
@click.option("--duration", default=10.0, help="Benchmark duration (s)")
@click.option("--max-batch", default=16)
@click.option("--max-wait-ms", default=10.0)
@click.option("--http", "http_port", default=None, type=int,
              help="Serve mode: start the HTTP inference endpoint on this "
                   "port (POST /predict with PNG bytes -> {latex[, score]}; "
                   "GET /metrics, /healthz) and block until interrupted — "
                   "no benchmark. 0 picks an ephemeral port.")
@click.option("--http-bench", is_flag=True,
              help="Run the QPS benchmark over a REAL localhost HTTP "
                   "round-trip (PNG encode + socket + server queue + "
                   "decode) instead of in-process futures.")
@click.option("--with-scores", is_flag=True,
              help="Resolve predictions as {latex, score} (sequence "
                   "log-prob confidence) — server-wide.")
@click.option("--host", default="127.0.0.1", show_default=True,
              help="Bind address for --http (0.0.0.0 exposes remotely).")
@click.option("--quota", "quotas", multiple=True,
              help="Per-model QPS quota as name=qps (repeatable); requests "
                   "over a model's quota are shed with a fast failure "
                   "instead of starving the other routed models")
def main(results: str, extra_models, image_dir: str, qps: float, duration: float,
         max_batch: int, max_wait_ms: float, http_port, http_bench: bool,
         with_scores: bool, host: str, quotas) -> None:
    from ..utils.jax_setup import setup_jax

    setup_jax()
    from ..serving import (LatexOCRServer, run_http_qps_benchmark,
                           run_qps_benchmark)

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

    serve_mode = http_port is not None and not http_bench
    imgs, names = [], list(models)
    if not serve_mode:
        if image_dir is None:
            raise click.ClickException("--images is required for benchmarking")
        raw = [
            read_img(os.path.join(image_dir, f))
            for f in sorted(os.listdir(image_dir))
            if f.endswith(".png")
        ][:64]
        if not raw:
            raise click.ClickException(f"no .png files under {image_dir}")
        # spread the request mix round-robin across every registered model
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
        with_scores=with_scores,
    )
    if serve_mode:
        # serve mode: warm, bind, block (the reference has only a REPL —
        # this is the network surface clients actually integrate against)
        server.warmup()
        _, port = server.serve_http(port=http_port, host=host)
        click.echo(f"serving on http://{host}:{port}  "
                   f"(POST /predict, GET /metrics, GET /healthz)")
        import signal as _signal

        try:
            _signal.pause()
        except (KeyboardInterrupt, AttributeError):
            pass
        finally:
            server.close()
        return
    try:
        # precompile every (model, bucket, max_batch) decode program so the
        # benchmark tail carries no first-compile pollution; without a
        # bucket table, fall back to warming through live requests
        if server.warmup() == 0:
            for img, name in imgs[: 4 * len(names)]:
                server.submit(img, model=name).result(timeout=600)
            server.stats.clear()
        if http_bench:
            _, port = server.serve_http(port=0, host="127.0.0.1")
            stats = run_http_qps_benchmark(
                f"http://127.0.0.1:{port}", imgs, qps=qps, duration_s=duration)
        else:
            stats = run_qps_benchmark(server, imgs, qps=qps, duration_s=duration)
    finally:
        server.close()
    click.echo(json.dumps({k: round(v, 2) for k, v in stats.items()}))


if __name__ == "__main__":
    main()
