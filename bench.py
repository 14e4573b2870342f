"""Benchmark: training throughput (formula images/sec/chip) on real TPU.

Measures the full jitted train step (conv encoder + scan attention decoder,
fwd+bwd+adam, bf16 compute) on a representative im2latex bucket shape:
stored bucket (400, 100) -> (50, 200) images, formula length 64, batch 256.

Prints ONE JSON line with {"metric", "value", "unit", "vs_baseline"} plus
hardware-anchored context: executed TFLOP/s and MFU (fraction of the v5e
chip's 197 TFLOP/s bf16 peak), using XLA's own per-program cost analysis
so the FLOP count includes rematerialized recompute actually executed.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6);
its trainer is TF 1.12 feed_dict on a consumer GPU (reference README.md:231
narrates very slow training). We use 50 images/sec as the documented
reference estimate for this ~10M-param model on that setup, so
vs_baseline = value / 50.0. The BASELINE.json north star is >=10x.
"""

import json
import time

import numpy as np

V5E_BF16_PEAK_FLOPS = 197e12


def main(
    n_real_tokens: int = 500,
    decoder_arch: str = "transformer",
    transformer_config: dict = None,
    cell_type: str = "lstm",
    batch: int = 256,
) -> None:
    """``n_real_tokens`` defaults to 500 (the im2latex vocab scale, and the
    round-1 bench workload — kept for round-over-round comparability).
    Passing 509 (+3 specials = 512, what data/vocab.py:pad_vocab lane-aligns
    to) measures identically within the tunneled chip's wobble: XLA already
    pads the (dim_o, V) logits matmul to 512 lanes, so vocab lane alignment
    is throughput-neutral on this model (A/B measured 2026-08-17).

    The no-arg run measures the FLAGSHIP: the transformer 2L/8H/256d
    (declared round 4 — faster AND more accurate than the LSTM,
    RESULTS.md "r4: tuned transformer"). ``--lstm`` / ``--gru`` measure
    the reference-parity attn-RNN family at the same bucket shape."""
    from latex_ocr_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from latex_ocr_tpu.models.img2seq import Img2SeqModel
    from latex_ocr_tpu.utils import Config

    # --batch probes batch-size scaling; 256 stays the headline shape
    B, H, W, T = batch, 50, 200, 64

    # FLAGSHIP_MODEL is the transformer (r4 flagship declaration);
    # --lstm / --gru select the reference-parity attn-RNN family
    model_cfg = dict(
        ge.FLAGSHIP_MODEL if decoder_arch == "transformer" else ge.REFERENCE_MODEL
    )
    if cell_type != "lstm":  # --gru: attention-GRU recurrence A/B
        model_cfg["attn_cell_config"] = dict(
            model_cfg["attn_cell_config"], cell_type=cell_type)
    if decoder_arch == "transformer" and transformer_config:
        model_cfg["transformer_config"] = transformer_config
    config = Config(model_cfg)
    vocab = ge._make_vocab(n_real_tokens)
    model = Img2SeqModel(config, vocab, compute_dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)
    opt_state = model.init_optimizer(params, "adam", clip=-1)

    host_batch = ge._make_batch(B, H, W, T, vocab.n_tok, vocab.id_end)
    batch = {k: jax.device_put(v) for k, v in host_batch.items()}
    lr = jnp.float32(1e-3)

    # XLA's executed-FLOPs count for one train step (same donated
    # signature as the jitted call below so the program is identical)
    flops_per_step = None
    try:
        # the jit wrapper's .lower is not descriptor-bound; pass self
        lowered = type(model).train_step.lower(
            model, params, opt_state, batch, lr, jax.random.fold_in(rng, 0), 1.0
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass  # cost analysis is best-effort; throughput still reported

    # warm-up: compile + 10 steps to reach steady state; float() forces a
    # real device round-trip (block_until_ready returns early on the
    # tunneled axon backend)
    for i in range(10):
        params, opt_state, metrics = model.train_step(
            params, opt_state, batch, lr, jax.random.fold_in(rng, 1000 + i), 1.0
        )
    _ = float(metrics["loss"])

    # 8 timed rounds, keep the fastest: the tunneled chip is SHARED and
    # shows multi-second contention windows (measured invocation-to-
    # invocation spread 7.3k-8.1k img/s); steady-state throughput is the
    # max over enough rounds to catch a quiet window, not the mean
    n_steps = 30
    best_elapsed = None
    for _ in range(8):
        t0 = time.perf_counter()
        for i in range(n_steps):
            params, opt_state, metrics = model.train_step(
                params, opt_state, batch, lr, jax.random.fold_in(rng, i), 1.0
            )
        _ = float(metrics["loss"])  # single hard sync per round
        elapsed = time.perf_counter() - t0
        if best_elapsed is None or elapsed < best_elapsed:
            best_elapsed = elapsed
    elapsed = best_elapsed

    images_per_sec = B * n_steps / elapsed
    arch_tag = "" if decoder_arch == "attn_lstm" else f", {decoder_arch} decoder"
    if cell_type != "lstm":
        arch_tag += f", {cell_type} cell"
    if decoder_arch == "transformer" and transformer_config:
        arch_tag += " " + json.dumps(transformer_config, sort_keys=True)
    out = {
        "metric": f"train images/sec/chip (bucket 400x100, T={T}, B={B}, bf16{arch_tag})",
        "value": round(float(images_per_sec), 2),
        "unit": "images/sec",
        "vs_baseline": round(float(images_per_sec) / 50.0, 2),
        # the reference publishes no throughput (SURVEY.md §6); 50 img/s is
        # a documented ESTIMATE of its consumer-GPU TF1 trainer, so the
        # multiplier is an estimate — the absolute img/s and MFU above are
        # the measured, defensible numbers (scripts/bench_torch_reference.py
        # grounds the order of magnitude with a torch stand-in)
        "vs_baseline_note": "vs documented 50 img/s estimate, not a measurement",
    }
    if flops_per_step is not None:
        achieved = flops_per_step * n_steps / elapsed
        out["tflops_per_sec"] = round(achieved / 1e12, 1)
        out["mfu_pct"] = round(100.0 * achieved / V5E_BF16_PEAK_FLOPS, 1)
        out["gflops_per_image"] = round(flops_per_step / B / 1e9, 2)
    print(json.dumps(out))


def main_mix(data_dir: str = None, n_epochs: int = 2) -> None:
    """Epoch-mix bench (r4 VERDICT #3): throughput over a REAL dataset's
    full bucket mix, through the product cached pipeline, flagship model.

    Unlike the single-bucket headline (kept unchanged for round-over-round
    comparability), this measures what an actual training epoch delivers:
    every bucket shape at its real frequency, adaptive per-bucket batch
    sizes, host pipeline + H2D included. Epoch 0 warms the compile cache
    (one XLA program per (image-bucket, length-bucket, batch) shape);
    epochs 1+ are timed. Reports mixed img/s/chip, the FLOP-weighted MFU,
    and the padding-waste decomposition (batch fill / token padding /
    image-bucket padding)."""
    import os

    from latex_ocr_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from latex_ocr_tpu.data.fast_pipeline import build_cached_pipeline
    from latex_ocr_tpu.data.vocab import Vocab
    from latex_ocr_tpu.models.img2seq import Img2SeqModel
    from latex_ocr_tpu.utils import Config

    if data_dir is None:
        for cand in ("data/im2latexSyn", "data/im2latex2dSyn"):
            if os.path.exists(os.path.join(cand, "vocab.txt")):
                data_dir = cand
                break
        else:
            raise SystemExit(
                "no dataset found; run scripts/build_im2latex_syn.py or pass "
                "--mix-data DIR"
            )
    base = data_dir.rstrip("/") + "/"
    with open(base + "buckets.json") as f:
        buckets = json.load(f)
    max_len = 150
    config = Config(dict(
        ge.FLAGSHIP_MODEL,
        max_length_formula=max_len,
        path_vocab=base + "vocab.txt",
        unk="_UNK", pad="_PAD", end="_END",
    ))
    vocab = Vocab(config)
    model = Img2SeqModel(config, vocab, compute_dtype=jnp.bfloat16,
                         decoder_dtype=jnp.float32)
    pipeline = build_cached_pipeline(
        base + "train.formulas.norm.txt", base + "images_train/",
        base + "train.matching.txt", vocab.form_prepro, base + "cache_train",
        batch_size=256, id_pad=vocab.id_pad, id_end=vocab.id_end,
        max_len=max_len, buckets=buckets, max_formula_len=max_len + 1,
        length_bucket=32, target_batch_pixels=64 * 100 * 500,
        device_resident="auto",
    )
    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)
    opt_state = model.init_optimizer(params, "adam", clip=-1)
    lr = jnp.float32(1e-4)

    def one_epoch(params, opt_state):
        t0 = time.perf_counter()
        n_img = 0
        token_slots = 0
        real_tokens = 0
        batch_rows = 0
        shapes = {}
        step = 0
        metrics = None
        for batch in pipeline:
            n_real = int(batch.pop("n_real"))
            shape_key = (
                tuple(batch["image"].shape), int(batch["formula"].shape[1])
            )
            shapes[shape_key] = shapes.get(shape_key, 0) + 1
            params, opt_state, metrics = model.train_step(
                params, opt_state, batch, lr,
                jax.random.fold_in(rng, step), 1.0,
            )
            step += 1
            n_img += n_real
            batch_rows += batch["formula"].shape[0]
            token_slots += int(np.prod(batch["formula"].shape))
            real_tokens += int(np.asarray(batch["length"]).sum())
        if metrics is None:
            raise SystemExit(f"no batches from {data_dir} — empty dataset?")
        _ = float(metrics["loss"])  # hard sync
        return params, opt_state, (
            time.perf_counter() - t0, n_img, batch_rows, token_slots,
            real_tokens, shapes,
        )

    # epoch 0: compile warm-up (not timed)
    params, opt_state, (warm_s, n_img, *_rest) = one_epoch(params, opt_state)
    best = None
    for _ in range(max(1, n_epochs - 1)):
        params, opt_state, stats = one_epoch(params, opt_state)
        if best is None or stats[0] < best[0]:
            best = stats
    elapsed, n_img, batch_rows, token_slots, real_tokens, shapes = best

    # FLOP-weighted MFU: per-shape cost analysis; the persistent compile
    # cache (jax_setup) makes these re-lowers cheap after the warm epoch
    total_flops = 0.0
    have_all_costs = True
    for (img_shape, T), count in shapes.items():
        try:
            b = ge._make_batch(img_shape[0], img_shape[1], img_shape[2], T,
                               vocab.n_tok, vocab.id_end)
            dev = {k: jax.device_put(v) for k, v in b.items()}
            dev.pop("n_real", None)
            lowered = type(model).train_step.lower(
                model, params, opt_state, dev, lr, rng, 1.0)
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            total_flops += float(cost.get("flops", 0.0)) * count
        except Exception:
            have_all_costs = False
            break

    # image-bucket padding waste: ink-bbox area vs stored bucket area over
    # a sample of the actual training images
    import glob

    from PIL import Image

    img_paths = sorted(glob.glob(base + "images_train/*.png"))
    rng_np = np.random.default_rng(0)
    sample = rng_np.choice(len(img_paths), min(300, len(img_paths)),
                           replace=False)
    ink_area = bucket_area = 0
    for i in sample:
        arr = np.asarray(Image.open(img_paths[int(i)]).convert("L"))
        ys, xs = np.where(arr != 255)
        if ys.size:
            ink_area += int((ys.max() - ys.min() + 1)) * int(
                (xs.max() - xs.min() + 1))
        bucket_area += arr.shape[0] * arr.shape[1]

    out = {
        "metric": f"epoch-mix train images/sec/chip ({data_dir}, "
                  f"{len(shapes)} shapes, cached pipeline, flagship)",
        "value": round(n_img / elapsed, 2),
        "unit": "images/sec",
        "vs_baseline": round(n_img / elapsed / 50.0, 2),
        "epoch_images": n_img,
        "epoch_seconds": round(elapsed, 2),
        "warmup_seconds": round(warm_s, 2),
        "batch_fill_pct": round(100.0 * n_img / batch_rows, 1),
        "token_pad_waste_pct": round(100.0 * (1 - real_tokens / token_slots), 1),
        "image_bucket_waste_pct": round(100.0 * (1 - ink_area / bucket_area), 1),
    }
    if have_all_costs and total_flops:
        out["tflops_per_sec"] = round(total_flops / elapsed / 1e12, 1)
        out["weighted_mfu_pct"] = round(
            100.0 * total_flops / elapsed / V5E_BF16_PEAK_FLOPS, 1)
    print(json.dumps(out))


def main_dp_scaling(n_devices: int) -> None:
    """DP weak-scaling on an n-device mesh: per-chip batch held fixed,
    throughput measured on a 1-device mesh vs the full mesh. Real pods are
    not reachable from this host, so the mesh is the virtual CPU platform
    (``--xla_force_host_platform_device_count``) — the numbers measure the
    sharded program's *scaling efficiency* (collective + infeed overhead),
    not TPU img/s; absolute chip throughput is the default bench. Re-execs
    itself under a forced CPU platform when the current backend can't host
    the mesh (same pattern as __graft_entry__.dryrun_multichip)."""
    import os
    import subprocess
    import sys

    probe = subprocess.run(  # cheap check without initializing jax here
        [sys.executable, "-c", "import jax; print(jax.device_count())"],
        capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "")),
    )
    have = int(probe.stdout.strip() or 0) if probe.returncode == 0 else 0
    if have < n_devices:
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=f"--xla_force_host_platform_device_count={n_devices}",
            LATEX_OCR_PLATFORM="cpu",
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--devices", str(n_devices)],
            env=env, text=True, timeout=1800,
        )
        sys.exit(proc.returncode)

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from latex_ocr_tpu.models.img2seq import Img2SeqModel
    from latex_ocr_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from latex_ocr_tpu.utils import Config

    # flagship architecture, CPU-sized shapes; fp32 (CPU bf16 is emulated)
    B_per, H, W, T = 8, 64, 128, 16
    config = Config(dict(ge.FLAGSHIP_MODEL, max_length_formula=T - 1))
    vocab = ge._make_vocab(100)
    model = Img2SeqModel(config, vocab)

    def measure(n: int) -> float:
        mesh = make_mesh(jax.devices()[:n])
        params = replicate(model.init_params(jax.random.PRNGKey(0)), mesh)
        opt_state = replicate(model.init_optimizer(params, "adam", clip=-1), mesh)
        host = ge._make_batch(B_per * n, H, W, T, vocab.n_tok, vocab.id_end)
        batch = shard_batch(host, mesh)
        lr = jnp.float32(1e-3)
        rng = jax.random.PRNGKey(1)
        p, o = params, opt_state
        for i in range(3):  # compile + settle
            p, o, m = model.train_step(p, o, batch, lr, jax.random.fold_in(rng, i), 1.0)
        _ = float(m["loss"])
        n_steps = 8
        t0 = time.perf_counter()
        for i in range(n_steps):
            p, o, m = model.train_step(p, o, batch, lr, jax.random.fold_in(rng, i), 1.0)
        _ = float(m["loss"])
        return B_per * n * n_steps / (time.perf_counter() - t0)

    one = measure(1)
    full = measure(n_devices)
    # this host has few physical cores, so an N-device CPU mesh largely
    # SERIALIZES the per-device compute — raw weak-scaling efficiency would
    # measure core starvation, not the sharded program. The meaningful
    # number here is overhead vs perfectly-serialized: N devices do N x the
    # total work, so tN ~= N * t1 is the no-overhead ideal on one core;
    # value > 100% means the mesh program plus collectives cost LESS than
    # N serial steps (leftover parallelism), < 100% means collective/
    # relayout overhead. Real ICI scaling needs real chips.
    eff_serialized = 100.0 * (full / one) / 1.0  # full/one == N*t1/tN scaled
    print(json.dumps({
        "metric": f"DP sharded-program efficiency vs serialized ideal "
                  f"({n_devices}-device virtual CPU mesh, per-chip batch {B_per})",
        "value": round(eff_serialized, 1),
        "unit": "%",
        "vs_baseline": round(full / one, 2),
        "img_per_sec_1dev": round(one, 2),
        f"img_per_sec_{n_devices}dev": round(full, 2),
    }))


if __name__ == "__main__":
    import sys

    argv = sys.argv[1:]
    if "--mix" in argv:
        argv.remove("--mix")
        mix_data = None
        if "--mix-data" in argv:
            i = argv.index("--mix-data")
            if i + 1 >= len(argv):
                raise SystemExit("--mix-data needs a directory argument")
            mix_data = argv[i + 1]
        main_mix(mix_data)
        sys.exit(0)
    batch = 256
    if "--batch" in argv:
        i = argv.index("--batch")
        batch = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--devices" in argv:
        if batch != 256:
            print("note: --batch is ignored with --devices (the DP-scaling "
                  "bench uses a fixed per-chip batch)", file=sys.stderr)
        i = argv.index("--devices")
        main_dp_scaling(int(argv[i + 1]))
        sys.exit(0)
    tf_cfg = None
    if "--transformer-config" in argv:
        i = argv.index("--transformer-config")
        tf_cfg = json.loads(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    # flagship default = transformer (r4); --lstm / --gru select the
    # reference-parity attn-RNN family ("--transformer" kept as a no-op
    # alias for round-over-round script compatibility)
    arch = "attn_lstm" if ("--lstm" in argv or "--gru" in argv) else "transformer"
    cell = "gru" if "--gru" in argv else "lstm"
    args = [a for a in argv if a not in ("--transformer", "--lstm", "--gru")]
    main(int(args[0]) if args else 500, decoder_arch=arch,
         transformer_config=tf_cfg, cell_type=cell, batch=batch)
