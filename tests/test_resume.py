"""Checkpoint resume: training N epochs equals training k, restarting, and
training N-k more (deterministic data order + restored opt state)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latex_ocr_tpu.data.fast_pipeline import build_cached_pipeline
from latex_ocr_tpu.data.vocab import Vocab
from latex_ocr_tpu.models.img2seq import Img2SeqModel
from latex_ocr_tpu.training.trainer import Trainer
from latex_ocr_tpu.utils import Config, LRSchedule

TINY = {
    "encoder_cnn": "vanilla", "positional_embeddings": True,
    "attn_cell_config": {"cell_type": "lstm", "num_units": 16, "dim_e": 8,
                          "dim_o": 16, "dim_embeddings": 8},
    "decoding": "greedy", "max_length_formula": 20,
}


@pytest.mark.slow
def test_exact_resume(mini_dataset, tmp_path):
    vocab = Vocab(Config({"unk": "_UNK", "pad": "_PAD", "end": "_END",
                          "path_vocab": mini_dataset["path_vocab"]}))

    def pipe(cache_tag):
        return build_cached_pipeline(
            mini_dataset["path_formulas_train"],
            mini_dataset["dir_images_train"],
            mini_dataset["path_matching_train"],
            vocab.form_prepro,
            str(tmp_path / f"cache_{cache_tag}"),
            batch_size=8, id_pad=vocab.id_pad, id_end=vocab.id_end,
            max_len=20, buckets=mini_dataset["buckets"],
            max_formula_len=21, shuffle_seed=7,
        )

    def run(out_dir, n_epochs, tag):
        config = Config(dict(TINY, batch_size=8, n_epochs=n_epochs, dropout=1.0,
                             clip=-1, lr_method="adam",
                             buckets=mini_dataset["buckets"], seed=3))
        model = Img2SeqModel(config, vocab)
        trainer = Trainer(model, config, out_dir)
        trainer.train(pipe(tag), pipe(tag + "v"), LRSchedule(lr_init=1e-3))
        return trainer._final_params

    # NOTE: keep-best checkpointing saves only on score improvement, so for
    # a determinism test every epoch must improve — tiny model + few epochs
    # makes that reliable; if flaky, this documents the contract.
    p_straight = run(str(tmp_path / "a/"), 2, "a")

    # interrupted: 1 epoch, then resume for the remaining 1 in the same dir
    run(str(tmp_path / "b/"), 1, "b")
    p_resumed = run(str(tmp_path / "b/"), 2, "b2")

    for x, y in zip(jax.tree_util.tree_leaves(p_straight),
                    jax.tree_util.tree_leaves(p_resumed)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6)


def test_warm_start_init_params_and_fresh_host_state(mini_dataset, tmp_path):
    """Warm starts transfer weights WITHOUT the donor's host state.

    Regression for the round-2 bug where fine-tune scripts copied the
    donor's checkpoint dir: the inherited best_score (from the easier
    donor task) was unbeatable, so keep-best never saved and the "trained"
    run silently kept the donor weights. The supported pattern is now
    Trainer.train(init_params=donor_params) into a fresh dir: the new run
    must (a) start from the donor weights, (b) start at epoch 0 with
    best_score None so the first validation always saves.
    """
    import os

    from latex_ocr_tpu.training.checkpoint import CheckpointManager

    vocab = Vocab(Config({"path_vocab": mini_dataset["path_vocab"],
                          "unk": "_UNK", "pad": "_PAD", "end": "_END"}))

    def pipe(tag):
        return build_cached_pipeline(
            mini_dataset["path_formulas_train"],
            mini_dataset["dir_images_train"],
            mini_dataset["path_matching_train"],
            vocab.form_prepro,
            str(tmp_path / f"cache_w{tag}"),
            batch_size=8, id_pad=vocab.id_pad, id_end=vocab.id_end,
            max_len=20, buckets=mini_dataset["buckets"],
            max_formula_len=21, shuffle_seed=7,
        )

    config = Config(dict(TINY, batch_size=8, n_epochs=1, dropout=1.0,
                         clip=-1, lr_method="adam",
                         buckets=mini_dataset["buckets"], seed=3))
    model = Img2SeqModel(config, vocab)

    # donor run: 1 epoch, saves a checkpoint with a (good) best_score
    donor = Trainer(model, config, str(tmp_path / "donor/"))
    donor.train(pipe("d"), pipe("dv"), LRSchedule(lr_init=1e-3))
    donor_params = donor._final_params

    # warm start into a fresh dir; n_epochs=0 -> train loop never runs, so
    # _final_params IS the initialized tree: must equal the donor weights
    cfg0 = Config(dict(TINY, batch_size=8, n_epochs=0, dropout=1.0,
                       clip=-1, lr_method="adam",
                       buckets=mini_dataset["buckets"], seed=99))
    t0 = Trainer(model, cfg0, str(tmp_path / "ft0/"))
    t0.train(pipe("f0"), pipe("f0v"), LRSchedule(lr_init=1e-3),
             init_params=donor_params)
    for a, b in zip(jax.tree_util.tree_leaves(t0._final_params),
                    jax.tree_util.tree_leaves(donor_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # real warm-started run: must SAVE (fresh best_score) even though the
    # donor's score would have been better
    t1 = Trainer(model, config, str(tmp_path / "ft1/"))
    t1.train(pipe("f1"), pipe("f1v"), LRSchedule(lr_init=1e-3),
             init_params=donor_params)
    steps = CheckpointManager(
        os.path.join(str(tmp_path / "ft1/"), "model_weights")
    )
    restored = steps.restore_params(model.init_params(jax.random.PRNGKey(0)))
    assert restored is not None, "warm-started run never checkpointed"


@pytest.mark.slow
def test_ema_published_weights_and_resume(mini_dataset, tmp_path):
    """`ema_decay`: the checkpoint's `params` are the Polyak average (what
    eval selected, what predict/serving restore), raw weights ride along
    as `raw_params`, and a resumed run continues from the raw trajectory."""
    from latex_ocr_tpu.training.checkpoint import CheckpointManager

    vocab = Vocab(Config({"unk": "_UNK", "pad": "_PAD", "end": "_END",
                          "path_vocab": mini_dataset["path_vocab"]}))

    def pipe(cache_tag):
        return build_cached_pipeline(
            mini_dataset["path_formulas_train"],
            mini_dataset["dir_images_train"],
            mini_dataset["path_matching_train"],
            vocab.form_prepro,
            str(tmp_path / f"cache_{cache_tag}"),
            batch_size=8, id_pad=vocab.id_pad, id_end=vocab.id_end,
            max_len=20, buckets=mini_dataset["buckets"],
            max_formula_len=21, shuffle_seed=7,
        )

    out = str(tmp_path / "ema/")

    def run(n_epochs, tag):
        config = Config(dict(TINY, batch_size=8, n_epochs=n_epochs, dropout=1.0,
                             clip=-1, lr_method="adam", ema_decay=0.9,
                             buckets=mini_dataset["buckets"], seed=3))
        model = Img2SeqModel(config, vocab)
        trainer = Trainer(model, config, out)
        trainer.train(pipe(tag), pipe(tag + "v"), LRSchedule(lr_init=1e-3))
        return model, trainer

    model, trainer = run(1, "e")

    ckpt = CheckpointManager(os.path.join(out, "model_weights"))
    params_like = model.init_params(jax.random.PRNGKey(0))
    opt_like = model.init_optimizer(params_like)
    extra_like = {"best_score": 0.0, "global_step": 0, "lr": 0.0,
                  "score": 0.0, "n_no_improvement": 0}
    got = ckpt.restore(params_like, opt_like, extra_like=extra_like,
                       raw_like=params_like)
    ckpt.close()
    assert got is not None
    published, _, _, _, raw = got
    assert raw is not None
    # published = EMA, raw = optimizer trajectory — genuinely different
    p_leaves = jax.tree_util.tree_leaves(published)
    r_leaves = jax.tree_util.tree_leaves(raw)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(p_leaves, r_leaves)
    )
    # _final_params are the published (EMA) weights
    for a, b in zip(jax.tree_util.tree_leaves(trainer._final_params), p_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # resume one more epoch: restores raw for training, ema for publishing
    run(2, "e2")


@pytest.mark.slow
def test_sigkill_midepoch_resume_bit_identical(mini_dataset, tmp_path):
    """r4 VERDICT #5: step-granular save-latest + exact mid-epoch resume.

    Run A trains 3 epochs uninterrupted. Run B is SIGKILLed (real kill -9,
    no flush) mid-epoch-2, between two save-latest points, then restarted.
    The resumed trajectory must be bit-identical: every metrics.jsonl loss
    at the same global step matches A exactly, and the final published
    checkpoint params are bitwise equal.
    """
    import json as _json
    import subprocess
    import sys

    def vocab_for(ds):
        return Vocab(Config({"unk": "_UNK", "pad": "_PAD", "end": "_END",
                             "path_vocab": ds["path_vocab"]}))

    worker = os.path.join(os.path.dirname(__file__), "_sigkill_worker.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu", LATEX_OCR_NO_TB="1")
    # single-device: the parent's 8-device XLA_FLAGS would shard the
    # subprocess differently than the in-process fixtures expect
    env["XLA_FLAGS"] = ""

    def spec(out, cache, die_after):
        p = tmp_path / f"spec_{os.path.basename(out)}.json"
        p.write_text(_json.dumps({
            "dataset": mini_dataset, "out": str(tmp_path / out),
            "cache": str(tmp_path / cache), "n_epochs": 3,
            "save_every": 2, "die_after_steps": die_after,
        }))
        return str(p)

    def run(spec_path, expect_dead=False):
        proc = subprocess.run(
            [sys.executable, worker, spec_path],
            capture_output=True, text=True, timeout=900, env=env,
            cwd=os.path.dirname(os.path.dirname(worker)),
        )
        if expect_dead:
            assert proc.returncode == -signal.SIGKILL, (
                proc.returncode, proc.stdout[-500:], proc.stderr[-800:])
        else:
            assert proc.returncode == 0, (
                proc.stdout[-500:], proc.stderr[-1500:])
        return proc

    import signal

    # A: uninterrupted
    run(spec("runA", "cacheA", 0))
    rows_a = [_json.loads(l) for l in open(tmp_path / "runA" / "metrics.jsonl")
              if '"loss"' in l]
    steps_a = {r["step"]: r for r in rows_a}

    # B: kill inside epoch 2 with the last save-latest strictly mid-epoch
    # (save_every=2 => an even step in (nb, nb+4) always saved)
    nb = len(build_cached_pipeline(
        mini_dataset["path_formulas_train"], mini_dataset["dir_images_train"],
        mini_dataset["path_matching_train"], vocab_for(mini_dataset).form_prepro,
        str(tmp_path / "cache_len"), batch_size=8,
        id_pad=0, id_end=1, max_len=20, buckets=mini_dataset["buckets"],
        max_formula_len=21, shuffle_seed=7))
    die_at = nb + 4
    assert die_at < 3 * nb or nb < 3  # kill lands before training ends
    run(spec("runB", "cacheB", die_at), expect_dead=True)
    assert os.path.isdir(tmp_path / "runB" / "model_weights_latest")

    # resume B to completion
    proc = run(spec("runB", "cacheB2", 0))
    log = open(tmp_path / "runB" / "model.log").read()
    assert "Restored save-latest stream" in log
    assert "Mid-epoch resume: skipping" in log

    # metrics trajectory: for every step B logged, the loss equals A's
    # bit for bit (dedupe keep-last: the killed attempt's rows between the
    # last save and the kill are legitimately re-written on replay)
    rows_b = [_json.loads(l) for l in open(tmp_path / "runB" / "metrics.jsonl")
              if '"loss"' in l]
    steps_b = {}
    for r in rows_b:
        steps_b[r["step"]] = r
    assert set(steps_b) == set(steps_a)
    for s in sorted(steps_a):
        assert steps_b[s]["loss"] == steps_a[s]["loss"], (
            s, steps_b[s]["loss"], steps_a[s]["loss"])

    # final published checkpoint: bitwise equal
    from latex_ocr_tpu.training.checkpoint import CheckpointManager

    vocab = Vocab(Config({"unk": "_UNK", "pad": "_PAD", "end": "_END",
                          "path_vocab": mini_dataset["path_vocab"]}))
    # TINY here matches the worker's model config by construction
    config = Config(dict(TINY, buckets=mini_dataset["buckets"]))
    model = Img2SeqModel(config, vocab)
    like = model.init_params(jax.random.PRNGKey(0))
    pa = CheckpointManager(str(tmp_path / "runA" / "model_weights")).restore_params(like)
    pb = CheckpointManager(str(tmp_path / "runB" / "model_weights")).restore_params(like)
    for a, b in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_params_numpy_fallback_and_error_passthrough(tmp_path):
    """ADVICE r4 #3: the cross-platform numpy fallback in restore_params
    (a) actually works against the current orbax layout — catching API
    drift — and (b) is ONLY taken for device/sharding errors: an
    unrelated ValueError surfaces instead of entering the untested path.
    """
    from latex_ocr_tpu.training.checkpoint import CheckpointManager

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    opt = {"m": jnp.zeros((3,))}
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, params, opt, extra={"best_score": 1.0})
    mgr.close()

    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))

    # (a) force the device-mismatch branch: the wrapped restore raises a
    # sharding error, the numpy fallback must still return trained leaves
    orig_restore = mgr2._mgr.restore

    def explode(step, *a, **k):
        raise ValueError("Device sharding refers to an unavailable device")

    mgr2._mgr.restore = explode
    got = mgr2.restore_params()
    assert got is not None
    np.testing.assert_array_equal(np.asarray(got["w"]),
                                  np.arange(6.0).reshape(2, 3))

    # (b) unrelated ValueErrors surface, not rerouted
    def explode_other(step, *a, **k):
        raise ValueError("user tree structure mismatch at key 'w'")

    mgr2._mgr.restore = explode_other
    with pytest.raises(ValueError, match="structure mismatch"):
        mgr2.restore_params()
    mgr2._mgr.restore = orig_restore
    mgr2.close()


def test_save_async_duplicate_step_is_noop(tmp_path):
    """Epoch boundaries landing on a save_every_steps multiple request the
    SAME step twice (the second request races the first's async commit);
    orbax raises StepAlreadyExistsError for committed duplicates, so
    save_async must treat a repeated step as a no-op — in-flight
    (tracked via _last_async_step) and committed (all_steps) alike."""
    import jax.numpy as jnp

    from latex_ocr_tpu.training.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "latest"), max_to_keep=2)
    params = {"w": jnp.ones((2, 2))}
    opt = {"m": jnp.zeros((2, 2))}
    mgr.save_async(10, params, opt, extra={"epoch": 1})
    # duplicate request while the first may still be in flight
    mgr.save_async(10, params, opt, extra={"epoch": 1})
    mgr._mgr.wait_until_finished()
    # duplicate request after commit (fresh manager: no in-flight marker)
    mgr2 = CheckpointManager(str(tmp_path / "latest"), max_to_keep=2)
    mgr2.save_async(10, params, opt, extra={"epoch": 1})
    mgr2._mgr.wait_until_finished()
    assert mgr2.latest_epoch() == 10
    # a NEW step still saves
    mgr2.save_async(11, params, opt, extra={"epoch": 1})
    mgr2._mgr.wait_until_finished()
    assert mgr2.latest_epoch() == 11
