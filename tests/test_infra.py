"""Unit tests for config, LR schedule, vocab, padding, image utils.

Golden behaviors derived from the reference semantics (SURVEY.md §2):
warm-up/decay windows, vocab special-token ordering, pad/END contract.
"""

import json
import math
import os

import numpy as np
import pytest

from latex_ocr_tpu.utils import Config, LRSchedule, minibatches
from latex_ocr_tpu.data.vocab import (
    Vocab,
    get_form_prepro,
    load_tok_to_id,
    pad_batch_formulas,
    truncate_end,
    write_vocab,
)
from latex_ocr_tpu.data.images import (
    get_max_shape,
    get_new_size,
    greyscale,
    pad_batch_images,
)


# ---------------------------------------------------------------- config
def test_config_merge_and_override(tmp_path):
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({"export_name": "a.json", "x": 1, "y": 2}))
    b.write_text(json.dumps({"export_name": "b.json", "y": 3, "z": 4}))
    cfg = Config([str(a), str(b)])
    assert cfg.x == 1 and cfg.y == 3 and cfg.z == 4

    out = tmp_path / "run"
    cfg.save(str(out))
    assert sorted(os.listdir(out)) == ["a.json", "b.json"]
    # reloading the snapshot reproduces the merged view
    cfg2 = Config([str(out / "a.json"), str(out / "b.json")])
    assert cfg2.y == 3


def test_config_dict_source():
    cfg = Config({"batch_size": 8})
    assert cfg.batch_size == 8
    assert cfg.get("missing", 42) == 42


# ---------------------------------------------------------------- lr schedule
def test_lr_warmup_then_decay():
    s = LRSchedule(lr_init=1e-3, lr_min=1e-4, start_decay=10, end_decay=20,
                   lr_warm=1e-5, end_warm=5)
    assert s.lr == 1e-5
    s.update(batch_no=5)
    assert s.lr == 1e-3  # warm-up ends: back to lr_init
    for b in range(6, 21):
        s.update(batch_no=b)
    assert s.lr == pytest.approx(1e-4, rel=1e-6)  # decayed to lr_min at end_decay
    s.update(batch_no=100)
    assert s.lr >= 1e-4  # floored


def test_lr_score_decay_and_early_stop():
    s = LRSchedule(lr_init=1.0, lr_min=1e-8, decay_rate=0.5, early_stopping=2)
    s.update(score=10.0)
    assert s.lr == 1.0  # first score: no previous to compare
    s.update(score=9.0)
    assert s.lr == 0.5
    assert not s.stop_training
    s.update(score=8.0)
    assert s.lr == 0.25
    assert s.stop_training
    s2 = LRSchedule(lr_init=1.0, decay_rate=0.5)
    s2.update(score=1.0)
    s2.update(score=2.0)  # improvement: untouched
    assert s2.lr == 1.0


def test_lr_state_dict_roundtrip_mid_decay():
    """A schedule restored from state_dict continues the exact trajectory
    (lr after score-decay events is multiplicative and cannot be recomputed
    from batch_no alone)."""
    mk = lambda: LRSchedule(lr_init=1.0, lr_min=1e-8, decay_rate=0.5,
                            early_stopping=3)
    a = mk()
    a.update(score=10.0)
    a.update(score=9.0)   # decay event
    a.update(score=8.5)   # decay event
    b = mk()
    b.load_state_dict(a.state_dict())
    for s in (a, b):
        s.update(score=8.0)
    assert a.lr == b.lr
    assert a.stop_training == b.stop_training
    assert a.state_dict() == b.state_dict()


def test_checkpoint_extra_roundtrip(tmp_path):
    """Host state (best_score, LRSchedule counters) survives save/restore."""
    import numpy as np

    from latex_ocr_tpu.training.checkpoint import CheckpointManager

    params = {"w": np.ones((2, 2), np.float32)}
    opt = {"m": np.zeros((2, 2), np.float32)}
    extra = {"best_score": -1.25, "global_step": 17, "lr": 5e-4,
             "score": -1.25, "n_no_improvement": 2}
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save(3, params, opt, extra=extra)
    restored = ckpt.restore(params, opt, extra_like={k: type(v)() for k, v in extra.items()})
    ckpt.close()
    assert restored is not None
    _, _, got, epoch, raw = restored
    assert raw is None  # no raw_params item saved (EMA off)
    assert epoch == 3
    assert got["global_step"] == 17
    assert got["n_no_improvement"] == 2
    assert float(got["best_score"]) == -1.25
    assert float(got["lr"]) == 5e-4


# ---------------------------------------------------------------- vocab
def test_vocab_special_tokens_appended(tmp_path):
    vocab_file = tmp_path / "vocab.txt"
    write_vocab(["a", "b", "x"], str(vocab_file))
    cfg = Config({"unk": "_UNK", "pad": "_PAD", "end": "_END",
                  "path_vocab": str(vocab_file), "min_count_tok": 0})
    v = Vocab(cfg)
    assert v.n_tok == 6
    assert v.tok_to_id == {"a": 0, "b": 1, "x": 2, "_UNK": 3, "_PAD": 4, "_END": 5}
    assert (v.id_unk, v.id_pad, v.id_end) == (3, 4, 5)
    assert v.form_prepro("a x zzz") == [0, 2, 3]


def test_load_tok_to_id_no_trailing_newline(tmp_path):
    p = tmp_path / "v.txt"
    p.write_text("a\nb\nc")  # write_vocab contract: no trailing newline
    assert load_tok_to_id(str(p), ["_END"]) == {"a": 0, "b": 1, "c": 2, "_END": 3}


def test_pad_batch_formulas_contract():
    batch, lengths = pad_batch_formulas([[5, 6], [7]], id_pad=0, id_end=9)
    assert batch.shape == (2, 3)  # max_len + 1
    np.testing.assert_array_equal(batch, [[5, 6, 9], [7, 9, 0]])
    np.testing.assert_array_equal(lengths, [3, 2])
    # explicit max_len
    batch2, _ = pad_batch_formulas([[5]], id_pad=0, id_end=9, max_len=4)
    assert batch2.shape == (1, 5)


def test_truncate_end():
    assert truncate_end([3, 1, 9, 5], id_end=9) == [3, 1]
    assert truncate_end([9], id_end=9) == []
    assert truncate_end([1, 2], id_end=9) == [1, 2]


def test_form_prepro_unknown_maps_to_unk():
    prepro = get_form_prepro({"a": 0}, id_unk=7)
    assert prepro(" a q ") == [0, 7]


# ---------------------------------------------------------------- images
def test_greyscale_luma_and_passthrough():
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[..., 1] = 255  # pure green
    g = greyscale(rgb)
    assert g.shape == (2, 2, 1)
    assert int(g[0, 0, 0]) == int(255 * 0.587)
    # grayscale input passthrough
    plain = np.full((3, 4), 7, dtype=np.uint8)
    assert greyscale(plain).shape == (3, 4, 1)


def test_pad_batch_images_white_padding():
    imgs = [np.zeros((2, 3, 1), np.uint8), np.zeros((4, 2, 1), np.uint8)]
    assert get_max_shape(imgs) == [4, 3, 1]
    batch = pad_batch_images(imgs)
    assert batch.shape == (2, 4, 3, 1)
    assert batch.dtype == np.uint8
    assert batch[0, 3, 0, 0] == 255  # padded region is white
    assert batch[0, 1, 2, 0] == 0


def test_get_new_size_bucket_snap():
    buckets = [(240, 100), (320, 80), (400, 100)]
    assert get_new_size((230, 90), buckets) == (240, 100)
    assert get_new_size((250, 70), buckets) == (320, 80)
    assert get_new_size((999, 999), buckets) == (999, 999)  # no fit: keep


# ---------------------------------------------------------------- minibatches
def test_minibatches_partial_tail():
    data = [(i, -i) for i in range(5)]
    batches = list(minibatches(iter(data), 2))
    assert [len(b[0]) for b in batches] == [2, 2, 1]
    assert batches[2] == ([4], [-4])


def test_lr_cosine_decay():
    s = LRSchedule(lr_init=1.0, lr_min=0.0, start_decay=0, end_decay=100,
                   decay_mode="cosine")
    s.update(batch_no=50)
    assert abs(s.lr - 0.5) < 1e-9  # half way through the cosine
    s.update(batch_no=100)
    assert s.lr == 0.0
    s.update(batch_no=1000)
    assert s.lr == 0.0  # clamped past the window


def test_adamax_optimizer_available():
    from latex_ocr_tpu.models.img2seq import make_optimizer

    import jax.numpy as jnp

    tx = make_optimizer("adamax", clip=1.0)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones(3)}, state, params)
    assert updates["w"].shape == (3,)


def test_build_vocab_from_file_char_level(tmp_path):
    from latex_ocr_tpu.data.vocab import build_vocab_from_file

    p = tmp_path / "f.txt"
    p.write_text("aab\nabc\n")
    # char counts: a=4, b=2, c=1
    assert build_vocab_from_file([str(p)], min_count=2) == ["a", "b"]
    assert build_vocab_from_file([str(p)], min_count=5) == []


def test_pad_vocab_lane_alignment():
    """pad_vocab pads with reserved tokens so file tokens + 3 specials hit
    the requested multiple; multiple<=1 is a no-op; already-aligned stays."""
    from latex_ocr_tpu.data.vocab import pad_vocab

    base = [f"t{i}" for i in range(335)]
    padded = pad_vocab(base, 128)
    assert (len(padded) + 3) % 128 == 0
    assert padded[: len(base)] == base  # ids of real tokens unchanged
    assert all(t.startswith("_RSV") for t in padded[len(base):])
    assert pad_vocab(base, 1) == base
    aligned = [f"t{i}" for i in range(125)]  # 125 + 3 == 128
    assert pad_vocab(aligned, 128) == aligned


def test_config_from_run_dir_fallback(tmp_path):
    """CLI-trained runs restore from data/vocab/model.json; script-trained
    runs (single dict source snapshotted as config.json) restore via the
    fallback; the 3-file layout wins when both exist."""
    import json

    from latex_ocr_tpu.utils import Config

    run = tmp_path / "run"
    run.mkdir()
    (run / "config.json").write_text(json.dumps({"a": 1, "batch_size": 9}))
    cfg = Config.from_run_dir(str(run))
    assert cfg.a == 1 and cfg.batch_size == 9

    for name, body in (("data.json", {"a": 2}), ("vocab.json", {"b": 3}),
                       ("model.json", {"c": 4})):
        (run / name).write_text(json.dumps(body))
    cfg = Config.from_run_dir(str(run))
    assert (cfg.a, cfg.b, cfg.c) == (2, 3, 4)

    # partial subset requests work on the dict snapshot too
    cfg = Config.from_run_dir(str(run), parts=("vocab.json", "model.json"))
    assert cfg.b == 3 and cfg.c == 4


def test_lr_noam_mode():
    import math

    s = LRSchedule(lr_init=1e-3, lr_min=0.0, end_warm=100, decay_mode="noam")
    # linear warm-up: lr(k) = lr_init * k / warmup
    s.update(batch_no=10)
    assert abs(s.lr - 1e-4) < 1e-12
    s.update(batch_no=100)
    assert abs(s.lr - 1e-3) < 1e-12  # peak at end of warm-up
    # inverse-sqrt after: lr(400) = lr_init * sqrt(100/400) = lr_init/2
    s.update(batch_no=400)
    assert abs(s.lr - 5e-4) < 1e-12
    # lr_min floors only post-warm-up
    s2 = LRSchedule(lr_init=1e-3, lr_min=5e-4, end_warm=100, decay_mode="noam")
    s2.update(batch_no=1)
    assert s2.lr < 5e-4  # ramp starts below the floor
    s2.update(batch_no=100 * 16)
    assert s2.lr == 5e-4  # 1e-3/4 would be 2.5e-4 -> floored


def test_lr_noam_score_decay_persists_across_recompute():
    s = LRSchedule(lr_init=1e-3, lr_min=0.0, end_warm=10, decay_mode="noam",
                   decay_rate=0.5)
    s.update(batch_no=10, score=1.0)
    s.update(batch_no=11, score=0.5)  # no improvement -> halve
    lr_after_decay = s.lr
    s.update(batch_no=12)  # recompute from batch_no must keep the 0.5x
    assert abs(s.lr - 1e-3 * math.sqrt(10 / 12) * 0.5) < 1e-12
    assert lr_after_decay < 1e-3
    # state_dict round-trip carries the multiplier
    state = s.state_dict()
    s3 = LRSchedule(lr_init=1e-3, lr_min=0.0, end_warm=10, decay_mode="noam",
                    decay_rate=0.5)
    s3.load_state_dict(state)
    s3.update(batch_no=12)
    assert abs(s3.lr - s.lr) < 1e-15


def test_spike_guard_lifecycle():
    """SpikeGuard (design.md §16.8): arms only after convergence, triggers
    on sampled spikes, holds the cooldown, extends on persistent spikes,
    and round-trips its state."""
    from latex_ocr_tpu.utils.lr_schedule import SpikeGuard

    g = SpikeGuard(threshold=3.0, converged=1.0, cooldown_mult=0.1,
                   cooldown_steps=100)
    # pre-convergence losses are high by nature: never trigger
    g.observe(0, 5.0)
    assert g.n_triggers == 0 and g.scale(1) == 1.0
    g.observe(10, 0.5)  # converged -> armed
    g.observe(20, 4.0)  # spike
    assert g.n_triggers == 1
    assert g.scale(21) == 0.1 and g.scale(119) == 0.1 and g.scale(120) == 1.0
    g.observe(80, 4.0)  # mid-cooldown: no re-trigger
    assert g.n_triggers == 1
    g.observe(130, 4.0)  # past cooldown, still spiking -> extends
    assert g.n_triggers == 2 and g.scale(131) == 0.1 and g.scale(229) == 0.1
    g.observe(300, 0.2)  # recovered
    assert g.scale(301) == 1.0
    g.observe(310, 9.0)  # a later spike triggers again
    assert g.n_triggers == 3

    g2 = SpikeGuard()
    g2.load_state_dict(g.state_dict())
    assert g2.n_triggers == 3 and g2.scale(311) == 0.1 and g2.scale(800) == 1.0
    # unified guard protocol: observe returns an event string on trigger,
    # apply composes the intervention onto the schedule lr
    g3 = SpikeGuard(threshold=3.0, converged=1.0, cooldown_mult=0.1,
                    cooldown_steps=100)
    assert g3.observe(0, 0.5) is None
    ev = g3.observe(10, 4.0)
    assert ev and "spike guard" in ev
    assert abs(g3.apply(11, 1e-3) - 1e-4) < 1e-12
    assert g3.apply(200, 1e-3) == 1e-3


def test_convergence_gate_lifecycle():
    """ConvergenceGate (design.md §16.8): passes full lr through while
    grounding, caps on convergence, releases the cap for full-lr recovery
    when a spike ignites anyway, re-engages on re-convergence, and
    round-trips its state."""
    from latex_ocr_tpu.utils.lr_schedule import ConvergenceGate

    g = ConvergenceGate(cap=2e-4, converged=1.0, release=3.0)
    # initial grounding: loss high, full lr passes through
    assert g.observe(0, 25.0) is None
    assert g.apply(1, 5e-4) == 5e-4
    # convergence engages the cap
    ev = g.observe(100, 0.5)
    assert ev and "capped" in ev
    assert g.apply(101, 5e-4) == 2e-4
    assert g.apply(101, 1e-4) == 1e-4  # never raises a lower schedule lr
    assert g.observe(110, 0.4) is None  # staying converged: no re-event
    # mild excursion (1.0 < loss < release): cap holds
    assert g.observe(120, 2.0) is None
    assert g.apply(121, 5e-4) == 2e-4
    # ignition past the release threshold: cap releases for recovery
    ev = g.observe(130, 4.5)
    assert ev and "released" in ev
    assert g.n_triggers == 1
    assert g.apply(131, 5e-4) == 5e-4
    # re-convergence re-engages
    ev = g.observe(300, 0.3)
    assert ev and "capped" in ev
    assert g.apply(301, 5e-4) == 2e-4

    g2 = ConvergenceGate()
    g2.load_state_dict(g.state_dict())
    assert g2.n_triggers == 1 and g2.apply(302, 5e-4) == 2e-4


def test_update_clip_bounds_adam_effective_step():
    """`update_clip` caps each element of the post-Adam update — the
    quantity design.md §16.8 proves a global-norm clip cannot bound.

    Scenario mirroring the GRU spike mechanism: the second moment adapts
    to tiny converged gradients, then hard batches deliver gradients
    1000x larger. Over consecutive hard steps m̂ tracks the new scale
    ~100x faster than v̂ (β1 window 10 steps vs β2 window 1000), so the
    unclipped update transiently approaches (1-β1)/√(1-β2) ≈ 3.16;
    with update_clip=1.0 every element is exactly bounded."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from latex_ocr_tpu.models.img2seq import make_optimizer

    params = {"w": jnp.zeros((4,), jnp.float32)}
    tiny = {"w": jnp.full((4,), 1e-4, jnp.float32)}
    huge = {"w": jnp.full((4,), 0.1, jnp.float32)}

    def max_update_through_spike(update_clip):
        tx = make_optimizer("adam", clip=-1.0, update_clip=update_clip)
        upd = jax.jit(lambda g, s: tx.update(g, s, params))
        state = tx.init(params)
        for _ in range(200):  # v-hat adapts to the tiny converged scale
            u, state = upd(tiny, state)
        mx = 0.0
        for _ in range(30):  # a sustained hard-batch excursion
            u, state = upd(huge, state)
            mx = max(mx, float(np.max(np.abs(np.asarray(u["w"])))))
        return mx

    unclipped = max_update_through_spike(-1.0)
    clipped = max_update_through_spike(1.0)
    assert unclipped > 2.0  # the stale-v-hat blowup is real (peaks ~2.9)
    assert clipped <= 1.0 + 1e-6  # and exactly bounded


def test_checkpoint_raw_params_roundtrip(tmp_path):
    """EMA checkpoints: published `params` + `raw_params` for resume;
    old-format checkpoints restore with raw None under the same call."""
    import numpy as np

    from latex_ocr_tpu.training.checkpoint import CheckpointManager

    ema = {"w": np.full((2, 2), 2.0, np.float32)}
    raw = {"w": np.full((2, 2), 7.0, np.float32)}
    opt = {"m": np.zeros((2, 2), np.float32)}

    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save(1, ema, opt, raw_params=raw)
    got = ckpt.restore(ema, opt, raw_like=raw)
    ckpt.close()
    p, _, _, epoch, r = got
    assert epoch == 1
    np.testing.assert_array_equal(np.asarray(p["w"]), 2.0)
    np.testing.assert_array_equal(np.asarray(r["w"]), 7.0)

    # pre-EMA format: no raw_params item; raw_like still asked for
    ckpt2 = CheckpointManager(str(tmp_path / "ck2"))
    ckpt2.save(4, ema, opt)
    got2 = ckpt2.restore(ema, opt, raw_like=raw)
    ckpt2.close()
    p2, _, _, epoch2, r2 = got2
    assert epoch2 == 4 and r2 is None
    np.testing.assert_array_equal(np.asarray(p2["w"]), 2.0)

    # the symmetric case: an EMA-written checkpoint restored WITHOUT
    # raw_like (resume with ema_decay off) must not crash — the raw tree
    # is silently discarded and the published params come back
    ckpt3 = CheckpointManager(str(tmp_path / "ck"))
    got3 = ckpt3.restore(ema, opt)  # no raw_like
    ckpt3.close()
    p3, _, _, epoch3, r3 = got3
    assert epoch3 == 1 and r3 is None
    np.testing.assert_array_equal(np.asarray(p3["w"]), 2.0)
