"""Tests for the cached native input pipeline."""

import numpy as np

from latex_ocr_tpu.data.fast_pipeline import build_cached_pipeline
from latex_ocr_tpu.data.pipeline import BatchPipeline
from latex_ocr_tpu.data.generator import DataGenerator, default_img_prepro
from latex_ocr_tpu.data.vocab import Vocab
from latex_ocr_tpu.utils import Config


def _vocab(small_dataset):
    return Vocab(Config({"unk": "_UNK", "pad": "_PAD", "end": "_END",
                         "path_vocab": small_dataset["path_vocab"]}))


def test_cached_pipeline_matches_slow_pipeline(small_dataset, tmp_path):
    vocab = _vocab(small_dataset)
    fast = build_cached_pipeline(
        small_dataset["path_formulas_train"],
        small_dataset["dir_images_train"],
        small_dataset["path_matching_train"],
        vocab.form_prepro,
        str(tmp_path / "cache"),
        batch_size=8,
        id_pad=vocab.id_pad,
        id_end=vocab.id_end,
        max_len=50,
        buckets=small_dataset["buckets"],
        max_formula_len=51,
    )
    batches = list(fast)
    assert len(batches) == len(fast)
    total = sum(int(b["n_real"]) for b in batches)
    assert total == 40

    # batch contents must agree with the slow (PIL per item) pipeline on
    # aggregate statistics: same image bytes per example set
    slow_ds = DataGenerator(
        small_dataset["path_formulas_train"], small_dataset["dir_images_train"],
        small_dataset["path_matching_train"], img_prepro=default_img_prepro,
        form_prepro=vocab.form_prepro, max_len=50,
    )
    slow_ink = sorted(int((img != 255).sum()) for img, _ in slow_ds)
    fast_ink = []
    for b in batches:
        for i in range(int(b["n_real"])):
            fast_ink.append(int((b["image"][i] != 255).sum()))
    assert sorted(fast_ink) == slow_ink

    for b in batches:
        assert b["image"].dtype == np.uint8
        assert b["image"].shape[0] == 8
        assert b["formula"].dtype == np.int32
        # every real row ends with END at position length-1
        for i in range(int(b["n_real"])):
            L = int(b["length"][i])
            assert b["formula"][i, L - 1] == vocab.id_end


def test_cached_pipeline_max_iter(small_dataset, tmp_path):
    """max_iter caps examples per epoch (reference data_generator.py:190-191)
    and __len__ agrees with the actual batch count."""
    vocab = _vocab(small_dataset)
    fast = build_cached_pipeline(
        small_dataset["path_formulas_train"],
        small_dataset["dir_images_train"],
        small_dataset["path_matching_train"],
        vocab.form_prepro,
        str(tmp_path / "cache_mi"),
        batch_size=8, id_pad=vocab.id_pad, id_end=vocab.id_end,
        max_len=50, buckets=small_dataset["buckets"],
        max_formula_len=51, max_iter=11,
    )
    batches = list(fast)
    assert sum(int(b["n_real"]) for b in batches) == 11
    assert len(batches) == len(fast)


def test_snap_image_shape_floor():
    """The no-bucket fallback must keep the encoder's H/8-2 contract
    positive for tiny inputs (predict/visualize pass buckets=None)."""
    from latex_ocr_tpu.data.pipeline import snap_image_shape

    assert snap_image_shape((5, 9), None) == (32, 32)
    assert snap_image_shape((40, 100), None) == (40, 104)


def test_cached_pipeline_shuffles_between_epochs(small_dataset, tmp_path):
    vocab = _vocab(small_dataset)
    fast = build_cached_pipeline(
        small_dataset["path_formulas_train"],
        small_dataset["dir_images_train"],
        small_dataset["path_matching_train"],
        vocab.form_prepro,
        str(tmp_path / "cache2"),
        batch_size=8,
        id_pad=vocab.id_pad,
        id_end=vocab.id_end,
        buckets=small_dataset["buckets"],
        max_formula_len=51,
        shuffle_seed=0,
    )
    first = [b["formula"].tobytes() for b in fast]
    second = [b["formula"].tobytes() for b in fast]
    assert first != second  # epoch reshuffle


def test_device_resident_matches_host_assembly(small_dataset, tmp_path):
    """device_resident=True yields bit-identical batches to the host
    assembler (including the white tail padding rows), with images already
    on device."""
    vocab = _vocab(small_dataset)

    def pipe(tag, resident):
        return build_cached_pipeline(
            small_dataset["path_formulas_train"],
            small_dataset["dir_images_train"],
            small_dataset["path_matching_train"],
            vocab.form_prepro,
            str(tmp_path / f"cache_{tag}"),
            batch_size=8, id_pad=vocab.id_pad, id_end=vocab.id_end,
            max_len=50, buckets=small_dataset["buckets"],
            max_formula_len=51, shuffle_seed=5, device_resident=resident,
        )

    host = pipe("h", False)
    dev = pipe("d", True)
    host_batches = list(host)
    dev_batches = list(dev)
    assert len(host_batches) == len(dev_batches) > 0
    for hb, db in zip(host_batches, dev_batches):
        assert hasattr(db["image"], "sharding")  # a jax array, on device
        np.testing.assert_array_equal(np.asarray(db["image"]), hb["image"])
        np.testing.assert_array_equal(db["formula"], hb["formula"])
        np.testing.assert_array_equal(db["length"], hb["length"])
        assert int(db["n_real"]) == int(hb["n_real"])


def test_device_resident_rejects_sharding_and_oversize(small_dataset, tmp_path):
    import pytest

    vocab = _vocab(small_dataset)
    kwargs = dict(
        batch_size=8, id_pad=vocab.id_pad, id_end=vocab.id_end, max_len=50,
        buckets=small_dataset["buckets"], max_formula_len=51,
    )
    with pytest.raises(ValueError, match="resident"):
        build_cached_pipeline(
            small_dataset["path_formulas_train"],
            small_dataset["dir_images_train"],
            small_dataset["path_matching_train"],
            vocab.form_prepro, str(tmp_path / "c1"),
            device_resident=True, max_resident_bytes=1024, **kwargs,
        )


def test_device_resident_sharding_exclusion_and_auto(small_dataset, tmp_path):
    import jax
    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P

    from latex_ocr_tpu.parallel.mesh import make_mesh

    vocab = _vocab(small_dataset)
    mesh = make_mesh(jax.devices()[:8])
    sharding = NamedSharding(mesh, P("data"))
    kwargs = dict(
        batch_size=8, id_pad=vocab.id_pad, id_end=vocab.id_end, max_len=50,
        buckets=small_dataset["buckets"], max_formula_len=51,
    )

    def build(tag, **kw):
        return build_cached_pipeline(
            small_dataset["path_formulas_train"],
            small_dataset["dir_images_train"],
            small_dataset["path_matching_train"],
            vocab.form_prepro, str(tmp_path / tag), **kwargs, **kw,
        )

    with pytest.raises(ValueError, match="mutually exclusive"):
        build("c_excl", device_resident=True, sharding=sharding)
    # auto degrades to the host path instead of raising
    p1 = build("c_auto1", device_resident="auto", sharding=sharding)
    assert p1.device_resident is False
    p2 = build("c_auto2", device_resident="auto", max_resident_bytes=1024)
    assert p2.device_resident is False
    p3 = build("c_auto3", device_resident="auto")
    assert p3.device_resident is True
