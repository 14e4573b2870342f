"""`train` CLI: compose 4 configs, snapshot them, train with LR schedule.

Flags and flow mirror the reference train.py:12-61; the output run dir
receives {data,vocab,training,model}.json snapshots so evaluate/predict
reload the exact run configuration.
"""

from __future__ import annotations

import click

from ..utils import Config, LRSchedule
from .common import build_split_pipeline, compute_dtype_from, make_vocab


@click.command()
@click.option("--data", default="configs/data_small.json")
@click.option("--vocab", default="configs/vocab_small.json")
@click.option("--training", default="configs/training_small.json")
@click.option("--model", default="configs/model.json")
@click.option("--output", default="results/small/")
@click.option("--devices", default="auto", show_default=True,
              help="Data-parallel mesh: 'auto' uses every visible chip "
                   "(multi-chip DP is the default, not an expert path), "
                   "'1' opts out, 'N' uses the first N devices.")
def main(data: str, vocab: str, training: str, model: str, output: str,
         devices: str) -> None:
    from ..utils.jax_setup import setup_jax

    setup_jax()
    config = Config([data, vocab, training, model])
    config.save(output)
    voc = make_vocab(config)

    from ..parallel.mesh import auto_mesh, round_batch_to_mesh

    mesh = auto_mesh(devices)
    if mesh is not None:
        rounded = round_batch_to_mesh(config.batch_size, mesh)
        if rounded != config.batch_size:
            click.echo(
                f"batch_size {config.batch_size} -> {rounded} "
                f"(multiple of the {mesh.devices.size}-device mesh)"
            )
            config.batch_size = rounded
        click.echo(f"Data-parallel mesh: {mesh.devices.size} devices")

    sharding = None
    if mesh is not None:
        from ..parallel.mesh import batch_sharding

        sharding = batch_sharding(mesh)
    # `"pipeline": "cached"` in the training config selects the
    # product-speed cached pipeline (the curriculum scripts' path);
    # default stays the reference-semantics DataGenerator
    train_set = build_split_pipeline(config, voc, "train",
                                     sharding=sharding, shuffle=True)
    val_set = build_split_pipeline(config, voc, "val", sharding=sharding)

    n_batches_epoch = (
        len(train_set)
        if hasattr(train_set, "id_pad")  # pipeline: len = batches/epoch
        else (len(train_set) + config.batch_size - 1) // config.batch_size
    )
    # the reference torch path's "lr_scheduler": "CosineAnnealingLR" maps to
    # cosine decay over the same [start_decay, end_decay] window
    decay_mode = (
        "cosine"
        if str(getattr(config, "lr_scheduler", "")).lower().startswith("cosine")
        else "exponential"
    )
    lr_schedule = LRSchedule(
        lr_init=config.lr_init,
        lr_min=config.lr_min,
        start_decay=config.start_decay * n_batches_epoch,
        end_decay=config.end_decay * n_batches_epoch,
        end_warm=(config.end_warm * n_batches_epoch) if getattr(config, "end_warm", 0) else None,
        lr_warm=getattr(config, "lr_warm", 1e-4),
        decay_rate=getattr(config, "decay_rate", None),
        early_stopping=getattr(config, "early_stopping", None),
        decay_mode=decay_mode,
    )

    from ..models.img2seq import Img2SeqModel
    from ..training.trainer import Trainer

    model_obj = Img2SeqModel(config, voc, compute_dtype=compute_dtype_from(config))
    trainer = Trainer(model_obj, config, output, mesh=mesh)
    best = trainer.train(train_set, val_set, lr_schedule)
    click.echo(f"Best validation score: {best}")


if __name__ == "__main__":
    main()
