from .vocab import (
    Vocab,
    build_vocab,
    build_vocab_from_file,
    pad_vocab,
    get_form_prepro,
    load_formulas,
    load_tok_to_id,
    pad_batch_formulas,
    write_vocab,
)
from .images import (
    crop_image,
    downsample,
    downsample_image,
    get_max_shape,
    get_new_size,
    greyscale,
    pad_batch_images,
    pad_image,
)
from .generator import DataGenerator, DataGeneratorFile

__all__ = [
    "DataGenerator",
    "DataGeneratorFile",
    "Vocab",
    "build_vocab",
    "build_vocab_from_file",
    "pad_vocab",
    "crop_image",
    "downsample",
    "downsample_image",
    "get_form_prepro",
    "get_max_shape",
    "get_new_size",
    "greyscale",
    "load_formulas",
    "load_tok_to_id",
    "pad_batch_formulas",
    "pad_batch_images",
    "pad_image",
    "write_vocab",
]
