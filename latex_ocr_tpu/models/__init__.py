from .encoder import encode, init_encoder_params
from .decoder import (
    init_decoder_params,
    teacher_forcing_logits,
)
from .img2seq import Img2SeqModel
from .transformer import (
    init_transformer_decoder_params,
    transformer_teacher_forcing_logits,
)

__all__ = [
    "Img2SeqModel",
    "encode",
    "init_decoder_params",
    "init_encoder_params",
    "init_transformer_decoder_params",
    "teacher_forcing_logits",
    "transformer_teacher_forcing_logits",
]
