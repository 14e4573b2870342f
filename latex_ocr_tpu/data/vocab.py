"""Vocabulary: token<->id maps, vocab building, formula padding.

Behavioral contract matches reference model/utils/text.py:5-164 so vocab
files and datasets interchange:
- vocab.txt holds one token per line; special tokens ``_UNK, _PAD, _END`` are
  appended after the file tokens (in that order).
- ``form_prepro`` maps a formula string to a list of ids via space-split with
  unknown tokens mapped to ``id_unk``.
- ``pad_batch_formulas`` pads to ``max_len + 1`` with ``id_pad`` and writes
  ``id_end`` at position ``len(formula)``; lengths are ``len + 1``.
"""

from __future__ import annotations

from collections import Counter
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np


class Vocab:
    """Token <-> id maps loaded from a vocab file plus special tokens."""

    def __init__(self, config):
        self.config = config
        special = [config.unk, config.pad, config.end]
        self.tok_to_id = load_tok_to_id(config.path_vocab, special)
        self.id_to_tok = {i: t for t, i in self.tok_to_id.items()}
        self.n_tok = len(self.tok_to_id)
        self.id_pad = self.tok_to_id[config.pad]
        self.id_end = self.tok_to_id[config.end]
        self.id_unk = self.tok_to_id[config.unk]

    @property
    def form_prepro(self) -> Callable[[str], List[int]]:
        return get_form_prepro(self.tok_to_id, self.id_unk)


def get_form_prepro(vocab: Dict[str, int], id_unk: int) -> Callable[[str], List[int]]:
    """Return a closure mapping a formula string to a list of token ids."""

    def prepro(formula: str) -> List[int]:
        return [vocab.get(tok, id_unk) for tok in formula.strip().split(" ")]

    return prepro


def load_tok_to_id(filename: str, extra_tokens: Sequence[str] = ()) -> Dict[str, int]:
    """Load one-token-per-line vocab file, then append ``extra_tokens``."""
    tok_to_id: Dict[str, int] = {}
    with open(filename) as f:
        for idx, line in enumerate(f):
            tok_to_id[line.strip()] = idx
    for tok in extra_tokens:
        tok_to_id[tok] = len(tok_to_id)
    return tok_to_id


def build_vocab(datasets: Iterable, min_count: int = 10) -> List[str]:
    """Count tokens over (img, formula-token-list) datasets; keep tokens with
    count >= min_count; return sorted."""
    counter: Counter = Counter()
    for dataset in datasets:
        for _, formula in dataset:
            counter.update(formula)
    vocab = [tok for tok, c in counter.items() if c >= min_count]
    print(f"Built vocab: {len(vocab)}/{len(counter)} tokens kept (min_count={min_count}).")
    return sorted(vocab)


def build_vocab_from_file(file_paths: Sequence[str], min_count: int = 10) -> List[str]:
    """Character-level vocab from raw formula files (reference text.py:66-90)."""
    counter: Counter = Counter()
    for path in file_paths:
        with open(path) as f:
            for line in f:
                counter.update(line.strip())
    vocab = [tok for tok, c in counter.items() if c >= min_count]
    return sorted(vocab)


def pad_vocab(vocab: Sequence[str], multiple: int, n_special: int = 3) -> List[str]:
    """Pad with reserved never-emitted tokens so the final model vocab
    (file tokens + ``n_special`` appended specials) is a multiple of
    ``multiple``.

    TPU-first rationale: the decoder's logits matmul and the decode
    megakernels carry a (…, V) lane axis — aligning V to the 128-lane
    tile avoids a ragged last tile on the MXU, and (more operationally)
    keeps every compiled program's shape stable across dataset rebuilds
    whose raw token counts wobble, so the persistent compile cache stays
    warm. Reserved tokens are ordinary classes with zero training
    occurrences; the softmax drives their probability down like any
    unseen token.
    """
    if multiple <= 1:
        return list(vocab)
    total = len(vocab) + n_special
    pad = (-total) % multiple
    reserved = [f"_RSV{i}" for i in range(pad)]
    assert not set(reserved) & set(vocab), "reserved token name collision"
    return list(vocab) + reserved


def write_vocab(vocab: Sequence[str], filename: str) -> None:
    """One token per line, no trailing newline after the last token."""
    with open(filename, "w") as f:
        f.write("\n".join(vocab))
    print(f"Wrote vocab ({len(vocab)} tokens) to {filename}")


def pad_batch_formulas(
    formulas: Sequence[Sequence[int]],
    id_pad: int,
    id_end: int,
    max_len: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad token-id lists to ``max_len + 1``, appending ``id_end``.

    Returns (batch [N, max_len+1] int32, lengths [N] int32) where
    lengths[i] = len(formulas[i]) + 1 (the END token counts).
    """
    if max_len is None:
        max_len = max(len(f) for f in formulas)
    batch = np.full((len(formulas), max_len + 1), id_pad, dtype=np.int32)
    lengths = np.zeros(len(formulas), dtype=np.int32)
    for i, formula in enumerate(formulas):
        batch[i, : len(formula)] = np.asarray(formula, dtype=np.int32)
        batch[i, len(formula)] = id_end
        lengths[i] = len(formula) + 1
    return batch, lengths


def load_formulas(filename: str) -> Dict[int, str]:
    """Load formulas file into {line_index: formula} dict."""
    formulas: Dict[int, str] = {}
    with open(filename) as f:
        for idx, line in enumerate(f):
            formulas[idx] = line.strip()
    print(f"Loaded {len(formulas)} formulas from {filename}")
    return formulas


def truncate_end(ids: Iterable[int], id_end: int) -> List[int]:
    """Cut a decoded id sequence at the first END token (exclusive)."""
    out: List[int] = []
    for idx in ids:
        if idx == id_end:
            break
        out.append(int(idx))
    return out
