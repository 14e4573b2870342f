"""Full-model decode parity oracle: an independent torch implementation.

The north star (BASELINE.json) asks for decoded sequences "bit-identical
to the PyTorch reference at equal checkpoints". The original TF1/torch
reference cannot run in this environment, so this module provides the
equal-weights oracle: a complete, independent re-implementation of the
flagship attn-LSTM model — encoder conv stack, 2-D positional signal,
Bahdanau attention init/step, deep output, greedy decode, and batched
beam search with finished-masking, flat top-k, parent backtracking and
GNMT length re-ranking — written against torch ops (torch.nn.LSTMCell,
torch.nn.functional.conv2d/max_pool2d/softmax) with NO JAX anywhere in
the compute path.

Loading the same parameter pytree into both implementations and
asserting token-identical greedy/beam output checks the whole decode
stack above cell level (reference semantics: encoder.py:26-67,
attention_mechanism.py:43-153, attention_cell.py:58-89,
greedy_decoder_cell.py:53-66, beam_search_decoder_cell.py:43-391,
img2seq.py:256-285). Exercised by tests/test_full_model_parity.py
(random weights, CPU) and scripts/parity_oracle.py (real trained
checkpoints).

Weight mapping notes
--------------------
* Convs: ours are HWIO / NHWC; torch wants OIHW / NCHW — pure transposes.
* LSTM: ours is the TF1 fused layout (one kernel over [x; h], gate order
  (i, j, f, o), forget_bias=1.0); torch.nn.LSTMCell has separate
  weight_ih/weight_hh in gate order (i, f, g, o) and no forget bias —
  the +1.0 is folded into the torch forget-gate bias chunk. This is the
  inverse of the mapping pinned cell-level in tests/test_torch_parity.py.
* Everything runs fp32; parity against the JAX model is checked with the
  JAX side also in fp32 (the production bf16 encoder is a declared
  numerics change, not a semantics one).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

NEG_INF = np.float32(-1e30)


def _to_numpy_tree(params) -> Dict:
    """jax pytree (or numpy tree) -> plain nested dict of np.float32 arrays."""
    if isinstance(params, dict):
        return {k: _to_numpy_tree(v) for k, v in params.items()}
    return np.asarray(params)


def _same_pool_pad(size: int, window: int, stride: int) -> Tuple[int, int]:
    """XLA SAME padding amounts (lo, hi) for one reduce-window dim."""
    out = -(-size // stride)
    total = max((out - 1) * stride + window - size, 0)
    return total // 2, total - total // 2


class _TorchEncoderBase:
    """Shared torch mirror of the "vanilla" encoder conv stack + 2-D
    positional signal (models/encoder.py). Subclasses add a decoder."""

    def __init__(self, params, id_end: int, positional: bool = True):
        import torch

        self.torch = torch
        p = _to_numpy_tree(params)
        self.enc = p["encoder"]
        self.dec = p["decoder"]
        self.id_end = int(id_end)
        self.positional = positional

    # ------------------------------------------------------------- encoder

    def _conv(self, x, name: str, padding: int = 1):
        F = self.torch.nn.functional
        w = self.torch.from_numpy(self.enc[name]["w"].transpose(3, 2, 0, 1).copy())
        b = self.torch.from_numpy(self.enc[name]["b"].copy())
        return F.conv2d(x, w, b, padding=padding)

    def _pool_same(self, x, window: Tuple[int, int], stride: Tuple[int, int]):
        F = self.torch.nn.functional
        ph = _same_pool_pad(x.shape[2], window[0], stride[0])
        pw = _same_pool_pad(x.shape[3], window[1], stride[1])
        x = F.pad(x, (pw[0], pw[1], ph[0], ph[1]), value=-math.inf)
        return F.max_pool2d(x, kernel_size=window, stride=stride)

    def encode(self, images_u8: np.ndarray) -> np.ndarray:
        """uint8 (B, H, W, 1) -> feature grid (B, H', W', 512) fp32.

        Mirrors models/encoder.py encode() for the "vanilla" variant,
        including the fused (x-128)/128 normalization and the trailing
        2-D sinusoidal positional signal.
        """
        torch = self.torch
        F = torch.nn.functional
        with torch.no_grad():
            x = torch.from_numpy(
                ((images_u8.astype(np.float32) - 128.0) / 128.0)
                .transpose(0, 3, 1, 2)
                .copy()
            )
            x = F.relu(self._conv(x, "conv1"))
            x = self._pool_same(x, (2, 2), (2, 2))
            x = F.relu(self._conv(x, "conv2"))
            x = self._pool_same(x, (2, 2), (2, 2))
            x = F.relu(self._conv(x, "conv3"))
            x = F.relu(self._conv(x, "conv4"))
            x = self._pool_same(x, (2, 1), (2, 1))
            x = F.relu(self._conv(x, "conv5"))
            x = self._pool_same(x, (1, 2), (1, 2))
            x = F.relu(self._conv(x, "conv6", padding=0))  # VALID
            feat = x.permute(0, 2, 3, 1).numpy()
        if self.positional:
            feat = feat + _timing_signal_2d(feat.shape[1], feat.shape[2], feat.shape[3])
        return feat


class TorchOracle(_TorchEncoderBase):
    """Independent torch implementation of the attn-RNN model families.

    ``params`` is the Img2SeqModel parameter pytree
    ``{"encoder": ..., "decoder": ...}`` (vanilla encoder variant; lstm or
    gru cell — torch.nn.LSTMCell/GRUCell drive the recurrence); ``id_end``
    the END token id.
    """

    def __init__(self, params, id_end: int, positional: bool = True):
        super().__init__(params, id_end, positional)
        torch = self.torch

        if "gru" in self.dec:
            # ---- torch GRUCell: our layout IS torch's (models/decoder.py) —
            # direct copy, no gate remap
            g = self.dec["gru"]
            in_dim, units3 = g["w_ih"].shape
            units = units3 // 3
            cell = torch.nn.GRUCell(in_dim, units)
            with torch.no_grad():
                cell.weight_ih.copy_(torch.from_numpy(g["w_ih"].T.copy()))
                cell.weight_hh.copy_(torch.from_numpy(g["w_hh"].T.copy()))
                cell.bias_ih.copy_(torch.from_numpy(g["b_ih"].copy()))
                cell.bias_hh.copy_(torch.from_numpy(g["b_hh"].copy()))
            self.is_gru = True
        elif "lstm" in self.dec:
            # ---- torch LSTMCell with the inverse TF1->torch gate mapping ----
            w = self.dec["lstm"]["w"]  # (in+U, 4U) fused, gate order (i, j, f, o)
            b = self.dec["lstm"]["b"]  # (4U,)
            units = w.shape[1] // 4
            in_dim = w.shape[0] - units

            def tf_to_torch(mat):  # columns (i, j, f, o) -> rows (i, f, g=j, o)
                i, j, f, o = np.split(mat, 4, axis=-1)
                return np.concatenate([i, f, j, o], axis=-1)

            w_t = tf_to_torch(w)  # (in+U, 4U) torch gate order
            b_t = tf_to_torch(b[None, :])[0].copy()
            b_t[units : 2 * units] += 1.0  # fold in TF1 forget_bias=1.0
            cell = torch.nn.LSTMCell(in_dim, units)
            with torch.no_grad():
                cell.weight_ih.copy_(torch.from_numpy(w_t[:in_dim].T.copy()))
                cell.weight_hh.copy_(torch.from_numpy(w_t[in_dim:].T.copy()))
                cell.bias_ih.copy_(torch.from_numpy(b_t))
                cell.bias_hh.zero_()
            self.is_gru = False
        else:
            raise NotImplementedError("oracle covers the attn-RNN families (lstm/gru)")
        self.cell = cell.float()
        self.units = units

    # ------------------------------------------------------------- decoder

    def _prep(self, feat: np.ndarray):
        torch = self.torch
        b, h, w, c = feat.shape
        regions = torch.from_numpy(feat.reshape(b, h * w, c).copy()).float()
        att = self.dec["att"]
        att_img = regions @ torch.from_numpy(att["img_w"].copy())
        init = self.dec["init"]
        mean = regions.mean(dim=1)
        c0 = torch.tanh(mean @ torch.from_numpy(init["c_w"].copy()) + torch.from_numpy(init["c_b"].copy()))
        h0 = torch.tanh(mean @ torch.from_numpy(init["h_w"].copy()) + torch.from_numpy(init["h_b"].copy()))
        o0 = torch.tanh(mean @ torch.from_numpy(init["o_w"].copy()) + torch.from_numpy(init["o_b"].copy()))
        return regions, att_img, (c0, h0, o0)

    def _step(self, emb, state, att_img, regions):
        """One attn-cell step on (N, *) tensors. Returns (logits, state)."""
        torch = self.torch
        c, h, o = state
        x = torch.cat([emb, o], dim=-1)
        if self.is_gru:
            h_new = self.cell(x, h)
            c_new = c  # unused pass-through (models/decoder.py recurrent_step)
        else:
            h_new, c_new = self.cell(x, (h, c))  # torch returns (h, c)

        att = self.dec["att"]
        att_h = h_new @ torch.from_numpy(att["h_w"].copy())  # (N, dim_e)
        e = torch.tanh(att_img + att_h[:, None, :])
        scores = e @ torch.from_numpy(att["beta"].copy())
        a = torch.softmax(scores, dim=-1)
        ctx = (a[..., None] * regions).sum(dim=1)

        out = self.dec["out"]
        o_new = torch.tanh(
            h_new @ torch.from_numpy(out["o_w_h"].copy())
            + ctx @ torch.from_numpy(out["o_w_c"].copy())
        )
        logits = o_new @ torch.from_numpy(out["y_w_o"].copy())
        return logits, (c_new, h_new, o_new)

    def decode_greedy(self, feat: np.ndarray, max_length: int) -> np.ndarray:
        """Greedy decode. Returns ids (B, max_length) int32, END-filled."""
        torch = self.torch
        with torch.no_grad():
            regions, att_img, state = self._prep(feat)
            B = regions.shape[0]
            table = torch.from_numpy(self.dec["embedding_table"].copy())
            emb = torch.from_numpy(self.dec["start_token"].copy())[None, :].expand(B, -1).contiguous()
            ids = np.full((B, max_length), self.id_end, np.int32)
            finished = np.zeros((B,), bool)
            for t in range(max_length):
                if finished.all():
                    break
                logits, state = self._step(emb, state, att_img, regions)
                new_ids = logits.argmax(dim=-1).numpy().astype(np.int32)
                new_ids = np.where(finished, np.int32(self.id_end), new_ids)
                ids[:, t] = new_ids
                finished |= new_ids == self.id_end
                emb = table[torch.from_numpy(new_ids.astype(np.int64))]
        return ids

    def decode_beam(
        self,
        feat: np.ndarray,
        max_length: int,
        beam_size: int,
        length_norm_alpha: float = 0.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched beam search mirroring models/decoding.py decode_beam
        (deterministic path: no diversity penalty, no coverage re-rank).

        Returns (ids (B, K, T) aligned best-first, scores (B, K)).
        """
        torch = self.torch
        K = beam_size
        with torch.no_grad():
            regions, att_img, (c0, h0, o0) = self._prep(feat)
            B, R, C = regions.shape
            table = torch.from_numpy(self.dec["embedding_table"].copy())
            V = table.shape[0]
            T = max_length

            # beam-tiled state/inputs flattened to (B*K, *): the oracle
            # deliberately takes the reference's tile-everything route
            # (attention_mechanism.py:59-65) rather than our broadcast
            # formulation — a genuinely different compute order.
            def tile(x):
                return x[:, None, :].expand(B, K, x.shape[-1]).reshape(B * K, -1).contiguous()

            state = (tile(c0), tile(h0), tile(o0))
            regions_t = (
                regions[:, None].expand(B, K, R, C).reshape(B * K, R, C).contiguous()
            )
            att_img_t = (
                att_img[:, None].expand(B, K, R, att_img.shape[-1])
                .reshape(B * K, R, -1).contiguous()
            )
            emb = torch.from_numpy(self.dec["start_token"].copy())[None, :].expand(B * K, -1).contiguous()

            log_probs = np.tile(
                np.concatenate([np.zeros(1, np.float32), np.full(K - 1, NEG_INF, np.float32)])[None],
                (B, 1),
            )
            finished = np.zeros((B, K), bool)
            lengths = np.zeros((B, K), np.int32)
            ids_buf = np.full((T, B, K), self.id_end, np.int32)
            parents_buf = np.broadcast_to(np.arange(K, dtype=np.int32)[None, None, :], (T, B, K)).copy()

            for t in range(T):
                if finished.all():
                    break
                logits, new_state = self._step(emb, state, att_img_t, regions_t)
                step_logp = torch.log_softmax(logits.float(), dim=-1).numpy().reshape(B, K, V)
                # finished beams extend only with END at probability 1
                end_row = np.full((V,), NEG_INF, np.float32)
                end_row[self.id_end] = 0.0
                step_logp = np.where(finished[..., None], end_row, step_logp)

                flat = (log_probs[:, :, None] + step_logp).reshape(B, K * V)
                # top-k sorted desc, ties -> lowest flat index (lax.top_k)
                idx_sorted = np.argsort(-flat, axis=1, kind="stable")[:, :K]
                new_lp = np.take_along_axis(flat, idx_sorted, axis=1).astype(np.float32)
                new_ids = (idx_sorted % V).astype(np.int32)
                parents = (idx_sorted // V).astype(np.int32)

                # reorder beam-tiled torch state by parent
                gather = torch.from_numpy(
                    (parents + np.arange(B, dtype=np.int32)[:, None] * K)
                    .reshape(-1).astype(np.int64)
                )
                state = tuple(s[gather] for s in new_state)

                prev_finished = np.take_along_axis(finished, parents, axis=1)
                new_finished = prev_finished | (new_ids == self.id_end)
                lengths = np.take_along_axis(lengths, parents, axis=1) + (~prev_finished).astype(np.int32)
                emb = table[torch.from_numpy(new_ids.reshape(-1).astype(np.int64))]

                ids_buf[t] = new_ids
                parents_buf[t] = parents
                log_probs, finished = new_lp, new_finished

            # ---- finalize: optional GNMT re-rank, then backtrack ----
            if length_norm_alpha > 0.0:
                norm = np.maximum(1, lengths).astype(np.float32) ** length_norm_alpha
                scores = log_probs / norm
                order = np.argsort(-scores, axis=1, kind="stable")
                log_probs = np.take_along_axis(scores, order, axis=1)
                pointers = np.take_along_axis(
                    np.broadcast_to(np.arange(K, dtype=np.int32)[None], (B, K)).copy(), order, axis=1
                )
            else:
                pointers = np.broadcast_to(np.arange(K, dtype=np.int32)[None], (B, K)).copy()

            aligned = np.empty((T, B, K), np.int32)
            for t in range(T - 1, -1, -1):
                aligned[t] = np.take_along_axis(ids_buf[t], pointers, axis=1)
                pointers = np.take_along_axis(parents_buf[t], pointers, axis=1)
        return aligned.transpose(1, 2, 0), log_probs


class TorchTransformerOracle(_TorchEncoderBase):
    """Independent torch implementation of the transformer decoder family
    (the r4 flagship, models/transformer.py).

    Deliberately takes a DIFFERENT compute route than the JAX model: where
    the JAX decode is an incremental ``lax.while_loop`` over preallocated
    per-layer KV caches (``_step_logits``), the oracle re-runs a full
    causal pass over the whole emitted prefix at every step — LayerNorm is
    per-position and attention is causal, so the routes agree exactly in
    exact arithmetic, and token-identical output at equal fp32 weights
    checks embeddings/positions/pre-LN blocks/cross-attention/out
    projection plus all beam bookkeeping above them.

    ``num_heads`` must match the config the checkpoint was trained with
    (transformer_config.num_heads).
    """

    def __init__(self, params, id_end: int, positional: bool = True, num_heads: int = 8):
        super().__init__(params, id_end, positional)
        if "layers" not in self.dec:
            raise NotImplementedError("not a transformer decoder pytree")
        self.H = int(num_heads)
        self.D = int(self.dec["embedding_table"].shape[1])
        self.sqrt_d = float(np.sqrt(self.D))

    # ----------------------------------------------------------- primitives

    def _t(self, arr) -> "object":
        return self.torch.from_numpy(np.asarray(arr, np.float32).copy())

    def _ln(self, p, x):
        mean = x.mean(dim=-1, keepdim=True)
        var = x.var(dim=-1, unbiased=False, keepdim=True)
        y = (x - mean) * self.torch.rsqrt(var + 1e-6)
        return y * self._t(p["g"]) + self._t(p["b"])

    def _heads(self, x):
        """(N, L, D) -> (N, H, L, Dh)."""
        N, L, _ = x.shape
        return x.reshape(N, L, self.H, self.D // self.H).permute(0, 2, 1, 3)

    def _attn(self, p, q_in, k_in, v_in, causal: bool):
        torch = self.torch
        q = self._heads(q_in @ self._t(p["wq"]))
        k = self._heads(k_in @ self._t(p["wk"]))
        v = self._heads(v_in @ self._t(p["wv"]))
        scale = 1.0 / math.sqrt(q.shape[-1])
        scores = q @ k.transpose(-1, -2) * scale  # (N, H, Lq, Lk)
        if causal:
            Lq, Lk = scores.shape[-2:]
            mask = torch.full((Lq, Lk), float(NEG_INF))
            scores = scores + torch.triu(mask, diagonal=1)
        w = torch.softmax(scores, dim=-1)
        out = w @ v  # (N, H, Lq, Dh)
        N, H, Lq, Dh = out.shape
        out = out.permute(0, 2, 1, 3).reshape(N, Lq, H * Dh)
        return out @ self._t(p["wo"]) + self._t(p["bo"])

    def _memory(self, feat: np.ndarray):
        """(B, H', W', C) fp32 -> projected + LN'd memory (B, R, D)."""
        b, h, w, c = feat.shape
        regions = self._t(feat.reshape(b, h * w, c))
        p = self.dec["mem_proj"]
        mem = regions @ self._t(p["w"]) + self._t(p["b"])
        return self._ln(self.dec["mem_ln"], mem)

    def _prefix_logits(self, prefix_ids: np.ndarray, mem) -> np.ndarray:
        """Full causal pass over [start] + prefix tokens; next-token logits.

        ``prefix_ids`` (N, t) int32 (t may be 0); ``mem`` (N, R, D) torch.
        Returns fp32 logits (N, V) at the last position.
        """
        torch = self.torch
        N, t = prefix_ids.shape
        table = self._t(self.dec["embedding_table"]) * self.sqrt_d
        start = self._t(self.dec["start_token"]) * self.sqrt_d
        pos = self._t(_positions_1d(t + 1, self.D))
        x = torch.empty((N, t + 1, self.D))
        x[:, 0] = start
        if t:
            x[:, 1:] = table[torch.from_numpy(prefix_ids.astype(np.int64))]
        x = x + pos[None]

        for layer in self.dec["layers"]:
            h1 = self._ln(layer["ln1"], x)
            x = x + self._attn(layer["self_attn"], h1, h1, h1, causal=True)
            h2 = self._ln(layer["ln2"], x)
            x = x + self._attn(layer["cross_attn"], h2, mem, mem, causal=False)
            h3 = self._ln(layer["ln3"], x)
            m = layer["mlp"]
            x = x + torch.relu(h3 @ self._t(m["w1"]) + self._t(m["b1"])) @ self._t(m["w2"]) + self._t(m["b2"])

        x = self._ln(self.dec["ln_f"], x)
        return (x[:, -1] @ self._t(self.dec["out_w"])).numpy()

    # -------------------------------------------------------------- decode

    def decode_greedy(self, feat: np.ndarray, max_length: int) -> np.ndarray:
        """Greedy decode mirroring transformer_decode_greedy. Returns ids
        (B, max_length) int32, END-filled after each sequence finishes."""
        torch = self.torch
        with torch.no_grad():
            mem = self._memory(feat)
            B = mem.shape[0]
            ids = np.full((B, max_length), self.id_end, np.int32)
            finished = np.zeros((B,), bool)
            prefix = np.zeros((B, 0), np.int32)
            for t in range(max_length):
                if finished.all():
                    break
                logits = self._prefix_logits(prefix, mem)
                new_ids = logits.argmax(axis=-1).astype(np.int32)
                new_ids = np.where(finished, np.int32(self.id_end), new_ids)
                ids[:, t] = new_ids
                finished |= new_ids == self.id_end
                prefix = np.concatenate([prefix, new_ids[:, None]], axis=1)
        return ids

    def decode_beam(
        self,
        feat: np.ndarray,
        max_length: int,
        beam_size: int,
        length_norm_alpha: float = 0.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched beam search mirroring transformer_decode_beam
        (deterministic path). The per-beam state is the token PREFIX
        itself (reordered by parent each step and re-run in full) — the
        polar opposite of the JAX KV-cache gather, hence a strong oracle.

        Returns (ids (B, K, T) aligned best-first, scores (B, K)).
        """
        torch = self.torch
        K = beam_size
        with torch.no_grad():
            mem = self._memory(feat)  # (B, R, D)
            B, R, _ = mem.shape
            V = self.dec["embedding_table"].shape[0]
            T = max_length
            mem_t = mem[:, None].expand(B, K, R, self.D).reshape(B * K, R, self.D).contiguous()

            log_probs = np.tile(
                np.concatenate([np.zeros(1, np.float32), np.full(K - 1, NEG_INF, np.float32)])[None],
                (B, 1),
            )
            finished = np.zeros((B, K), bool)
            lengths = np.zeros((B, K), np.int32)
            ids_buf = np.full((T, B, K), self.id_end, np.int32)
            parents_buf = np.broadcast_to(np.arange(K, dtype=np.int32)[None, None, :], (T, B, K)).copy()
            prefix = np.zeros((B, K, 0), np.int32)

            for t in range(T):
                if finished.all():
                    break
                logits = self._prefix_logits(prefix.reshape(B * K, t), mem_t)
                step_logp = torch.log_softmax(torch.from_numpy(logits), dim=-1).numpy().reshape(B, K, V)
                end_row = np.full((V,), NEG_INF, np.float32)
                end_row[self.id_end] = 0.0
                step_logp = np.where(finished[..., None], end_row, step_logp)

                flat = (log_probs[:, :, None] + step_logp).reshape(B, K * V)
                idx_sorted = np.argsort(-flat, axis=1, kind="stable")[:, :K]
                new_lp = np.take_along_axis(flat, idx_sorted, axis=1).astype(np.float32)
                new_ids = (idx_sorted % V).astype(np.int32)
                parents = (idx_sorted // V).astype(np.int32)

                # reorder prefixes by parent, then extend
                prefix = np.take_along_axis(prefix, parents[:, :, None], axis=1)
                prefix = np.concatenate([prefix, new_ids[:, :, None]], axis=2)

                prev_finished = np.take_along_axis(finished, parents, axis=1)
                new_finished = prev_finished | (new_ids == self.id_end)
                lengths = np.take_along_axis(lengths, parents, axis=1) + (~prev_finished).astype(np.int32)

                ids_buf[t] = new_ids
                parents_buf[t] = parents
                log_probs, finished = new_lp, new_finished

            if length_norm_alpha > 0.0:
                norm = np.maximum(1, lengths).astype(np.float32) ** length_norm_alpha
                scores = log_probs / norm
                order = np.argsort(-scores, axis=1, kind="stable")
                log_probs = np.take_along_axis(scores, order, axis=1)
                pointers = np.take_along_axis(
                    np.broadcast_to(np.arange(K, dtype=np.int32)[None], (B, K)).copy(), order, axis=1
                )
            else:
                pointers = np.broadcast_to(np.arange(K, dtype=np.int32)[None], (B, K)).copy()

            aligned = np.empty((T, B, K), np.int32)
            for t in range(T - 1, -1, -1):
                aligned[t] = np.take_along_axis(ids_buf[t], pointers, axis=1)
                pointers = np.take_along_axis(parents_buf[t], pointers, axis=1)
        return aligned.transpose(1, 2, 0), log_probs


def make_oracle(params, id_end: int, positional: bool = True, num_heads: int = 8):
    """Family-dispatching factory: transformer pytrees (a "layers" key)
    get the TorchTransformerOracle, attn-RNN pytrees the TorchOracle."""
    dec = params["decoder"] if isinstance(params, dict) else params
    if "layers" in dec:
        return TorchTransformerOracle(params, id_end, positional, num_heads)
    return TorchOracle(params, id_end, positional)


def _positions_1d(T: int, d: int) -> np.ndarray:
    """numpy mirror of models/transformer.py sinusoidal_positions."""
    pos = np.arange(T, dtype=np.float32)[:, None]
    half = d // 2
    freq = np.exp(np.arange(half, dtype=np.float32) * (-math.log(10000.0) / max(1, half - 1)))
    ang = pos * freq[None, :]
    pe = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)
    if pe.shape[-1] < d:  # odd d
        pe = np.pad(pe, ((0, 0), (0, d - pe.shape[-1])))
    return pe


def _timing_signal_2d(h: int, w: int, channels: int) -> np.ndarray:
    """numpy mirror of models/positional.py add_timing_signal_nd (2-D)."""
    num_timescales = channels // 4
    log_inc = math.log(1.0e4) / max(1, num_timescales - 1)
    inv = np.exp(np.arange(num_timescales, dtype=np.float32) * -log_inc)

    out = np.zeros((1, h, w, channels), np.float32)
    for dim, length in enumerate((h, w)):
        pos = np.arange(length, dtype=np.float32)
        scaled = pos[:, None] * inv[None, :]
        signal = np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)
        prepad = dim * 2 * num_timescales
        postpad = channels - (dim + 1) * 2 * num_timescales
        signal = np.pad(signal, [(0, 0), (prepad, postpad)])
        shape = [1, 1, 1, channels]
        shape[dim + 1] = length
        out = out + signal.reshape(shape)
    return out
