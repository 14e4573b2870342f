"""Numerical parity against torch (CPU): LSTM cell and conv layer.

The reference's numerics come from TF1/torch kernels; these tests pin our
pure-JAX primitives to the same math using torch as the oracle (torch CPU
is available in the image; TF is not).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from latex_ocr_tpu.models.decoder import lstm_step  # noqa: E402


def test_lstm_step_matches_torch_lstmcell():
    """Our fused TF1-layout LSTM == torch.nn.LSTMCell with mapped weights.

    Mapping: torch gate order is (i, f, g, o) with separate weight_ih /
    weight_hh and two biases; TF1 order is (i, j=g, f, o) with one fused
    kernel over [x; h], single bias, and forget_bias=1.0.
    """
    torch.manual_seed(0)
    in_dim, units, B = 24, 32, 4
    cell = torch.nn.LSTMCell(in_dim, units)

    w_ih = cell.weight_ih.detach().numpy()  # (4U, in) torch order i,f,g,o
    w_hh = cell.weight_hh.detach().numpy()
    b = (cell.bias_ih + cell.bias_hh).detach().numpy()

    def torch_to_tf(mat):
        i, f, g, o = np.split(mat, 4, axis=0)
        return np.concatenate([i, g, f, o], axis=0)  # tf order i,j,f,o

    w_tf = np.concatenate([torch_to_tf(w_ih), torch_to_tf(w_hh)], axis=1).T  # (in+U, 4U)
    b_tf = torch_to_tf(b[:, None])[:, 0]
    # cancel TF's forget_bias=1.0 so both cells compute identical gates
    b_tf = b_tf.copy()
    b_tf[units : 2 * units] = b_tf[units : 2 * units]  # (i, j) untouched
    b_tf_f = b_tf.copy()
    b_tf_f[2 * units : 3 * units] -= 1.0

    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, in_dim)).astype(np.float32)
    h0 = rng.normal(size=(B, units)).astype(np.float32)
    c0 = rng.normal(size=(B, units)).astype(np.float32)

    with torch.no_grad():
        h_t, c_t = cell(torch.from_numpy(x), (torch.from_numpy(h0), torch.from_numpy(c0)))

    params = {"w": jnp.asarray(w_tf), "b": jnp.asarray(b_tf_f)}
    c_j, h_j = lstm_step(params, jnp.asarray(x), jnp.asarray(c0), jnp.asarray(h0))

    np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_t.numpy(), rtol=1e-5, atol=1e-5)


def test_conv2d_matches_torch():
    import torch.nn.functional as F

    from latex_ocr_tpu.models.encoder import _conv2d

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 10, 12, 3)).astype(np.float32)  # NHWC
    w = rng.normal(size=(3, 3, 3, 8)).astype(np.float32)  # HWIO
    b = rng.normal(size=(8,)).astype(np.float32)

    y_jax = np.asarray(_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # OIHW
        y_t = F.conv2d(xt, wt, torch.from_numpy(b), padding=1)
    y_torch = y_t.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(y_jax, y_torch, rtol=1e-4, atol=1e-4)


def test_gru_step_matches_torch_grucell():
    """Our GRU step == torch.nn.GRUCell with directly-mapped weights
    (same layout: gate order (r, z, n), separate ih/hh biases, reset gate
    applied to the post-matmul hidden candidate)."""
    from latex_ocr_tpu.models.decoder import gru_step

    torch.manual_seed(3)
    in_dim, units, B = 24, 32, 4
    cell = torch.nn.GRUCell(in_dim, units)

    params = {
        "w_ih": jnp.asarray(cell.weight_ih.detach().numpy().T),  # (in, 3U)
        "w_hh": jnp.asarray(cell.weight_hh.detach().numpy().T),
        "b_ih": jnp.asarray(cell.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(cell.bias_hh.detach().numpy()),
    }

    rng = np.random.default_rng(4)
    x = rng.normal(size=(B, in_dim)).astype(np.float32)
    h0 = rng.normal(size=(B, units)).astype(np.float32)

    with torch.no_grad():
        h_t = cell(torch.from_numpy(x), torch.from_numpy(h0))
    h_j = gru_step(params, jnp.asarray(x), jnp.asarray(h0))

    np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(), rtol=1e-5, atol=1e-5)
