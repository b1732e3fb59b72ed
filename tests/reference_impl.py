"""Clean-room eager PyTorch golden reference for parity tests.

This is an independent re-implementation of the RNN-T math and greedy-decode
semantics (written from the behavioral contract of the MLPerf RNN-T model:
torch-convention LSTMs, StackTime zero+pad+reshape, joint =
relu(f@W1t + g@W1p + b1)@W2 + b2, and the update_g/update_f greedy masks).
It exists so the JAX/TPU implementation has an executable oracle; it is NOT
used on any serving path.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np
import torch


class RefLSTMStack:
    """Multi-layer LSTM using torch.nn.LSTM as ground truth."""

    def __init__(self, w_ihs, w_hhs, bs):
        # w_ih: (IC, 4H) ours -> torch wants (4H, IC)
        self.num_layers = len(w_ihs)
        input_size = w_ihs[0].shape[0]
        hidden = w_hhs[0].shape[0]
        self.lstm = torch.nn.LSTM(input_size, hidden, self.num_layers)
        with torch.no_grad():
            for l in range(self.num_layers):
                getattr(self.lstm, f"weight_ih_l{l}").copy_(
                    torch.from_numpy(np.asarray(w_ihs[l]).T.copy())
                )
                getattr(self.lstm, f"weight_hh_l{l}").copy_(
                    torch.from_numpy(np.asarray(w_hhs[l]).T.copy())
                )
                getattr(self.lstm, f"bias_ih_l{l}").copy_(
                    torch.from_numpy(np.asarray(bs[l]).copy())
                )
                getattr(self.lstm, f"bias_hh_l{l}").zero_()

    @torch.no_grad()
    def __call__(self, x, h0, c0):
        # x: (T, N, IC); h0/c0: (L, N, H)
        y, (h, c) = self.lstm(
            torch.as_tensor(x), (torch.as_tensor(h0), torch.as_tensor(c0))
        )
        return y, h, c


def ref_stack_time(x: torch.Tensor, x_lens: torch.Tensor, factor: int = 2):
    x = x.clone()
    T, N, C = x.shape
    for b in range(N):
        x[int(x_lens[b]) :, b, :] = 0
    x = x.transpose(0, 1)
    pad = (-T) % factor
    if pad:
        x = torch.cat([x, torch.zeros(N, pad, C, dtype=x.dtype)], dim=1)
    x = x.reshape(N, x.shape[1] // factor, C * factor)
    return x.transpose(0, 1).contiguous()


class RefRNNT:
    """Eager reference model over the same weight arrays as RNNTWeights."""

    def __init__(self, weights, params):
        self.params = params
        w = weights
        np_ = lambda a: np.asarray(a, dtype=np.float32)
        self.pre = RefLSTMStack(
            [np_(l.w_ih) for l in w.pre_rnn],
            [np_(l.w_hh) for l in w.pre_rnn],
            [np_(l.b) for l in w.pre_rnn],
        )
        self.post = RefLSTMStack(
            [np_(l.w_ih) for l in w.post_rnn],
            [np_(l.w_hh) for l in w.post_rnn],
            [np_(l.b) for l in w.post_rnn],
        )
        self.pred = RefLSTMStack(
            [np_(l.w_ih) for l in w.pred_rnn],
            [np_(l.w_hh) for l in w.pred_rnn],
            [np_(l.b) for l in w.pred_rnn],
        )
        self.embed = torch.from_numpy(np_(w.embed))
        self.w1t = torch.from_numpy(np_(w.joint.w1_trans))
        self.w1p = torch.from_numpy(np_(w.joint.w1_pred))
        self.b1 = torch.from_numpy(np_(w.joint.b1))
        self.w2 = torch.from_numpy(np_(w.joint.w2))
        self.b2 = torch.from_numpy(np_(w.joint.b2))

    @torch.no_grad()
    def transcription(self, x, x_lens, pre_h, pre_c, post_h, post_c):
        y, pre_h, pre_c = self.pre(x, pre_h, pre_c)
        y = ref_stack_time(y, x_lens, self.params.stack_time_factor)
        f, post_h, post_c = self.post(y, post_h, post_c)
        return f, pre_h, pre_c, post_h, post_c

    @torch.no_grad()
    def prediction(self, tokens, hg, cg):
        # tokens: (N,) int64 with SOS==-1 -> zero embedding
        sos = tokens.eq(self.params.SOS)
        idx = tokens.masked_fill(sos, 0)
        g = self.embed[idx]
        g[sos] = 0.0
        y, hg, cg = self.pred(g.unsqueeze(0), hg, cg)
        return y[0], hg, cg

    @torch.no_grad()
    def joint(self, f, g):
        y = torch.relu(f @ self.w1t + g @ self.w1p + self.b1)
        return y @ self.w2 + self.b2


@torch.no_grad()
def ref_greedy_decode(
    model: RefRNNT, x: np.ndarray, x_lens: np.ndarray, split_len: int = -1
) -> Tuple[np.ndarray, np.ndarray]:
    """Eager greedy decode replicating the update_g/update_f mask semantics."""
    p = model.params
    T, N, _ = x.shape
    x = torch.as_tensor(np.asarray(x, dtype=np.float32))
    x_lens = torch.as_tensor(np.asarray(x_lens, dtype=np.int64))

    H, P = p.trans_hidden_size, p.pred_hidden_size
    res = np.full((N, p.max_res_len), -1, np.int32)
    res_idx = np.full((N,), -1, np.int64)
    pre_h = torch.zeros(p.pre_num_layers, N, H)
    pre_c = torch.zeros(p.pre_num_layers, N, H)
    post_h = torch.zeros(p.post_num_layers, N, H)
    post_c = torch.zeros(p.post_num_layers, N, H)
    pre_g = torch.full((N,), p.SOS, dtype=torch.int64)
    hg = torch.zeros(p.pred_num_layers, N, P)
    cg = torch.zeros(p.pred_num_layers, N, P)

    def decode_chunk(xi, xi_lens):
        nonlocal pre_h, pre_c, post_h, post_c, pre_g, hg, cg, res, res_idx
        finish = xi_lens.eq(0).numpy()
        f, pre_h, pre_c, post_h, post_c = model.transcription(
            xi, xi_lens, pre_h, pre_c, post_h, post_c
        )
        fac = p.stack_time_factor
        f_lens = torch.div(xi_lens + fac - 1, fac, rounding_mode="floor").numpy()
        eos_idx = np.maximum(f_lens - 1, 0)
        time_idx = np.zeros(N, np.int64)
        symbols_added = np.zeros(N, np.int64)
        fi = f[0]
        while True:
            g, hg_new, cg_new = model.prediction(pre_g, hg, cg)
            y = model.joint(fi, g)
            symbols = torch.argmax(y, dim=1).numpy()
            update_g = (
                (symbols != p.BLANK)
                & (symbols_added != p.max_symbols_per_step)
                & ~finish
            )
            if update_g.any():
                res_idx += update_g
                for b in np.nonzero(update_g)[0]:
                    if res_idx[b] < p.max_res_len:
                        res[b, res_idx[b]] = symbols[b]
                symbols_added += update_g
                upd = torch.from_numpy(update_g)
                pre_g[upd] = torch.from_numpy(symbols.astype(np.int64))[upd]
                hg[:, upd, :] = hg_new[:, upd, :]
                cg[:, upd, :] = cg_new[:, upd, :]
            update_f = ~update_g & ~finish
            if update_f.any():
                time_idx += update_f
                finish |= time_idx >= f_lens
                time_idx = np.minimum(time_idx, eos_idx)
                if finish.all():
                    break
                fi = f[torch.from_numpy(time_idx), torch.arange(N), :]
                symbols_added *= ~update_f
            if finish.all():
                break
        return

    if split_len == -1:
        decode_chunk(x, x_lens)
    else:
        for s in range(0, T, split_len):
            xi = x[s : s + split_len]
            xi_lens = torch.clamp(x_lens - s, min=0).clamp(max=split_len)
            decode_chunk(xi, xi_lens)
    return res, (res_idx + 1).astype(np.int32)
