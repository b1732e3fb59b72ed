"""Fused greedy-decode step as one Pallas TPU kernel.

The decode ``while_loop`` body is ~30 small XLA ops (prediction LSTM step,
joint, argmax, mask algebra); at N=512 the measured iteration costs ~50 us
of which ~31 us is op-launch/fusion-gap overhead around ~19 us of actual
MXU/VPU work (docs/PERFORMANCE.md decode ablation).  This kernel fuses the
whole step — embedding lookup (as a one-hot MXU matmul), the L-layer
prediction LSTM step, the joint (minus the hoisted transcription
projection), the argmax, and the reference's update_g/update_f mask algebra
(reference: models/decoder.py:125-168) — into ONE kernel launch.  Only two
ops stay in XLA per iteration: the per-lane time gather from the hoisted
``fproj`` and the result-token scatter (both are per-lane dynamic indexing,
which XLA's gather/scatter handle better than a hand-rolled kernel).

Alignment: pred_hidden 320 is not a lane multiple, so all prediction-side
weights are re-laid-out once per decode call into a 384-wide (3x128)
zero-padded gate layout (``_pad_pred_weights``).  Zero pad rows/cols make
the padding exactly inert: pad lanes of h/c stay finite (gates of 0) and
contribute 0 to every dot product.  Logit pad columns are biased to -1e30
so the first-max argmax semantics over the real 29 labels are preserved.

Numerics match the XLA body op-for-op (same matmul operand dtypes, f32
accumulation, same add order), so decode stays token-exact vs the torch
oracle with either implementation; tests/test_decode_pallas.py pins
bit-equality of the full decode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_pred_weights(weights, params):
    """Re-lay the prediction + joint weights into lane-aligned padded form.

    Returns a dict of arrays (done in XLA once per decode call, hoisted out
    of the while_loop):
      embed_p  (LANE, PG)        rows >= num_labels-1 zero
      w_ih_p   (L, PG, 4*PG)     per-gate column blocks padded P->PG
      w_hh_p   (L, PG, 4*PG)     input rows padded too
      b_p      (L, 1, 4*PG) f32
      w1_pred_p (PG, J)          pad rows zero
      b1_p     (1, J) f32
      w2_p     (J, LV)           pad cols zero
      b2_p     (1, LV) f32       pad cols -1e30 (argmax-inert)
    """
    P = params.pred_hidden_size
    PG = _round_up(P, LANE)
    V = params.num_labels
    LV = _round_up(V, LANE)
    jw = weights.joint

    def pad_gates_cols(w):  # (in, 4P) -> (in, 4PG)
        inp = w.shape[0]
        w4 = w.reshape(inp, 4, P)
        w4 = jnp.pad(w4, ((0, 0), (0, 0), (0, PG - P)))
        return w4.reshape(inp, 4 * PG)

    w_ih_p, w_hh_p, b_p = [], [], []
    for layer in weights.pred_rnn:
        wi = pad_gates_cols(layer.w_ih)  # (P, 4PG)
        wi = jnp.pad(wi, ((0, PG - P), (0, 0)))
        wh = pad_gates_cols(layer.w_hh)
        wh = jnp.pad(wh, ((0, PG - P), (0, 0)))
        b = pad_gates_cols(layer.b.astype(jnp.float32)[None, :])  # (1, 4PG)
        w_ih_p.append(wi)
        w_hh_p.append(wh)
        b_p.append(b)

    embed_p = jnp.pad(
        weights.embed, ((0, LANE - weights.embed.shape[0]), (0, PG - P))
    )
    w1_pred_p = jnp.pad(jw.w1_pred, ((0, PG - P), (0, 0)))
    w2_p = jnp.pad(jw.w2, ((0, 0), (0, LV - V)))
    b2_p = jnp.pad(
        jw.b2.astype(jnp.float32), ((0, LV - V),), constant_values=-1e30
    )
    return dict(
        embed_p=embed_p,
        w_ih_p=jnp.stack(w_ih_p),
        w_hh_p=jnp.stack(w_hh_p),
        b_p=jnp.stack(b_p),
        w1_pred_p=w1_pred_p,
        b1_p=jw.b1.astype(jnp.float32)[None, :],
        w2_p=w2_p,
        b2_p=b2_p[None, :],
    )


def pad_state(h: jax.Array, P: int) -> jax.Array:
    """(L, N, P) -> (L, N, PG) zero pad (XLA, once per decode call)."""
    PG = _round_up(P, LANE)
    return jnp.pad(h, ((0, 0), (0, 0), (0, PG - P)))


def unpad_state(h: jax.Array, P: int) -> jax.Array:
    return h[:, :, :P]


def _decode_step_kernel(n_layers, blank, sos, max_sym, max_res_len, n_labels):
    # trace-time gate selection (set_gate_act), same switch
    # ops/lstm.py and ops/lstm_pallas.py read — keeps the fused decode step
    # token-identical to the XLA body under either activation implementation
    from rnnt_inference_tpu.ops.activations import gate_fns

    sigmoid, tanh = gate_fns()

    def kernel(
        fi_ref,       # (BN, J) f32
        pre_g_ref,    # (BN, 1) int32
        time_ref,     # (BN, 1) int32
        symadd_ref,   # (BN, 1) int32
        residx_ref,   # (BN, 1) int32
        finish_ref,   # (BN, 1) int32 (0/1)
        flens_ref,    # (BN, 1) int32
        eos_ref,      # (BN, 1) int32
        hg_ref,       # (L, BN, PG) wdtype
        cg_ref,       # (L, BN, PG) f32
        embed_ref,    # (LANE, PG) wdtype
        wih_ref,      # (L, PG, 4PG) wdtype
        whh_ref,      # (L, PG, 4PG) wdtype
        b_ref,        # (L, 1, 4PG) f32
        w1p_ref,      # (PG, J) wdtype
        b1_ref,       # (1, J) f32
        w2_ref,       # (J, LV) wdtype
        b2_ref,       # (1, LV) f32
        # outputs
        pre_g_o, time_o, symadd_o, residx_o, finish_o, write_o, sym_o,
        hg_o, cg_o,
    ):
        wdtype = embed_ref.dtype
        BN = fi_ref.shape[0]
        PG = embed_ref.shape[1]

        pre_g = pre_g_ref[:]
        finish = finish_ref[:] != 0

        # embedding lookup as a one-hot matmul; SOS (-1) embeds to zeros
        sos_mask = pre_g == sos
        idx = jnp.where(sos_mask, 0, pre_g)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (BN, LANE), 1) == idx
        ) & ~sos_mask
        y = jnp.dot(
            onehot.astype(wdtype), embed_ref[:],
            preferred_element_type=jnp.float32,
        ).astype(wdtype)

        # L-layer LSTM single step (ops/lstm.py lstm_single_step semantics)
        h_new_l, c_new_l = [], []
        for l in range(n_layers):
            xw = (
                jnp.dot(y, wih_ref[l], preferred_element_type=jnp.float32)
                + b_ref[l]
            )
            gates = xw + jnp.dot(
                hg_ref[l].astype(wdtype), whh_ref[l],
                preferred_element_type=jnp.float32,
            )
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = sigmoid(f) * cg_ref[l] + sigmoid(i) * tanh(g)
            h_new = sigmoid(o) * tanh(c_new)
            y = h_new.astype(wdtype)
            h_new_l.append(y)
            c_new_l.append(c_new)

        # joint minus the hoisted transcription projection
        logits = fi_ref[:] + jnp.dot(
            y, w1p_ref[:], preferred_element_type=jnp.float32
        ) + b1_ref[:]
        logits = jnp.maximum(logits, 0.0).astype(w2_ref.dtype)
        logits = jnp.dot(
            logits, w2_ref[:], preferred_element_type=jnp.float32
        ) + b2_ref[:]

        # first-max argmax (pad cols hold -1e30)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        symbols = jnp.min(
            jnp.where(logits == mx, ids, n_labels), axis=-1, keepdims=True
        )

        # update_g / update_f algebra (reference: models/decoder.py:125-168)
        symadd = symadd_ref[:]
        update_g = (symbols != blank) & (symadd != max_sym) & ~finish
        res_idx = residx_ref[:] + update_g.astype(jnp.int32)
        write_idx = jnp.where(update_g, res_idx, max_res_len)
        symadd = symadd + update_g.astype(jnp.int32)
        pre_g = jnp.where(update_g, symbols, pre_g)

        update_f = ~update_g & ~finish
        time_idx = time_ref[:] + update_f.astype(jnp.int32)
        finish = finish | (time_idx >= flens_ref[:])
        time_idx = jnp.minimum(time_idx, eos_ref[:])
        symadd = jnp.where(update_f, 0, symadd)

        pre_g_o[:] = pre_g
        time_o[:] = time_idx
        symadd_o[:] = symadd
        residx_o[:] = res_idx
        finish_o[:] = finish.astype(jnp.int32)
        write_o[:] = write_idx
        sym_o[:] = symbols
        for l in range(n_layers):
            sel = update_g  # (BN, 1) broadcasts over PG
            hg_o[l] = jnp.where(sel, h_new_l[l], hg_ref[l])
            cg_o[l] = jnp.where(sel, c_new_l[l], cg_ref[l])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_layers", "blank", "sos", "max_sym", "max_res_len", "n_labels",
        "interpret",
    ),
)
def _decode_step(
    fi_proj: jax.Array,   # (N, J) f32
    lanes: Tuple[jax.Array, ...],  # 7x (N, 1) int32
    hg: jax.Array,        # (L, N, PG)
    cg: jax.Array,        # (L, N, PG) f32
    pw: dict,
    n_layers: int,
    blank: int,
    sos: int,
    max_sym: int,
    max_res_len: int,
    n_labels: int,
    interpret: bool = False,
):
    N, J = fi_proj.shape
    L, _, PG = hg.shape
    LV = pw["w2_p"].shape[1]
    BN = N if N <= 256 else 256
    assert N % BN == 0, f"batch {N} not a multiple of decode kernel tile {BN}"
    grid = (N // BN,)
    tile1 = pl.BlockSpec((BN, 1), lambda b: (b, 0), memory_space=pltpu.VMEM)
    state = pl.BlockSpec((L, BN, PG), lambda b: (0, b, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _decode_step_kernel(n_layers, blank, sos, max_sym, max_res_len, n_labels),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BN, J), lambda b: (b, 0), memory_space=pltpu.VMEM),
            tile1, tile1, tile1, tile1, tile1, tile1, tile1,
            state, state,
            const((LANE, PG)),
            const((L, PG, 4 * PG)),
            const((L, PG, 4 * PG)),
            const((L, 1, 4 * PG)),
            const((PG, J)),
            const((1, J)),
            const((J, LV)),
            const((1, LV)),
        ],
        out_specs=[tile1] * 7 + [state, state],
        out_shape=[jax.ShapeDtypeStruct((N, 1), jnp.int32)] * 7
        + [
            jax.ShapeDtypeStruct((L, N, PG), hg.dtype),
            jax.ShapeDtypeStruct((L, N, PG), jnp.float32),
        ],
        interpret=interpret,
    )(
        fi_proj, *lanes, hg, cg,
        pw["embed_p"], pw["w_ih_p"], pw["w_hh_p"], pw["b_p"],
        pw["w1_pred_p"], pw["b1_p"], pw["w2_p"], pw["b2_p"],
    )
    return out[:7], out[7], out[8]


def decode_step_pallas(
    fi_proj, lanes, hg, cg, pw, params, interpret=False
):
    """One fused decode step.  lanes = (pre_g, time_idx, symbols_added,
    res_idx, finish, f_lens, eos) as (N, 1) int32.  Returns
    ((pre_g', time', symadd', res_idx', finish', write_idx, symbols),
    hg', cg') — hg/cg in the padded (L, N, PG) layout."""
    return _decode_step(
        fi_proj, tuple(lanes), hg, cg, dict(pw),
        n_layers=len(pw["b_p"]),
        blank=params.BLANK,
        sos=params.SOS,
        max_sym=params.max_symbols_per_step,
        max_res_len=params.max_res_len,
        n_labels=params.num_labels,
        interpret=interpret,
    )
