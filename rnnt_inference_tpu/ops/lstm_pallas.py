"""Pallas TPU kernel for the LSTM recurrence.

The XLA scan re-reads W_hh (8 MB bf16 at H=1024) from HBM every timestep —
~4 GB of HBM traffic per layer for a 500-frame chunk.  This kernel keeps
W_hh resident in VMEM for the whole sequence and streams the precomputed
input projections xw_t through the automatic Pallas pipeline (double-
buffered HBM->VMEM DMA), so per-step HBM traffic drops to the xw block
read + y block write (~1 MB at N=128).

Replaces the recurrent half of the reference's fused AMX kernels
(mlperf_plugins lstm_amx_int8 / lstm_amx_bf16, SURVEY §2.3) with the
TPU-idiomatic split:
  - input projection x@W_ih + b : ONE large MXU matmul over (T*N, IC) (XLA)
  - recurrence h@W_hh + gates   : this kernel, grid=(T,), state in VMEM

xw is staged at ops.lstm.xw_dtype (bf16 on the bf16 path, f32 under
RNNT_XW_F32=1) — the SAME rule as the XLA scan, so the Pallas and XLA
paths are numerically aligned and the perf-measured path does not differ
from the accuracy-validated one.  At batch 1024 the f32 xw stream was the
encoder's dominant HBM traffic; bf16 staging halves it.

VMEM budget at H=1024, BN=128: W_hh 8 MB bf16 + 2x xw blocks (2 MB bf16 /
4 MB f32) + 2x y blocks 0.5 MB + h/c scratch 0.75 MB ≈ 11-13 MB < 16 MB.
(N > 128 is tiled into 128-row tiles.)
"""

from __future__ import annotations

import functools
import os as _os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnnt_inference_tpu.models.weights import LSTMLayerWeights


def _lstm_scan_kernel(taxis):
  # grid = (batch_tiles, T) (or (T,) when one tile): T sweeps fastest, so
  # W_hh stays VMEM-resident for a whole tile's sequence; scratch re-inits
  # at each tile's t=0.  taxis = index of the time axis in the grid.
  def kernel(xw_ref, whh_ref, h0_ref, c0_ref,
             ys_ref, hT_ref, cT_ref,
             h_s, c_s):
    t = pl.program_id(taxis)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    from rnnt_inference_tpu.ops.activations import gate_fns

    sigmoid, tanh = gate_fns()
    gates = xw_ref[0].astype(jnp.float32) + jnp.dot(
        h_s[:], whh_ref[:], preferred_element_type=jnp.float32
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = sigmoid(f) * c_s[:] + sigmoid(i) * tanh(g)
    h_new = sigmoid(o) * tanh(c_new)

    h_b = h_new.astype(h_s.dtype)
    h_s[:] = h_b
    c_s[:] = c_new
    ys_ref[0] = h_new.astype(ys_ref.dtype)

    @pl.when(t == pl.num_programs(taxis) - 1)
    def _():
        hT_ref[:] = h_s[:]
        cT_ref[:] = c_s[:]

  return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lstm_recurrence(
    xw: jax.Array,  # (T, N, 4H) compute dtype, already includes bias
    w_hh: jax.Array,  # (H, 4H)
    h0: jax.Array,  # (N, H) compute dtype
    c0: jax.Array,  # (N, H) f32
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    T, N, H4 = xw.shape
    H = w_hh.shape[0]
    dtype = w_hh.dtype
    # tile the batch so VMEM holds W_hh + one tile's f32 xw buffers at any N
    BN = N if N <= 128 else 128
    assert N % BN == 0, f"batch {N} is not a multiple of the {BN} kernel tile"
    nb = N // BN
    if nb == 1:
        grid = (T,)
        xw_map, const_map, tile_map, ys_map = (
            lambda t: (t, 0, 0),
            lambda t: (0, 0),
            lambda t: (0, 0),
            lambda t: (t, 0, 0),
        )
        taxis = 0
    else:
        grid = (nb, T)
        xw_map, const_map, tile_map, ys_map = (
            lambda b, t: (t, b, 0),
            lambda b, t: (0, 0),
            lambda b, t: (b, 0),
            lambda b, t: (t, b, 0),
        )
        taxis = 1
    kernel = pl.pallas_call(
        _lstm_scan_kernel(taxis),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BN, H4), xw_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), const_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, H), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, H), tile_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BN, H), ys_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, H), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, H), tile_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, N, H), dtype),
            jax.ShapeDtypeStruct((N, H), dtype),
            jax.ShapeDtypeStruct((N, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BN, H), dtype),
            pltpu.VMEM((BN, H), jnp.float32),
        ],
        interpret=interpret,
    )
    ys, hT, cT = kernel(xw, w_hh, h0, c0)
    return ys, hT, cT


def lstm_layer_pallas(
    layer: LSTMLayerWeights,
    x: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in replacement for ops.lstm.lstm_layer using the Pallas kernel."""
    from rnnt_inference_tpu.ops.lstm import xw_dtype

    dtype = layer.w_ih.dtype
    x = x.astype(dtype)
    # xw staged at xw_dtype — the SAME rule as ops.lstm.lstm_layer, so the
    # Pallas and XLA paths stay numerically identical (f32 accumulation
    # either way; bf16 staging halves the dominant HBM stream at large N)
    xw = (
        jnp.dot(x, layer.w_ih, preferred_element_type=jnp.float32)
        + layer.b.astype(jnp.float32)
    ).astype(xw_dtype(dtype))
    ys, hT, cT = _lstm_recurrence(
        xw, layer.w_hh, h0.astype(dtype), c0.astype(jnp.float32), interpret=interpret
    )
    return ys, hT, cT


# ---------------------------------------------------------------------------
# int8 fused-cat kernel
# ---------------------------------------------------------------------------
#
# The XLA int8 scan was measured 3.3x SLOWER than bf16 (docs/PERFORMANCE.md):
# per-step quantize/requant VPU work plus poor int8 dot_general lowering
# inside lax.scan.  A first Pallas kernel (VMEM-resident int8 W_hh, hoisted
# int32 xw streamed from HBM) measured 138 ms at N=1024 — already 1.25x
# faster than bf16 — but the (T, N, 4H) int32 xw stream was its bottleneck
# (~30 GB/batch).  This kernel instead computes the input projection
# IN-KERNEL: both int8 weight matrices stay VMEM-resident (12 MB worst case
# at IC=2048) and the streamed input is the int8 x itself — 16x fewer HBM
# bytes per step.  gates = x_t@W_ih + h@W_hh in int32 is exactly the
# reference's cat(x,h) @ W_cat int8 GEMM with the shared cat scale
# (models/quant_lstm.py:92-101 lstm_amx_int8; integer adds are exact, so
# the split formulation bit-matches the numpy oracle in tests/test_quant.py),
# then dequant by rb_scale + f32 bias -> activations -> f32 cell (we keep
# f32 where the AMX kernel used f16 — strictly more accurate) -> requant
# h by in_scale (recurrence) and out_scale (layer output, skip_quant_y
# emits f32 instead).


def _quant_lstm_cat_kernel(taxis, emit_f32, bf16_gates=False):
  def kernel(x_ref, wih_ref, whh_ref, h0_ref, c0_ref, scales_ref,
             ys_ref, hT_ref, cT_ref,
             h_s, c_s):
    t = pl.program_id(taxis)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    rb = scales_ref[0, 0]        # 1 / (in_scale * w_scale)
    in_scale = scales_ref[0, 1]  # shared x/h recurrence scale
    out_scale = scales_ref[0, 2]
    bias = bias_ref_get(scales_ref)

    i32dot = lambda a, b: jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    def quantize(v, s):
        return jnp.clip(jnp.round(v * s), -128.0, 127.0).astype(jnp.int8)

    gates_i32 = i32dot(x_ref[0], wih_ref[:]) + i32dot(h_s[:], whh_ref[:])
    gates = gates_i32.astype(jnp.float32) * rb + bias
    if bf16_gates:
        # DIAGNOSTIC probe (RNNT_INT8_GATE_BF16=1, VERDICT r4 item 8): the
        # kernel's serial VPU section is the 5 transcendentals per element;
        # evaluate them on bf16 INPUTS (outputs cast back) while keeping
        # the cell-state multiply-accumulate in f32 — unlike the round-1
        # all-bf16-gates experiment, which also accumulated c in bf16.
        # Numerics change (~2^-8 gate inputs); tokens must be re-gated
        # before this could ever ship.
        i, f, g, o = jnp.split(gates.astype(jnp.bfloat16), 4, axis=-1)
        # sigmoid via tanh: jax.nn.sigmoid's logistic lowering hits a Mosaic
        # verifier bug on bf16 inputs (f32 constant broadcast into a bf16
        # vector); tanh lowers clean
        half = jnp.bfloat16(0.5)
        sig = lambda v: (
            half * jnp.tanh(half * v) + half
        ).astype(jnp.float32)
        tnh = lambda v: jnp.tanh(v).astype(jnp.float32)
        c_new = sig(f) * c_s[:] + sig(i) * tnh(g)
        h_new = sig(o) * tnh(c_new.astype(jnp.bfloat16))
    else:
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c_s[:] + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    h_s[:] = quantize(h_new, in_scale)
    c_s[:] = c_new
    if emit_f32:
        ys_ref[0] = h_new
    else:
        ys_ref[0] = quantize(h_new, out_scale)

    @pl.when(t == pl.num_programs(taxis) - 1)
    def _():
        hT_ref[:] = h_s[:]
        cT_ref[:] = c_s[:]

  return kernel


def bias_ref_get(scales_ref):
    """Bias row stored alongside the scalars: scales_ref is (2, 4H) f32 with
    row 0 = [rb, in_scale, out_scale, 0...] and row 1 = the folded bias."""
    return scales_ref[1, :]


@functools.partial(
    jax.jit, static_argnames=("emit_f32", "bf16_gates", "interpret")
)
def _quant_lstm_recurrence(
    x: jax.Array,       # (T, N, IC) int8
    w_ih: jax.Array,    # (IC, 4H) int8
    w_hh: jax.Array,    # (H, 4H) int8
    h0: jax.Array,      # (N, H) int8
    c0: jax.Array,      # (N, H) f32
    scales: jax.Array,  # (2, 4H) f32: [rb, in_scale, out_scale, 0...; bias]
    emit_f32: bool,
    bf16_gates: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    T, N, IC = x.shape
    H, H4 = w_hh.shape
    # tile size: bigger tiles = fewer grid steps and larger MXU ops (the
    # 12 MB resident weight pair + per-tile f32 gate buffers fit under the
    # raised 64 MB scoped-vmem cap; 128 was the 16 MB-era choice).
    # Measured at N=1024 T=500: 256 is ~6% faster than 128, 512 neutral.
    # Non-divisible N (e.g. 384) falls back to smaller power-of-two tiles
    # rather than asserting.
    BN = int(_os.environ.get("RNNT_INT8_BN", "256"))
    BN = N if N <= BN else BN
    while N % BN and BN > 8:
        BN //= 2
    assert N % BN == 0, f"batch {N} is not a multiple of the {BN} kernel tile"
    nb = N // BN
    if nb == 1:
        grid = (T,)
        x_map = lambda t: (t, 0, 0)
        const_map = lambda t: (0, 0)
        tile_map = lambda t: (0, 0)
        taxis = 0
    else:
        grid = (nb, T)
        x_map = lambda b, t: (t, b, 0)
        const_map = lambda b, t: (0, 0)
        tile_map = lambda b, t: (b, 0)
        taxis = 1
    y_dtype = jnp.float32 if emit_f32 else jnp.int8
    kernel = pl.pallas_call(
        _quant_lstm_cat_kernel(taxis, emit_f32, bf16_gates),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BN, IC), x_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((IC, H4), const_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), const_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, H), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, H), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H4), const_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BN, H), x_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, H), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, H), tile_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, N, H), y_dtype),
            jax.ShapeDtypeStruct((N, H), jnp.int8),
            jax.ShapeDtypeStruct((N, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BN, H), jnp.int8),
            pltpu.VMEM((BN, H), jnp.float32),
        ],
        # the resident weight pair alone is 12 MB at IC=2048; with
        # double-buffered x/y blocks some shapes (e.g. T=217, IC=2048)
        # exceed Mosaic's default 16 MB scoped-vmem budget.  v5e has
        # 128 MB VMEM — raise this kernel's cap instead of shrinking tiles.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )
    ys, hT, cT = kernel(x, w_ih, w_hh, h0, c0, scales)
    return ys, hT, cT


def quant_lstm_layer_pallas(
    layer,  # models.quant.QuantLSTMLayerWeights
    x_i8: jax.Array,
    h_i8: jax.Array,
    c: jax.Array,
    emit_f32: bool,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in replacement for ops.lstm_int8.quant_lstm_layer."""
    H4 = layer.w_hh.shape[1]
    scalars = jnp.zeros((H4,), jnp.float32)
    scalars = scalars.at[0].set(layer.rb_scale)
    scalars = scalars.at[1].set(layer.in_scale)
    scalars = scalars.at[2].set(layer.out_scale)
    scales = jnp.stack([scalars, layer.b.astype(jnp.float32)])
    return _quant_lstm_recurrence(
        x_i8, layer.w_ih, layer.w_hh, h_i8, c.astype(jnp.float32), scales,
        emit_f32=emit_f32,
        # static arg -> env flips retrace; DIAGNOSTIC only (kernel comment)
        bf16_gates=_os.environ.get("RNNT_INT8_GATE_BF16", "0") == "1",
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Measured-negative MXU/VPU-overlap variants (deleted)
# ---------------------------------------------------------------------------
#
# Three kernel structures tried to overlap the recurrence's int8/bf16 MXU
# GEMMs with the VPU gate transcendentals and all measured SLOWER on v5e
# (docs/PERFORMANCE.md "Microbenchmarks & negative results" and "Round-4
# measurements"):
#   1. pl.when two-half interleave        13.25 vs 10.66 ms (bf16, round 1)
#   2. straight-line half-tile interleave 186.8/193.9/198.7 ms for 1/2/4
#      halves (int8, round 3)
#   3. cross-grid-step software pipeline  253.0 vs 207.0 ms (int8, round 4,
#      bit-exact on device)
# Mosaic serializes the MXU and VPU chains regardless of kernel structure;
# the plain kernels above are the speed of light for this recurrence.  The
# variants' code lives at git ee9f3f3..84b8218 if ever needed again.
