"""Phase-level timing of the sequence-packed Offline path.

Round-4 measurement: BENCH_PACKED=1 scored 39.8k audio-s/s vs 63.5k
unpacked (chunk grain 16 vs 32 indistinguishable), i.e. the packed rep
wall is +0.59 s.  Neither HBM-traffic nor kernel-ramp estimates explain
that, so this script times each phase of PackedOfflineRunner separately
on the real chip:

  A  featurize + scatter (per staged wav-bucket batch)
  B  chunked encoder scan only
  C  compaction gather only
  D  packed greedy decode only (starts-aware while_loop)

Usage: python scripts/diag_packed.py [n_utts] [n_lanes] [chunk_frames]
Prints one JSON line with per-phase ms.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
from rnnt_inference_tpu.data.dataset import SampleStore
from rnnt_inference_tpu.models import rnnt as model
from rnnt_inference_tpu.models.decoder import (
    _greedy_decode_chunk_xla,
    init_decode_state,
)
from rnnt_inference_tpu.models.quant import calibrate, quantize_weights
from rnnt_inference_tpu.models.weights import init_weights
from rnnt_inference_tpu.ops.lstm import set_lstm_impl
from rnnt_inference_tpu.runtime.packing import PackedOfflineRunner
from rnnt_inference_tpu.runtime.qsl import QuerySampleLibrary


def sync(x):
    # slice ONE element on device, read back 4 bytes — np.asarray of the
    # full buffer would drag GBs through the ~43 MB/s relay (CLAUDE.md)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[tuple(0 for _ in leaf.shape)])


def timed(fn, reps=3):
    sync(fn())  # compile + warm, fully drained before the clock starts
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.time() - t0) / reps * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    set_lstm_impl("pallas")
    params = RNNTParams()
    cfg = FeaturizerConfig()
    w32 = init_weights(jax.random.PRNGKey(0), params, dtype=jnp.float32)
    xc = jax.random.normal(jax.random.PRNGKey(1), (64, 8, params.trans_input_size))
    weights = quantize_weights(
        w32, calibrate(w32, [(xc, jnp.full((8,), 64, jnp.int32))], params), params
    )

    store = SampleStore.synthetic(n=n, seed=0)
    qsl = QuerySampleLibrary(store, cfg)
    runner = PackedOfflineRunner(
        weights, params, cfg, n_lanes=n_lanes, chunk_frames=chunk
    )
    plan = runner.stage(qsl)
    print(
        f"plan: {plan.n_chunks} chunks x {chunk} frames x {n_lanes} lanes, "
        f"efficiency {plan.packing_efficiency:.4f}",
        file=sys.stderr,
    )

    # ---- A: featurize + scatter over all staged batches
    def phase_a():
        packed = runner._packed
        for wav, lens, dest_t, dest_lane in runner._staged:
            packed = runner._stage_batch(packed, wav, lens, dest_t, dest_lane)
        return packed

    # phase A donates runner._packed; re-stage a fresh buffer each call
    T_pack = plan.n_chunks * chunk

    def phase_a_fresh():
        packed = jnp.zeros((T_pack, n_lanes, cfg.out_feat), jnp.float32)
        for wav, lens, dest_t, dest_lane in runner._staged:
            packed = runner._stage_batch(packed, wav, lens, dest_t, dest_lane)
        return packed

    ms_a = timed(phase_a_fresh)
    packed = phase_a_fresh()
    sync(packed)

    ch = cfg.out_feat
    C = plan.n_chunks
    P = chunk
    N = n_lanes
    stack = params.stack_time_factor
    enc_dtype = weights.pre_rnn[0].w_ih.dtype
    pred_dtype = weights.pred_rnn[0].w_ih.dtype
    f_dtype = weights.joint.w1_trans.dtype

    @jax.jit
    def phase_b(packed, chunk_lens, resets):
        xck = packed.reshape(C, P, N, ch)
        enc0 = model.init_encoder_state(N, params, enc_dtype)

        def enc_step(est, inp):
            x_c, lens_c, reset_c = inp
            m1 = reset_c[None, :, None]
            z = lambda a: jnp.where(m1, jnp.zeros_like(a), a)
            est = model.EncoderState(
                pre_h=z(est.pre_h), pre_c=z(est.pre_c),
                post_h=z(est.post_h), post_c=z(est.post_c),
            )
            f_c, est = model.transcription(weights, x_c, lens_c, est, params)
            return est, f_c.astype(f_dtype)

        _, f_all = jax.lax.scan(enc_step, enc0, (xck, chunk_lens, resets))
        return f_all.reshape(C * (P // stack), N, f_all.shape[-1])

    ms_b = timed(lambda: phase_b(packed, runner._chunk_lens, runner._resets))
    f_all = phase_b(packed, runner._chunk_lens, runner._resets)
    sync(f_all)

    @jax.jit
    def phase_c(f_all, src_idx):
        return jnp.take_along_axis(f_all, src_idx[:, :, None], axis=0)

    ms_c = timed(lambda: phase_c(f_all, runner._src_idx))
    f_packed = phase_c(f_all, runner._src_idx)
    sync(f_packed)

    pp = runner._params_pack

    @jax.jit
    def phase_d(f_packed, lane_f_lens, starts):
        st0 = init_decode_state(N, pp, enc_dtype, pred_dtype)
        st = _greedy_decode_chunk_xla(
            weights, st0, f_packed, lane_f_lens, pp, starts=starts
        )
        return st.res, st.res_idx

    ms_d = timed(
        lambda: phase_d(f_packed, runner._lane_f_lens, runner._starts)
    )

    audio_s = store.audio_seconds
    total_ms = ms_a + ms_b + ms_c + ms_d
    print(json.dumps({
        "metric": "packed_phase_ms",
        "value": round(total_ms, 1),
        "unit": "ms",
        "phase_a_scatter": round(ms_a, 1),
        "phase_b_encoder": round(ms_b, 1),
        "phase_c_compact": round(ms_c, 1),
        "phase_d_decode": round(ms_d, 1),
        "audio_s": round(audio_s, 1),
        "audio_s_per_s": round(audio_s / (total_ms / 1e3), 1),
        "n": n, "n_lanes": n_lanes, "chunk": chunk,
        "n_chunks": C,
        "efficiency": round(plan.packing_efficiency, 4),
    }))


if __name__ == "__main__":
    main()
