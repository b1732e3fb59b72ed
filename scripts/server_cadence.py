"""Dispatch-free Server step cadence (VERDICT r4 item 4).

Rounds 3-4 measured the Server "device step cadence" with a 50-dispatch
host chain (scripts/server_probe.py phase 1) and got 5.35 vs 6.2 ms across
relay instances — a 16% delta left unattributed.  Two flaws in that
protocol, both fixed here:

  1. Host dispatch overhead is INSIDE the measurement (the async chain still
     pays a per-dispatch submit cost that varies by relay instance; the int8
     encoder microbench measured ~10 ms/dispatch on one instance).  Fix: the
     same fused multi-step chained K times in ONE jitted lax.fori_loop —
     zero dispatches inside the timed window (the protocol the round-4 int8
     microbench established).
  2. The probe filled half the slots with 8 s samples and then ran 50
     dispatches x 4 steps x 24 frames = 4800 frames: the samples (~134
     post-splice frames) drain after ~1.4 dispatches, so ~97% of the
     measured steps ran with EMPTY slots (w_lens=0 -> the decode while_loop
     exits at iteration 0).  Fix: slots are kept active for the whole
     window by wrapping their offsets (cadence-only device program; not
     product semantics), and the empty-step floor is reported separately.

Rows printed (all ms per server_step = one split_len-frame window over all
slots):
  - device_loop_active_ms: K steps in one program, ALL slots active with
    blank-biased emission (the honest sustained-streaming cadence)
  - device_loop_empty_ms:  same program shape, all slots empty (the floor
    the old protocol mostly measured, minus its dispatch overhead)
  - dispatch_chain_ms:     the round-3/4 protocol replica (ServerRunner
    step_async chain, half slots, drained) for cross-round attribution;
    reported per STEP (each dispatch fuses steps_per_dispatch=4 steps)

Usage: python scripts/server_cadence.py  [env: CAD_SLOTS=128 CAD_SPLIT=24
CAD_STEPS=96 CAD_DTYPE=quant CAD_SYM_CAP=1 BENCH_BLANK_DELTA=amp:delta]
"""

import dataclasses
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
from rnnt_inference_tpu.data.dataset import SampleStore, speechlike_noise
from rnnt_inference_tpu.models.weights import init_weights
from rnnt_inference_tpu.ops.features import log_mel_features
from rnnt_inference_tpu.ops.lstm import set_lstm_impl
from rnnt_inference_tpu.runtime.server import (
    ServerRunner,
    init_server_state,
    server_step,
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[tuple(0 for _ in leaf.shape)])


def main():
    slots = int(os.environ.get("CAD_SLOTS", "128"))
    split = int(os.environ.get("CAD_SPLIT", "24"))
    K = int(os.environ.get("CAD_STEPS", "96"))
    sym_cap = int(os.environ.get("CAD_SYM_CAP", "1"))
    set_lstm_impl("pallas")
    params = dataclasses.replace(
        RNNTParams(), max_res_len=512, max_symbols_per_step=sym_cap
    )
    cfg = FeaturizerConfig()

    if os.environ.get("CAD_DTYPE", "quant") == "quant":
        from rnnt_inference_tpu.models.quant import calibrate, quantize_weights

        w32 = init_weights(jax.random.PRNGKey(0), params, dtype=jnp.float32)
        xc = jax.random.normal(
            jax.random.PRNGKey(1), (64, 8, params.trans_input_size)
        )
        weights = quantize_weights(
            w32, calibrate(w32, [(xc, jnp.full((8,), 64, jnp.int32))], params),
            params,
        )
    else:
        weights = init_weights(jax.random.PRNGKey(0), params, dtype=jnp.bfloat16)

    # realistic emission for the active row (the decode while_loop's
    # iteration count is emission-dependent); reuses the bench calibrators.
    # CAD_EMISSION=burst + CAD_SYM_CAP=30 measures the PRODUCT decode
    # config's sustained cadence with trained-model-like burst statistics
    # (replay the bench-calibrated triple via CAD_BURST_DELTA).
    if os.environ.get("CAD_EMISSION", "blank") == "burst":
        from bench import bias_joint_burst

        weights = bias_joint_burst(
            weights, params, cfg,
            fixed=os.environ.get("CAD_BURST_DELTA", "4:-0.0312:2.82843"),
        )
    else:
        from bench import bias_joint_toward_blank

        weights = bias_joint_toward_blank(
            weights, params, cfg, target_rate=0.8,
            fixed_delta=os.environ.get("BENCH_BLANK_DELTA"),
        )

    enc_dtype = weights.pre_rnn[0].w_ih.dtype
    pred_dtype = weights.pred_rnn[0].w_ih.dtype
    max_frames = -(-cfg.out_frames(int(15.0 * cfg.sample_rate)) // split) * split

    # fill every slot with real featurized audio (LSTM cost is shape-
    # determined, but emission statistics come from the data distribution
    # the blank bias was calibrated on)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(
        np.stack([speechlike_noise(rng, 240000) for _ in range(slots)])
    )
    feats, flens = jax.jit(lambda a, b: log_mel_features(a, b, cfg))(
        wav, jnp.full((slots,), 240000, jnp.int32)
    )
    state0 = init_server_state(slots, max_frames, params, cfg,
                               enc_dtype, pred_dtype)
    T = min(int(feats.shape[0]), max_frames)
    state0 = dataclasses.replace(
        state0,
        F=state0.F.at[:T].set(feats[:T]),
        F_lens=jnp.full((slots,), T, jnp.int32),
        active=jnp.ones((slots,), bool),
    )

    def wrap_step(st):
        """One product server_step, then keep the slot eternally active:
        offsets that would run past F_lens wrap to 0 and token buffers are
        reset so they never overflow.  CADENCE ONLY — the wrap breaks decode
        semantics (a wrapped slot re-decodes its own audio), but every step
        does exactly the product step's work."""
        st, _fin = server_step(weights, st, split, params)
        offsets = jnp.where(st.offsets + split > st.F_lens, 0, st.offsets)
        decode = dataclasses.replace(
            st.decode, res_idx=jnp.zeros_like(st.decode.res_idx)
        )
        return dataclasses.replace(
            st, offsets=offsets, active=jnp.ones_like(st.active), decode=decode
        )

    @jax.jit
    def chain(st):
        return jax.lax.fori_loop(0, K, lambda i, s: wrap_step(s), st)

    # -- device-loop ACTIVE cadence ----------------------------------------
    out = chain(state0)
    sync(out)  # compile + warm
    reps = 5
    walls = []
    for _ in range(reps):
        t0 = time.time()
        out = chain(state0)
        sync(out)
        walls.append((time.time() - t0) / K * 1e3)
    active_ms = float(np.median(walls))
    log(f"device-loop ACTIVE: {active_ms:.2f} ms/step over {slots} slots "
        f"x {split} frames (K={K}, reps {['%.2f' % w for w in walls]})")

    # -- device-loop EMPTY floor --------------------------------------------
    state_e = init_server_state(slots, max_frames, params, cfg,
                                enc_dtype, pred_dtype)
    out = chain(state_e)
    sync(out)
    walls_e = []
    for _ in range(reps):
        t0 = time.time()
        out = chain(state_e)
        sync(out)
        walls_e.append((time.time() - t0) / K * 1e3)
    empty_ms = float(np.median(walls_e))
    log(f"device-loop EMPTY: {empty_ms:.2f} ms/step")

    # -- round-3/4 dispatch-chain protocol replica ---------------------------
    runner = ServerRunner(weights, params, cfg, slots=slots, split_len=split)
    store = SampleStore.synthetic(n=slots, seed=0)
    runner.warmup()
    wavs = [store.samples[i] for i in range(slots // 2)]
    ids = list(range(len(wavs)))
    for s0 in range(0, len(wavs), runner.insert_batch):
        chunk = wavs[s0 : s0 + runner.insert_batch]
        runner.insert_samples(chunk, ids[s0 : s0 + len(chunk)])
    KD = 50
    masks = [runner.step_async() for _ in range(2)]
    np.asarray(masks[-1])
    t0 = time.time()
    masks = [runner.step_async() for _ in range(KD)]
    np.asarray(masks[-1])
    # each dispatch fuses steps_per_dispatch product steps; report per STEP
    dispatch_ms = (time.time() - t0) / (KD * runner.steps_per_dispatch) * 1e3
    log(f"dispatch-chain replica: {dispatch_ms:.2f} ms/step "
        f"({KD} dispatches x {runner.steps_per_dispatch} steps, half slots, "
        f"drains early — the round-3/4 protocol's number)")

    # capacity at the honest cadence: audio seconds consumed per second
    frame_s = cfg.hop_length * cfg.frame_splicing / cfg.sample_rate
    audio_per_step = slots * split * frame_s
    cap = audio_per_step / (active_ms / 1e3)
    log(f"sustained streaming capacity at ACTIVE cadence: {cap:.0f} audio-s/s "
        f"({audio_per_step:.1f} audio-s per step)")

    print(json.dumps({
        "metric": "server_step_cadence_ms",
        "value": round(active_ms, 3),
        "unit": "ms",
        "device_loop_active_ms": round(active_ms, 3),
        "device_loop_empty_ms": round(empty_ms, 3),
        "dispatch_chain_ms_per_step": round(dispatch_ms, 3),
        "slots": slots, "split": split, "k": K,
        "sym_cap": sym_cap,
        "emission": os.environ.get("CAD_EMISSION", "blank"),
        "capacity_audio_s_per_s": round(cap, 0),
    }))


if __name__ == "__main__":
    main()
