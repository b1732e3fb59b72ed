"""Headline benchmark: Offline-scenario throughput on the local chip(s).

Prints ONE JSON line:
  {"metric": "offline_audio_seconds_per_second", "value": N,
   "unit": "audio-s/s", "vs_baseline": N / 46500}

Baseline: the reference (Intel MLPerf RNN-T, 2-socket SPR, 112 cores) targets
6000 utt/s Offline over dev-clean (~7.75 s/utt) ~= 46,500 audio-seconds/s for
the whole machine (BASELINE.md).  vs_baseline compares ONE TPU chip against
that full 2-socket system.

Env knobs: BENCH_N (samples, default 8192), BENCH_BATCH (default 1024),
BENCH_SECONDS (wav bucket ladder; the default 1 s ladder "2,3,...,14,15"
has padding efficiency 0.911 on the gamma-length synthetic set),
BENCH_DTYPE (quant|bf16|f32, default quant — the reference's own headline
mode), BENCH_EMISSION (blank|uniform), BENCH_MIN_S (measured-window
floor, s), BENCH_SYM_CAP, BENCH_BLANK_DELTA ("amp:delta" replay).

BENCH_EMISSION=blank (default) biases the random joint toward blank so
~70% of decode iterations advance time — the emission statistics of real
speech (~1 symbol per 2-3 frames; dev-clean transcripts are ~14 chars/s
of audio).  Unbiased random weights saturate the 30-symbols-per-frame cap
instead, which overweights the decode loop relative to any real workload.
BENCH_EMISSION=uniform keeps the round-1 unbiased behavior for comparison.
BENCH_EMISSION=burst (with BENCH_SYM_CAP=30) calibrates a realistic burst
model for the reference's product decode config: total rate 0.84
symbols/frame (BENCH_BURST_RATE) with mean burst length 1.05
(BENCH_BURST_FACTOR ~= 1 + P(burst >= 2)); see bias_joint_burst.

BENCH_SYM_CAP (default 1) sets max_symbols_per_step for the bench run.
Rationale: with random weights the prediction net cannot learn the
"emit one symbol then blank" dynamics of the trained model, so under the
product cap (30) every emitting frame BURSTS to the cap — per-lane
iteration counts become heavy-tailed and the lock-step while_loop pays
the max lane (~1.5x the mean), overweighting decode vs any real workload.
Real dev-clean decode almost never emits >1-2 symbols per frame:
iterations = frames + symbols with small lane variance.  Cap=1 reproduces
exactly that statistic (each emitting frame = 1 symbol + its advance);
the product default stays 30 (RNNTParams, reference config.py
max_symbols_per_step).  BENCH_SYM_CAP=30 keeps the bursty behavior.
The decode-loop iteration count estimate (lock-step: per batch the max
over lanes of post-stack frames + emitted symbols) is logged per run.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
from rnnt_inference_tpu.ops.lstm import set_lstm_impl
from rnnt_inference_tpu.data.dataset import SampleStore
from rnnt_inference_tpu.models.weights import init_weights
from rnnt_inference_tpu.runtime.harness import run_offline
from rnnt_inference_tpu.runtime.offline import OfflineRunner  # noqa: F401
from rnnt_inference_tpu.runtime.qsl import QuerySampleLibrary

BASELINE_AUDIO_S_PER_S = 46500.0
LAST_GOOD_PATH = os.environ.get(
    "BENCH_LAST_GOOD_PATH",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".bench_last_good.json"),
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _emit_unavailable(why: str):
    """Exactly one JSON line, then exit.  If a previous successful run left
    a last-known-good record, re-emit it marked ``"stale": true`` (a dated
    real measurement beats a zero when the outage is a relay artifact,
    VERDICT r3 item 6); otherwise emit the explicit zero/error record."""
    log(f"backend unavailable: {why}")
    payload = dict(
        metric="offline_audio_seconds_per_second",
        value=0,
        unit="audio-s/s",
        vs_baseline=0,
        error=f"TPU backend unavailable: {why}",
    )
    rc = 1
    try:
        with open(LAST_GOOD_PATH) as f:
            prev = json.load(f)
        prev["stale"] = True
        prev["error"] = f"TPU backend unavailable: {why}; re-emitting " \
            f"last-known-good from {prev.get('measured_at', 'unknown time')}"
        payload, rc = prev, 0
    except (OSError, ValueError):
        pass
    print(json.dumps(payload), flush=True)
    # any wedged probe thread is daemonic; _exit skips atexit hooks that
    # might touch the dead backend
    os._exit(rc)


def _bisect_delta(rate, target_rate, iters):
    """Bracket + bisect the blank delta for a MEASURED emission rate.

    `rate(delta)` is monotone DECREASING in delta; random inits can start
    blank-dominated (needing delta < 0), so both bracket ends expand
    geometrically first.  The rate-vs-delta curve can have cliffs (per-frame
    emission margins cluster), so the best point actually EVALUATED is
    returned, not the final midpoint.  Shared by the blank and burst
    emission calibrators."""
    evals = []

    def probe(delta):
        r = rate(delta)
        evals.append((delta, r))
        return r

    lo, hi = -1.0, 1.0
    while probe(lo) <= target_rate and lo > -4096:
        lo *= 4
    while probe(hi) > target_rate and hi < 4096:
        hi *= 4
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        if probe(mid) > target_rate:
            lo = mid
        else:
            hi = mid
    return min(evals, key=lambda dr: abs(dr[1] - target_rate))


def bias_joint_toward_blank(weights, params, cfg, target_rate=0.8, seed=123,
                            fixed_delta=None):
    """Shift the joint's blank logit so the decode emits ~target_rate symbols
    per post-stack frame (real speech: ~14 chars/s over 16.7 f-frames/s ≈
    0.84 symbols/frame; see module docstring).

    Two changes to the random joint:
      1. the prediction projection w1_pred is scaled down 20x, so whether a
         frame emits is decided by the FRAME features, not the prediction
         state.  Unmodified random weights are bistable per lane (the
         prediction LSTM falls into an attractor after the first emission
         and the lane then emits at every frame until the cap) — no blank
         bias can give an intermediate rate there.  Frame-decided emission
         makes the rate a monotonic function of the blank bias.
      2. the blank logit gets +delta, bisected on the MEASURED decode until
         the emission rate hits target_rate, so the decode-loop iteration
         count matches real speech (frames + symbols; under BENCH_SYM_CAP=1
         each emitting frame is exactly one symbol + its advance).  The
         bias is a weight value, not a traced constant: every bisection
         step reuses one compiled program.
    """
    import dataclasses as dc

    import numpy as _np

    from rnnt_inference_tpu.models.decoder import greedy_decode
    from rnnt_inference_tpu.ops.features import log_mel_features

    def biased_joint(amp: float, delta: float):
        jw = weights.joint
        jw = dc.replace(
            jw,
            w1_pred=(jw.w1_pred.astype(jnp.float32) * 0.05).astype(jw.w1_pred.dtype),
            w1_trans=(jw.w1_trans.astype(jnp.float32) * amp).astype(jw.w1_trans.dtype),
            b2=jw.b2.astype(jnp.float32)
            .at[params.BLANK]
            .add(delta)
            .astype(jw.b2.dtype),
        )
        return dc.replace(weights, joint=jw)

    rng = _np.random.RandomState(seed)
    if fixed_delta is not None:
        # "delta" or "amp:delta" — must replay BOTH knobs a calibrated run
        # logged ("blank-bias: using amp=A delta=D"), else the emission
        # statistics differ from the run the delta was captured from
        amp_s, _, delta_s = str(fixed_delta).rpartition(":")
        amp, delta = float(amp_s or 1.0), float(delta_s)
        log(f"blank-bias: fixed amp={amp:g} delta={delta:.4f}")
        return biased_joint(amp, delta)
    from rnnt_inference_tpu.data.dataset import speechlike_noise

    wav = jnp.asarray(
        _np.stack([speechlike_noise(rng, 64000) for _ in range(8)])
    )
    lens = jnp.full((8,), 64000, jnp.int32)
    feats, flens = jax.jit(lambda a, b: log_mel_features(a, b, cfg))(wav, lens)
    frames = float(jnp.sum(-(-flens // params.stack_time_factor)))

    # amp scales the FRAME projection w1_trans: when per-frame emission
    # logits cluster too tightly, rate-vs-delta is a step function and no
    # global bias hits an intermediate rate; amplifying frame variability
    # smooths the curve.  (The speechlike_noise AM envelope in the synthetic
    # store is the primary fix; this ladder is the backstop.)  Keep the amp
    # whose calibrated rate lands closest to target within a 2x band.
    best = None
    for amp in (1.0, 2.0, 4.0, 8.0):
        def with_delta(delta: float, amp=amp):
            return biased_joint(amp, delta)

        def rate(delta: float) -> float:
            _, rlens = greedy_decode(with_delta(delta), feats, flens, params=params)
            return float(_np.sum(_np.asarray(rlens))) / frames

        delta, r = _bisect_delta(rate, target_rate, iters=14)
        log(f"blank-bias calibration: amp={amp:g} delta={delta:.4f} -> "
            f"{r:.2f} symbols/frame (target {target_rate})")
        if best is None or abs(r - target_rate) < abs(best[2] - target_rate):
            best = (amp, delta, r, with_delta(delta))
        if 0.5 * target_rate <= r <= 2.0 * target_rate:
            break
    amp, delta, r, w = best
    log(f"blank-bias: using amp={amp:g} delta={delta:.4f} "
        f"({r:.2f} symbols/frame)")
    return w


def bias_joint_burst(weights, params, cfg, target_rate=0.84,
                     target_burst=1.05, seed=123, fixed=None):
    """Calibrated BURST emission model for benching the reference's actual
    decode config (max_symbols_per_step=30, reference models/config.py:14).

    The cap=1 headline protocol sidesteps burst dynamics entirely; raw
    random weights at cap=30 storm to the cap on every emitting frame
    (13,046 audio-s/s, round 4).  Real speech is in between: emission rate
    ~0.84 symbols per post-stack frame with P(burst >= 2) of a few %.

    Why random weights storm — and why small perturbations can't fix it: a
    frame emits when its emission margin m = logit_top - logit_blank > 0.
    After the emission, only the prediction-state contribution changes; if
    that change D is ZERO-MEAN (any random-weight prediction path), then
    P(m + D > 0) >= P(D > 0) = 1/2 — mean burst length >= 2, and in
    practice the margin barely moves, so the frame storms to the cap.
    Trained RNN-T suppresses bursts through an AGREEMENT mechanism instead:
    consuming a symbol moves the prediction state to "expect the NEXT
    char's acoustics", so the just-emitted frame (whose acoustics align to
    the consumed char) scores blank — D is systematically negative for the
    consumed symbol's logit.

    This model engineers exactly that mechanism into the random weights:

      1. the prediction net is made MEMORYLESS pass-through (w_hh = 0,
         input/output gates saturated open, forget gate closed): its
         output g is a fixed nonlinear map G(k) of the last emitted symbol
         k.  Same shapes, same MXU/VPU work per decode iteration — only
         the weight VALUES change, so decode cost stays realistic.
      2. w1_pred is CONSTRUCTED as -2*kappa * pinv(G) @ pinv(w2): through
         the relu's average 0.5 pass-rate, the joint's pred contribution
         to the logits becomes ~ -kappa * onehot(k) — repetition
         suppression of the consumed symbol.  A burst continues only when
         the frame's runner-up symbol ALSO clears blank, so burst
         probability falls smoothly as kappa grows.
      3. blank delta (bisected, as in bias_joint_toward_blank) sets the
         TOTAL emission rate at the product cap; kappa is laddered until
         the measured burst factor := symbols(cap)/symbols(cap=1) — the
         mean emitted burst length — hits `target_burst`.

    All three knobs are weight VALUES: every (kappa, delta) evaluation
    reuses the same two compiled decode programs (cap and cap=1).

    fixed="amp:delta:kappa" replays a calibrated triple (logged below).
    """
    import dataclasses as dc

    import numpy as _np

    from rnnt_inference_tpu.models.decoder import greedy_decode
    from rnnt_inference_tpu.ops.features import log_mel_features

    # ---- history-carrying pass-through prediction net (step 1) ------------
    # Layer 1 keeps a HALF-OPEN forget gate (decay 0.5 per consumed symbol):
    # without it, g encodes only the LAST symbol and a frame with two
    # above-blank symbols ping-pongs them to the cap (suppress k1 -> k2
    # wins -> suppressing k2 RELEASES k1 -> ...; measured burst ~11 at the
    # design stage).  With decay, g ~ sum_j 0.5^j G(k_j) over the recent
    # history, so every symbol of the current burst stays suppressed.
    def passthrough_layer(layer, forget_bias):
        w_ih = layer.w_ih.astype(jnp.float32)
        H4 = w_ih.shape[1]
        H = H4 // 4
        b = _np.zeros((H4,), _np.float32)
        b[0 * H : 1 * H] = 6.0   # input gate ~ open
        b[1 * H : 2 * H] = forget_bias
        b[3 * H : 4 * H] = 6.0   # output gate ~ open
        return dc.replace(
            layer,
            w_hh=jnp.zeros_like(layer.w_hh),
            b=jnp.asarray(b).astype(layer.b.dtype),
        )

    pred_rnn = [
        # layer 1: decay-0.5 history accumulator; deeper layers memoryless
        passthrough_layer(l, 0.0 if li == 0 else -6.0)
        for li, l in enumerate(weights.pred_rnn)
    ]

    # host-side replica (zero state) to tabulate the single-symbol map G(k);
    # the in-decode g for a burst is approximately the decayed mixture of
    # these (tanh mixing is mildly nonlinear — kappa is calibrated on the
    # MEASURED burst factor, which absorbs the approximation)
    def g_of_embeddings(E):
        sig = lambda v: 1.0 / (1.0 + _np.exp(-v))
        x = E
        for layer in pred_rnn:
            w_ih = _np.asarray(layer.w_ih, _np.float32)
            b = _np.asarray(layer.b, _np.float32)
            H = w_ih.shape[1] // 4
            gates = x @ w_ih + b
            i, f, g, o = (gates[:, k * H : (k + 1) * H] for k in range(4))
            c = sig(f) * 0.0 + sig(i) * _np.tanh(g)
            x = sig(o) * _np.tanh(c)
        return x  # (28, H_pred)

    # embed covers only the 28 EMITTABLE symbols (blank is never consumed,
    # SOS embeds to the zero vector via the reference's masked-fill hack)
    E = _np.asarray(weights.embed, _np.float32)  # (28, pred_input)
    G = g_of_embeddings(E)  # (28, H_pred)
    w2 = _np.asarray(weights.joint.w2, _np.float32)  # (joint_hidden, 29)
    # want G @ W1p @ (0.5 * w2) = -kappa * [I_28 | 0]  (relu pass-rate ~0.5):
    # consuming symbol k suppresses logit k by kappa, leaves blank untouched
    T_unit = _np.zeros((E.shape[0], w2.shape[1]), _np.float32)
    T_unit[: E.shape[0], : E.shape[0]] = -_np.eye(E.shape[0])
    W1p_unit = (
        _np.linalg.pinv(G) @ T_unit @ _np.linalg.pinv(w2)
    )  # (H_pred, joint_hidden)

    def biased_joint(amp, delta, kappa):
        jw = weights.joint
        jw = dc.replace(
            jw,
            w1_pred=jnp.asarray(2.0 * kappa * W1p_unit).astype(
                jw.w1_pred.dtype
            ),
            w1_trans=(jw.w1_trans.astype(jnp.float32) * amp).astype(jw.w1_trans.dtype),
            b2=jw.b2.astype(jnp.float32)
            .at[params.BLANK]
            .add(delta)
            .astype(jw.b2.dtype),
        )
        return dc.replace(weights, joint=jw, pred_rnn=pred_rnn)

    if fixed is not None:
        amp_s, delta_s, kappa_s = str(fixed).split(":")
        amp, delta, kappa = float(amp_s), float(delta_s), float(kappa_s)
        log(f"burst-bias: fixed amp={amp:g} delta={delta:.4f} kappa={kappa:g}")
        return biased_joint(amp, delta, kappa)

    # Calibration data: fixed 4 s speechlike windows — DELIBERATE, after two
    # measured attempts at store-duration-matched calibration failed
    # (measurements/, round 5): per-utterance normalization + short-
    # utterance variance spread per-utterance emission rates so widely that
    # every operating point with ON-TARGET MEAN rate has storming tails at
    # store scale (mean 0.90/0.96 sym/frame calibrations measured 1.96 and
    # 0.96 sym/frame with +67% and +148% lock-step skew, collapsing to
    # 9.9-13.2k audio-s/s) — tails real speech does not have.  The fixed-
    # window calibration lands at the conservative tail-clean operating
    # point (store-measured ~0.32 sym/frame, +2% skew); its light mean is
    # the documented caveat, and the cap-1 blank row (0.93 sym/frame, clean
    # tails, cap-independent per-iteration cost) is the better proxy for
    # real cap-30 ITERATION cost.
    rng = _np.random.RandomState(seed)
    from rnnt_inference_tpu.data.dataset import speechlike_noise

    wav_np = _np.stack([speechlike_noise(rng, 64000) for _ in range(8)])
    lens_np = _np.full((8,), 64000, _np.int32)
    feats, flens = jax.jit(lambda a, b: log_mel_features(a, b, cfg))(
        jnp.asarray(wav_np), jnp.asarray(lens_np)
    )
    frames_u = _np.maximum(
        _np.asarray(-(-flens // params.stack_time_factor)), 1
    ).astype(_np.float64)
    frames = float(frames_u.sum())
    params1 = dc.replace(params, max_symbols_per_step=1)

    def symbols(w, p):
        """-> (total symbols, per-utterance max rate) on the calib sample."""
        _, rlens = greedy_decode(w, feats, flens, params=p)
        r = _np.asarray(rlens, _np.float64)
        return float(r.sum()), float((r / frames_u).max())

    amp = 4.0  # frame-feature variability backstop (see bias_joint_toward_blank)

    def calibrated(kappa):
        """Bisect delta for target_rate at this kappa; return
        (delta, rate, burst_factor, tail) — tail = the worst single
        utterance's symbols/frame, the storm detector."""

        def rate(delta):
            return symbols(biased_joint(amp, delta, kappa), params)[0] / frames

        delta, r = _bisect_delta(rate, target_rate, iters=12)
        sym_cap, tail = symbols(biased_joint(amp, delta, kappa), params)
        sym_1, _ = symbols(biased_joint(amp, delta, kappa), params1)
        burst = sym_cap / max(sym_1, 1.0)
        log(f"burst calibration: kappa={kappa:g} delta={delta:.4f} -> "
            f"{r:.2f} sym/frame, burst factor {burst:.3f}, worst-utt "
            f"{tail:.2f} sym/frame (targets {target_rate}, {target_burst})")
        return delta, r, burst, tail

    # kappa ladder: burst factor falls from ~cap (kappa=0 storms) toward 1
    # as suppression grows; bracket the target, then bisect kappa
    # a candidate is admissible only if its mean rate is in band AND no
    # calibration utterance CAP-STORMS (worst-utt rate bounded well below
    # the cap): weak suppression can look on-target in the mean while a
    # minority of utterances burst to the cap — which the 8192-utterance
    # store then amplifies into heavy lock-step lane tails (a 12-utt
    # calibration once passed mean 1.06 that measured 1.96 sym/frame with
    # +67% skew at store scale).  This synthetic family cannot hold mean
    # ~0.84 with every utterance under ~2.5 sym/frame (per-utterance
    # normalization + short-utterance variance spread the per-utterance
    # rates), so the gate only excludes storms; the bench log's store-level
    # skew/symbols-per-frame line is the final health check.  The per-kappa
    # rate bisection is cliffy (per-utterance margins cluster), so single
    # out-of-band points say nothing about neighbors: scan the WHOLE
    # ladder, then refine geometrically around the best admissible point.
    tail_cap = min(10.0, 0.4 * params.max_symbols_per_step)
    ladder = (0.03125, 0.0625, 0.125, 0.25, 0.5, 1.0, 2.0, 4.0, 8.0,
              16.0, 32.0)
    best = None  # (|burst-target|, kappa, delta, r, burst)

    def consider(kappa):
        nonlocal best
        delta, r, burst, tail = calibrated(kappa)
        if 0.5 * target_rate <= r <= 2.0 * target_rate and tail <= tail_cap:
            cand = (abs(burst - target_burst), kappa, delta, r, burst)
            if best is None or cand < best:
                best = cand
        return burst

    for kappa in ladder:
        consider(kappa)
    if best is not None:
        # refine between the best kappa and its ladder neighbors
        k = best[1]
        for k_mid in (k / 2 ** 0.5, k * 2 ** 0.5, k / 2 ** 0.25, k * 2 ** 0.25):
            consider(k_mid)
    assert best is not None, "burst calibration failed at every kappa"
    _, kappa, delta, r, burst = best
    log(f"burst-bias: using amp={amp:g} delta={delta:.4f} kappa={kappa:g} "
        f"({r:.2f} sym/frame, burst factor {burst:.3f}; replay with "
        f"BENCH_BURST_DELTA={amp:g}:{delta:.4f}:{kappa:g})")
    global LAST_BURST_STATS
    LAST_BURST_STATS = dict(
        kappa=kappa, delta=round(delta, 4), sym_per_frame=round(r, 3),
        burst_factor=round(burst, 3),
    )
    return biased_joint(amp, delta, kappa)


# set by bias_joint_burst; folded into the bench protocol record so the
# cap-30 defense row carries its achieved emission statistics
LAST_BURST_STATS = None


def main():
    n = int(os.environ.get("BENCH_N", "8192"))
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    # 14-bucket 1 s ladder: padding efficiency 0.911 vs 0.874 for the
    # round-1 7-bucket ladder on the gamma-length synthetic set (+4%
    # throughput for a few more one-time compiles, all persistent-cached)
    buckets = tuple(
        float(s)
        for s in os.environ.get(
            "BENCH_SECONDS", "2,3,4,5,6,7,8,9,10,11,12,13,14,15"
        ).split(",")
    )
    # int8 fused-cat Pallas encoder + fused Pallas decode step are the
    # fastest measured config (and int8 is the reference's own headline
    # mode, quant_lstm.py:92-101); both are bit-exact vs their XLA paths.
    bench_dtype = os.environ.get("BENCH_DTYPE", "quant")
    dtype = jnp.bfloat16 if bench_dtype == "bf16" else jnp.float32
    set_lstm_impl(os.environ.get("RNNT_LSTM_IMPL", "pallas"))
    from rnnt_inference_tpu.models.decoder import set_decode_impl

    set_decode_impl(os.environ.get("RNNT_DECODE_IMPL", "auto"))

    # Backend resilience (round-3 lesson: a transient relay outage must
    # delay the measurement, not erase it).  Phase 1: subprocess probes with
    # exponential backoff up to BENCH_DEADLINE_S (default 3 h) — a wedged
    # relay costs one probe-timeout per attempt, never a hung bench.
    # Phase 2: once a throwaway probe succeeds, init in-process under a
    # thread guard (the backend could flap between probe and init).
    from rnnt_inference_tpu.utils.backend import wait_for_backend

    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", "10800"))
    if not wait_for_backend(deadline_s, log=log):
        _emit_unavailable(f"backend never came up within {deadline_s:.0f}s")

    import threading

    probe_done = threading.Event()
    probe_out = {}

    def _probe():
        try:
            probe_out["devices"] = jax.devices()
        except Exception as e:  # backend init error: also report, not raise
            probe_out["error"] = repr(e)
        probe_done.set()

    threading.Thread(target=_probe, daemon=True).start()
    init_timeout_s = float(os.environ.get("BENCH_BACKEND_TIMEOUT_S", "900"))
    if not probe_done.wait(init_timeout_s) or "error" in probe_out:
        why = probe_out.get(
            "error", f"jax.devices() still blocked after {init_timeout_s:.0f}s"
        )
        _emit_unavailable(why)

    log(f"backend={jax.default_backend()} devices={probe_out['devices']}")
    import dataclasses as _dc

    # 512 tokens comfortably covers <=15 s transcripts (~450 chars max);
    # halves the per-batch result transfer vs the 1024 default.
    # max_symbols_per_step: see module docstring (BENCH_SYM_CAP).
    params = _dc.replace(
        RNNTParams(),
        max_res_len=int(os.environ.get("BENCH_RES_LEN", "512")),
        max_symbols_per_step=int(os.environ.get("BENCH_SYM_CAP", "1")),
    )
    cfg = FeaturizerConfig()
    if bench_dtype == "quant":
        # int8 encoder path: synthetic calibration then quantize
        from rnnt_inference_tpu.models.quant import calibrate, quantize_weights
        from rnnt_inference_tpu.ops.features import log_mel_features

        w32 = init_weights(jax.random.PRNGKey(0), params, dtype=jnp.float32)
        import numpy as _np

        wav = jnp.asarray((_np.random.RandomState(1).randn(8, 64000) * 0.1).astype(_np.float32))
        feats, flens = jax.jit(lambda a, b: log_mel_features(a, b, cfg))(
            wav, jnp.full((8,), 64000, jnp.int32)
        )
        calib = calibrate(w32, [(feats, flens)], params)
        weights = quantize_weights(w32, calib, params)
        log("int8-quantized encoder (synthetic calibration)")
    else:
        weights = init_weights(jax.random.PRNGKey(0), params, dtype=dtype)

    emission = os.environ.get("BENCH_EMISSION", "blank")
    if emission == "blank":
        weights = bias_joint_toward_blank(
            weights, params, cfg, target_rate=0.8,
            # BENCH_BLANK_DELTA skips the measured bisection (dev loop);
            # unset, the delta is calibrated on-device
            fixed_delta=os.environ.get("BENCH_BLANK_DELTA"),
        )
    elif emission == "burst":
        # the cap-30 defense row (VERDICT r4 item 2): realistic burst
        # statistics under the reference's product decode config — run with
        # BENCH_SYM_CAP=30 so `params` carries the product cap
        weights = bias_joint_burst(
            weights, params, cfg,
            target_rate=float(os.environ.get("BENCH_BURST_RATE", "0.84")),
            target_burst=float(os.environ.get("BENCH_BURST_FACTOR", "1.05")),
            fixed=os.environ.get("BENCH_BURST_DELTA"),
        )

    store = SampleStore.synthetic(n=n, seed=0)
    qsl = QuerySampleLibrary(store, cfg, wav_buckets_s=buckets)
    log(f"store: {n} utts, {store.audio_seconds:.0f} audio-s; "
        f"buckets={qsl.wav_buckets}")

    # Sequence-packed Offline (runtime/packing.py) is the DEFAULT headline
    # mode since its gather-formulation fix measured +2.2% over the bucketed
    # path (64,852 vs 63,463 audio-s/s, round 4): no bucket padding or dead
    # rows; utterances concatenate along time on a BENCH_PACK_CHUNK-frame
    # grain with per-boundary state resets, token-exact vs the bucketed
    # path by test.  BENCH_PACKED=0 selects the bucketed path.
    packed = os.environ.get("BENCH_PACKED", "1") == "1"
    t0 = time.time()
    report = run_offline(
        weights,
        store,
        params,
        cfg,
        batch_size=batch,
        warmup=True,  # untimed: stage to HBM + compile bucket shapes
        device_resident=True,
        wav_buckets_s=buckets,
        packed=packed,
        chunk_frames=int(os.environ.get("BENCH_PACK_CHUNK", "16")),
        # decode-scan grain over the compacted timeline: larger chunks
        # average out per-chunk max-lane emission skew (sd ~ sqrt(DC)), at
        # the risk of the monolithic-decode per-iteration penalty round 4
        # measured; sweep via the queue (64/128/256)
        decode_chunk=int(os.environ.get("BENCH_PACK_DECODE_CHUNK", "128")),
        # 20 s window: relay RPC stalls (hundreds of ms, occasionally
        # seconds) amortize; measured run-to-run spread drops well under
        # the +-10% seen at 3 s windows
        min_duration_s=float(os.environ.get("BENCH_MIN_S", "20")),
    )
    log(f"total incl. staging+compile (untimed portion): {time.time()-t0:.1f}s")
    log(f"run: {report.wall_seconds:.2f}s wall, "
        f"{report.samples_per_second:.1f} utt/s, "
        f"{report.audio_seconds_per_second:.0f} audio-s/s; "
        f"per-rep walls {report.extra['rep_wall_seconds']}; "
        f"token readback (untimed) {report.extra['readback_seconds']}s")

    if packed:
        log(
            f"packing: efficiency={report.extra['packing_efficiency']} "
            f"chunks={report.extra['pack_chunks']} x "
            f"{report.extra['chunk_frames']} frames"
        )

    # decode-loop iteration statistics (VERDICT r1 item 8): the while_loop
    # is lock-step, so each batch costs max over its lanes of
    # (post-stack frames + emitted symbols); padding lanes are finished at
    # iteration 0.  Reconstructed host-side from the deterministic batch
    # plan + per-sample emission counts — no extra device work.  (The packed
    # path has its own accounting above: one loop, balanced lanes.)
    from rnnt_inference_tpu.runtime.qsl import batch_plan

    res_lens = [len(h) for h in report.hypotheses]
    t2 = {
        int(i): -(-cfg.out_frames(min(s.shape[0], qsl.wav_buckets[-1]))
                  // params.stack_time_factor)
        for i, s in enumerate(store.samples)
    }
    plan = batch_plan(qsl, batch)
    per_batch_max = [
        max(t2[i] + res_lens[i] for i in rows) + 1 for _S, rows, _g in plan
    ]
    per_batch_mean = [
        sum(t2[i] + res_lens[i] for i in rows) / len(rows) + 1
        for _S, rows, _g in plan
    ]
    total_t2 = sum(t2.values())
    total_sym = sum(res_lens)
    log(
        f"decode iterations: {sum(per_batch_max)} over {len(per_batch_max)} "
        f"batches (lock-step pays max lane; mean-lane floor "
        f"{sum(per_batch_mean):.0f}, skew overhead "
        f"{sum(per_batch_max) / max(sum(per_batch_mean), 1) - 1:+.0%}); "
        f"symbols/frame = {total_sym / total_t2:.2f}"
    )

    # Headline value = MEDIAN per-rep throughput.  The relayed PJRT backend
    # injects rare multi-second RPC stalls into individual reps (measured:
    # a 14.3 s rep amid 1.4 s reps) that are artifacts of the tunnel, not
    # the chip; the median over the >=BENCH_MIN_S window is robust to them.
    # The plain total-wall number is logged alongside for comparison.
    import numpy as _np

    rep_walls = report.extra["rep_wall_seconds"]
    total_wall = float(
        store.audio_seconds * report.extra["reps"] / report.wall_seconds
    )
    med = float(store.audio_seconds / _np.median(rep_walls))
    log(f"total-wall {total_wall:.0f} vs median-rep {med:.0f} audio-s/s "
        f"over {len(rep_walls)} reps")
    value = med
    # one JSON line; protocol fields record exactly which measurement
    # protocol produced the headline number (median-per-rep vs total-wall,
    # emission mode, symbol cap, dtype, rep count) so downstream comparisons
    # against the reference baseline are reproducible
    payload = {
        "metric": "offline_audio_seconds_per_second",
        "value": round(value, 1),
        "unit": "audio-s/s",
        "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 4),
        "protocol": {
            "value_is": "median_per_rep",
            "total_wall_value": round(total_wall, 1),
            "reps": len(rep_walls),
            "dtype": bench_dtype,
            "emission": os.environ.get("BENCH_EMISSION", "blank"),
            "max_symbols_per_step": params.max_symbols_per_step,
            "batch": batch,
            "n_samples": n,
            "packed": packed,
            "pack_chunk": int(os.environ.get("BENCH_PACK_CHUNK", "16")),
            "pack_decode_chunk": int(
                os.environ.get("BENCH_PACK_DECODE_CHUNK", "128")
            ),
            **({"burst": LAST_BURST_STATS} if LAST_BURST_STATS else {}),
        },
    }
    print(json.dumps(payload))
    # record last-known-good for the stale-fallback path — only for the
    # default (headline) configuration, so a stale re-emit never reports an
    # A/B leg's number as the headline
    if not any(k in os.environ for k in (
        "BENCH_DTYPE", "BENCH_EMISSION", "BENCH_SYM_CAP", "BENCH_N",
        "BENCH_BATCH", "BENCH_SECONDS", "RNNT_DECODE_IMPL", "BENCH_PACKED",
        "BENCH_PACK_CHUNK", "BENCH_PACK_DECODE_CHUNK",
    )):
        try:
            with open(LAST_GOOD_PATH, "w") as f:
                json.dump(dict(payload, measured_at=time.strftime(
                    "%Y-%m-%dT%H:%M:%S")), f)
        except OSError as e:
            log(f"last-good record not written: {e}")


if __name__ == "__main__":
    main()
