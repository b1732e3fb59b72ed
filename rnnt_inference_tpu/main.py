"""CLI entry point: calibrate -> quantize -> benchmark/accuracy.

The staged flow of the reference's models/main.py (:19-89) and
models/arguments.py, minus the TorchScript export stage (unneeded in JAX):

  python -m rnnt_inference_tpu.main --model rnnt.pt --calibration \
      --calib_file train.npz --calib_out rnnt_calib.npz
  python -m rnnt_inference_tpu.main --model rnnt.pt --save_quant \
      --calib_in rnnt_calib.npz --quant_out rnnt_quant.npz
  python -m rnnt_inference_tpu.main --quant_in rnnt_quant.npz --benchmark \
      --scenario Offline --sample_file dev-clean.npz --accuracy
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser("rnnt_inference_tpu")
    # model artifacts
    p.add_argument("--model", type=str, default=None,
                   help="f32 checkpoint: zenodo rnnt.pt (torch) or weights .npz")
    p.add_argument("--calib_in", type=str, default=None)
    p.add_argument("--calib_out", type=str, default="rnnt_calib.npz")
    p.add_argument("--quant_in", type=str, default=None)
    p.add_argument("--quant_out", type=str, default="rnnt_quant.npz")
    # run mode (reference: arguments.py run_mode {None,f32,calib,quant,fake_quant})
    p.add_argument("--run_mode", type=str, default="bf16",
                   choices=["f32", "bf16", "quant", "fake_quant"])
    # stages
    p.add_argument("--calibration", action="store_true")
    p.add_argument("--save_quant", action="store_true")
    p.add_argument("--benchmark", action="store_true")
    p.add_argument("--accuracy", action="store_true")
    # data
    p.add_argument("--sample_file", type=str, default=None,
                   help="SampleStore .npz (waveforms or features)")
    p.add_argument("--calib_file", type=str, default=None)
    p.add_argument("--calib_list", type=str, default=None,
                   help="calibration file list (reference "
                        "configs/calibration_files.txt): restricts the "
                        "calibration stage to the listed utterances")
    p.add_argument("--manifest", type=str, default=None,
                   help="manifest JSON for WER scoring")
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic utterances instead of sample_file")
    # scenario
    p.add_argument("--scenario", type=str, default="Offline",
                   choices=["Offline", "Server", "SingleStream"])
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--split_len", type=int, default=-1)
    # sequence-packed Offline serving (runtime/packing.py): token-exact vs
    # bucketed by test, fully productized (native loadgen timing, mesh
    # lanes).  Default is AUTO by measured regime (round-5 A/Bs, same
    # emission statistics): packed wins dense cap-1 decode (+1.3%), the
    # bucketed path wins under the product decode cap 30 (+12% — the packed
    # lane buffer must budget max_res_len tokens for ~9 utterances and TPU
    # scatter cost scales with the carried buffer width).  The product cap
    # is 30 (reference config.py:14), so bare CLI runs serve bucketed;
    # --packed forces packed (the bench headline protocol runs cap=1 where
    # packed is the winner).  Feature-store runs are always bucketed.
    p.add_argument("--packed", dest="packed", action="store_true",
                   default=None,
                   help="force the sequence-packed Offline path")
    p.add_argument("--no_packed", dest="packed", action="store_false",
                   help="force the bucketed Offline path")
    p.add_argument("--pack_chunk", type=int, default=16,
                   help="packing grain in feature frames")
    p.add_argument("--pack_decode_chunk", type=int, default=128,
                   help="decode-scan grain over the packed timeline")
    p.add_argument("--server_slots", type=int, default=128)
    p.add_argument("--response_size", type=int, default=9)
    p.add_argument("--native_loadgen", action="store_true",
                   help="drive Server/SingleStream with the C++ mini-loadgen "
                        "(native Poisson issue thread + latency recorder)")
    p.add_argument("--mlperf_conf", type=str, default=None)
    p.add_argument("--user_conf", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="output")
    p.add_argument("--profiler_dir", type=str, default=None,
                   help="write a jax.profiler device trace of the run here "
                        "(reference: csrc/utils.hpp ProfileRecord)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None,
                   help="force a JAX platform (e.g. cpu) — set via config "
                        "update because JAX_PLATFORMS env can be overridden "
                        "by site customizations")
    return p.parse_args(argv)


def load_model_weights(args, params):
    """Resolve (weights, kind) from CLI flags."""
    import jax
    import jax.numpy as jnp

    from rnnt_inference_tpu.models import checkpoint as ckpt
    from rnnt_inference_tpu.models.weights import init_weights, load_torch_checkpoint

    if args.quant_in:
        return ckpt.load_quant_weights(args.quant_in, params), "quant"
    if args.model is None:
        w = init_weights(jax.random.PRNGKey(args.seed), params)
    elif args.model.endswith(".npz"):
        w = ckpt.load_weights(args.model, params)
    else:
        w = load_torch_checkpoint(args.model, params)
    if args.run_mode == "fake_quant":
        # quantization-error triage mode (reference run_mode fake_quant):
        # needs the calibrated activation amaxes
        from rnnt_inference_tpu.models.quant import fake_quantize_weights

        if not args.calib_in:
            raise SystemExit("--run_mode fake_quant requires --calib_in")
        calib = ckpt.load_calib(args.calib_in)
        return fake_quantize_weights(w.astype(jnp.float32), calib, params), "fake_quant"
    if args.run_mode == "bf16":
        w = w.astype(jnp.bfloat16)
    return w, args.run_mode


def load_store(args, path):
    from rnnt_inference_tpu.data.dataset import SampleStore

    if args.synthetic:
        return SampleStore.synthetic(n=args.synthetic, seed=args.seed)
    if path is None:
        raise SystemExit("need --sample_file/--calib_file or --synthetic N")
    return SampleStore.load(path)


def main(argv=None):
    args = parse_args(argv)
    from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams

    params = RNNTParams()
    cfg = FeaturizerConfig()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # persistent compile cache: uncached compiles cost minutes per shape on
    # remote-compile TPU backends (same setting bench.py uses)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache"),
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    weights, kind = load_model_weights(args, params)

    # -- stage: calibration (reference main.py:22-36) ------------------------
    if args.calibration:
        from rnnt_inference_tpu.models import checkpoint as ckpt
        from rnnt_inference_tpu.models.quant import calibrate
        from rnnt_inference_tpu.ops.features import log_mel_features
        from rnnt_inference_tpu.runtime.qsl import QuerySampleLibrary

        store = load_store(args, args.calib_file)
        if args.calib_list:
            store = store.filter_by_list(args.calib_list)
            print(f"calibration subset: {len(store)} utterances from "
                  f"{args.calib_list}")
        qsl = QuerySampleLibrary(store, cfg)
        feat_fn = jax.jit(lambda a, b: log_mel_features(a, b, cfg))
        batches = []
        order = qsl.sort_desc(np.arange(len(store)))
        B = min(args.batch_size, 32)
        for s in range(0, len(order), B):
            wav, lens, _ = qsl.assemble_waveforms(order[s : s + B], pad_n=B)
            batches.append(feat_fn(jnp.asarray(wav), jnp.asarray(lens)))
        calib = calibrate(weights.astype(jnp.float32), batches, params)
        ckpt.save_calib(args.calib_out, calib)
        print(f"calibration saved to {args.calib_out}: "
              f"pre_amax={np.asarray(calib.pre_amax)} "
              f"post_amax={np.asarray(calib.post_amax)}")

    # -- stage: quantize + save (reference main.py:38-58 / save_model.sh) ----
    if args.save_quant:
        from rnnt_inference_tpu.models import checkpoint as ckpt
        from rnnt_inference_tpu.models.quant import quantize_weights

        calib = ckpt.load_calib(args.calib_in or args.calib_out)
        qw = quantize_weights(weights.astype(jnp.float32), calib, params)
        ckpt.save_quant_weights(args.quant_out, qw)
        print(f"quantized model saved to {args.quant_out}")

    # -- stage: benchmark / accuracy (reference main.py:60-85) ---------------
    if args.benchmark or args.accuracy:
        from rnnt_inference_tpu.utils.profiler import device_trace

        store = load_store(args, args.sample_file)
        if args.manifest:
            from rnnt_inference_tpu.data.manifest import Manifest

            store.transcripts = Manifest([args.manifest], max_duration=15.0).transcripts

        with device_trace(args.profiler_dir):
            _run_scenario(args, weights, store, params, cfg)


def _write_summary(args, summary):
    print(json.dumps(summary, indent=2))
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


def _run_scenario(args, weights, store, params, cfg):
    import numpy as np

    from rnnt_inference_tpu.runtime.config import TestSettings, validate_report

    settings = TestSettings.from_conf(
        args.mlperf_conf, args.user_conf, "rnnt", args.scenario
    )
    # performance runs load exactly performance_sample_count samples into
    # the QSL and cycle queries over them (reference configs/mlperf.conf
    # rnnt override = 2513, csrc/rnnt_qsl.hpp:42-46); accuracy runs cover
    # the full set.  The trim is an MLPerf conf rule — apply it only when a
    # conf file was actually given, so bare benchmark runs serve the whole
    # store the user pointed at.
    if (
        not args.accuracy
        and (args.mlperf_conf or args.user_conf)
        and len(store) > settings.performance_sample_count
    ):
        store = store.select(np.arange(settings.performance_sample_count))

    if args.scenario == "Offline":
        from rnnt_inference_tpu.runtime.harness import run_offline

        # auto default = the measured winner for this decode config (see
        # parse_args --packed rationale): packed at cap 1, bucketed at the
        # product cap; --packed/--no_packed force either mode explicitly
        packed = args.packed
        if packed is None:
            packed = (
                store.kind == "waveform" and params.max_symbols_per_step == 1
            )
        elif packed and store.kind != "waveform":
            raise SystemExit("--packed requires a waveform sample store")
        if args.native_loadgen and not args.accuracy:
            from rnnt_inference_tpu.runtime.harness import run_offline_native

            report = run_offline_native(
                weights, store, params, cfg,
                batch_size=args.batch_size,
                split_len=args.split_len,
                target_qps=settings.target_qps,
                min_query_count=settings.min_query_count,
                min_duration_s=settings.min_duration_ms / 1e3,
                samples_per_query=settings.samples_per_query,
                # 0 = full store when no MLPerf conf was given (same rule as
                # the store trim above)
                performance_sample_count=(
                    settings.performance_sample_count
                    if (args.mlperf_conf or args.user_conf)
                    else 0
                ),
                packed=packed,
                chunk_frames=args.pack_chunk,
                decode_chunk=args.pack_decode_chunk,
            )
            _write_summary(args, validate_report(settings, report.summary()))
            return
        report = run_offline(
            weights, store, params, cfg,
            batch_size=args.batch_size,
            split_len=args.split_len,
            accuracy=args.accuracy,
            output_dir=args.output_dir,
            device_resident=not args.accuracy,
            packed=packed,
            chunk_frames=args.pack_chunk,
            decode_chunk=args.pack_decode_chunk,
        )
        print(json.dumps(report.summary(), indent=2))
    elif args.scenario == "Server":
        from rnnt_inference_tpu.runtime.harness import tokens_to_hex
        from rnnt_inference_tpu.runtime.scheduler import run_server
        from rnnt_inference_tpu.runtime.server import ServerRunner

        runner = ServerRunner(
            weights, params, cfg,
            slots=args.server_slots,
            split_len=max(args.split_len, 2) if args.split_len > 0 else 24,
        )
        # accuracy runs cover the set exactly once; performance runs honor
        # the conf's min_duration/min_query_count rules
        if args.native_loadgen and not args.accuracy:
            from rnnt_inference_tpu.runtime.scheduler import run_server_native

            report, results = run_server_native(
                runner, store, target_qps=settings.target_qps,
                response_size=args.response_size,
                min_query_count=settings.min_query_count,
                min_duration_s=settings.min_duration_ms / 1e3,
            )
            summary = validate_report(settings, dict(report, scenario="Server"))
        else:
            metrics, results = run_server(
                runner, store, target_qps=settings.target_qps,
                realtime=not args.accuracy,
                response_size=args.response_size,
                min_query_count=0 if args.accuracy else settings.min_query_count,
                min_duration_s=0.0 if args.accuracy else settings.min_duration_ms / 1e3,
            )
            summary = validate_report(settings, metrics.summary())
        _write_summary(args, summary)
        if args.accuracy:
            n = len(store)
            acc = [
                {"qsl_idx": q % n, "data": tokens_to_hex(results[q])}
                for q in sorted(results)
            ]
            with open(os.path.join(args.output_dir, "accuracy_log.json"), "w") as f:
                json.dump(acc, f)
    elif args.scenario == "SingleStream":
        from rnnt_inference_tpu.runtime.harness import run_single_stream

        if args.native_loadgen:
            from rnnt_inference_tpu.runtime.harness import run_single_stream_native

            report = run_single_stream_native(
                weights, store, params, cfg,
                min_query_count=settings.min_query_count,
                min_duration_s=settings.min_duration_ms / 1e3,
            )
        else:
            report = run_single_stream(weights, store, params, cfg,
                                       split_len=args.split_len)
        summary = validate_report(settings, report.summary())
        _write_summary(args, summary)
    else:
        raise SystemExit(f"unknown scenario {args.scenario}")


if __name__ == "__main__":
    main()
