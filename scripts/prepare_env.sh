#!/bin/bash
# Environment preparation / readiness check (reference: prepare_env.sh, which
# builds clang, loadgen, patched PyTorch, oneDNN and the plugin stack).  The
# TPU-native framework needs none of that toolchain: JAX + XLA are the
# compiler, and the only native artifact is the mini-loadgen .so.  This
# script verifies the runtime prerequisites, builds the native loadgen, and
# optionally pre-warms the persistent compile cache.
set -e
cd "$(dirname "$0")/.."

echo "== python deps =="
python - <<'EOF'
import importlib, os
for mod in ("jax", "jaxlib", "numpy", "scipy"):
    m = importlib.import_module(mod)
    print(f"  {mod} {getattr(m, '__version__', '?')}")
import jax
# PLATFORM=cpu skips touching the accelerator (config update, not env var:
# site customizations can override JAX_PLATFORMS)
if os.environ.get("PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PLATFORM"])
    print(f"  backend: {jax.default_backend()} devices={jax.devices()}")
else:
    # the relayed TPU backend can block jax.devices() FOREVER during an
    # outage; probe in a killable subprocess with a deadline so stage -1
    # fails loudly instead of wedging the staged run (ADVICE r3)
    from rnnt_inference_tpu.utils.backend import probe_backend
    timeout = float(os.environ.get("PREPARE_PROBE_TIMEOUT_S", "300"))
    ok, detail = probe_backend(timeout_s=timeout)
    if not ok:
        raise SystemExit(f"  accelerator backend unavailable: {detail}\n"
                         "  (set PLATFORM=cpu to prepare without it)")
    print(f"  backend probe: {detail}")
EOF

echo "== native mini-loadgen =="
python - <<'EOF'
from rnnt_inference_tpu.runtime.native import get_lib
lib = get_lib()
print("  built OK" if lib is not None else "  g++ unavailable — native loadgen disabled (Python fallbacks remain)")
EOF

echo "== pure-python FLAC codec =="
python - <<'EOF'
import numpy as np
from rnnt_inference_tpu.data.flac import decode_flac, encode_flac
x = np.arange(-500, 500, dtype=np.int32)
out, sr, bps = decode_flac(encode_flac(x, 16000))
assert (out[:, 0] == x).all()
print("  round-trip OK (no external codec needed)")
EOF

if [ "${WARM_CACHE:-false}" = "true" ]; then
  echo "== warming the persistent compile cache (bench shapes) =="
  BENCH_N=64 BENCH_MIN_S=1 python bench.py >/dev/null || true
fi

echo "environment ready"
