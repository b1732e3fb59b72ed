"""rnnt_inference_tpu — a TPU-native RNN-T speech-recognition inference framework.

Built on JAX/XLA/Pallas/pjit with the capabilities of the Intel MLPerf RNN-T
CPU submission (reference mounted at /root/reference), re-designed TPU-first:
log-mel frontend as fused XLA/Pallas ops, LSTM encoder/prediction as
scan/Pallas recurrent kernels (bf16/int8), greedy transducer decode as an
on-chip lax.while_loop, and MLPerf-style Offline/Server serving scenarios
scaling over jax.sharding meshes.
"""

from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams

__version__ = "0.1.0"

__all__ = ["RNNTParams", "FeaturizerConfig", "__version__"]
