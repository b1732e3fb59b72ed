"""High-level transcription API — the one-call front door.

    from rnnt_inference_tpu.transcribe import Transcriber
    t = Transcriber.from_checkpoint("rnnt.pt")       # or .npz / quantized
    text = t.transcribe(waveform_f32_16khz)          # one utterance
    texts = t.transcribe_batch(list_of_waveforms)    # batched
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from rnnt_inference_tpu.config import FeaturizerConfig, RNNTParams
from rnnt_inference_tpu.utils.labels import seq_to_sen


class Transcriber:
    def __init__(
        self,
        weights,
        params: RNNTParams = RNNTParams(),
        cfg: FeaturizerConfig = FeaturizerConfig(),
        batch_size: int = 8,
    ):
        from rnnt_inference_tpu.runtime.offline import OfflineRunner

        self.params = params
        self.cfg = cfg
        self.batch_size = batch_size
        self._runner = OfflineRunner(weights, params, cfg, batch_size=batch_size)

    @classmethod
    def from_checkpoint(
        cls,
        path: str,
        params: RNNTParams = RNNTParams(),
        bf16: bool = True,
        **kw,
    ) -> "Transcriber":
        import jax.numpy as jnp

        from rnnt_inference_tpu.models import checkpoint as ckpt
        from rnnt_inference_tpu.models.weights import load_torch_checkpoint

        if path.endswith(".npz"):
            try:
                w = ckpt.load_quant_weights(path, params)
            except AssertionError:
                w = ckpt.load_weights(path, params)
                if bf16:
                    w = w.astype(jnp.bfloat16)
        else:
            w = load_torch_checkpoint(path, params)
            if bf16:
                w = w.astype(jnp.bfloat16)
        return cls(w, params, **kw)

    def transcribe_batch(self, waveforms: Sequence[np.ndarray]) -> List[str]:
        """Waveforms: f32 arrays at 16 kHz (any lengths) -> transcripts."""
        from rnnt_inference_tpu.data.dataset import SampleStore
        from rnnt_inference_tpu.runtime.qsl import QuerySampleLibrary

        store = SampleStore(
            kind="waveform",
            samples=[np.asarray(w, np.float32) for w in waveforms],
            transcripts=[""] * len(waveforms),
        )
        qsl = QuerySampleLibrary(store, self.cfg)
        result = self._runner.run(qsl)
        return [seq_to_sen(t.astype(np.int32), len(t)) for t in result.tokens]

    def transcribe(self, waveform: np.ndarray) -> str:
        return self.transcribe_batch([waveform])[0]
