"""High-level Transcriber API."""

import numpy as np
import jax

from rnnt_inference_tpu.config import RNNTParams
from rnnt_inference_tpu.models.weights import init_weights
from rnnt_inference_tpu.transcribe import Transcriber

SMALL = RNNTParams(
    trans_input_size=240,
    trans_hidden_size=64,
    pred_hidden_size=32,
    joint_hidden_size=32,
    max_res_len=128,
)


def test_transcriber_api():
    w = init_weights(jax.random.PRNGKey(0), SMALL)
    t = Transcriber(w, SMALL, batch_size=2)
    rng = np.random.RandomState(0)
    wavs = [rng.randn(int(s * 16000)).astype(np.float32) * 0.1 for s in (0.4, 0.7, 0.5)]
    texts = t.transcribe_batch(wavs)
    assert len(texts) == 3
    assert all(isinstance(s, str) for s in texts)
    single = t.transcribe(wavs[1])
    assert single == texts[1]
