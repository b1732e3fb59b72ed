"""Golden-bundle regression gate (VERDICT r3 item 8).

With real dev-clean WER unreachable in this image, the committed golden
bundle is the accuracy contract: tokens of a fixed-seed small model over
fixed-seed synthetic utterances, under every numeric mode (f32, fake_quant,
quant, packed), must match tests/golden/golden.npz byte for
byte.  A mismatch means quantization scale algebra, decode mask algebra,
packing, or the featurizer changed semantics — fail loudly and either fix
the regression or intentionally regenerate via scripts/make_golden.py.
"""

import os

import numpy as np
import pytest

from rnnt_inference_tpu.utils.golden import compute_golden, load_golden

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden.npz")


@pytest.fixture(scope="module")
def recomputed():
    return compute_golden()


def test_bundle_exists():
    assert os.path.exists(GOLDEN), (
        "tests/golden/golden.npz missing — run scripts/make_golden.py"
    )


@pytest.mark.parametrize(
    "mode", ["f32", "fake_quant", "quant", "packed"]
)
def test_tokens_match_golden(recomputed, mode):
    want = load_golden(GOLDEN)[mode]
    got = recomputed[mode]
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        assert np.array_equal(g, w), (
            f"{mode} sample {i}: {g.tolist()} != golden {w.tolist()}"
        )


def test_quant_differs_from_f32(recomputed):
    """Sanity: the bundle actually exercises quantization (int8 rounding
    must perturb at least one sequence, else the gate is vacuous)."""
    diff = any(
        not np.array_equal(a, b)
        for a, b in zip(recomputed["f32"], recomputed["quant"])
    )
    assert diff, "quant tokens identical to f32 — bundle not discriminating"
