"""Regenerate the committed golden bundle (tests/golden/golden.npz).

Run ONLY after an intended semantic change; justify the regeneration in the
commit message.  Forces CPU so the bundle is hardware-independent.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from rnnt_inference_tpu.utils.golden import save_golden  # noqa: E402


def main():
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "golden.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_golden(out)
    import numpy as np

    data = np.load(out)
    print(f"wrote {out}: {len(data.files)} sequences, "
          f"{sum(data[k].size for k in data.files)} tokens")


if __name__ == "__main__":
    main()
