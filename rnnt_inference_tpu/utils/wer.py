"""Word-error-rate scoring (reference: eval_accuracy.py:30-78 semantics)."""

from __future__ import annotations

from typing import List, Sequence, Tuple


def levenshtein(a: Sequence, b: Sequence) -> int:
    """Edit distance with O(min(n,m)) space."""
    n, m = len(a), len(b)
    if n > m:
        a, b = b, a
        n, m = m, n
    current = list(range(n + 1))
    for i in range(1, m + 1):
        previous, current = current, [i] + [0] * n
        for j in range(1, n + 1):
            add, delete = previous[j] + 1, current[j - 1] + 1
            change = previous[j - 1]
            if a[j - 1] != b[i - 1]:
                change += 1
            current[j] = min(add, delete, change)
    return current[n]


def word_error_rate(
    hypotheses: List[str], references: List[str]
) -> Tuple[float, int, int]:
    """Corpus WER over aligned hypothesis/reference string lists.

    Returns (wer, edit_distance_sum, reference_word_count).
    """
    if len(hypotheses) != len(references):
        raise ValueError(
            f"hypotheses ({len(hypotheses)}) and references ({len(references)}) "
            "must have the same length"
        )
    scores = 0
    words = 0
    for h, r in zip(hypotheses, references):
        h_list = h.split()
        r_list = r.split()
        words += len(r_list)
        scores += levenshtein(h_list, r_list)
    wer = scores / words if words else float("inf")
    return wer, scores, words
