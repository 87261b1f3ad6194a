"""Determinism gates for every compute path (SURVEY.md section 5: the
reference ships no race detection; bit-identical reruns are our analog)."""

import numpy as np
import pytest

from gpu_matrix_inversion_tpu.models.solver import inverse
from gpu_matrix_inversion_tpu.utils.determinism import check_deterministic
from gpu_matrix_inversion_tpu.utils.generators import hollow_random_matrix


@pytest.mark.parametrize("method", ["spec", "fused", "blocked", "lu", "ns"])
def test_paths_bit_deterministic(method):
    a = hollow_random_matrix(96, seed=95)
    if method == "ns":
        a = a + 96 * np.eye(96, dtype=np.float32)
    identical, diff = check_deterministic(
        lambda x: inverse(x, method=method), a, runs=3)
    assert identical, f"{method} drifted by {diff}"


def test_fused_batched_deterministic():
    a = np.stack([hollow_random_matrix(64, seed=s) for s in range(4)])
    identical, diff = check_deterministic(
        lambda x: inverse(x, method="fused"), a, runs=2)
    assert identical, f"batched fused drifted by {diff}"
