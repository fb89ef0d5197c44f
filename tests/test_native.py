"""Native C++ metric kernels vs the numpy reference implementation."""

import subprocess
import os

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", NATIVE_DIR], check=True, capture_output=True)


def test_native_matches_numpy_fuzz():
    from tggcn.utils import metrics
    from tggcn.utils.native import f1_at_k_single_example, native_available

    assert native_available()
    rng = np.random.default_rng(7)
    for _ in range(100):
        n = int(rng.integers(3, 80))
        nc = int(rng.integers(2, 10))
        y_true = rng.integers(0, nc + 2, size=n)
        y_pred = rng.integers(0, nc + 2, size=n)
        overlap = float(rng.uniform(0.05, 0.95))
        got = f1_at_k_single_example(y_true, y_pred, nc, overlap=overlap)
        want = metrics.f1_at_k_single_example(y_true, y_pred, nc, overlap=overlap)
        assert abs(got - want) < 1e-9


def test_native_batch_with_padding():
    from tggcn.utils import metrics
    from tggcn.utils.native import f1_at_k

    rng = np.random.default_rng(8)
    y_true = rng.integers(-1, 5, size=(8, 40))
    y_true[3] = -1  # all-padding example excluded from the mean
    y_pred = rng.integers(0, 5, size=(8, 40))
    got = f1_at_k(y_true, y_pred, 5, overlap=0.25, ignore_value=-1)
    want = metrics.f1_at_k(y_true, y_pred, 5, overlap=0.25, ignore_value=-1)
    assert abs(got - want) < 1e-9
