"""parity_mode plumbing: config default, process-wide apply, scoped switch."""

import os

import jax
import pytest

from tggcn.runtime import apply_parity_mode, parity_mode_scope

CONF_DIR = os.path.join(os.path.dirname(__file__), "..", "conf")


def test_conf_default_is_fast():
    from tggcn.config import compose

    cfg = compose(CONF_DIR, overrides=[])
    assert cfg.resources.parity_mode == "fast"


def test_apply_exact_sets_highest_precision():
    original = jax.config.jax_default_matmul_precision
    try:
        apply_parity_mode("exact")
        assert jax.config.jax_default_matmul_precision == "highest"
    finally:
        jax.config.update("jax_default_matmul_precision", original)


def test_apply_fast_is_noop():
    original = jax.config.jax_default_matmul_precision
    apply_parity_mode("fast")
    assert jax.config.jax_default_matmul_precision == original


def test_scope_is_scoped():
    original = jax.config.jax_default_matmul_precision
    with parity_mode_scope("exact"):
        assert jax.config.jax_default_matmul_precision == "highest"
    assert jax.config.jax_default_matmul_precision == original


def test_invalid_mode_raises():
    with pytest.raises(ValueError, match="parity_mode"):
        apply_parity_mode("exactly")
    with pytest.raises(ValueError, match="parity_mode"):
        with parity_mode_scope("speed"):
            pass
