"""NaN-guard / checkify tooling tests (SURVEY.md §5.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

from vitrs_tpu.utils import debug as DBG


def test_checked_passes_clean_fn():
    f = DBG.checked(lambda x: jnp.sum(x * 2))
    assert float(f(jnp.ones(4))) == 8.0


def test_checked_raises_on_nan():
    f = DBG.checked(lambda x: jnp.log(x).sum())
    with pytest.raises(checkify.JaxRuntimeError):
        f(jnp.asarray([-1.0, 2.0]))    # log(-1) = nan


def test_global_norm():
    tree = {"a": jnp.asarray([3.0]), "b": jnp.asarray([4.0])}
    np.testing.assert_allclose(float(DBG.global_norm(tree)), 5.0, rtol=1e-6)


def test_debug_mode_restores_flag():
    prev = jax.config.jax_debug_nans
    with DBG.debug_mode():
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == prev
