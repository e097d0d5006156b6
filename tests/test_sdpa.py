"""Unit tests for the single-pass SDPA Pallas kernel (ops/sdpa_pallas.py).

Interpret-mode agreement against the plain einsum attention the encoder's
"einsum" path computes — including a T that is not a lane multiple, so the
key-padding mask and query-row slicing are both exercised.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_speech_enhancement_metrics_tpu.ops.sdpa_pallas import sdpa


def _reference(q, k, v, scaling):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scaling, k, precision="highest")
    weights = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v, precision="highest")


@pytest.mark.parametrize("t", [70, 128, 259])
def test_sdpa_matches_einsum(t):
    rng = np.random.default_rng(0)
    b, h, d = 2, 3, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, t, d)), dtype=jnp.float32)
        for _ in range(3)
    )
    scaling = d**-0.5
    out = sdpa(q, k, v, scaling, block_q=128, interpret=True)
    ref = _reference(q, k, v, scaling)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_sdpa_bf16_class():
    """bf16 operands (the act_dtype=bf16 encoder feed) stay within the bf16
    einsum path's deviation class against an fp32 reference."""
    rng = np.random.default_rng(1)
    b, h, t, d = 1, 2, 100, 64
    q32, k32, v32 = (
        jnp.asarray(rng.standard_normal((b, h, t, d)), dtype=jnp.float32)
        for _ in range(3)
    )
    scaling = d**-0.5
    out = sdpa(
        q32.astype(jnp.bfloat16),
        k32.astype(jnp.bfloat16),
        v32.astype(jnp.bfloat16),
        scaling,
        interpret=True,
    )
    ref = _reference(q32, k32, v32, scaling)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref), atol=3e-2
    )
