"""Pallas kernel correctness (interpret mode on CPU) vs the jnp reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from evoke_tpu.models.layers import dot_attention
from evoke_tpu.ops.fusion_attention import masked_cross_view_attention


def _reference(q, k, v, attend_mask, t_tokens):
    """jnp masked attention over the flat key axis (the fusion.py XLA path)."""
    qn, h, t, dk = q.shape
    n = k.shape[1]
    mask = jnp.repeat(attend_mask, t_tokens, axis=1)[:, None, None, :]  # [Q,1,1,N]
    out, _ = dot_attention(q, k[None].transpose(0, 1, 2, 3).reshape(1, h, n, dk),
                           v[None].reshape(1, h, n, dk), mask=mask)
    return out


class TestMaskedCrossViewAttention:
    def test_matches_jnp_path(self, rng):
        qn, b, t, h, dk = 4, 6, 8, 2, 16
        n = b * t
        q = jnp.asarray(rng.normal(size=(qn, h, t, dk)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(h, n, dk)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(h, n, dk)), jnp.float32)
        attend = np.zeros((qn, b), bool)
        attend[0, 1] = attend[0, 4] = True
        attend[1, 0] = True
        attend[2, 2] = True   # self-fallback style single sample
        attend[3, 5] = attend[3, 3] = attend[3, 0] = True
        attend = jnp.asarray(attend)

        got = masked_cross_view_attention(q, k, v, attend, t_tokens=t, key_block=16,
                                          interpret=True)
        want = _reference(q, k, v, attend, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_uneven_key_block_divides(self, rng):
        qn, b, t, h, dk = 2, 3, 4, 1, 8
        n = b * t  # 12: key_block 512 must self-reduce to a divisor
        q = jnp.asarray(rng.normal(size=(qn, h, t, dk)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(h, n, dk)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(h, n, dk)), jnp.float32)
        attend = jnp.ones((qn, b), bool)
        got = masked_cross_view_attention(q, k, v, attend, t_tokens=t, interpret=True)
        want = _reference(q, k, v, attend, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
