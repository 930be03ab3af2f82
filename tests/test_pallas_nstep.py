"""Fused n-step-target+priority kernel vs. the lax reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from seed_rl_tpu.ops import value_ops
from seed_rl_tpu.ops.pallas import nstep_kernel


def _random_inputs(rng, T, B, A):
    return dict(
        q_values=rng.normal(size=(T, B, A)).astype(np.float32),
        target_q_values=rng.normal(size=(T, B, A)).astype(np.float32),
        online_argmax_action=rng.randint(0, A, (T, B)).astype(np.int32),
        replay_action=rng.randint(0, A, (T, B)).astype(np.int32),
        rewards=rng.normal(size=(T, B)).astype(np.float32),
        done=(rng.binomial(1, 0.1, (T, B))).astype(bool),
    )


def test_fused_matches_reference_aligned_batch():
    rng = np.random.RandomState(0)
    kwargs = _random_inputs(rng, T=11, B=256, A=6)
    want_loss, want_pri = value_ops.td_loss_and_priorities(
        **kwargs, gamma=0.997, n_steps=5
    )
    got_loss, got_pri = nstep_kernel.td_loss_and_priorities(
        **kwargs, gamma=0.997, n_steps=5, interpret=True
    )
    np.testing.assert_allclose(got_loss, want_loss, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_pri, want_pri, rtol=1e-5, atol=1e-5)


def test_fused_matches_reference_small_batch_single_program():
    # B=64 is not lane-aligned: exercises the whole-block single-program path
    # (the R2D2 reference training batch size).
    rng = np.random.RandomState(1)
    kwargs = _random_inputs(rng, T=7, B=64, A=4)
    want_loss, want_pri = value_ops.td_loss_and_priorities(
        **kwargs, gamma=0.99, n_steps=3, eta=0.7
    )
    got_loss, got_pri = nstep_kernel.td_loss_and_priorities(
        **kwargs, gamma=0.99, n_steps=3, eta=0.7, interpret=True
    )
    np.testing.assert_allclose(got_loss, want_loss, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_pri, want_pri, rtol=1e-5, atol=1e-5)


def test_fused_gradient_matches_reference():
    rng = np.random.RandomState(2)
    kwargs = _random_inputs(rng, T=6, B=128, A=3)
    q = jnp.asarray(kwargs.pop("q_values"))

    def ref_loss(q_values):
        loss, _ = value_ops.td_loss_and_priorities(
            q_values=q_values, **kwargs, gamma=0.99, n_steps=2
        )
        return loss.sum()

    def fused_loss(q_values):
        loss, _ = nstep_kernel.td_loss_and_priorities(
            q_values=q_values, **kwargs, gamma=0.99, n_steps=2, interpret=True
        )
        return loss.sum()

    g_ref = jax.grad(ref_loss)(q)
    g_fused = jax.grad(fused_loss)(q)
    # f32 sum-order differences between the fused and staged formulations
    # produce ~1e-4-relative wiggle on a handful of elements.
    np.testing.assert_allclose(g_fused, g_ref, rtol=1e-3, atol=1e-4)


def test_dispatch_falls_back_on_cpu():
    rng = np.random.RandomState(3)
    kwargs = _random_inputs(rng, T=4, B=8, A=2)
    loss, pri = nstep_kernel.td_loss_and_priorities_dispatch(
        **kwargs, gamma=0.99, n_steps=2
    )
    assert loss.shape == (8,)
    assert pri.shape == (8,)
