"""ops/pooling.max_pool_same vs nn.max_pool: forward bytes and backward
values (incl. tie-breaking) must match XLA's reduce_window /
SelectAndScatter exactly."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seed_rl_tpu.ops.pooling import max_pool_same


def _ref_pool(x, window=(3, 3), strides=(2, 2)):
    return nn.max_pool(x, window, strides=strides, padding="SAME")


SHAPES = [
    (3, 72, 96, 4),   # DmLab stack0 (even dims, asymmetric pad)
    (2, 36, 48, 8),
    (2, 9, 12, 3),    # odd dims
    (1, 5, 5, 1),
]


@pytest.mark.critical
@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_reduce_window(shape):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(max_pool_same(x)), np.asarray(_ref_pool(x))
    )


@pytest.mark.critical
@pytest.mark.parametrize("shape", SHAPES)
def test_backward_matches_select_and_scatter(shape):
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, shape, jnp.float32)
    ct_shape = jax.eval_shape(_ref_pool, x).shape
    ct = jax.random.normal(jax.random.PRNGKey(2), ct_shape, jnp.float32)

    def loss_custom(x):
        return jnp.vdot(max_pool_same(x), ct)

    def loss_ref(x):
        return jnp.vdot(_ref_pool(x), ct)

    g_custom = jax.grad(loss_custom)(x)
    g_ref = jax.grad(loss_ref)(x)
    # An input that wins multiple windows accumulates its cotangent in a
    # different order than SelectAndScatter — identical up to fp add
    # reassociation.
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_ref), rtol=1e-6, atol=1e-6
    )


@pytest.mark.critical
def test_backward_tie_breaking_matches():
    # Constant inputs: every window is all-ties. SelectAndScatter routes the
    # cotangent to the FIRST maximal element in row-major window order; the
    # custom backward must agree element-for-element.
    for shape in [(1, 6, 6, 1), (1, 7, 9, 2), (2, 72, 96, 3)]:
        x = jnp.ones(shape, jnp.float32)
        ct_shape = jax.eval_shape(_ref_pool, x).shape
        ct = (
            jax.random.normal(jax.random.PRNGKey(3), ct_shape, jnp.float32)
            + 2.0
        )
        g_custom = jax.grad(lambda x: jnp.vdot(max_pool_same(x), ct))(x)
        g_ref = jax.grad(lambda x: jnp.vdot(_ref_pool(x), ct))(x)
        np.testing.assert_array_equal(np.asarray(g_custom), np.asarray(g_ref))


def test_quantized_random_ties():
    # Coarsely-quantized random data: many partial ties inside windows.
    x = jnp.round(
        jax.random.normal(jax.random.PRNGKey(4), (4, 36, 48, 8)) * 2
    ) / 2.0
    ct_shape = jax.eval_shape(_ref_pool, x).shape
    ct = jax.random.normal(jax.random.PRNGKey(5), ct_shape, jnp.float32)
    g_custom = jax.grad(lambda x: jnp.vdot(max_pool_same(x), ct))(x)
    g_ref = jax.grad(lambda x: jnp.vdot(_ref_pool(x), ct))(x)
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_ref), rtol=1e-6, atol=1e-6
    )


def test_bfloat16():
    x = jax.random.normal(
        jax.random.PRNGKey(6), (2, 72, 96, 16), jnp.bfloat16
    )
    np.testing.assert_array_equal(
        np.asarray(max_pool_same(x)).astype(np.float32),
        np.asarray(_ref_pool(x)).astype(np.float32),
    )
    ct_shape = jax.eval_shape(_ref_pool, x).shape
    ct = jax.random.normal(jax.random.PRNGKey(7), ct_shape, jnp.bfloat16)
    g_custom = jax.grad(
        lambda x: jnp.vdot(max_pool_same(x), ct).astype(jnp.float32)
    )(x)
    g_ref = jax.grad(
        lambda x: jnp.vdot(_ref_pool(x), ct).astype(jnp.float32)
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_custom).astype(np.float32),
        np.asarray(g_ref).astype(np.float32),
        rtol=2e-2,  # bf16 add reassociation
        atol=2e-2,
    )


def test_window_2x2_stride_2():
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 10, 10, 4))
    ref = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
    np.testing.assert_array_equal(
        np.asarray(max_pool_same(x, (2, 2), (2, 2))), np.asarray(ref)
    )
    ct = jax.random.normal(jax.random.PRNGKey(9), ref.shape)
    g_custom = jax.grad(
        lambda x: jnp.vdot(max_pool_same(x, (2, 2), (2, 2)), ct)
    )(x)
    g_ref = jax.grad(
        lambda x: jnp.vdot(
            nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME"), ct
        )
    )(x)
    np.testing.assert_array_equal(np.asarray(g_custom), np.asarray(g_ref))


def _impala_setup(custom_pool_bwd, remat=False):
    from seed_rl_tpu.models.resnets import ImpalaDeep
    from seed_rl_tpu.types import EnvOutput

    net = ImpalaDeep(
        num_actions=5, dtype=jnp.bfloat16,
        custom_pool_bwd=custom_pool_bwd, remat=remat,
    )
    rng = jax.random.PRNGKey(11)
    obs = jax.random.randint(rng, (4, 72, 96, 3), 0, 256, jnp.uint8)
    eo = EnvOutput(
        reward=jnp.zeros((4,)), done=jnp.zeros((4,), bool),
        observation=obs, abandoned=jnp.zeros((4,), bool),
        episode_step=jnp.zeros((4,), jnp.int32),
    )
    pa = jnp.zeros((4,), jnp.int32)
    params = net.init(rng, pa, eo, net.initial_state(4))

    def loss(p):
        (logits, baseline), _ = net.apply(p, pa, eo, net.initial_state(4))
        return (logits.astype(jnp.float32) ** 2).sum() + (
            baseline.astype(jnp.float32) ** 2
        ).sum()

    return params, loss


def test_impala_deep_pool_toggle_matches():
    # The custom-VJP pool is a drop-in: same params tree, same forward
    # bytes, matching gradients through the full agent (bf16 add-order
    # tolerance; masks/argmax agree exactly so structure is identical).
    params_a, loss_a = _impala_setup(custom_pool_bwd=True)
    params_b, loss_b = _impala_setup(custom_pool_bwd=False)
    chex = jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params_a, params_b)
    del chex
    np.testing.assert_array_equal(
        np.asarray(loss_a(params_a)), np.asarray(loss_b(params_b))
    )
    g_a = jax.jit(jax.grad(loss_a))(params_a)
    g_b = jax.jit(jax.grad(loss_b))(params_b)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-2, atol=1e-2,
        ),
        g_a, g_b,
    )


def test_impala_deep_remat_composes_with_custom_pool():
    params, loss = _impala_setup(custom_pool_bwd=True, remat=False)
    params_r, loss_r = _impala_setup(custom_pool_bwd=True, remat=True)
    g = jax.jit(jax.grad(loss))(params)
    g_r = jax.jit(jax.grad(loss_r))(params_r)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-2, atol=1e-2,
        ),
        g, g_r,
    )


@pytest.mark.parametrize("window,strides,shape", [
    ((3, 3), (3, 3), (2, 9, 12, 4)),    # non-overlapping
    ((2, 2), (1, 1), (2, 7, 9, 3)),     # overlapping stride-1
    ((3, 2), (2, 2), (2, 10, 8, 5)),    # asymmetric window
    ((4, 4), (2, 2), (1, 8, 8, 2)),     # window == 2*stride boundary
])
def test_other_window_stride_combos(window, strides, shape):
    x = jax.random.normal(jax.random.PRNGKey(12), shape)
    ref = nn.max_pool(x, window, strides=strides, padding="SAME")
    np.testing.assert_array_equal(
        np.asarray(max_pool_same(x, window, strides)), np.asarray(ref)
    )
    ct = jax.random.normal(jax.random.PRNGKey(13), ref.shape)
    g_custom = jax.grad(
        lambda x: jnp.vdot(max_pool_same(x, window, strides), ct)
    )(x)
    g_ref = jax.grad(
        lambda x: jnp.vdot(
            nn.max_pool(x, window, strides=strides, padding="SAME"), ct
        )
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_ref), rtol=1e-6, atol=1e-6
    )


def test_grad_under_vmap():
    # vmapped gradients (e.g. per-example grads) must match the reference.
    xs = jax.random.normal(jax.random.PRNGKey(14), (3, 2, 12, 16, 4))
    ct = jax.random.normal(jax.random.PRNGKey(15), (2, 6, 8, 4))

    def g_custom(x):
        return jax.grad(lambda x: jnp.vdot(max_pool_same(x), ct))(x)

    def g_ref(x):
        return jax.grad(lambda x: jnp.vdot(_ref_pool(x), ct))(x)

    np.testing.assert_allclose(
        np.asarray(jax.vmap(g_custom)(xs)),
        np.asarray(jax.vmap(g_ref)(xs)),
        rtol=1e-6, atol=1e-6,
    )
