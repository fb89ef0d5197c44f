"""Pallas kernel equivalence tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from tggcn.ops.geo_gcn_pallas import geo_gcn_fused, geo_gcn_reference


def _weights(key, out_c=128):
    keys = jax.random.split(key, 10)
    return dict(
        w1=jax.random.normal(keys[0], (4, 64)) * 0.2,
        b1=jax.random.normal(keys[1], (64,)) * 0.1,
        w2=jax.random.normal(keys[2], (64, 64)) * 0.2,
        b2=jax.random.normal(keys[3], (64,)) * 0.1,
        ws1=jax.random.normal(keys[4], (64, 128)) * 0.2,
        bs1=jax.random.normal(keys[5], (128,)) * 0.1,
        ws2=jax.random.normal(keys[6], (64, 128)) * 0.2,
        bs2=jax.random.normal(keys[7], (128,)) * 0.1,
        w_out=jax.random.normal(keys[8], (64, out_c)) * 0.2,
    )


def test_fused_matches_reference_all_node_counts():
    for v in (19, 26, 30):
        x = jax.random.normal(jax.random.PRNGKey(v), (37, v, 4))  # non-multiple of tile
        w = _weights(jax.random.PRNGKey(v + 100))
        expected = geo_gcn_reference(x, **w)
        got = geo_gcn_fused(x, *[w[k] for k in
                                 ("w1", "b1", "w2", "b2", "ws1", "bs1", "ws2",
                                  "bs2", "w_out")],
                            tile_n=16, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-5, atol=1e-5)


def test_reference_matches_geo_gcn_module():
    """The fused math must equal apply_geo_gcn's post-BN computation."""
    from tggcn.nn.geo_gcn import apply_geo_gcn, init_geo_gcn

    v = 19
    params = init_geo_gcn(jax.random.PRNGKey(0), v)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, v, 4))
    module_out, _ = apply_geo_gcn(params, x, train=False)

    from tggcn.nn.batchnorm import apply_batchnorm
    x_norm, _ = apply_batchnorm(params["bn"], x, reduce_axes=(0, 1), train=False)
    flat = x_norm.reshape(-1, v, 4)
    fused = geo_gcn_reference(
        flat,
        params["embed1"]["w"], params["embed1"]["b"],
        params["embed2"]["w"], params["embed2"]["b"],
        params["s1"]["w"], params["s1"]["b"],
        params["s2"]["w"], params["s2"]["b"],
        params["weight"])
    np.testing.assert_allclose(np.asarray(fused.reshape(2, 5, v, -1)),
                               np.asarray(module_out), rtol=1e-5, atol=1e-6)


def test_fused_custom_vjp_matches_reference_grad():
    """geo_gcn_fused gradients (custom VJP) == jax.grad of the XLA reference."""
    v = 19
    x = jax.random.normal(jax.random.PRNGKey(1), (9, v, 4))
    w = _weights(jax.random.PRNGKey(2))
    order = ("w1", "b1", "w2", "b2", "ws1", "bs1", "ws2", "bs2", "w_out")

    def loss_ref(x, *weights):
        return jnp.sum(geo_gcn_reference(x, **dict(zip(order, weights))) ** 2)

    def loss_fused(x, *weights):
        return jnp.sum(geo_gcn_fused(x, *weights, tile_n=8, interpret=True) ** 2)

    args = (x,) + tuple(w[k] for k in order)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(len(args))))(*args)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(len(args))))(*args)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)
