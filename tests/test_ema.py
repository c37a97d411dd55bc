"""Parameter EMA (parallel/ema.py): closed-form and model-pytree tests."""
import jax
import jax.numpy as jnp
import numpy as np

from eqxvision_tpu.parallel import ema_init, ema_params, ema_update


def test_ema_closed_form():
    p = {"w": jnp.full((3,), 2.0), "b": jnp.asarray(4.0)}
    e = ema_init(p)
    d = 0.9
    for _ in range(5):
        e = ema_update(e, p, decay=d)
    # e_k = d^k * p0 + (1 - d^k) * p with e0 = p0 = p -> stays p
    assert np.allclose(np.asarray(e["w"]), 2.0, atol=1e-6)
    # now move params and verify the geometric approach
    p2 = {"w": jnp.full((3,), 10.0), "b": jnp.asarray(4.0)}
    e2 = e
    for k in range(1, 4):
        e2 = ema_update(e2, p2, decay=d)
        expect = d**k * 2.0 + (1 - d**k) * 10.0
        assert np.allclose(np.asarray(e2["w"]), expect, atol=1e-5), k


def test_ema_warmup_decay():
    p0 = {"w": jnp.asarray(0.0)}
    p1 = {"w": jnp.asarray(1.0)}
    e = ema_init(p0)
    # step 0: effective d = 0.9999 * 1/10
    e = ema_update(e, p1, decay=0.9999, step=jnp.asarray(0))
    d_eff = 0.9999 * (1.0 / 10.0)
    assert np.allclose(np.asarray(e["w"]), 1.0 - d_eff, atol=1e-6)


def test_ema_on_model_pytree_and_swap():
    from eqxvision_tpu.models import registry

    model, state = registry.create_model("squeezenet1_1", num_classes=7)
    e = ema_init(model)
    # static/None leaves survive; update under jit
    upd = jax.jit(lambda e_, m_: ema_update(e_, m_, decay=0.5))
    e = upd(e, model)
    from eqxvision_tpu.core import tree_inference

    m_eval = tree_inference(ema_params(e, model), True)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out, _ = m_eval(x, state)
    assert out.shape == (2, 7)
    # with decay 0.5 and identical params, EMA leaves equal the params
    lw = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: None if a is None else float(jnp.abs(a - b).max()),
        e, model, is_leaf=lambda x: x is None))
    assert max(lw) < 1e-6
