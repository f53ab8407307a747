"""Non-finite-update protection (train/optim.py skip_nonfinite): a step whose
gradients contain inf/NaN must be skipped wholesale — params, momentum and
schedule step untouched — instead of poisoning every parameter through the
global-norm clip. This is the torch-AMP GradScaler skip-step semantics the
reference gets from mmcv's Fp16OptimizerHook (reference
mmdet/core/fp16/hooks.py); here it guards bf16/TPU warmup spikes (measured:
a transient track-head match-CE spike overflowing one backward poisoned the
whole model without the guard)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vps_tpu.train import build_optimizer
from vps_tpu.train.step import TrainState, make_train_step


def _params():
    return {"head": {"w": jnp.ones((4,), jnp.float32),
                     "b": jnp.zeros((2,), jnp.float32)}}


def test_finite_grads_update_normally():
    params = _params()
    tx, _ = build_optimizer(params, 0.1, momentum=0.0, weight_decay=0.0,
                            frozen_stages=-1)
    st = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    upd, st = tx.update(g, st, params)
    new = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(new["head"]["w"]), 0.9, rtol=1e-6)
    assert int(st.total_notfinite) == 0


def test_nonfinite_grads_skip_update_and_count():
    params = _params()
    tx, _ = build_optimizer(params, 0.1, momentum=0.9, weight_decay=0.0,
                            frozen_stages=-1)
    st = tx.init(params)
    # healthy step first so momentum is non-trivial
    g = jax.tree.map(jnp.ones_like, params)
    upd, st = tx.update(g, st, params)
    params = optax.apply_updates(params, upd)
    ref_params = jax.device_get(params)
    ref_inner = jax.device_get(st.inner_state)

    bad = jax.tree.map(jnp.ones_like, params)
    bad["head"]["w"] = bad["head"]["w"].at[2].set(jnp.inf)
    upd, st = tx.update(bad, st, params)
    params = optax.apply_updates(params, upd)

    # params unchanged, momentum unchanged, skip counted
    for k in ("w", "b"):
        np.testing.assert_array_equal(np.asarray(params["head"][k]),
                                      ref_params["head"][k])
    assert int(st.total_notfinite) == 1
    chex_equal = jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        st.inner_state, ref_inner)
    del chex_equal

    # a following healthy step proceeds from the pre-skip state
    upd, st = tx.update(g, st, params)
    params = optax.apply_updates(params, upd)
    assert np.all(np.isfinite(np.asarray(params["head"]["w"])))
    assert int(st.notfinite_count) == 0  # consecutive counter reset


def test_consecutive_bad_steps_eventually_propagate():
    params = _params()
    tx, _ = build_optimizer(params, 0.1, momentum=0.0, weight_decay=0.0,
                            frozen_stages=-1, skip_nonfinite=2)
    st = tx.init(params)
    bad = jax.tree.map(lambda x: jnp.full_like(x, jnp.nan), params)
    for _ in range(3):
        upd, st = tx.update(bad, st, params)
        params = optax.apply_updates(params, upd)
    # after max_consecutive_errors the NaNs must surface (divergence is
    # reported, not silently spun on)
    assert not np.all(np.isfinite(np.asarray(params["head"]["w"])))


def test_skip_nonfinite_zero_disables_guard():
    params = _params()
    tx, _ = build_optimizer(params, 0.1, momentum=0.0, weight_decay=0.0,
                            frozen_stages=-1, skip_nonfinite=0)
    st = tx.init(params)
    assert not isinstance(st, optax.ApplyIfFiniteState)


def test_train_step_surfaces_skip_counter():
    """make_train_step must expose nonfinite_skips and keep params intact
    when a loss produces non-finite gradients on one batch."""

    class Toy:
        def init(self, rngs, **kw):
            return {"params": {"w": jnp.ones((3,), jnp.float32)}}

        def apply(self, variables, batch=None, method=None, rngs=None):
            w = variables["params"]["w"]
            # flag=0: forward sqrt(0)=0 is finite but the backward is
            # inf·0 = NaN (sqrt cotangent at 0 times the zero flag)
            return {"loss_toy": jnp.sqrt(jnp.sum(w * w) * batch["flag"])}

        def loss(self):
            pass

    det = Toy()

    from vps_tpu.train.step import make_loss_fn

    params = {"w": jnp.ones((3,), jnp.float32)}
    tx, _ = build_optimizer(params, 0.1, momentum=0.0, weight_decay=0.0,
                            frozen_stages=-1)

    def loss_fn(p, bs, batch, rng):
        out = det.apply({"params": p}, batch=jax.tree.map(lambda x: x[0],
                                                          batch))
        total = out["loss_toy"]
        return total, dict(out, loss=total)

    import vps_tpu.train.step as step_mod

    orig = step_mod.make_loss_fn
    step_mod.make_loss_fn = lambda d: loss_fn
    try:
        step = make_train_step(det, tx, donate=False)
    finally:
        step_mod.make_loss_fn = orig

    state = TrainState(params, {}, tx.init(params), jnp.asarray(0))
    rng = jax.random.PRNGKey(0)

    good = {"flag": jnp.ones((1,), jnp.float32)}
    state, logs = step(state, good, rng)
    assert int(logs["nonfinite_skips"]) == 0
    w_after_good = np.asarray(state.params["w"])

    bad = {"flag": jnp.zeros((1,), jnp.float32)}
    state, logs = step(state, bad, rng)
    assert int(logs["nonfinite_skips"]) == 1
    np.testing.assert_array_equal(np.asarray(state.params["w"]), w_after_good)
