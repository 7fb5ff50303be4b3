"""Seed-sweep runner: S seeds train in parallel across the mesh in one SPMD
program; per-seed results match individually-trained seeds."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from hallucidet_tpu.train.parallel import make_mesh
from hallucidet_tpu.train.sweep import SeedSweep, stack_states, unstack_state


class ToyModule:
    """Linear-regression toy with the module contract (make_train_step/state)."""

    def __init__(self, seed):
        k = jax.random.PRNGKey(seed)
        self.params = {"w": jax.random.normal(k, (4,)), "b": jnp.zeros(())}
        self.tx = optax.sgd(0.1)
        self.opt_state = self.tx.init(self.params)

    def make_train_step(self):
        tx = self.tx

        def step(state, batch, rng):
            params, opt_state = state
            x, y = batch

            def loss_fn(p):
                pred = x @ p["w"] + p["b"]
                return jnp.mean((pred - y) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), {"loss": loss}

        return step


def _factory(seed):
    m = ToyModule(seed)
    return m, (m.params, m.opt_state)


def _data(seed, n_steps=5, n=16):
    rng = np.random.RandomState(seed)
    w_true = np.arange(4, dtype=np.float32)
    out = []
    for _ in range(n_steps):
        x = rng.randn(n, 4).astype(np.float32)
        y = x @ w_true + 0.5
        out.append((jnp.asarray(x), jnp.asarray(y)))
    return out


def test_sweep_matches_individual_training():
    seeds = [0, 1, 2, 3]
    mesh = make_mesh(4)
    sweep = SeedSweep(_factory, seeds, mesh=mesh)
    logs = sweep.run_epoch([_data(s) for s in seeds])
    assert logs["loss"].shape == (4,)

    # train seed 2 individually, same data stream
    m, state = _factory(2)
    step = jax.jit(m.make_train_step())
    for i, batch in enumerate(_data(2)):
        rng = jax.random.fold_in(jax.random.PRNGKey(2), i)
        state, solo_logs = step(state, batch, rng)

    swept = sweep.seed_state(2)
    np.testing.assert_allclose(
        np.asarray(swept[0]["w"]), np.asarray(state[0]["w"]), atol=1e-5
    )
    np.testing.assert_allclose(
        float(logs["loss"][2]), float(solo_logs["loss"]), atol=1e-5
    )


def test_stack_unstack_roundtrip():
    trees = [{"a": jnp.ones(3) * i} for i in range(3)]
    stacked = stack_states(trees)
    assert stacked["a"].shape == (3, 3)
    np.testing.assert_allclose(np.asarray(unstack_state(stacked, 1)["a"]), 1.0)
