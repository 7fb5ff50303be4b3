"""Multi-seed sweep runner — seeds as a device-mesh axis.

SURVEY.md §7.8: the reference's scale-out story is multi-seed sweeps and
bigger batches. Here a sweep is ONE SPMD program: model parameters are
stacked along a leading `seed` axis and sharded over the mesh, per-seed
batches are stacked and sharded the same way, and a vmapped train step runs
every seed simultaneously — one compile, S seeds per step, zero cross-seed
communication (XLA sees a fully parallel program).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_states(states: Sequence):
    """Per-seed pytrees -> one pytree with a leading seed axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *states)


def unstack_state(stacked, idx: int):
    return jax.tree_util.tree_map(lambda x: x[idx], stacked)


class SeedSweep:
    """Runs a module-factory's train step for S seeds in parallel.

    module_factory(seed) must return an object exposing
    `make_train_step()` -> step(state, batch, rng) and an initial `state`
    pytree (the HalluciDet/Detector modules satisfy this via small adapters).
    """

    def __init__(
        self,
        module_factory: Callable[[int], tuple],
        seeds: Sequence[int],
        mesh: Optional[Mesh] = None,
    ):
        self.seeds = list(seeds)
        modules_states = [module_factory(s) for s in self.seeds]
        self.modules = [m for m, _ in modules_states]
        states = [s for _, s in modules_states]
        self.state = stack_states(states)

        base_step = self.modules[0].make_train_step()
        vstep = jax.vmap(base_step, in_axes=(0, 0, 0))

        if mesh is not None:
            seed_sh = NamedSharding(mesh, P("data"))
            self.state = jax.device_put(self.state, seed_sh)
            self._sharding = seed_sh
            self.step = jax.jit(
                vstep,
                in_shardings=(seed_sh, seed_sh, seed_sh),
                out_shardings=(seed_sh, seed_sh),
                donate_argnums=(0,),
            )
        else:
            self._sharding = None
            self.step = jax.jit(vstep, donate_argnums=(0,))

    def run_epoch(self, loaders: Sequence, max_steps: Optional[int] = None):
        """loaders: one iterable of batches per seed (different shuffles).
        Returns the last step's per-seed logs."""
        logs = None
        iters = [iter(ld) for ld in loaders]
        step_idx = 0
        while True:
            if max_steps is not None and step_idx >= max_steps:
                break
            try:
                batches = [next(it) for it in iters]
            except StopIteration:
                break
            batch = stack_states(batches)
            rngs = jnp.stack(
                [
                    jax.random.fold_in(jax.random.PRNGKey(s), step_idx)
                    for s in self.seeds
                ]
            )
            if self._sharding is not None:
                batch = jax.device_put(batch, self._sharding)
                rngs = jax.device_put(rngs, self._sharding)
            self.state, logs = self.step(self.state, batch, rngs)
            step_idx += 1
        return logs

    def seed_state(self, seed: int):
        return unstack_state(self.state, self.seeds.index(seed))
