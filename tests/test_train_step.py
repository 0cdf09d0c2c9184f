"""Training-step smoke tests (analogue of the reference's 10-step Lightning
fit on DummyDataset, tests/test_module.py:36-147) + multi-device DP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchmdnet_tpu.models.model import create_model
from torchmdnet_tpu.parallel.dp import (
    make_data_parallel_train_step,
    make_mesh,
    shard_batch,
)
from torchmdnet_tpu.train.step import create_train_state, make_train_step

pytestmark = pytest.mark.slow  # minutes-scale; excluded from the fast suite


def _args(**kw):
    base = dict(
        model="tensornet",
        embedding_dimension=16,
        num_layers=1,
        num_rbf=8,
        rbf_type="expnorm",
        trainable_rbf=False,
        activation="silu",
        cutoff_lower=0.0,
        cutoff_upper=5.0,
        max_z=20,
        max_num_neighbors=16,
        derivative=True,
        prior_model=None,
        output_model="Scalar",
        reduce_op="sum",
        precision=32,
        equivariance_invariance_group="O(3)",
        atom_filter=-1,
    )
    base.update(kw)
    return base


def _random_batch(rng, n_pad=16, n_mols=2):
    sizes = [6, 7]
    z = np.zeros(n_pad, np.int32)
    pos = np.zeros((n_pad, 3), np.float32)
    seg = np.full(n_pad, n_mols, np.int32)
    o = 0
    for m, n in enumerate(sizes):
        z[o:o + n] = rng.randint(1, 10, n)
        pos[o:o + n] = rng.uniform(-3, 3, (n, 3)) + 10 * m
        seg[o:o + n] = m
        o += n
    return dict(
        z=jnp.asarray(z),
        pos=jnp.asarray(pos),
        batch=jnp.asarray(seg),
        y=jnp.asarray(rng.randn(n_mols, 1).astype(np.float32)),
        neg_dy=jnp.asarray(rng.randn(n_pad, 3).astype(np.float32)
                           * (seg < n_mols)[:, None]),
        mol_mask=jnp.ones((n_mols,), bool),
    )


def test_train_step_descends():
    rng = np.random.RandomState(0)
    pot = create_model(_args())
    batch = _random_batch(rng)
    variables = pot.init(
        jax.random.PRNGKey(0), batch["z"], batch["pos"], batch["batch"],
        num_mols=2,
    )
    state = create_train_state(variables["params"], lr=1e-3)
    step = jax.jit(make_train_step(
        pot, num_mols=2, lr=1e-3, lr_warmup_steps=2,
        ema_alpha_y=1.0, ema_alpha_neg_dy=1.0,
    ))
    losses = []
    for _ in range(15):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 15
    # warmup: first step lr = base/2
    assert np.isfinite(losses).all()


def test_ema_smoothing_changes_loss_path():
    rng = np.random.RandomState(1)
    pot = create_model(_args())
    batch = _random_batch(rng)
    variables = pot.init(
        jax.random.PRNGKey(0), batch["z"], batch["pos"], batch["batch"],
        num_mols=2,
    )
    st1 = create_train_state(variables["params"], lr=1e-3)
    st2 = create_train_state(variables["params"], lr=1e-3)
    plain = jax.jit(make_train_step(pot, num_mols=2, lr=1e-3))
    ema = jax.jit(make_train_step(
        pot, num_mols=2, lr=1e-3, ema_alpha_y=0.5, ema_alpha_neg_dy=0.5,
    ))
    _, m1 = plain(st1, batch)
    st2b, m2 = ema(st2, batch)
    assert float(st2b.ema_y) >= 0  # initialized
    # raw per-step losses are recorded unsmoothed
    assert np.isclose(float(m1["loss_y"]), float(m2["loss_y"]), rtol=1e-6)


@pytest.mark.parametrize("n_dev", [4, 8])
def test_data_parallel_train_step(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough virtual devices")
    rng = np.random.RandomState(2)
    pot = create_model(_args())
    one = _random_batch(rng)
    variables = pot.init(
        jax.random.PRNGKey(0), one["z"], one["pos"], one["batch"], num_mols=2,
    )
    mesh = make_mesh(n_dev)
    # stack per-device batches along the leading axis
    batches = [_random_batch(np.random.RandomState(10 + i)) for i in range(n_dev)]
    stacked = {
        k: jnp.stack([b[k] for b in batches]) for k in batches[0]
    }
    stacked = shard_batch(mesh, stacked)
    state = create_train_state(variables["params"], lr=1e-3)
    dp_step = make_data_parallel_train_step(
        pot, mesh, num_mols=2, lr=1e-3,
    )
    state2, metrics = dp_step(state, stacked)
    assert np.isfinite(float(metrics["loss"]))
    # params must remain replica-identical (pmean'd grads)
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_gradient_clipping_step():
    rng = np.random.RandomState(3)
    pot = create_model(_args())
    batch = _random_batch(rng)
    variables = pot.init(
        jax.random.PRNGKey(0), batch["z"], batch["pos"], batch["batch"],
        num_mols=2,
    )
    state = create_train_state(variables["params"], lr=1e-3,
                               gradient_clipping=1.0)
    step = jax.jit(make_train_step(
        pot, num_mols=2, lr=1e-3, gradient_clipping=1.0,
    ))
    for _ in range(3):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
