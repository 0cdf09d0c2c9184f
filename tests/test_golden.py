"""Golden-output regression (reference tests/test_model.py:282-329 +
expected.pkl): fixed seed + fixed batch → stored energies/forces.

Regenerate with:  python tests/test_golden.py --overwrite-reference
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden_outputs.npz")

MODELS = ["tensornet", "tensornet2", "equivariant-transformer",
          "transformer", "graph-network"]


def _args(model):
    return dict(
        model=model, embedding_dimension=32, num_layers=2, num_rbf=16,
        rbf_type="expnorm", trainable_rbf=False, activation="silu",
        cutoff_lower=0.0, cutoff_upper=5.0, max_z=20, max_num_neighbors=16,
        derivative=True, prior_model=None, output_model="Scalar",
        reduce_op="sum", precision=32,
        equivariance_invariance_group="O(3)", atom_filter=-1,
        attn_activation="silu", num_heads=4, distance_influence="both",
        neighbor_embedding=True, vector_cutoff=False, aggr="add",
        q_dim=4, q_weights=[[1.0] * 4] * 3, coulomb_cutoff=None,
    )


def _example_batch():
    rng = np.random.RandomState(2024)
    sizes = [6, 5]
    z, pos, batch = [], [], []
    for m, n in enumerate(sizes):
        z.append(rng.randint(1, 9, n))
        pos.append(rng.uniform(-3, 3, (n, 3)) + 10.0 * m)
        batch.append(np.full(n, m))
    return (np.concatenate(z).astype(np.int32),
            np.concatenate(pos).astype(np.float32),
            np.concatenate(batch).astype(np.int32))


def _compute(model):
    from torchmdnet_tpu.models.model import create_model

    pot = create_model(_args(model))
    z, pos, batch = _example_batch()
    variables = pot.init(
        jax.random.PRNGKey(1234), jnp.asarray(z), jnp.asarray(pos),
        jnp.asarray(batch), num_mols=2,
    )
    y, f = pot.apply(variables, jnp.asarray(z), jnp.asarray(pos),
                     jnp.asarray(batch), num_mols=2)
    return np.asarray(y), np.asarray(f)


@pytest.mark.parametrize("model", MODELS)
def test_golden_outputs(model):
    if not os.path.exists(GOLDEN):
        pytest.skip("golden file missing; regenerate with --overwrite-reference")
    data = np.load(GOLDEN)
    y, f = _compute(model)
    np.testing.assert_allclose(y, data[f"{model}_y"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(f, data[f"{model}_f"], rtol=1e-3, atol=1e-4)


if __name__ == "__main__":
    import sys

    if "--overwrite-reference" in sys.argv:
        out = {}
        for model in MODELS:
            y, f = _compute(model)
            out[f"{model}_y"] = y
            out[f"{model}_f"] = f
            print(model, y.ravel())
        np.savez(GOLDEN, **out)
        print("wrote", GOLDEN)
