"""Batched energy minimization + Langevin MD, fully on device.

Equivalent of the reference's AceFF workflow
(``examples/aceff_examples/batched_minimization_and_md.py:137-279``:
RDKit conformers → flat batch → LBFGS minimize → Langevin MD) — TPU-first:
the whole batch of molecules lives in ONE padded flat system (ghost
segment), minimization is jitted optax L-BFGS on the positions, and the MD
loop is the on-device integrator from ``torchmdnet_tpu.md``.

Run (any checkpoint exported by this framework or by the reference):

    python examples/batched_minimization_and_md.py model.ckpt mols.npz

``mols.npz`` holds ``z`` (object array of int arrays) and ``pos`` (object
array of [n_i, 3] float arrays); with RDKit installed you can instead pass
SMILES strings with ``--smiles "CCO" "c1ccccc1"``.
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp
import optax


def pack(mols, pad_multiple=128):
    """Flatten a list of (z, pos) molecules into one padded batch."""
    zs = np.concatenate([z for z, _ in mols])
    ps = np.concatenate([p for _, p in mols])
    batch = np.concatenate(
        [np.full(len(z), i, np.int32) for i, (z, _) in enumerate(mols)]
    )
    n, b = len(zs), len(mols)
    n_pad = int(np.ceil((n + 1) / pad_multiple) * pad_multiple)
    z = np.zeros(n_pad, np.int32)
    z[:n] = zs
    pos = np.zeros((n_pad, 3), np.float32)
    pos[:n] = ps
    seg = np.full(n_pad, b, np.int32)  # ghost segment
    seg[:n] = batch
    return z, pos, seg, b, n


def minimize(potential, variables, z, pos, seg, num_mols, steps=200):
    """Jitted batched L-BFGS on atom positions (reference uses torch LBFGS,
    examples/aceff_examples/batched_minimization_and_md.py:137-200)."""
    z, pos, seg = jnp.asarray(z), jnp.asarray(pos), jnp.asarray(seg)

    def energy(p):
        y = potential.energy(variables, z, p, seg, num_mols=num_mols)
        return jnp.sum(y)

    opt = optax.lbfgs()

    @jax.jit
    def run(p0):
        state = opt.init(p0)

        def body(carry, _):
            p, state = carry
            value, grad = jax.value_and_grad(energy)(p)
            updates, state = opt.update(
                grad, state, p, value=value, grad=grad, value_fn=energy
            )
            return (optax.apply_updates(p, updates), state), value

        (p, _), values = jax.lax.scan(body, (p0, state), None, length=steps)
        return p, values

    return run(pos)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("molecules", nargs="?", help="npz with z/pos object arrays")
    ap.add_argument("--smiles", nargs="*", help="RDKit route (optional dep)")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--md-steps", type=int, default=1000)
    ap.add_argument("--temperature", type=float, default=300.0)
    args = ap.parse_args()

    from torchmdnet_tpu.models.model import load_model
    from torchmdnet_tpu.md import run_md
    from torchmdnet_tpu.utils.periodic_table import ATOMIC_MASSES

    if args.smiles:
        try:
            from rdkit import Chem
            from rdkit.Chem import AllChem
        except ImportError as e:  # pragma: no cover - optional dep
            raise SystemExit("--smiles requires rdkit") from e
        mols = []
        for smi in args.smiles:
            m = Chem.AddHs(Chem.MolFromSmiles(smi))
            AllChem.EmbedMolecule(m, randomSeed=7)
            z = np.array([a.GetAtomicNum() for a in m.GetAtoms()], np.int32)
            pos = np.asarray(m.GetConformer().GetPositions(), np.float32)
            mols.append((z, pos))
    else:
        data = np.load(args.molecules, allow_pickle=True)
        mols = list(zip(data["z"], data["pos"]))

    z, pos, seg, num_mols, n_real = pack(mols)
    potential, variables = load_model(args.checkpoint, derivative=True)

    pos_min, energies = minimize(
        potential, variables, z, pos, seg, num_mols, steps=args.steps
    )
    print("minimization: E0=%.4f -> E=%.4f eV"
          % (float(energies[0]), float(energies[-1])))

    masses = ATOMIC_MASSES[z].astype(np.float32)
    state = run_md(
        potential, variables, jnp.asarray(z), pos_min, jnp.asarray(masses),
        n_steps=args.md_steps, dt=1.0, batch=jnp.asarray(seg),
        num_mols=num_mols, temperature=args.temperature, gamma=0.1,
        rebuild_every=25, skin=1.0,
    )
    print("MD done: overflow=%s, %d atoms, %d molecules"
          % (bool(state.overflow), n_real, num_mols))
    np.save("final_positions.npy", np.asarray(state.pos)[:n_real])


if __name__ == "__main__":
    main()
