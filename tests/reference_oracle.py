"""Import harness for the *reference* torch implementation as a test oracle.

The reference at /root/reference hard-imports NVIDIA Warp in
``extensions/ops.py`` and lightning_utilities in ``models/model.py``;
neither is installed here.  We inject two tiny stubs:

* ``torchmdnet.extensions.ops`` — a pure-torch O(N²) neighbor kernel with
  the exact contract of the Warp op (padded pair list, −1 sentinels,
  transpose twins, deltas = pos[i] − pos[j], triclinic wrap), and
* ``lightning_utilities.core.rank_zero`` — rank_zero_warn.

Everything else (TensorNet math, output modules, priors, head) then runs on
the reference's pure-torch fallback path (OPT=False), which is the
documented numerical contract (tests/test_warp_ops.py compares warp vs
python paths at 1e-4).
"""

import sys
import types
import warnings

import torch

REFERENCE_PATH = "/root/reference"


def _neighbor_pairs_torch(
    strategy,
    positions,
    batch,
    box_vectors,
    use_periodic,
    cutoff_lower,
    cutoff_upper,
    max_num_pairs,
    loop,
    include_transpose,
    num_cells,
):
    n = positions.shape[0]
    dtype = positions.dtype
    device = positions.device
    delta = positions[:, None, :] - positions[None, :, :]
    if use_periodic:
        box = box_vectors.to(dtype)
        if box.dim() == 2:
            box = box[None].expand(int(batch.max().item()) + 1, 3, 3)
        pb = box[batch]  # [N,3,3] per row atom
        a, b, c = pb[:, 0, :], pb[:, 1, :], pb[:, 2, :]
        scale3 = torch.round(delta[..., 2] / c[:, None, 2])
        delta = delta - scale3[..., None] * c[:, None, :]
        scale2 = torch.round(delta[..., 1] / b[:, None, 1])
        delta = delta - scale2[..., None] * b[:, None, :]
        scale1 = torch.round(delta[..., 0] / a[:, None, 0])
        delta = delta - scale1[..., None] * a[:, None, :]
    dist = delta.norm(dim=-1)
    eye = torch.eye(n, dtype=torch.bool, device=device)
    adj = (dist < cutoff_upper) & (batch[:, None] == batch[None, :])
    if cutoff_lower > 0:
        adj &= (dist >= cutoff_lower) | eye
    if loop:
        keep = torch.tril(torch.ones(n, n, dtype=torch.bool, device=device))
    else:
        keep = torch.tril(
            torch.ones(n, n, dtype=torch.bool, device=device), diagonal=-1
        )
    adj = adj & keep
    ii, jj = adj.nonzero(as_tuple=True)
    d = delta[ii, jj]
    w = dist[ii, jj]
    pairs_i = [ii]
    pairs_j = [jj]
    ds = [d]
    ws = [w]
    if include_transpose:
        not_self = ii != jj
        pairs_i.append(jj[not_self])
        pairs_j.append(ii[not_self])
        ds.append(-d[not_self])
        ws.append(w[not_self])
    ii = torch.cat(pairs_i)
    jj = torch.cat(pairs_j)
    d = torch.cat(ds)
    w = torch.cat(ws)
    num_found = ii.shape[0]
    cap = int(max_num_pairs)
    edge_index = torch.full((2, cap), -1, dtype=torch.long, device=device)
    deltas = torch.zeros((cap, 3), dtype=dtype, device=device)
    distances = torch.zeros((cap,), dtype=dtype, device=device)
    m = min(num_found, cap)
    edge_index[0, :m] = ii[:m]
    edge_index[1, :m] = jj[:m]
    deltas[:m] = d[:m]
    distances[:m] = w[:m]
    num_pairs = torch.tensor([num_found], dtype=torch.long, device=device)
    return edge_index, deltas, distances, num_pairs


def install():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    if "torchmdnet.extensions.ops" not in sys.modules:
        mod = types.ModuleType("torchmdnet.extensions.ops")

        def get_neighbor_pairs_kernel(
            strategy,
            positions,
            batch,
            box_vectors,
            use_periodic,
            cutoff_lower,
            cutoff_upper,
            max_num_pairs,
            loop,
            include_transpose,
            num_cells,
        ):
            return _neighbor_pairs_torch(
                strategy,
                positions,
                batch,
                box_vectors,
                use_periodic,
                cutoff_lower,
                cutoff_upper,
                max_num_pairs,
                loop,
                include_transpose,
                num_cells,
            )

        mod.get_neighbor_pairs_kernel = get_neighbor_pairs_kernel
        mod.__all__ = ["get_neighbor_pairs_kernel"]
        sys.modules["torchmdnet.extensions.ops"] = mod

    if "lightning_utilities" not in sys.modules:
        lu = types.ModuleType("lightning_utilities")
        lu_core = types.ModuleType("lightning_utilities.core")
        lu_rz = types.ModuleType("lightning_utilities.core.rank_zero")
        lu_rz.rank_zero_warn = warnings.warn
        sys.modules["lightning_utilities"] = lu
        sys.modules["lightning_utilities.core"] = lu_core
        sys.modules["lightning_utilities.core.rank_zero"] = lu_rz


def make_reference_args(**overrides):
    """Minimal args dict for the reference create_model (and ours)."""
    args = dict(
        model="tensornet",
        embedding_dimension=32,
        num_layers=2,
        num_rbf=8,
        rbf_type="expnorm",
        trainable_rbf=False,
        activation="silu",
        cutoff_lower=0.0,
        cutoff_upper=5.0,
        max_z=100,
        max_num_neighbors=64,
        derivative=True,
        atom_filter=-1,
        prior_model=None,
        output_model="Scalar",
        reduce_op="sum",
        precision=32,
        equivariance_invariance_group="O(3)",
        static_shapes=False,
        # ET/T/GN extras
        attn_activation="silu",
        num_heads=8,
        distance_influence="both",
        neighbor_embedding=True,
        aggr="add",
        vector_cutoff=False,
    )
    args.update(overrides)
    return args
