from torchmdnet_tpu.ops.neighbors import (  # noqa: F401
    NeighborMatrix,
    brute_neighbor_matrix,
    cell_neighbor_matrix,
    build_neighbor_matrix,
    neighbor_geometry,
    neighbor_matrix_to_edge_list,
)
from torchmdnet_tpu.ops.tensor_algebra import (  # noqa: F401
    Irreps,
    compose_tensor,
    decompose_tensor,
    irreps_norm3,
    tensor_frobenius_norm2,
    tensor_matmul_o3,
    tensor_matmul_so3,
    vector_to_skewtensor,
    skewtensor_to_vector,
)
from torchmdnet_tpu.ops.rbf import (  # noqa: F401
    cosine_cutoff,
    expnorm_rbf,
    gauss_rbf,
)
from torchmdnet_tpu.ops.segment import segment_sum, segment_mean  # noqa: F401
