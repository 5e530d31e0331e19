from smilify_tpu.ops.knn import knn_points  # noqa: F401
from smilify_tpu.ops.mesh_ops import (  # noqa: F401
    chamfer_distance,
    mesh_edge_loss,
    mesh_laplacian_smoothing,
    mesh_normal_consistency,
    sample_points_from_meshes,
)
