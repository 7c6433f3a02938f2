from .clusten import clusten_av, clusten_qk, clusten_wf, gather_neighbors
from .knn import knn
from .points import points2img
from .sfc import (
    calculate_hilbert_order,
    calculate_peano_order,
    grid_cluster,
    space_filling_cluster,
)

__all__ = [
    "clusten_av",
    "clusten_qk",
    "clusten_wf",
    "gather_neighbors",
    "knn",
    "points2img",
    "calculate_hilbert_order",
    "calculate_peano_order",
    "grid_cluster",
    "space_filling_cluster",
]
