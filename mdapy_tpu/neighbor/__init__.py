from .neighbor import Neighbor  # noqa: F401
from .knn import NearestNeighbor  # noqa: F401
