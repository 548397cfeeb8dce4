from .model import BodyModel, lbs, make_test_body  # noqa: F401
from .skinning import (  # noqa: F401
    SkinningData,
    knn_idw_weights,
    mean_knn_sq_dist,
)
