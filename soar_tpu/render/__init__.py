from .types import GaussianInputs, RasterConfig, RenderOutputs  # noqa: F401
from .tiled import rasterize  # noqa: F401
from .oracle import rasterize_oracle  # noqa: F401
