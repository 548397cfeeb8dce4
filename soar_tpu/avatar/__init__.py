from .state import (  # noqa: F401
    AvatarModel,
    AvatarParams,
    canonical_pose_params,
    init_avatar,
)
from .renderer import render_view, RenderSettings  # noqa: F401
