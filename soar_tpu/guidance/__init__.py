from .scheduler import DDPMSchedule  # noqa: F401
from .sds import MultiviewGuidance, GuidanceConfig  # noqa: F401
from .build import build_guidance, NetworkShapes  # noqa: F401
