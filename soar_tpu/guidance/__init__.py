from .scheduler import DDPMSchedule  # noqa: F401
from .sds import MultiviewGuidance, GuidanceConfig  # noqa: F401
