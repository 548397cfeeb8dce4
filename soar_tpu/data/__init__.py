from .cameras import sample_multiview_cameras, sample_head_cameras  # noqa: F401
from .dataset import AvatarDataset, load_sequence, make_synthetic_sequence  # noqa: F401
