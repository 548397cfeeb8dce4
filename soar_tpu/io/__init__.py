from .checkpoint import load_avatar, save_avatar, import_reference_ckpt  # noqa: F401
from .ply import read_ply, write_ply, avatar_to_ply  # noqa: F401
