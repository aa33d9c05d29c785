from .nerf import NeRF, NeRFMLP, init_nerf  # noqa: F401
