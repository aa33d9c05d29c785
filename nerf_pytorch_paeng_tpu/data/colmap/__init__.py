from .poses import gen_poses  # noqa: F401
from .read_model import (  # noqa: F401
    qvec2rotmat, read_cameras_binary, read_images_binary,
    read_points3d_binary)
from .wrapper import run_colmap  # noqa: F401
