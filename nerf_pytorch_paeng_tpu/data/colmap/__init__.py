from .poses import gen_poses  # noqa: F401
from .read_model import (  # noqa: F401
    detect_model_ext, qvec2rotmat, read_cameras_binary, read_cameras_text,
    read_images_binary, read_images_text, read_model, read_points3d_binary,
    read_points3d_text)
from .wrapper import run_colmap  # noqa: F401
