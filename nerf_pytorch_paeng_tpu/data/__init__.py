from .blender import load_blender  # noqa: F401
from .llff import load_llff  # noqa: F401
from .custom import load_custom  # noqa: F401
from .render_pose import get_render_pose, pose_spherical  # noqa: F401
