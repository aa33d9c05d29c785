from .metrics import compute_lpips, compute_ssim, load_lpips_params  # noqa: F401
from .test import run_test  # noqa: F401
from .render import run_render  # noqa: F401
