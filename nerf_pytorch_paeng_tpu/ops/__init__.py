from .posenc import positional_encoding, posenc_out_dim  # noqa: F401
from .rays import get_rays, ndc_rays, sample_pixels  # noqa: F401
from .sampling import (  # noqa: F401
    sample_pdf, sample_pdf_from_u, stratified_z_vals)
from .volume import volume_render  # noqa: F401
from .render import render_rays, render_frame  # noqa: F401
