from .fused_mlp import fused_mlp_eval, pack_nerf_mlp_params  # noqa: F401
