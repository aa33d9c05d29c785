"""nerf_pytorch_paeng_tpu — a TPU-native NeRF training/rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
nuggy875/NeRF_pytorch_paeng (reference mounted at /root/reference):

- the whole render -> loss -> grad step is one jit-compiled XLA program
  (no host-side ray/point chunk loops as in reference nerf_process.py:236),
- ray batches shard across a ``jax.sharding.Mesh`` (data parallel) and the
  MLP width can shard across a model axis (tensor parallel),
- the hot inference path (posenc -> MLP -> compositing) has a fused Pallas
  kernel option,
- training state checkpoints via orbax; configs remain compatible with the
  reference's ``--config configs/blender/lego.txt`` text files.
"""

__version__ = "0.1.0"

from .config import NerfConfig, load_config  # noqa: F401
