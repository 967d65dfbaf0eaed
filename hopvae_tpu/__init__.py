"""hopvae_tpu — TPU-native rebuild of the capabilities of joejenb/Hop-VAE.

A from-scratch JAX/XLA/Pallas framework: NHWC conv stacks on the MXU, a
fused Pallas modern-Hopfield bottleneck, an on-device `lax.scan` PixelCNN
sampler, and `shard_map`/NamedSharding data parallelism over a device mesh.
See SURVEY.md for the reference analysis this build follows.
"""

from hopvae_tpu.config import MakeConfig, load_config
from hopvae_tpu.models.hopvae import HopVAE

__version__ = "0.1.0"

__all__ = ["MakeConfig", "load_config", "HopVAE", "__version__"]
