"""hopvae_tpu — TPU-native rebuild of the capabilities of joejenb/Hop-VAE.

A from-scratch JAX/XLA/Pallas framework: NHWC conv stacks on the MXU, a
fused Pallas modern-Hopfield bottleneck, an on-device `lax.scan` PixelCNN
sampler, and `shard_map`/NamedSharding data parallelism over a device mesh.
See SURVEY.md for the reference analysis this build follows.
"""

from hopvae_tpu.config import MakeConfig, load_config
from hopvae_tpu.models.hopvae import HopVAE

__version__ = "0.1.0"

__all__ = [
    "MakeConfig",
    "load_config",
    "HopVAE",
    "Trainer",
    "InferenceEngine",
    "__version__",
]


def __getattr__(name):  # lazy: Trainer/InferenceEngine pull in optax/serving
    if name == "Trainer":
        from hopvae_tpu.train import Trainer

        return Trainer
    if name == "InferenceEngine":
        from hopvae_tpu.serving import InferenceEngine

        return InferenceEngine
    raise AttributeError(name)
