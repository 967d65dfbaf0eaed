"""Convert a reference torch checkpoint to a native msgpack checkpoint.

Usage:
    python tools/convert_checkpoint.py --config mnist_28 \
        --input /root/reference/checkpoints/MNIST-28.ckpt \
        --output checkpoints/MNIST-28.ckpt.msgpack

After conversion the framework never needs torch again.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--input", required=True, help="torch .ckpt state_dict")
    parser.add_argument("--output", required=True, help="native .msgpack path")
    args = parser.parse_args(argv)

    import jax

    from hopvae_tpu.config import load_config
    from hopvae_tpu.models.hopvae import HopVAE
    from hopvae_tpu.utils import checkpoint as ckpt_lib

    config = load_config(args.config)
    model = HopVAE(config)
    params = model.init(jax.random.PRNGKey(config.seed))
    sd = ckpt_lib.load_torch_state_dict(args.input)
    converted = ckpt_lib.convert_torch_state_dict(sd, config)
    params = ckpt_lib.lenient_merge(params, converted)
    ckpt_lib.save_params(args.output, params)
    n = len(jax.tree_util.tree_leaves(params))
    print(f"wrote {args.output}: {n} tensors")


if __name__ == "__main__":
    main()
