"""FFHQ 128×128 — a scale-up config with no reference counterpart.

Same dict schema as the reference's ``configs/*_config.py``. Exercises the
framework beyond the reference's largest geometry: encoder 128→33
(k4s2p1 → k4s2p1 → k4s1p2 → k3s1p1 gives H/4+1), so the Hopfield
bottleneck runs over a 33×33 = 1089-token latent grid against the scaled
4096-pattern memory, and the PixelCNN prior models a 33×33×3 grid.
Sized for a v5e slice with the batch sharded over the data axis and the
pattern memories optionally sharded over the model axis.
"""

config = {}
config["batch_size"] = 128
config["epochs"] = 100
config["no_cuda"] = False
config["seed"] = 1265
config["image_size"] = 128
config["log_interval"] = 1
config["learning_rate"] = 1e-3
config["momentum"] = 0.1
config["gamma"] = 0.98
config["weight_decay"] = 0.0

config["num_hiddens"] = 128
config["num_residual_layers"] = 2
config["num_residual_hiddens"] = 32
config["num_filters"] = 64
config["embedding_dim"] = 64
config["num_embeddings"] = 4096
config["num_channels"] = 3
config["data_set"] = "FFHQ"
config["representation_dim"] = 33
config["num_levels"] = 512
config["prior_start"] = 50

config["prior"] = "PixelCNN"
config["index_dim"] = 3
