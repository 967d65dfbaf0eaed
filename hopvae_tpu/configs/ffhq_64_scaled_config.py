"""FFHQ 64×64 with a scaled 4096-pattern Hopfield memory + PixelCNN prior.

The multi-chip target config from BASELINE.json ("FFHQ-64 scaled Hopfield
memory (4096 patterns) with batched AR sampling on a v5e slice"). No
reference counterpart — this is the configuration the Pallas
pattern-streaming kernel and the sharded mesh path are sized for.
"""

config = {}
config["batch_size"] = 256  # sized for a v5e slice, sharded over the data axis
config["epochs"] = 100
config["no_cuda"] = False
config["seed"] = 1265
config["image_size"] = 64
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
config["representation_dim"] = 17
config["num_levels"] = 512
config["prior_start"] = 50

config["prior"] = "PixelCNN"
config["index_dim"] = 3
