"""Reference-surface entry point: ``python main.py --data <path>``.

Mirrors the reference's CLI (``/root/reference/main.py:89-94`` — a single
``--data`` flag with the experiment picked statically) while delegating to
the real driver, which adds ``--config``/``--set``/``--resume``/… (see
``python main.py --help``). Default config matches the reference's
hard-coded import (mnist_28, ``main.py:16``).
"""

from hopvae_tpu.train import main

if __name__ == "__main__":
    main()
