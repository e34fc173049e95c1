"""Root-level training entry (the reference ships a broken one: it imports a
gitignored module, /root/reference/train_model.py:1 — this one works).

    python train_model.py model01 --n-updates 100000

Thin forwarding wrapper over ``python -m vae_mdl_tpu.cli.run train``.
"""
import sys

from vae_mdl_tpu.cli.run import main

if __name__ == "__main__":
    main(["train"] + sys.argv[1:])
