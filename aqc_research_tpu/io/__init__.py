"""IO layer: checkpointing and native-kernel bindings."""

from .checkpoint import load_checkpoint, load_pytree, save_checkpoint, save_pytree
