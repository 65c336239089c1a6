"""Checkpoint / resume utilities (SURVEY §5 checkpoint row).

The reference gets checkpointing for free from ``nn.Module.state_dict()``
(its layers subclass torch ConvNd and add no state — reference nn.py:42-63).
The TPU-native equivalent: modules are pytrees, so serialization is a tree
of arrays. Two paths:

  * ``save_checkpoint`` / ``load_checkpoint`` — dependency-free ``.npz``
    with torch's key names and weight layouts, so checkpoints interop with
    ``torch.nn.Conv*`` state dicts in both directions.
  * ``save_orbax`` / ``load_orbax`` — orbax-checkpoint for large / sharded
    checkpoints, when orbax is installed (it is not required).
"""

import os
from typing import Dict


import jax.numpy as jnp
import numpy as np


def module_state(module) -> Dict[str, np.ndarray]:
    """Torch-layout state dict as host numpy arrays."""
    return {k: np.asarray(v) for k, v in module.state_dict().items()}


def save_checkpoint(path: str, module) -> None:
    """Writes the module's parameters to ``path`` (.npz, torch key names)."""
    np.savez(path, **module_state(module))


def load_checkpoint(path: str, module):
    """Returns a new module with parameters loaded from ``path``.

    Accepts .npz files written by ``save_checkpoint`` or dicts of numpy
    arrays converted from a torch ``state_dict()``.
    """
    with np.load(path) as data:
        state = {k: data[k] for k in data.files}
    return module.load_state_dict(state)


def save_orbax(path: str, module) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), dict(module.state_dict()))
    ckptr.wait_until_finished()


def load_orbax(path: str, module):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = {k: jnp.asarray(v) for k, v in module.state_dict().items()}
    state = ckptr.restore(os.path.abspath(path), target=target)
    return module.load_state_dict(state)
