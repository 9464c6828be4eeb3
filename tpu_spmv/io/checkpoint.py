"""Save/load of converted sparse matrices and vectors (.npz).

Reference analog: the closest thing the reference has is its text writers
(``VectorWrite`` `/root/reference/src/data_io.cpp:27-40`, mmio writers
`/root/reference/src/mmio.cpp:398-452`) — conversion work is redone on
every run.  Here any format pytree round-trips through a single ``.npz``
(array leaves + a JSON-encoded static spec), so expensive conversions and
Pallas packings are done once and reloaded — the checkpoint/resume
capability SURVEY.md §5 calls for.
"""

from __future__ import annotations

import json

import numpy as np
import jax

from .. import formats as _formats

__all__ = ["save_matrix", "load_matrix", "save_vector", "load_vector"]

_CLASSES = {cls.__name__: cls for cls in set(_formats.FORMATS.values())}


def save_matrix(path, mat) -> None:
    """Serialize any tpu_spmv format (or nested pytree of them) to .npz."""
    leaves, treedef = jax.tree_util.tree_flatten(mat)
    cls = type(mat).__name__
    if cls not in _CLASSES:
        raise TypeError(f"not a tpu_spmv format: {cls}")
    import dataclasses

    static = {
        f.name: getattr(mat, f.name)
        for f in dataclasses.fields(mat)
        if f.metadata.get("static")
    }
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez_compressed(
        path,
        __meta__=np.frombuffer(
            json.dumps({"class": cls, "static": static}).encode(), dtype=np.uint8
        ),
        **arrays,
    )


def load_matrix(path):
    """Load a matrix saved by :func:`save_matrix`."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
        leaves = [z[f"leaf_{i}"] for i in range(len(z.files) - 1)]
    cls = _CLASSES[meta["class"]]
    import dataclasses

    import jax.numpy as jnp

    static = meta["static"]
    # JSON turns tuples into lists; restore
    for key, val in static.items():
        if isinstance(val, list):
            static[key] = tuple(val)
    field_names = [
        f.name for f in dataclasses.fields(cls) if not f.metadata.get("static")
    ]
    kwargs = {name: jnp.asarray(leaf) for name, leaf in zip(field_names, leaves)}
    kwargs.update(static)
    return cls(**kwargs)


def save_vector(path, vec) -> None:
    np.savez_compressed(path, v=np.asarray(vec))


def load_vector(path):
    import jax.numpy as jnp

    with np.load(path) as z:
        return jnp.asarray(z["v"])
