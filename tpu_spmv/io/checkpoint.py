"""Save/load of converted and packed sparse matrices (.npz).

Reference analog: the closest thing the reference has is its text writers
(``VectorWrite`` `/root/reference/src/data_io.cpp:27-40`, mmio writers
`/root/reference/src/mmio.cpp:398-452`) — conversion work is redone on
every run (`/root/reference/src/data_io.cpp:111-138`).  Here any format
pytree round-trips through a single ``.npz`` (array leaves + a JSON spec
tree), **including the expensive Pallas packings** (``PackedELL``,
``GPCSR``/``GPCSRChunked`` and their nested ``PermutationPlan``s) — GPR
packing costs seconds per 700k nnz, so amortizing it across runs is the
point of checkpointing (the ``--cache`` CLI flag wires this up).

The serializer recurses over ``sparse_dataclass`` pytrees: array leaves go
into the npz, static fields and structure go into the JSON spec.  Nested
dataclasses (a ``GPCSR`` holds a ``PermutationPlan``, a ``COO`` side
matrix, and optionally another ``GPCSR``), ``None`` fields, and tuples of
children (``GPCSRChunked.chunks``) all round-trip.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax

__all__ = ["save_matrix", "load_matrix", "save_vector", "load_vector"]


def _classes():
    """Name → class for every serializable pytree dataclass (lazy: the
    kernels import pallas)."""
    from .. import formats as _formats
    from ..kernels.dia_stream import PSDIA, SDIA
    from ..kernels.ell_pallas import PackedELL
    from ..kernels.gpr import GPCSR, GPCSRChunked, ChunkFold
    from ..kernels.permute import PermutationPlan, TwoLevelPlan

    out = {cls.__name__: cls for cls in set(_formats.FORMATS.values())}
    for cls in (PackedELL, GPCSR, GPCSRChunked, ChunkFold, PermutationPlan,
                TwoLevelPlan, SDIA, PSDIA):
        out[cls.__name__] = cls
    return out


def _serialize(obj, arrays: dict, classes: dict):
    """Object → JSON-able spec; array leaves are appended to ``arrays``."""
    if obj is None:
        return None
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        name = type(obj).__name__
        if name not in classes:
            raise TypeError(f"not a serializable tpu_spmv format: {name}")
        static, fields = {}, {}
        for f in dataclasses.fields(obj):
            if f.metadata.get("static"):
                static[f.name] = getattr(obj, f.name)
            else:
                fields[f.name] = _serialize(getattr(obj, f.name), arrays,
                                            classes)
        return {"__class__": name, "static": static, "fields": fields}
    if isinstance(obj, (tuple, list)):
        return {"__tuple__": [_serialize(o, arrays, classes) for o in obj]}
    key = f"a{len(arrays)}"
    arrays[key] = np.asarray(obj)
    return {"__array__": key}


def _deep_tuple(v):
    """JSON turns tuples into lists; restore (recursively — e.g. the
    per-class layout tuples of ``GPCSR.class_tiles``)."""
    if isinstance(v, list):
        return tuple(_deep_tuple(x) for x in v)
    return v


def _deserialize(spec, z, classes: dict):
    if spec is None:
        return None
    if "__array__" in spec:
        # numpy leaf: load_matrix device_puts the WHOLE pytree in one
        # batched call (per-array transfers pay a per-call tunnel
        # round-trip each — the pack cold-start lesson, round 5)
        return np.ascontiguousarray(z[spec["__array__"]])
    if "__tuple__" in spec:
        return tuple(_deserialize(s, z, classes) for s in spec["__tuple__"])
    cls = classes[spec["__class__"]]
    kwargs = {k: _deep_tuple(v) for k, v in spec["static"].items()}
    for name, sub in spec["fields"].items():
        kwargs[name] = _deserialize(sub, z, classes)
    # forward compatibility: checkpoints written by an older revision may
    # carry fields a newer dataclass dropped (e.g. PermutationPlan.b1
    # after the round-2 b1->a3 fold).  Unknown fields cannot be applied
    # to the new semantics, so the checkpoint is stale — raise the
    # error callers (cli --cache) treat as "re-pack"
    known = {f.name for f in dataclasses.fields(cls)}
    stale = set(kwargs) - known
    if stale:
        raise ValueError(
            f"stale checkpoint: {spec['__class__']} no longer has "
            f"field(s) {sorted(stale)} — delete and re-pack"
        )
    return cls(**kwargs)


def save_matrix(path, mat, *, extra: dict | None = None) -> None:
    """Serialize any tpu_spmv format — basic or packed — to one .npz.

    ``extra`` attaches a small JSON-able dict (e.g. the planner strategy)
    retrievable via ``load_matrix(path, with_extra=True)``.
    """
    classes = _classes()
    arrays: dict = {}
    spec = _serialize(mat, arrays, classes)
    meta = {"spec": spec, "extra": extra or {}}
    np.savez_compressed(
        path,
        __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        **arrays,
    )


def load_matrix(path, *, with_extra: bool = False):
    """Load a matrix saved by :func:`save_matrix`."""
    import jax

    classes = _classes()
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
        mat = jax.device_put(_deserialize(meta["spec"], z, classes))
    if with_extra:
        return mat, meta.get("extra", {})
    return mat


def save_vector(path, vec) -> None:
    np.savez_compressed(path, v=np.asarray(vec))


def load_vector(path):
    import jax.numpy as jnp

    with np.load(path) as z:
        return jnp.asarray(z["v"])
