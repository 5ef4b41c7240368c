"""Serialization of sparse containers (npz).

The reference computes its packed format and then leaks it — the buffers
never escape the driver (SURVEY.md §2.7, §5 "checkpoint/resume: none").
Here every container round-trips to a single .npz so expensive preprocessing
is reusable across runs, which the reference clearly intended but never
shipped.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np

from spmm_tpu.formats.bsr import BSR
from spmm_tpu.formats.containers import COO, CSR, BlockedCSR
from spmm_tpu.formats.ell import ELL


_TYPES = {c.__name__: c for c in (COO, CSR, BSR, BlockedCSR, ELL)}


def _types():
    """ONE registry for both top-level and nested type resolution.  Lazy:
    SpgemmPlan lives in the jax-heavy ops package, only needed at
    save/load time."""
    from spmm_tpu.ops.slab_spgemm import SpgemmPlan

    return {**_TYPES, SpgemmPlan.__name__: SpgemmPlan}


def _flatten(obj, prefix, arrays, meta):
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        key = f"{prefix}{f.name}"
        if f.metadata.get("static"):
            meta[key] = v if not isinstance(v, tuple) else list(v)
        elif isinstance(v, tuple):  # tuple of arrays (ELL slabs)
            meta[key + "__len"] = len(v)
            for i, a in enumerate(v):
                arrays[f"{key}__{i}"] = np.asarray(a)
        elif dataclasses.is_dataclass(v):  # nested container (ELL.rest)
            meta[key + "__type"] = type(v).__name__
            _flatten(v, key + ".", arrays, meta)
        else:
            arrays[key] = np.asarray(v)


def _unflatten(cls, prefix, arrays, meta):
    kwargs = {}
    for f in dataclasses.fields(cls):
        key = f"{prefix}{f.name}"
        if f.metadata.get("static"):
            v = meta[key]
            kwargs[f.name] = tuple(v) if isinstance(v, list) else v
        elif key + "__len" in meta:
            kwargs[f.name] = tuple(arrays[f"{key}__{i}"] for i in range(meta[key + "__len"]))
        elif key + "__type" in meta:
            kwargs[f.name] = _unflatten(_types()[meta[key + "__type"]], key + ".", arrays, meta)
        else:
            kwargs[f.name] = arrays[key]
    return cls(**kwargs)


def save(path, obj) -> None:
    """Save any spmm_tpu container (COO/CSR/BSR/BlockedCSR/ELL) — or a
    ``SpgemmPlan`` (preprocess-once / multiply-in-another-process, the
    reference's premise applied to the two-phase SpGEMM) — to .npz."""
    arrays, meta = {}, {"__type": type(obj).__name__}
    _flatten(jax_to_host(obj), "", arrays, meta)
    np.savez_compressed(path, __meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8), **arrays)


def load(path):
    """Load a container saved with ``save``.  Arrays come back as numpy;
    ``jax.tree.map(jnp.asarray, obj)`` moves a loaded plan/container to the
    device once for steady-state reuse."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta"].tobytes()).decode())
        arrays = {k: z[k] for k in z.files if k != "__meta"}
    return _unflatten(_types()[meta["__type"]], "", arrays, meta)


def jax_to_host(obj):
    import jax

    return jax.tree.map(np.asarray, obj)
