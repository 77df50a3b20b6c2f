"""Minimal functional module system for TPU-native models.

Design goals (see SURVEY.md §7):
- Parameters live in nested dict pytrees whose structure mirrors the module
  attribute tree, with torch-compatible leaf names (``weight``, ``bias``,
  ``running_mean`` ...).  This makes PyTorch ``state_dict`` conversion a
  generic tree walk (see :meth:`Module.from_torch`), which is what lets the
  entire pretrained checkpoint zoo load without per-model conversion tables.
- Modules hold only *static* configuration; all array state is passed in and
  returned explicitly, so every ``__call__`` is a pure function that can be
  ``jax.jit``-ed, ``lax.scan``-ed and sharded with ``pjit``.
- Mutable state (batch-norm running stats) is handled by letting layers write
  updated leaves into the (traced) params dict passed to them; training steps
  shallow-copy the tree and return it (standard functional-state threading).

Reference behavior being matched: torch ``nn.Module`` naming conventions used
throughout ``/root/reference/ptlflow/models`` (e.g. ``raft/extractor.py``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Leaf names that are state, not trainable parameters.
STATE_LEAVES = ("running_mean", "running_var", "num_batches_tracked")


class Module:
    """Base class. Children are discovered through attribute assignment."""

    def __init__(self):
        object.__setattr__(self, "_children", {})

    def __setattr__(self, name: str, value: Any) -> None:
        children = self.__dict__.get("_children")
        if children is None:
            children = {}
            object.__setattr__(self, "_children", children)
        if isinstance(value, Module):
            children[name] = value
        elif name in children:
            del children[name]
        object.__setattr__(self, name, value)

    # ------------------------------------------------------------------ init
    def init(self, key: jax.Array) -> Dict[str, Any]:
        """Initialize parameters. Default: recurse into children."""
        params: Dict[str, Any] = {}
        for name, child in self._children.items():
            key, sub = jax.random.split(key)
            p = child.init(sub)
            if p:
                params[name] = p
        return params

    # ------------------------------------------------------------------ call
    def __call__(self, params: Dict[str, Any], *args, **kwargs):
        raise NotImplementedError

    # ---------------------------------------------------------- torch import
    def _torch_leaves(self) -> Dict[str, Callable[[np.ndarray], np.ndarray]]:
        """Map of this module's own (non-child) torch param names to converters."""
        return {}

    def _torch_ignore(self) -> set:
        """Torch state_dict names of this module to drop on conversion:
        constant (non-learned) buffers the JAX side recomputes, e.g.
        LCV's identity matrix (corr_lcv.py:17 register_buffer('eye'))."""
        return set()

    def from_torch(self, flat: Dict[str, np.ndarray], strict: bool = True,
                   _path: str = "") -> Dict[str, Any]:
        """Convert a flat torch state_dict (already scoped to this module).

        ``flat`` maps dotted names relative to this module to numpy arrays.
        """
        params: Dict[str, Any] = {}
        used = set(n for n in self._torch_ignore() if n in flat)
        leaves = self._torch_leaves()
        for name, fn in leaves.items():
            if name in flat:
                # jnp.array (not asarray): torch state_dict tensors share
                # memory with their numpy views; we must own the buffer.
                params[name] = jnp.array(fn(np.asarray(flat[name])))
                used.add(name)
            elif strict:
                raise KeyError(f"missing torch param '{_path}{name}'")
        # group remaining keys by first path component
        grouped: Dict[str, Dict[str, np.ndarray]] = {}
        for k, v in flat.items():
            if k in used:
                continue
            if "." not in k:
                if k == "num_batches_tracked":
                    continue
                if strict:
                    raise KeyError(f"unexpected torch param '{_path}{k}'")
                continue
            head, rest = k.split(".", 1)
            grouped.setdefault(head, {})[rest] = v
        for head, sub in grouped.items():
            child = self._children.get(head)
            if child is None:
                if strict:
                    raise KeyError(f"no child module for torch params under '{_path}{head}.'")
                continue
            p = child.from_torch(sub, strict=strict, _path=f"{_path}{head}.")
            if p:
                params[head] = p
        if strict:
            # make sure every child that has params received some
            pass
        return params

    # --------------------------------------------------------------- helpers
    def named_children(self):
        return self._children.items()


class Sequential(Module):
    """Container matching torch ``nn.Sequential`` naming ("0", "1", ...)."""

    def __init__(self, *mods):
        super().__init__()
        self.mods: List[Any] = []
        for i, m in enumerate(mods):
            if isinstance(m, Module):
                setattr(self, str(i), m)
            self.mods.append(m)

    def __call__(self, params, x, **kwargs):
        for i, m in enumerate(self.mods):
            if isinstance(m, Module):
                x = m(params.get(str(i), {}), x, **kwargs)
            else:  # plain function, e.g. an activation
                x = m(x)
        return x


class ModuleList(Module):
    """Container matching torch ``nn.ModuleList`` naming."""

    def __init__(self, mods: Sequence[Module] = ()):  # noqa: D401
        super().__init__()
        self.mods = list(mods)
        for i, m in enumerate(self.mods):
            setattr(self, str(i), m)

    def append(self, m: Module):
        setattr(self, str(len(self.mods)), m)
        self.mods.append(m)

    def __iter__(self):
        return iter(self.mods)

    def __len__(self):
        return len(self.mods)

    def __getitem__(self, i):
        return self.mods[i]


class Identity(Module):
    def __call__(self, params, x, **kwargs):
        return x


# ---------------------------------------------------------------------------
# Param tree utilities
# ---------------------------------------------------------------------------

def flatten_params(params: Dict[str, Any], prefix: str = "") -> Dict[str, jnp.ndarray]:
    out = {}
    for k, v in params.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_params(v, prefix=name + "."))
        else:
            out[name] = v
    return out


def count_parameters(params: Dict[str, Any]) -> int:
    return sum(int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(params))


def split_trainable(params: Dict[str, Any],
                    frozen_prefixes: Tuple[str, ...] = ()) -> Tuple[Dict, Dict]:
    """Split a param tree into (trainable, state) by leaf name.

    ``frozen_prefixes`` are dotted subtree paths (e.g. a frozen backbone,
    mirroring torch's requires_grad=False) routed wholesale into state.
    """
    def walk(p, path):
        train, state = {}, {}
        for k, v in p.items():
            sub = f"{path}.{k}" if path else k
            if sub in frozen_prefixes and isinstance(v, dict):
                state[k] = v
            elif isinstance(v, dict):
                t, s = walk(v, sub)
                if t:
                    train[k] = t
                if s:
                    state[k] = s
            elif k in STATE_LEAVES:
                state[k] = v
            else:
                train[k] = v
        return train, state

    return walk(params, "")


def merge_params(trainable: Dict[str, Any], state: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`split_trainable`."""
    out: Dict[str, Any] = {}
    for src in (trainable, state):
        for k, v in src.items():
            if isinstance(v, dict):
                out[k] = merge_params(out.get(k, {}), v) if k in out else merge_params(v, {})
            else:
                out[k] = v
    return out


def tree_copy(params: Dict[str, Any]) -> Dict[str, Any]:
    """Shallow-copy all dict shells (leaves shared)."""
    return {k: tree_copy(v) if isinstance(v, dict) else v for k, v in params.items()}


def cast_params(params: Dict[str, Any], dtype) -> Dict[str, Any]:
    """Cast floating-point leaves to ``dtype`` (state leaves stay fp32)."""
    def walk(p):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k in STATE_LEAVES or not jnp.issubdtype(v.dtype, jnp.floating):
                out[k] = v
            else:
                out[k] = v.astype(dtype)
        return out

    return walk(params)
