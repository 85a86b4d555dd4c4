"""Model base: flax modules with class-name/kwargs/params checkpointing.

TPU-native counterpart of reference ``blvm/models/base_model.py``: the
reference saves three files (class name, ``__init__`` kwargs captured by
signature reflection, state_dict — ``base_model.py:84-89``) and reloads by
class-name lookup (``base_model.py:21-34``). Here a model is a
``flax.linen.Module`` (hyperparameters are dataclass fields, so "init kwargs"
come for free) and parameters are a separate pytree saved as msgpack.

Checkpoint layout (directory):
    model_class_name.json   — class name for registry dispatch
    model_kwargs.json       — the module's dataclass fields
    model_params.msgpack    — flax.serialization bytes of the params pytree

Forward contract (mirrors reference §2.5): modules define
``__call__(x, x_sl, ...) -> (loss, mets, outputs)`` where ``mets`` is a
jit-safe dict of arrays and each model provides ``build_metrics(mets)``
(host-side) turning it into the reference's ``List[Metric]``.
"""

import dataclasses
import json
import os
from typing import Any, Optional

import flax.linen as nn
import jax
from flax import serialization

MODEL_CLASS_NAME_STR = "model_class_name.json"
MODEL_INIT_KWARGS_STR = "model_kwargs.json"
MODEL_PARAMS_STR = "model_params.msgpack"


def _jsonable(value):
    if isinstance(value, (list, tuple)):
        return [_jsonable(v) for v in value]
    if dataclasses.is_dataclass(value) and not isinstance(value, type):
        return {f.name: _jsonable(getattr(value, f.name)) for f in dataclasses.fields(value)}
    if hasattr(value, "dtype") and hasattr(value, "tolist"):
        return value.tolist()
    if isinstance(value, type):
        return value.__name__
    return value


class BaseModel(nn.Module):
    """Base class for end-use models (checkpointable flax modules)."""

    def init_arguments(self) -> dict:
        """The module's hyperparameters (dataclass fields) as a JSON-able dict."""
        out = {}
        for field in dataclasses.fields(self):
            if field.name in ("name", "parent"):
                continue
            out[field.name] = _jsonable(getattr(self, field.name))
        return out

    def save(self, path: str, params: Any) -> None:
        """Save class name, init kwargs and params under ``path``."""
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, MODEL_CLASS_NAME_STR), "w") as f:
            json.dump(self.__class__.__name__, f)
        with open(os.path.join(path, MODEL_INIT_KWARGS_STR), "w") as f:
            json.dump(self.init_arguments(), f, indent=2, default=str)
        with open(os.path.join(path, MODEL_PARAMS_STR), "wb") as f:
            f.write(serialization.to_bytes(params))

    @classmethod
    def load(cls, path: str):
        """Return ``(model, params)`` reconstructed from a checkpoint directory.

        Params are restored by shape/dtype re-initialization then byte restore,
        so the result works on any backend.
        """
        with open(os.path.join(path, MODEL_INIT_KWARGS_STR)) as f:
            kwargs = json.load(f)
        # JSON turns tuples into lists; linen fields declared as tuples/Sequences accept lists.
        model = cls(**{k: tuple(v) if isinstance(v, list) else v for k, v in kwargs.items()})
        params = model.lazy_params()
        with open(os.path.join(path, MODEL_PARAMS_STR), "rb") as f:
            params = serialization.from_bytes(params, f.read())
        params = jax.tree_util.tree_map(jax.numpy.asarray, params)
        return model, params

    def lazy_params(self):
        """Initialize a params pytree with example inputs (shape template for restore).

        Models must implement ``example_inputs()`` returning (args, rngs-dict).
        """
        args, rngs = self.example_inputs()
        variables = jax.eval_shape(lambda: self.init({"params": jax.random.PRNGKey(0), **{k: jax.random.PRNGKey(0) for k in rngs}}, *args))
        # materialize concrete zeros with the right structure
        import jax.numpy as jnp

        return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), variables["params"])

    def example_inputs(self):
        raise NotImplementedError(f"{self.__class__.__name__} must define example_inputs() for checkpoint restore")

    @staticmethod
    def build_metrics(mets: dict):
        raise NotImplementedError

    def summary(self, params=None, depth: int = 3) -> str:
        """Layer table with parameter shapes and counts (role of reference
        ``base_model.py:113-141``/torchinfo). Uses abstract init — no FLOPs
        are spent building the table."""
        if params is None:
            args, rngs = self.example_inputs()
            variables = jax.eval_shape(
                lambda: self.init(
                    {"params": jax.random.PRNGKey(0), **{k: jax.random.PRNGKey(0) for k in rngs}}, *args
                )
            )
            params = variables["params"]

        rows = []

        def walk(tree, path):
            if hasattr(tree, "shape"):
                rows.append(("/".join(path), tuple(tree.shape), int_prod(tree.shape)))
                return
            for key in sorted(tree.keys()):
                walk(tree[key], path + [key])

        def int_prod(shape):
            out = 1
            for s in shape:
                out *= int(s)
            return out

        walk(params, [])
        # collapse below `depth` path segments
        collapsed = {}
        for path, shape, count in rows:
            parts = path.split("/")
            key = "/".join(parts[:depth])
            if key not in collapsed:
                collapsed[key] = [0, shape]
            collapsed[key][0] += count

        width = max((len(k) for k in collapsed), default=10) + 2
        lines = [f"{self.__class__.__name__} — {sum(c for c, _ in collapsed.values()):,} parameters"]
        for key, (count, shape) in collapsed.items():
            lines.append(f"  {key:<{width}} {count:>12,}")
        return "\n".join(lines)


def load_model(path: str, model_class_name: str = None):
    """Re-instantiate a saved model by class-name lookup in ``blvm_tpu.models``."""
    import blvm_tpu.models as models_pkg

    if not os.path.exists(path):
        raise RuntimeError(f"Tried to load model checkpoint but the path does not exist: {path}")

    if model_class_name is None:
        name_path = os.path.join(path, MODEL_CLASS_NAME_STR)
        if not os.path.exists(name_path):
            raise RuntimeError(f"Name of class of model to load was not given and not saved in checkpoint: {path}")
        with open(name_path) as f:
            model_class_name = json.load(f)

    model_class = getattr(models_pkg, model_class_name)
    return model_class.load(path)


def count_parameters(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
