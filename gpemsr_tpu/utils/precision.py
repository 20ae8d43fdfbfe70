"""Mixed-precision helpers.

TPU MXU peak is bf16; for inference we cast params + inputs to bfloat16 and
let every conv/matmul run natively (reductions inside our custom ops still
accumulate in f32 via preferred_element_type). Training keeps f32 params with
default-precision matmuls (bf16 multiply, f32 accumulate on TPU)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resolve_dtype(name: str):
    """Config string -> jnp dtype (ParallelConfig.dtype / compute_dtype)."""
    table = {"float32": jnp.float32, "f32": jnp.float32,
             "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}
    if name not in table:
        raise ValueError(f"unknown dtype {name!r}; one of {sorted(table)}")
    return table[name]


def cast_floats(tree, dtype):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


def bf16_params(params):
    return cast_floats(params, jnp.bfloat16)


def bf16_inference(apply_fn, params):
    """Wrap an apply(params, *args) into a bf16-compute closure returning f32."""
    p16 = bf16_params(params)

    def fn(*args):
        args16 = cast_floats(args, jnp.bfloat16)
        out = apply_fn(p16, *args16)
        return cast_floats(out, jnp.float32)

    return fn
