"""Tiny MLPs as pure functions over weight pytrees.

Replaces the reference's SDF/color decoder nets (reference:
slam/model_components/decoder_coslam.py:9-111 — 2-layer, 32-hidden, bias-free
Linear stacks with ReLU) and the tcnn FullyFusedMLP variant. On TPU the
"fully fused" property comes for free: XLA fuses the ReLU chains into the
matmuls, and batches are kept large and flat so the [N, in] x [in, hidden]
products land on the MXU.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp


def mlp_init(key: jax.Array, dims: Sequence[int], bias: bool = False, dtype=jnp.float32):
    """Initialize an MLP with torch.nn.Linear's default kaiming-uniform.

    dims = [in, hidden, ..., out]. Returns {'w': [W_i...], 'b': [b_i...]|None}.
    """
    ws: List[jnp.ndarray] = []
    bs: List[jnp.ndarray] = []
    keys = jax.random.split(key, len(dims) - 1)
    for i, k in enumerate(keys):
        fan_in = dims[i]
        bound = 1.0 / jnp.sqrt(fan_in)
        ws.append(jax.random.uniform(k, (dims[i], dims[i + 1]), dtype=dtype, minval=-bound, maxval=bound))
        if bias:
            kb = jax.random.fold_in(k, 1)
            bs.append(jax.random.uniform(kb, (dims[i + 1],), dtype=dtype, minval=-bound, maxval=bound))
    params = {"w": ws}
    if bias:
        params["b"] = bs
    return params


def mlp_apply(
    params,
    x: jnp.ndarray,
    activation: Callable[[jnp.ndarray], jnp.ndarray] = jax.nn.relu,
    final_activation: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Apply the MLP; activation between layers, none (or final_activation) at the end."""
    ws = params["w"]
    bs = params.get("b")
    h = x
    n = len(ws)
    for i, w in enumerate(ws):
        h = jnp.dot(h, w, preferred_element_type=h.dtype)
        if bs is not None:
            h = h + bs[i]
        if i < n - 1:
            h = activation(h)
    if final_activation is not None:
        h = final_activation(h)
    return h
