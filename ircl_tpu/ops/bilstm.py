"""Multi-layer bidirectional LSTM via ``lax.scan``.

TPU-native replacement for the reference's cuDNN ``nn.LSTM`` encoder head
(``src/model.py:16-22``). Design:

- the input projection ``x @ W_ih^T`` for the whole sequence is hoisted out of
  the recurrence as one large MXU matmul per layer/direction;
- only the O(H^2) recurrent matmul runs inside ``lax.scan``;
- both directions of a layer share one scan by stacking them into a leading
  axis (the reverse direction scans the time-flipped sequence).

Parameter layout per layer/direction (torch gate order i, f, g, o):
``w_ih [4H, I]``, ``w_hh [4H, H]``, ``b [4H]`` (the two torch biases folded
into one). Init matches the reference (``src/model.py:29-36``): Xavier-uniform
for input-hidden, orthogonal for hidden-hidden, zero biases.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp


def _xavier_uniform(key, shape, dtype=jnp.float32):
    fan_out, fan_in = shape[0], shape[1]
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def _orthogonal(key, shape, dtype=jnp.float32):
    a = jax.random.normal(key, shape, dtype)
    q, r = jnp.linalg.qr(a if shape[0] >= shape[1] else a.T)
    q = q * jnp.sign(jnp.diag(r))
    return q if shape[0] >= shape[1] else q.T


def init_bilstm_params(
    key: jax.Array,
    input_size: int,
    hidden_size: int,
    num_layers: int,
    bidirectional: bool = True,
) -> List[Dict[str, Any]]:
    """Per-layer params: {'fwd': {...}, 'bwd': {...}} (bwd absent if uni)."""
    dirs = 2 if bidirectional else 1
    layers = []
    for layer in range(num_layers):
        in_size = input_size if layer == 0 else hidden_size * dirs
        layer_params = {}
        for d in range(dirs):
            key, k1, k2 = jax.random.split(key, 3)
            # torch stacks 4 gate matrices; orthogonal init is applied to the
            # whole [4H, H] stack in the reference (init_weights loops named
            # parameters), so mirror that.
            w_ih = _xavier_uniform(k1, (4 * hidden_size, in_size))
            w_hh = _orthogonal(k2, (4 * hidden_size, hidden_size))
            layer_params["bwd" if d else "fwd"] = {
                "w_ih": w_ih,
                "w_hh": w_hh,
                "b": jnp.zeros((4 * hidden_size,), jnp.float32),
            }
        layers.append(layer_params)
    return layers


def _lstm_direction(params: Dict[str, Any], x: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """One direction of one layer. x: [B, L, I] -> [B, L, H]."""
    B, L, _ = x.shape
    H = params["w_hh"].shape[1]
    dtype = x.dtype
    # Hoisted input projection: [B, L, 4H] in one MXU matmul.
    xp = (
        jax.lax.dot_general(
            x,
            params["w_ih"].astype(dtype).T,
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + params["b"]
    )
    xs = jnp.swapaxes(xp, 0, 1)  # [L, B, 4H]
    if reverse:
        xs = xs[::-1]

    w_hh_t = params["w_hh"].astype(dtype).T  # [H, 4H]

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.dot(h, w_hh_t, preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = (o * jnp.tanh(c)).astype(dtype)
        return (h, c.astype(jnp.float32)), h

    h0 = jnp.zeros((B, H), dtype)
    c0 = jnp.zeros((B, H), jnp.float32)
    _, hs = jax.lax.scan(step, (h0, c0), xs)
    if reverse:
        hs = hs[::-1]
    return jnp.swapaxes(hs, 0, 1)  # [B, L, H]


def bilstm_apply(layers: List[Dict[str, Any]], x: jnp.ndarray) -> jnp.ndarray:
    """Full stack. x: [B, L, I] -> [B, L, H*dirs]."""
    out = x
    for layer_params in layers:
        fwd = _lstm_direction(layer_params["fwd"], out, reverse=False)
        if "bwd" in layer_params:
            bwd = _lstm_direction(layer_params["bwd"], out, reverse=True)
            out = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            out = fwd
    return out
