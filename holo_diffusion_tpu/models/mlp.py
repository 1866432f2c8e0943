"""MLPWithInputSkips — flax rebuild of the reference's configurable decoding
MLP (custom_modules.py:44-160).

BEHAVIORAL QUIRK replicated on purpose: the reference (custom_modules.py:108-113)
swaps the activation branches relative to upstream pytorch3d — the *last*
layer gets `hidden_activation` and all earlier layers get `last_activation`.
With the RenderMLP's settings (hidden=LEAKYRELU, last=IDENTITY) the density
net is therefore a linear cascade with a single LeakyReLU at the output.
HoloDiffusion trained with this behavior, so weight-import parity requires it;
set `reference_activation_order=False` for the upstream (intended) ordering.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

_xavier = nn.initializers.xavier_uniform()
_zeros = nn.initializers.zeros

_HIDDEN_ACTS = {
    "RELU": nn.relu,
    "SOFTPLUS": nn.softplus,
    # torch.nn.LeakyReLU(negative_slope=0.2) (custom_modules.py:80-82)
    "LEAKYRELU": lambda x: nn.leaky_relu(x, negative_slope=0.2),
}
_LAST_ACTS = {
    "RELU": nn.relu,
    "SOFTPLUS": nn.softplus,
    "SIGMOID": nn.sigmoid,
    "IDENTITY": lambda x: x,
}


class MLPWithInputSkips(nn.Module):
    n_layers: int = 8
    output_dim: int = 256
    hidden_dim: int = 256
    input_skips: Tuple[int, ...] = (5,)
    last_layer_bias_init: Optional[float] = None
    hidden_activation: str = "LEAKYRELU"
    last_activation: str = "SOFTPLUS"
    reference_activation_order: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, z: Optional[jnp.ndarray] = None):
        """x: (..., input_dim); z: optional skip tensor (defaults to x)."""
        hidden_act = _HIDDEN_ACTS[self.hidden_activation]
        last_act = _LAST_ACTS[self.last_activation]
        if z is None:
            z = x
        y = x
        skips = set(self.input_skips)
        for li in range(self.n_layers):
            if li > 0 and li in skips:
                y = jnp.concatenate([y, z], axis=-1)
            is_last = li + 1 >= self.n_layers
            dimout = self.output_dim if is_last else self.hidden_dim
            bias_init = _zeros
            if is_last and self.last_layer_bias_init is not None:
                bias_init = nn.initializers.constant(self.last_layer_bias_init)
            y = nn.Dense(
                dimout,
                kernel_init=_xavier,
                bias_init=bias_init,
                dtype=self.dtype,
                name=f"linear_{li}",
            )(y)
            if self.reference_activation_order:
                y = hidden_act(y) if is_last else last_act(y)
            else:
                y = last_act(y) if is_last else hidden_act(y)
        return y
