"""Harmonic (positional) embedding — pytorch3d `HarmonicEmbedding` subset.

Used by the RenderMLP for view-direction encoding (reference:
holo_voxel_grid_implicit_function.py:64-66) and by the MLP feature aggregator
for point->camera ray directions (custom_modules.py:186-188).
"""
from __future__ import annotations

import jax.numpy as jnp


def harmonic_embedding_dim(
    input_dims: int, n_harmonic_functions: int, append_input: bool = True
) -> int:
    return input_dims * (2 * n_harmonic_functions + int(append_input))


class HarmonicEmbedding:
    """Sin/cos embedding with log-spaced frequencies (omega_0 * 2**i).

    Output layout matches pytorch3d: [sin(f1 x), ..., sin(fN x),
    cos(f1 x), ..., cos(fN x), (x if append_input)], flattened over the last
    axis as (..., N * D) blocks with frequency-major ordering per trig fn.
    """

    def __init__(
        self,
        n_harmonic_functions: int = 6,
        omega_0: float = 1.0,
        logspace: bool = True,
        append_input: bool = True,
    ):
        self.n = n_harmonic_functions
        self.append_input = append_input
        if n_harmonic_functions > 0:
            if logspace:
                freqs = 2.0 ** jnp.arange(n_harmonic_functions, dtype=jnp.float32)
            else:
                freqs = jnp.linspace(
                    1.0,
                    2.0 ** (n_harmonic_functions - 1),
                    n_harmonic_functions,
                    dtype=jnp.float32,
                )
            self.frequencies = omega_0 * freqs
        else:
            self.frequencies = jnp.zeros((0,), jnp.float32)

    def get_output_dim(self, input_dims: int = 3) -> int:
        return harmonic_embedding_dim(input_dims, self.n, self.append_input)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., D) -> (..., D * (2N [+ 1]))."""
        if self.n == 0:
            return x if self.append_input else x[..., :0]
        # (..., D, N) -> (..., D*N) with pytorch3d ordering: embed[..., d*N+i]
        embed = (x[..., :, None] * self.frequencies).reshape(*x.shape[:-1], -1)
        parts = [jnp.sin(embed), jnp.cos(embed)]
        if self.append_input:
            parts.append(x)
        return jnp.concatenate(parts, axis=-1)
