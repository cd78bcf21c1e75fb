"""LatentGRUCell — GRU-Bayes encoder cell for irregular time series.

Reference: ``src/layers/latent_ode.jl``. The cell consumes
``x_t = concat(data_t, mask_t, dt_t)`` slices of shape (B, 2·in_dim + 1) and
carries ``(y_mean, y_std)``. Observation-mask gating keeps the carried
(mean, std) unchanged at unobserved steps (``latent_ode.jl:40-43``).

Two reference as-is quirks are preserved deliberately (SURVEY.md §7 item 6):
1. ``new_y_mean`` is computed from ``new_state_std`` rather than
   ``new_state_mean`` (``latent_ode.jl:37``);
2. the observation mask is summed over the rows *after the first half* of x,
   which includes the Δt channel (``latent_ode.jl:40``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.basic import Chain, Dense
from ..nn.module import Module


class LatentGRUCell(Module):
    def __init__(self, in_dim: int, h_dim: int, latent_dim: int):
        self.in_dim = in_dim
        self.h_dim = h_dim
        self.latent_dim = latent_dim
        _in = latent_dim * 2 + in_dim * 2 + 1
        self.update_gate = Chain(
            Dense(_in, h_dim, "tanh"), Dense(h_dim, latent_dim, "sigmoid")
        )
        self.reset_gate = Chain(
            Dense(_in, h_dim, "tanh"), Dense(h_dim, latent_dim, "sigmoid")
        )
        self.new_state = Chain(
            Dense(_in, h_dim, "tanh"), Dense(h_dim, latent_dim * 2, "tanh")
        )

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        pu, su = self.update_gate.init(k1)
        pr, sr = self.reset_gate.init(k2)
        pn, sn = self.new_state.init(k3)
        params = {"update_gate": pu, "reset_gate": pr, "new_state": pn}
        state = {"update_gate": su, "reset_gate": sr, "new_state": sn}
        return params, state

    def initial_carry(self, x_t):
        """First-call carry: y_mean = 0, y_std = 1 (``latent_ode.jl:19-23``)."""
        batch = x_t.shape[0]
        return (
            jnp.zeros((batch, self.latent_dim), x_t.dtype),
            jnp.ones((batch, self.latent_dim), x_t.dtype),
        )

    def apply(self, params, state, xc, *, training: bool = False):
        x, (y_mean, y_std) = xc
        L = self.latent_dim

        y_concat = jnp.concatenate([y_mean, y_std, x], axis=-1)
        update, st_u = self.update_gate(
            params["update_gate"], state["update_gate"], y_concat,
            training=training,
        )
        reset, st_r = self.reset_gate(
            params["reset_gate"], state["reset_gate"], y_concat,
            training=training,
        )
        concat = jnp.concatenate(
            [y_mean * reset, y_std * reset, x], axis=-1
        )
        new_state_out, st_n = self.new_state(
            params["new_state"], state["new_state"], concat, training=training
        )
        new_state_std = new_state_out[..., L:]

        # quirk 1 preserved: mean computed from new_state_std
        new_y_mean = (1 - update) * new_state_std + update * y_mean
        new_y_std = (1 - update) * new_state_std + update * y_std

        # quirk 2 preserved: mask block = second half of x (mask rows + Δt)
        half = x.shape[-1] // 2
        mask = (
            jnp.sum(x[..., half:], axis=-1, keepdims=True) > 0
        ).astype(x.dtype)

        new_y_mean = mask * new_y_mean + (1 - mask) * y_mean
        new_y_std = mask * new_y_std + (1 - mask) * y_std

        y = jnp.concatenate([new_y_mean, new_y_std], axis=-1)
        new_st = {"update_gate": st_u, "reset_gate": st_r, "new_state": st_n}
        return (y, (new_y_mean, new_y_std)), new_st
