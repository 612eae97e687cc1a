"""Transformer policy network (flax) — the reference's flagship architecture.

Reimplements ``TransformerPolicyNetwork`` (agent/multi_algorithm_agent.py:
123-227): obs → Dense embed (d_model 256) → sinusoidal positional encoding
(max_len 5000, :90-105) → N pre-norm encoder layers (8 heads, ff 512, GELU,
dropout 0.1) → last-token pooling → LayerNorm → optional squeeze-excitation
(:107-121) → twin GELU+LayerNorm heads emitting (mean, log_std) with
log_std clamped to [-20, 2] and a value scalar.

TPU notes: the live workload runs sequence length 1 (the reference pools the
last token of a length-1 sequence, :197-210), so attention degenerates to a
couple of dense layers — kept for API/capability parity and for
history-conditioned policies (seq_len > 1), where plain batched attention is
the right tool at these sizes (no ring/Ulysses needed, SURVEY §2.4).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tvc_ai_tpu.models.distributions import clamp_log_std


def sinusoidal_encoding(max_len: int, d_model: int) -> jnp.ndarray:
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe)


class SqueezeExcitation(nn.Module):
    """Feature recalibration (ref :107-121)."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.relu(nn.Dense(max(self.channels // self.reduction, 1))(x))
        y = nn.sigmoid(nn.Dense(self.channels)(y))
        return x * y


class EncoderLayer(nn.Module):
    """Pre-norm transformer encoder block (heads/ff per ref config)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn_in = nn.LayerNorm()(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=deterministic,
        )(attn_in, attn_in)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        ff_in = nn.LayerNorm()(x)
        ff = nn.Dense(self.dim_feedforward)(ff_in)
        ff = nn.gelu(ff)
        ff = nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        ff = nn.Dense(self.d_model)(ff)
        return x + nn.Dropout(self.dropout, deterministic=deterministic)(ff)


class _Head(nn.Module):
    """GELU + LayerNorm MLP head (ref :157-180)."""

    hidden_dims: tuple[int, ...]
    out_dim: int
    dropout: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for h in self.hidden_dims:
            x = nn.Dense(
                h, kernel_init=nn.initializers.orthogonal(jnp.sqrt(2.0))
            )(x)
            x = nn.gelu(x)
            x = nn.LayerNorm()(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(
            self.out_dim, kernel_init=nn.initializers.orthogonal(jnp.sqrt(2.0))
        )(x)


class TransformerPolicyNetwork(nn.Module):
    action_dim: int
    d_model: int = 256
    num_heads: int = 8
    num_layers: int = 4
    dim_feedforward: int = 512
    dropout: float = 0.1
    head_hidden_dims: tuple[int, ...] = (512, 512)
    use_squeeze_excitation: bool = True
    max_len: int = 5000

    @nn.compact
    def __call__(
        self,
        obs: jnp.ndarray,
        sequence_length: int = 1,
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """obs: (B, obs_dim) for seq-len 1, or (B, S·obs_dim)/(B, S, obs_dim).

        Returns (mean, log_std, value) like the reference forward (:193-227).
        """
        batch = obs.shape[0]
        if obs.ndim == 2 and sequence_length > 1:
            obs = obs.reshape(batch, sequence_length, -1)
        elif obs.ndim == 2:
            obs = obs[:, None, :]
        x = nn.Dense(
            self.d_model, kernel_init=nn.initializers.orthogonal(jnp.sqrt(2.0))
        )(obs)
        seq = x.shape[1]
        x = x + sinusoidal_encoding(self.max_len, self.d_model)[:seq]
        for _ in range(self.num_layers):
            x = EncoderLayer(
                self.d_model, self.num_heads, self.dim_feedforward, self.dropout
            )(x, deterministic=deterministic)
        x = x[:, -1, :]  # last-token pooling (ref :204)
        x = nn.LayerNorm()(x)
        if self.use_squeeze_excitation:
            x = SqueezeExcitation(self.d_model)(x)
        policy_out = _Head(self.head_hidden_dims, self.action_dim * 2, self.dropout)(
            x, deterministic=deterministic
        )
        value = _Head(self.head_hidden_dims, 1, self.dropout)(
            x, deterministic=deterministic
        )[..., 0]
        mean, log_std = jnp.split(policy_out, 2, axis=-1)
        return mean, clamp_log_std(log_std), value


class TransformerActor(nn.Module):
    """GaussianActor-compatible facade over the transformer policy:
    obs → (mean, log_std), dropping the value head — lets SAC/PPO swap the
    MLP for the reference's flagship architecture via config
    (network.architecture_type, config/config.yaml:72)."""

    action_dim: int
    d_model: int = 256
    num_heads: int = 8
    num_layers: int = 4
    dim_feedforward: int = 512
    head_hidden_dims: tuple[int, ...] = (512, 512)

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        mean, log_std, _ = TransformerPolicyNetwork(
            action_dim=self.action_dim,
            d_model=self.d_model,
            num_heads=self.num_heads,
            num_layers=self.num_layers,
            dim_feedforward=self.dim_feedforward,
            head_hidden_dims=self.head_hidden_dims,
            dropout=0.0,  # SAC's entropy handles exploration; keep apply pure
        )(obs, deterministic=True)
        return mean, log_std
