"""HBM-resident ring replay buffer.

The legacy SAC API promises a real replay buffer with ``buffer_size`` /
``learning_starts`` semantics (SURVEY §0.1; config/config.yaml buffer_size
1e6) which the reference's live path never implements (it trains on a batch
of one transition, agent/multi_algorithm_agent.py:950-1016). Here the buffer
is a pytree of fixed-size device arrays updated with ``dynamic_update_slice``
— it lives in HBM, is donated across train steps, and both ``add`` and
``sample`` trace into the fused rollout+update XLA program (no host round
trips).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    """Fixed-capacity ring buffer over a dict of arrays.

    data: dict name -> (capacity, *feature) array
    ptr:  next write index; size: valid entries (saturates at capacity).
    """

    data: dict[str, jnp.ndarray]
    ptr: jnp.ndarray   # i32
    size: jnp.ndarray  # i32
    capacity: int = struct.field(pytree_node=False)

    @staticmethod
    def create(capacity: int, example: dict[str, jnp.ndarray]) -> "ReplayBuffer":
        """Allocate from a single example transition (no batch axis)."""
        data = {
            k: jnp.zeros((capacity,) + v.shape, v.dtype) for k, v in example.items()
        }
        return ReplayBuffer(
            data=data, ptr=jnp.int32(0), size=jnp.int32(0), capacity=capacity
        )


def add_batch(buf: ReplayBuffer, batch: dict[str, jnp.ndarray]) -> ReplayBuffer:
    """Insert a batch of B transitions at the ring pointer.

    Capacity is required to be a multiple of B (checked at trace time), so a
    batch never straddles the wrap point and the write is one
    ``dynamic_update_slice`` per field — the cheap path on TPU.
    """
    b = next(iter(batch.values())).shape[0]
    if buf.capacity % b != 0:
        raise ValueError(
            f"replay capacity {buf.capacity} must be a multiple of batch {b}"
        )
    data = {
        k: jax.lax.dynamic_update_slice(
            buf.data[k], v.astype(buf.data[k].dtype),
            (buf.ptr,) + (0,) * (buf.data[k].ndim - 1),
        )
        for k, v in batch.items()
    }
    ptr = (buf.ptr + b) % buf.capacity
    size = jnp.minimum(buf.size + b, buf.capacity)
    return buf.replace(data=data, ptr=ptr, size=size)


def sample(
    buf: ReplayBuffer, key: jnp.ndarray, batch_size: int
) -> dict[str, jnp.ndarray]:
    """Uniform sample of ``batch_size`` transitions from the valid region."""
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(buf.size, 1))
    return {k: v[idx] for k, v in buf.data.items()}
