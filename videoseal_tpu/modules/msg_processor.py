"""Message processor: binary/Gaussian message -> spatial embedding.

Parity with videoseal/modules/msg_processor.py:8-127, redesigned for the MXU:
the reference gathers per-bit rows from an Embedding(2*nbits, d) table and
sums them. Splitting the table into even (bit=0) and odd (bit=1) rows turns
that gather-and-sum into

    emb(m) = sum_k E[2k]  +  m @ (E[2k+1] - E[2k])

i.e. a constant plus ONE (B, nbits) x (nbits, d) matmul — no gathers, no
dynamic indexing, identical numerics, and it batches over frames for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class MsgProcessor(nn.Module):
    """Args mirror the reference (msg_processor.py:18-41)."""
    nbits: int
    hidden_size: int
    msg_processor_type: str = "binary+concat"
    msg_mult: float = 1.0

    @property
    def msg_type(self) -> str:
        return (self.msg_processor_type if self.nbits > 0 else "none+_").split("+")[0]

    @property
    def msg_agg(self) -> str:
        return (self.msg_processor_type if self.nbits > 0 else "none+_").split("+")[1]

    def message_embedding(self, msgs: jnp.ndarray) -> jnp.ndarray:
        """(B, nbits) -> (B, hidden_size) message embedding."""
        if self.msg_type.startswith("bin"):
            table = self.param("msg_embeddings", nn.initializers.normal(1.0),
                               (2 * self.nbits, self.hidden_size))
            even = table[0::2]   # rows used when bit k == 0
            odd = table[1::2]    # rows used when bit k == 1
            base = jnp.sum(even, axis=0)
            delta = odd - even
            m = msgs.astype(jnp.float32)
            return base + jnp.dot(m, delta, precision="highest")
        if self.msg_type.startswith("gau"):
            table = self.param("msg_embeddings", nn.initializers.normal(1.0),
                               (self.nbits, self.hidden_size))
            return jnp.dot(msgs.astype(jnp.float32), table, precision="highest")
        raise ValueError(f"Invalid msg_type: {self.msg_type}")

    @nn.compact
    def __call__(self, latents: jnp.ndarray, msgs: jnp.ndarray) -> jnp.ndarray:
        """latents: (B, h, w, d'); msgs: (B, nbits). Mirrors msg_processor.py:65-127."""
        if self.nbits == 0:
            return latents
        emb = self.message_embedding(msgs)  # (B, d)
        emb = emb[:, None, None, :] * jnp.ones(latents.shape[:-1] + (1,), latents.dtype)
        if self.msg_agg == "concat":
            return jnp.concatenate([latents, self.msg_mult * emb.astype(latents.dtype)], axis=-1)
        if self.msg_agg == "add":
            return latents + self.msg_mult * emb.astype(latents.dtype)
        raise ValueError(f"Invalid msg_agg: {self.msg_agg}")


def get_random_msg(key: jax.Array, nbits: int, bsz: int = 1,
                   nb_repetitions: int = 1, msg_type: str = "binary") -> jnp.ndarray:
    """Random message sampler (parity: msg_processor.py:43-63)."""
    if msg_type.startswith("bin"):
        if nb_repetitions != 1:
            assert nbits % nb_repetitions == 0
            aux = jax.random.randint(key, (bsz, nbits // nb_repetitions), 0, 2)
            return jnp.tile(aux, (1, nb_repetitions))
        return jax.random.randint(key, (bsz, nbits), 0, 2)
    if msg_type.startswith("gau"):
        g = jax.random.normal(key, (bsz, nbits))
        return g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    return jnp.zeros((bsz, 0), jnp.int32)
