"""Mixed-precision policy: bf16 compute on the MXU, fp32 params/LN.

The reference runs fp32 throughout (TF default). On TPU the MXU wants
bfloat16 inputs; parameters, layer norms and the softmax/cross-entropy stay
float32 for stability.
"""

import dataclasses

import jax
import jax.numpy as jnp


def enable_fast_prng() -> None:
    """Switch jax's default PRNG to the TPU-efficient 'rbg' implementation.

    Dropout mask generation with the default threefry PRNG costs ~20% of a
    BERT4Rec train step (measured: 22.5 -> 18.4 ms/step on ml-1m_128,
    batch 256); rbg generates the same-distribution bits at a fraction of
    the cost. Changes random streams (not reproducible across impls), so
    it is opt-in rather than the package default.
    """
    jax.config.update("jax_default_prng_impl", "rbg")


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    # logits / loss / layer-norm always accumulate in fp32

    @classmethod
    def bf16(cls) -> "DTypePolicy":
        return cls(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)

    @classmethod
    def f32(cls) -> "DTypePolicy":
        return cls(param_dtype=jnp.float32, compute_dtype=jnp.float32)
