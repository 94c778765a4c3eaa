"""Mixed-precision policy: bf16 compute on the MXU, fp32 params/LN.

The reference runs fp32 throughout (TF default). On TPU the MXU wants
bfloat16 inputs; parameters, layer norms and the softmax/cross-entropy stay
float32 for stability.
"""

import dataclasses

import jax.numpy as jnp


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
