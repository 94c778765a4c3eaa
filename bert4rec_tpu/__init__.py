"""bert4rec_tpu — a TPU-native sequential-recommendation framework.

A from-scratch JAX/XLA/pjit/Pallas implementation with the capabilities of the
TF2/Keras reference `maneymarkus/BERT4Rec` (BERT4Rec, arXiv:1904.06690):

- ``datasets``    — raw dataset acquisition (ML-1M, ML-20M, Beauty, Steam, Reddit)
- ``tokenizers``  — item <-> integer-id vocabularies
- ``dataloaders`` — sequence construction, leave-one-out splitting, vectorized
  dynamic MLM masking, negative samplers
- ``models``      — bidirectional transformer encoder + tied-embedding MLM head
- ``trainers``    — jit-compiled train step, optax AdamW w/ warmup, checkpointing
- ``evaluation``  — sampled-negative ranking metrics (HR@k, NDCG@k, MAP)
- ``apps``        — Recommender / Ranker inference modules
- ``core``        — device mesh, sharding specs, dtype policy (the distributed
  layer the reference does not have)
- ``ops``         — Pallas TPU kernels for the hot paths

Package convention (mirrors the reference, README.md:26-35): abstract base
class + concrete subclass(es) + module-level ``get(identifier, **kwargs)``
factories.
"""

__version__ = "0.1.0"
