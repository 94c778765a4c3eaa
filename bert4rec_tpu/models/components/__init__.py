from bert4rec_tpu.models.components import layers, transformer
from bert4rec_tpu.models.components.networks import Bert4RecEncoder

__all__ = ["layers", "transformer", "Bert4RecEncoder"]
