from bert4rec_tpu.models.components.networks.bert4rec_encoder import (
    Bert4RecEncoder,
)

__all__ = ["Bert4RecEncoder"]
