"""Models: bidirectional encoder + tied MLM head + persistence wrapper."""

from bert4rec_tpu.models.config import BERT4RecConfig
from bert4rec_tpu.models.components.networks import Bert4RecEncoder
from bert4rec_tpu.models.bert4rec_model import BERT4RecModel, SPECIAL_TOKEN_IDS
from bert4rec_tpu.models.sasrec_model import SASRecModel
from bert4rec_tpu.models.model_wrapper import ModelWrapper
from bert4rec_tpu.models.bert4rec_wrapper import BERT4RecModelWrapper
from bert4rec_tpu.models import export, model_utils, quantization

__all__ = [
    "export",
    "quantization",
    "BERT4RecConfig",
    "Bert4RecEncoder",
    "BERT4RecModel",
    "SASRecModel",
    "SPECIAL_TOKEN_IDS",
    "ModelWrapper",
    "BERT4RecModelWrapper",
    "model_utils",
]
